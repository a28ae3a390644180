from image_restoration_tpu.parallel.halo import halo_tiled_apply  # noqa: F401
