from image_restoration_tpu.train import losses, schedulers  # noqa: F401
