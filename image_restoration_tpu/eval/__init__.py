from image_restoration_tpu.eval.metrics import (  # noqa: F401
    psnr,
    masked_psnr,
    ssim,
    masked_ssim,
    rgb_to_y,
    psnr_yc,
    ssim_yc,
)
from image_restoration_tpu.eval.tiled import (  # noqa: F401
    window_partition,
    window_reverse,
    windowed_apply,
    pad_test,
)
