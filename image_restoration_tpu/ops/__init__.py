from image_restoration_tpu.ops.common import (  # noqa: F401
    Conv,
    conv2d,
    crop_to,
    gelu_exact,
    pad_to_multiple,
    simple_gate,
)
from image_restoration_tpu.ops.layernorm import (  # noqa: F401
    BiasFreeLayerNorm,
    LayerNorm,
    LayerNorm2d,
    WithBiasLayerNorm,
)
from image_restoration_tpu.ops.attention import MDTA, SRAttention, SparseTopKMDTA  # noqa: F401
from image_restoration_tpu.ops.ffn import GDFN, MLP, MixedScaleFFN  # noqa: F401
from image_restoration_tpu.ops.resample import (  # noqa: F401
    Downsample,
    Upsample,
    pixel_shuffle,
    pixel_unshuffle,
    resize_bilinear,
)
