"""image_restoration_tpu — a TPU-native image-restoration framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of the
reference PyTorch zoo `1601339895/Image-Restoration` (see SURVEY.md): a shared
block library (MDTA, GDFN, bias-free LayerNorm, pixel-shuffle resamplers, FFT
branches, top-k MoE routing, illumination guidance, INR decoders, FiLM
hypernets), the model families built from it (Restormer, AdaIR, MoCE-IR,
TransWeather, SRConvNet, DarkIR, NeRD-Rain, ...), an all-in-one degradation
data pipeline, on-device PSNR/SSIM eval, tiled whole-image inference, and a
single pjit/shard_map training runtime.

Everything is channels-last (NHWC), statically shaped, and jit-compiled.
Multi-chip scaling rides `jax.sharding.Mesh` axes ("data", "expert",
"spatial") rather than NCCL process groups.
"""

__version__ = "0.1.0"

from image_restoration_tpu.core import mesh, precision  # noqa: F401
