"""Illumination guidance ops (Retinexformer lineage).

Reference: Illumination_Estimator (IGMoCE-IR-main/src/net/igmoce_ir.py:232-258,
same module grafted into MoCE-IR-main/src/net/moce_ir.py:211-246 and
LumiSenseMoE): mean-channel concat -> 1x1 conv -> 5x5 depthwise (groups = 4,
the input channel count) -> 1x1 conv to an illumination map.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from image_restoration_tpu.ops.common import Conv, gelu_exact


class IlluminationEstimator(nn.Module):
    n_fea_middle: int
    n_fea_in: int = 4
    n_fea_out: int = 3
    depth_groups: int | None = None  # IGMoCE: n_fea_in(4); LumiSense: middle
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        groups = self.depth_groups if self.depth_groups is not None else self.n_fea_in
        mean_c = jnp.mean(img, axis=-1, keepdims=True)
        x = jnp.concatenate([img, mean_c], axis=-1)
        x1 = Conv(self.n_fea_middle, 1, use_bias=True, name="conv1", **kw)(x)
        illu_fea = Conv(self.n_fea_middle, 5, padding=2, groups=groups,
                        use_bias=True, name="depth_conv", **kw)(x1)
        illu_map = Conv(self.n_fea_out, 1, use_bias=True, name="conv2", **kw)(illu_fea)
        return illu_fea, illu_map


class AdaptiveIlluminationModulator(nn.Module):
    """conv-GELU-conv-sigmoid modulation map (igmoce_ir.py:261-281)."""

    dim: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, illu_fea):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        m = Conv(self.dim, 3, padding=1, use_bias=False, name="modulate_conv_0", **kw)(illu_fea)
        m = Conv(self.dim, 3, padding=1, use_bias=False, name="modulate_conv_2", **kw)(gelu_exact(m))
        return jax.nn.sigmoid(m)
