"""Feed-forward blocks (NHWC)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from image_restoration_tpu.ops.common import Conv, gelu_exact


class GDFN(nn.Module):
    """Gated-DConv FFN (Restormer.py:76-93).

    1x1 expand to 2*hidden -> 3x3 depthwise -> gelu(x1)*x2 gate -> 1x1 out.
    The two 1x1 convs are MXU matmuls; XLA fuses the gate into the dwconv.
    """

    dim: int
    expansion: float = 2.66
    use_bias: bool = False
    fold_dwconv: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = int(self.dim * self.expansion)
        if self.fold_dwconv and not self.use_bias:
            # Alternative path: fold (1x1 expand -> 3x3 depthwise) into
            # one dense MXU 3x3 conv (see ops/attention.py MDTA note);
            # exact when bias-free, flops-for-bandwidth trade.
            import jax

            from image_restoration_tpu.ops.common import ConvParams

            w1, _ = ConvParams(hidden * 2, self.dim, 1, False,
                               self.param_dtype, name="project_in")()
            dw, _ = ConvParams(hidden * 2, 1, 3, False, self.param_dtype,
                               name="dwconv")()
            dt = x.dtype if self.dtype is None else self.dtype
            kfold = w1[0, 0][None, None, :, :] * dw[:, :, 0][:, :, None, :]
            prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32 else None)
            x = jax.lax.conv_general_dilated(
                x.astype(dt), kfold.astype(dt), (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=prec)
        else:
            x = Conv(hidden * 2, 1, use_bias=self.use_bias, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="project_in")(x)
            x = Conv(hidden * 2, 3, padding=1, groups=hidden * 2, use_bias=self.use_bias,
                     dtype=self.dtype, param_dtype=self.param_dtype, name="dwconv")(x)
        x1, x2 = jnp.split(x, 2, axis=-1)
        x = gelu_exact(x1) * x2
        return Conv(self.dim, 1, use_bias=self.use_bias, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="project_out")(x)


class MixedScaleFFN(nn.Module):
    """DRSformer mixed-scale FFN (DRSformer_arch.py:62-98): two parallel
    depthwise branches (3x3 and 5x5) with cross-gating, then 1x1 out."""

    dim: int
    expansion: float = 2.66
    use_bias: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = int(self.dim * self.expansion)
        x = Conv(hidden * 2, 1, use_bias=self.use_bias, dtype=self.dtype,
                 param_dtype=self.param_dtype, name="project_in")(x)
        x1, x2 = jnp.split(x, 2, axis=-1)
        d3 = Conv(hidden, 3, padding=1, groups=hidden, use_bias=self.use_bias,
                  dtype=self.dtype, param_dtype=self.param_dtype, name="dwconv3")(x1)
        d5 = Conv(hidden, 5, padding=2, groups=hidden, use_bias=self.use_bias,
                  dtype=self.dtype, param_dtype=self.param_dtype, name="dwconv5")(x2)
        x1 = gelu_exact(d3) * d5
        x2 = gelu_exact(d5) * d3
        x = jnp.concatenate([x1, x2], axis=-1)
        return Conv(self.dim, 1, use_bias=self.use_bias, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="project_out")(x)


class MLP(nn.Module):
    """Token MLP with depthwise positional conv (transweather_model.py:258-290)."""

    hidden: int
    out: int
    use_dwconv: bool = True
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, h: int = None, w: int = None):
        b, n, _ = x.shape
        x = nn.Dense(self.hidden, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="fc1")(x)
        if self.use_dwconv:
            xr = x.reshape(b, h, w, self.hidden)
            xr = Conv(self.hidden, 3, padding=1, groups=self.hidden, use_bias=True,
                      dtype=self.dtype, param_dtype=self.param_dtype, name="dwconv")(xr)
            x = xr.reshape(b, n, self.hidden)
        x = gelu_exact(x)
        return nn.Dense(self.out, dtype=self.dtype, param_dtype=self.param_dtype,
                        name="fc2")(x)
