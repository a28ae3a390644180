"""Restormer, TPU-native (NHWC, flax).

Re-designed from the behavior of the reference `Restormer.py:193-283`
(4-level U-Net transformer: MDTA + GDFN blocks, pixel-shuffle resamplers,
encoder-skip concat with 1x1 reduce at levels 3/2, plain concat at level 1,
refinement blocks, residual-to-input head, optional dual-pixel skip path).

Module names mirror the torch attribute paths so the checkpoint importer
(utils/torch_import.py) can map `encoder_level1.0.attn.qkv.weight` ->
params['encoder_level1_0']['attn']['qkv']['conv']['kernel'] mechanically.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from image_restoration_tpu.ops.attention import MDTA
from image_restoration_tpu.ops.common import Conv
from image_restoration_tpu.ops.ffn import GDFN
from image_restoration_tpu.ops.layernorm import LayerNorm
from image_restoration_tpu.ops.resample import Downsample, Upsample


class TransformerBlock(nn.Module):
    """LN -> MDTA -> +res; LN -> GDFN -> +res (Restormer.py:137-150)."""

    dim: int
    num_heads: int
    expansion: float = 2.66
    use_bias: bool = False
    ln_type: str = "WithBias"
    fold_dwconv: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = x + MDTA(self.dim, self.num_heads, self.use_bias,
                     fold_dwconv=self.fold_dwconv, name="attn", **kw)(
            LayerNorm(self.ln_type, param_dtype=self.param_dtype, name="norm1")(x)
        )
        x = x + GDFN(self.dim, self.expansion, self.use_bias,
                     fold_dwconv=self.fold_dwconv, name="ffn", **kw)(
            LayerNorm(self.ln_type, param_dtype=self.param_dtype, name="norm2")(x)
        )
        return x


from image_restoration_tpu.models.registry import register_model


@register_model("restormer")
class Restormer(nn.Module):
    inp_channels: int = 3
    out_channels: int = 3
    dim: int = 48
    num_blocks: Sequence[int] = (4, 6, 6, 8)
    num_refinement_blocks: int = 4
    heads: Sequence[int] = (1, 2, 4, 8)
    ffn_expansion_factor: float = 2.66
    use_bias: bool = False
    ln_type: str = "WithBias"
    dual_pixel_task: bool = False
    fold_dwconv: bool = False  # TPU fast path: dense-3x3 folded qkv/FFN convs
    dtype: Any = None
    param_dtype: Any = jnp.float32

    def _blocks(self, dim, heads, n, prefix):
        return [
            TransformerBlock(
                dim=dim, num_heads=heads, expansion=self.ffn_expansion_factor,
                use_bias=self.use_bias, ln_type=self.ln_type,
                # the dense-3x3 fold beats the VPU depthwise only while
                # channels < ~112 (9x MXU flops vs 18 VPU flops/px/ch)
                fold_dwconv=self.fold_dwconv and dim <= 96, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"{prefix}_{i}",
            )
            for i in range(n)
        ]

    @nn.compact
    def __call__(self, inp_img):
        d = self.dim
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = inp_img.astype(self.dtype) if self.dtype is not None else inp_img

        feats = Conv(d, 3, padding=1, use_bias=False, name="patch_embed", **kw)(x)
        enc1 = feats
        for blk in self._blocks(d, self.heads[0], self.num_blocks[0], "encoder_level1"):
            enc1 = blk(enc1)

        x2 = Downsample(d, name="down1_2", **kw)(enc1)
        enc2 = x2
        for blk in self._blocks(d * 2, self.heads[1], self.num_blocks[1], "encoder_level2"):
            enc2 = blk(enc2)

        x3 = Downsample(d * 2, name="down2_3", **kw)(enc2)
        enc3 = x3
        for blk in self._blocks(d * 4, self.heads[2], self.num_blocks[2], "encoder_level3"):
            enc3 = blk(enc3)

        x4 = Downsample(d * 4, name="down3_4", **kw)(enc3)
        latent = x4
        for blk in self._blocks(d * 8, self.heads[3], self.num_blocks[3], "latent"):
            latent = blk(latent)

        dec3 = Upsample(d * 8, name="up4_3", **kw)(latent)
        dec3 = jnp.concatenate([dec3, enc3], axis=-1)
        dec3 = Conv(d * 4, 1, use_bias=self.use_bias, name="reduce_chan_level3", **kw)(dec3)
        for blk in self._blocks(d * 4, self.heads[2], self.num_blocks[2], "decoder_level3"):
            dec3 = blk(dec3)

        dec2 = Upsample(d * 4, name="up3_2", **kw)(dec3)
        dec2 = jnp.concatenate([dec2, enc2], axis=-1)
        dec2 = Conv(d * 2, 1, use_bias=self.use_bias, name="reduce_chan_level2", **kw)(dec2)
        for blk in self._blocks(d * 2, self.heads[1], self.num_blocks[1], "decoder_level2"):
            dec2 = blk(dec2)

        dec1 = Upsample(d * 2, name="up2_1", **kw)(dec2)
        dec1 = jnp.concatenate([dec1, enc1], axis=-1)  # stays at 2*dim: no reduce
        for blk in self._blocks(d * 2, self.heads[0], self.num_blocks[0], "decoder_level1"):
            dec1 = blk(dec1)
        for blk in self._blocks(d * 2, self.heads[0], self.num_refinement_blocks, "refinement"):
            dec1 = blk(dec1)

        if self.dual_pixel_task:
            dec1 = dec1 + Conv(d * 2, 1, use_bias=self.use_bias, name="skip_conv", **kw)(feats)
            out = Conv(self.out_channels, 3, padding=1, use_bias=self.use_bias,
                       name="output", **kw)(dec1)
        else:
            out = Conv(self.out_channels, 3, padding=1, use_bias=self.use_bias,
                       name="output", **kw)(dec1) + x
        return out.astype(jnp.float32)
