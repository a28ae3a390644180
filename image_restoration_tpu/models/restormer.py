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
from image_restoration_tpu.ops.common import Conv, ConvParams
from image_restoration_tpu.ops.ffn import GDFN
from image_restoration_tpu.ops.layernorm import LayerNorm
from image_restoration_tpu.ops.resample import Downsample, Upsample


class _LNLeaf(nn.Module):
    """Param twin of {BiasFree,WithBias}LayerNorm's 'body'."""

    with_bias: bool
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, c):
        w = self.param("weight", nn.initializers.ones, (c,), self.param_dtype)
        b = (self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
             if self.with_bias else None)
        return w, b


class _LNParams(nn.Module):
    ln_type: str
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, c):
        return _LNLeaf(self.ln_type != "BiasFree", self.param_dtype,
                       name="body")(c)


class _GDFNParams(nn.Module):
    """Param twin of GDFN (project_in / dwconv / project_out)."""

    dim: int
    expansion: float
    use_bias: bool
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        hidden = int(self.dim * self.expansion)
        w_in, b_in = ConvParams(hidden * 2, self.dim, 1, self.use_bias,
                                self.param_dtype, name="project_in")()
        w_dw, b_dw = ConvParams(hidden * 2, 1, 3, self.use_bias,
                                self.param_dtype, name="dwconv")()
        w_out, b_out = ConvParams(self.dim, hidden, 1, self.use_bias,
                                  self.param_dtype, name="project_out")()
        return w_in, b_in, w_dw, b_dw, w_out, b_out


class _AttnParams(nn.Module):
    """Param twin of MDTA (temperature / qkv / qkv_dwconv / project_out)."""

    dim: int
    num_heads: int
    use_bias: bool
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        d = self.dim
        temp = self.param("temperature", nn.initializers.ones,
                          (self.num_heads, 1, 1), self.param_dtype)
        wq, bq = ConvParams(3 * d, d, 1, self.use_bias, self.param_dtype,
                            name="qkv")()
        wd, bd = ConvParams(3 * d, 1, 3, self.use_bias, self.param_dtype,
                            name="qkv_dwconv")()
        wo, bo = ConvParams(d, d, 1, self.use_bias, self.param_dtype,
                            name="project_out")()
        return temp, wq, bq, wd, bd, wo, bo


class TransformerBlock(nn.Module):
    """LN -> MDTA -> +res; LN -> GDFN -> +res (Restormer.py:137-150)."""

    dim: int
    num_heads: int
    expansion: float = 2.66
    use_bias: bool = False
    ln_type: str = "WithBias"
    fold_dwconv: bool = False
    fused_gdfn: bool = False  # Pallas fused LN+GDFN tail (kernels/gdfn_pallas)
    fused_attn: bool = False  # Pallas fused LN+qkv+dwconv (kernels/mdta_pallas)
    fused_block: bool = False  # whole-block 2-pass kernel (kernels/block_pallas)
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, w_real: int | None = None):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if self.fused_block:
            # x is a canvas tensor from kernels.block_pallas.canvas_pad;
            # w_real is the pre-padding image width (static).
            from image_restoration_tpu.kernels.block_pallas import fused_block

            d = self.dim
            lnw1, lnb1 = _LNParams(self.ln_type, self.param_dtype,
                                   name="norm1")(d)
            temp, wq, bq, wd, bd, wo, bo = _AttnParams(
                d, self.num_heads, self.use_bias, self.param_dtype,
                name="attn")()
            lnw2, lnb2 = _LNParams(self.ln_type, self.param_dtype,
                                   name="norm2")(d)
            w_in, b_in, w_dw2, b_dw2, w_out, b_out = _GDFNParams(
                d, self.expansion, self.use_bias, self.param_dtype,
                name="ffn")()
            params = (lnw1, lnb1, wq, bq, wd, bd, temp, wo, bo, lnw2, lnb2,
                      w_in, b_in, w_dw2, b_dw2, w_out, b_out)
            return fused_block(
                x, params, (d, w_real, self.num_heads, self.ln_type, 1e-5),
                None)
        if self.fused_attn:
            from image_restoration_tpu.kernels.attn_core_pallas import (
                fused_mdta_core,
            )
            from image_restoration_tpu.kernels.mdta_pallas import (
                fused_ln_qkv_dwconv_split,
            )

            d = self.dim
            lnw, lnb = _LNParams(self.ln_type, self.param_dtype,
                                 name="norm1")(d)
            temp, wq, bq, wd, bd, wo, bo = _AttnParams(
                d, self.num_heads, self.use_bias, self.param_dtype,
                name="attn")()
            qkv = fused_ln_qkv_dwconv_split(x, (lnw, lnb, wq, bq, wd, bd),
                                            self.ln_type)
            x = fused_mdta_core(qkv, x, temp, wo, bo, self.num_heads)
        else:
            x = x + MDTA(self.dim, self.num_heads, self.use_bias,
                         fold_dwconv=self.fold_dwconv, name="attn", **kw)(
                LayerNorm(self.ln_type, param_dtype=self.param_dtype,
                          name="norm1")(x)
            )
        if self.fused_gdfn:
            from image_restoration_tpu.kernels.gdfn_pallas import fused_ln_gdfn

            lnw, lnb = _LNParams(self.ln_type, self.param_dtype,
                                 name="norm2")(self.dim)
            gp = _GDFNParams(self.dim, self.expansion, self.use_bias,
                             self.param_dtype, name="ffn")()
            w_in, b_in, w_dw, b_dw, w_out, b_out = gp
            x = fused_ln_gdfn(
                x, (lnw, lnb, w_in, b_in, w_dw, b_dw, w_out, b_out),
                self.ln_type)
        else:
            x = x + GDFN(self.dim, self.expansion, self.use_bias,
                         fold_dwconv=self.fold_dwconv, name="ffn", **kw)(
                LayerNorm(self.ln_type, param_dtype=self.param_dtype,
                          name="norm2")(x)
            )
        return x


class _ScanCell(nn.Module):
    """Scan body: one TransformerBlock as a (carry, None) -> (carry, None)
    cell so a level's identical blocks compile ONCE under `nn.scan` (stacked
    params on axis 0) instead of being inlined per block by XLA."""

    dim: int
    num_heads: int
    expansion: float
    use_bias: bool
    ln_type: str
    fold_dwconv: bool
    fused_gdfn: bool
    fused_attn: bool
    fused_block: bool
    w_real: int | None
    dtype: Any
    param_dtype: Any

    @nn.compact
    def __call__(self, x, _):
        blk = TransformerBlock(
            dim=self.dim, num_heads=self.num_heads, expansion=self.expansion,
            use_bias=self.use_bias, ln_type=self.ln_type,
            fold_dwconv=self.fold_dwconv, fused_gdfn=self.fused_gdfn,
            fused_attn=self.fused_attn, fused_block=self.fused_block,
            dtype=self.dtype, param_dtype=self.param_dtype, name="block")
        return blk(x, w_real=self.w_real), None


def stack_scan_params(params, prefixes=None):
    """Loop->scan layout converter over the TOP-LEVEL keys of ``params``:
    a run of sibling subtrees named ``{prefix}_0 .. {prefix}_{n-1}`` with
    identical leaf shapes is replaced by ``{prefix}_scan: {"block": leaves
    stacked on axis 0}`` — the layout
    `BlockStackMixin._run_level(scan_blocks=True)` expects. Nested dicts are
    NOT recursed into (block-stack groups live at the top level for every
    mixin model; recursing would mis-stack flax auto-numbered submodules like
    ``Conv_0``/``Conv_1``). Runs must start at index 0, so step-numbered
    module names like ``latent_mid1`` / ``up2_1_mid2`` (no ``..._0`` sibling)
    pass through untouched.

    ``prefixes``: optional allowlist of stack-name prefixes (e.g.
    ``{"encoder_level1", "latent"}``); when given, only those runs are
    converted — use it to protect coincidental ``foo_0``/``foo_1`` sibling
    pairs that are not block stacks. Works for any model whose stacks are
    built by the mixin (Restormer, AdaIR, NeRD-Rain)."""
    import re

    import jax

    out = dict(params)
    runs = {}
    for k in out:
        m = re.fullmatch(r"(.+)_(\d+)", k)
        if m:
            runs.setdefault(m.group(1), set()).add(int(m.group(2)))
    for prefix, idxs in runs.items():
        if prefixes is not None and prefix not in prefixes:
            continue
        n = len(idxs)
        if idxs != set(range(n)):
            continue  # not a 0..n-1 run: step-numbered module, not a stack
        group = [out[f"{prefix}_{i}"] for i in range(n)]
        shapes = [jax.tree.map(jnp.shape, g) for g in group]
        if any(s != shapes[0] for s in shapes[1:]):
            continue  # heterogeneous: not an identical-block stack
        for i in range(n):
            out.pop(f"{prefix}_{i}")
        out[f"{prefix}_scan"] = {
            "block": jax.tree.map(lambda *ls: jnp.stack(ls, 0), *group)}
    return out


def to_scan_params(params, num_blocks=(4, 6, 6, 8), num_refinement_blocks=4):
    """Convert a loop-layout Restormer param tree (`encoder_level1_0`, ...)
    to the scan layout (`encoder_level1_scan.block` with leaves stacked on
    axis 0). Use after torch checkpoint import to run `scan_blocks=True`.
    AdaIR uses the same group names, so this converts AdaIR trees too (its
    FreModule/resample params pass through untouched)."""
    import jax

    out = dict(params)
    groups = [
        ("encoder_level1", num_blocks[0]), ("encoder_level2", num_blocks[1]),
        ("encoder_level3", num_blocks[2]), ("latent", num_blocks[3]),
        ("decoder_level3", num_blocks[2]), ("decoder_level2", num_blocks[1]),
        ("decoder_level1", num_blocks[0]),
        ("refinement", num_refinement_blocks),
    ]
    for prefix, n in groups:
        stack = [out.pop(f"{prefix}_{i}") for i in range(n)]
        out[f"{prefix}_scan"] = {
            "block": jax.tree.map(lambda *ls: jnp.stack(ls, 0), *stack)}
    return out


from image_restoration_tpu.models.registry import register_model


class BlockStackMixin:
    """Shared serving fast paths for Restormer-block U-Nets (Restormer,
    AdaIR): the whole-block 2-pass canvas kernel (``fused_block``) and the
    per-level ``nn.scan`` layout (``scan_blocks``). The host nn.Module must
    define ``ffn_expansion_factor, use_bias, ln_type, fold_dwconv,
    fused_gdfn, fused_attn, fused_block, scan_blocks, dtype, param_dtype``.
    Param naming is identical to the plain per-block loop (``{prefix}_{i}``)
    unless ``scan_blocks`` stacks each group under ``{prefix}_scan.block``
    (see ``to_scan_params``)."""

    def _block_kwargs(self, dim, heads):
        return dict(
            dim=dim, num_heads=heads, expansion=self.ffn_expansion_factor,
            use_bias=self.use_bias, ln_type=self.ln_type,
            fold_dwconv=self.fold_dwconv and dim <= 96,
            fused_gdfn=self.fused_gdfn, fused_attn=self.fused_attn,
            fused_block=self.fused_block, dtype=self.dtype,
            param_dtype=self.param_dtype)

    def _run_level(self, x, *specs):
        """Apply block stacks at one resolution. specs = (dim, heads, n,
        prefix) groups applied in order. With fused_block the level runs on a
        single persistent canvas (pad once, unpad once — zero per-block
        copies). With scan_blocks each group is one `nn.scan` over stacked
        per-block params (compile the block body ONCE per level instead of
        once per block — cuts whole-model XLA compile ~8x; see
        to_scan_params for the loop->scan checkpoint layout converter)."""
        w = x.shape[2]
        if self.fused_block:
            from image_restoration_tpu.kernels.block_pallas import (
                canvas_pad,
                canvas_unpad,
            )

            c = x.shape[-1]
            x = canvas_pad(x)
        for dim, heads, n, prefix in specs:
            if self.scan_blocks:
                cell = nn.scan(
                    _ScanCell,
                    variable_axes={"params": 0},
                    split_rngs={"params": True},
                    length=n,
                )(w_real=w if self.fused_block else None,
                  name=f"{prefix}_scan", **self._block_kwargs(dim, heads))
                x, _ = cell(x, None)
            else:
                for i in range(n):
                    blk = TransformerBlock(name=f"{prefix}_{i}",
                                           **self._block_kwargs(dim, heads))
                    x = blk(x, w_real=w) if self.fused_block else blk(x)
        if self.fused_block:
            x = canvas_unpad(x, w, c)
        return x


@register_model("restormer")
class Restormer(BlockStackMixin, nn.Module):
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
    fold_dwconv: bool = False  # alternative dense-3x3 folded qkv/FFN convs
    fused_gdfn: bool = False   # Pallas fused LN+GDFN (TPU serving fast path)
    fused_attn: bool = False   # Pallas fused LN+qkv+dwconv front
    fused_block: bool = False  # whole-block 2-pass canvas kernel (fastest)
    scan_blocks: bool = False  # nn.scan over each level's blocks (fast compile)
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inp_img):
        d = self.dim
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = inp_img.astype(self.dtype) if self.dtype is not None else inp_img

        feats = Conv(d, 3, padding=1, use_bias=False, name="patch_embed", **kw)(x)
        enc1 = self._run_level(
            feats, (d, self.heads[0], self.num_blocks[0], "encoder_level1"))

        x2 = Downsample(d, name="down1_2", **kw)(enc1)
        enc2 = self._run_level(
            x2, (d * 2, self.heads[1], self.num_blocks[1], "encoder_level2"))

        x3 = Downsample(d * 2, name="down2_3", **kw)(enc2)
        enc3 = self._run_level(
            x3, (d * 4, self.heads[2], self.num_blocks[2], "encoder_level3"))

        x4 = Downsample(d * 4, name="down3_4", **kw)(enc3)
        latent = self._run_level(
            x4, (d * 8, self.heads[3], self.num_blocks[3], "latent"))

        dec3 = Upsample(d * 8, name="up4_3", **kw)(latent)
        dec3 = jnp.concatenate([dec3, enc3], axis=-1)
        dec3 = Conv(d * 4, 1, use_bias=self.use_bias, name="reduce_chan_level3", **kw)(dec3)
        dec3 = self._run_level(
            dec3, (d * 4, self.heads[2], self.num_blocks[2], "decoder_level3"))

        dec2 = Upsample(d * 4, name="up3_2", **kw)(dec3)
        dec2 = jnp.concatenate([dec2, enc2], axis=-1)
        dec2 = Conv(d * 2, 1, use_bias=self.use_bias, name="reduce_chan_level2", **kw)(dec2)
        dec2 = self._run_level(
            dec2, (d * 2, self.heads[1], self.num_blocks[1], "decoder_level2"))

        dec1 = Upsample(d * 2, name="up2_1", **kw)(dec2)
        dec1 = jnp.concatenate([dec1, enc1], axis=-1)  # stays at 2*dim: no reduce
        dec1 = self._run_level(
            dec1,
            (d * 2, self.heads[0], self.num_blocks[0], "decoder_level1"),
            (d * 2, self.heads[0], self.num_refinement_blocks, "refinement"))

        if self.dual_pixel_task:
            dec1 = dec1 + Conv(d * 2, 1, use_bias=self.use_bias, name="skip_conv", **kw)(feats)
            out = Conv(self.out_channels, 3, padding=1, use_bias=self.use_bias,
                       name="output", **kw)(dec1)
        else:
            out = Conv(self.out_channels, 3, padding=1, use_bias=self.use_bias,
                       name="output", **kw)(dec1) + x
        return out.astype(jnp.float32)
