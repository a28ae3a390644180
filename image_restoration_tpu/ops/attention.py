"""Attention blocks, NHWC-native.

MDTA (Restormer.py:99-132) is *transposed* channel attention: the attention
matrix is (C/heads x C/heads) contracted over all HW tokens, so the cost is
linear in resolution — the architectural trick that makes whole-image
restoration feasible without windowing. On TPU both contractions are skinny
matmuls (c x HW)@(HW x c); we express them as einsums over the natural NHWC
layout and accumulate in fp32 on the MXU.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from image_restoration_tpu.ops.common import Conv


def l2_normalize(x, axis: int, eps: float = 1e-12):
    """torch F.normalize semantics: x / max(||x||_2, eps)."""
    n = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(n, eps)


def normalized_channel_logits(q, k, eps: float = 1e-12):
    """Normalized C x C channel-attention logits, token-major layout.

    q, k: (B, N, heads, C) with N the token axis. Returns fp32
    (B, heads, C, C) equal to ``l2_normalize(q, axis=1)^T @
    l2_normalize(k, axis=1)`` — but computed as the RAW contraction (fp32
    accumulation on the MXU) rescaled by the outer product of the channel
    norms. Normalization commutes with the dot, so this never materializes
    fp32-normalized copies of the big (N, C) tensors (2 full HBM round
    trips per block at 512^2 in the naive order).
    """
    raw = jnp.einsum("bnhc,bnhd->bhcd", q, k,
                     preferred_element_type=jnp.float32)
    qn = jnp.sqrt(jnp.einsum("bnhc,bnhc->bhc", q, q,
                             preferred_element_type=jnp.float32))
    kn = jnp.sqrt(jnp.einsum("bnhc,bnhc->bhc", k, k,
                             preferred_element_type=jnp.float32))
    denom = (jnp.maximum(qn, eps)[:, :, :, None]
             * jnp.maximum(kn, eps)[:, :, None, :])
    return raw / denom


def normalized_channel_logits_tok_minor(q, k, eps: float = 1e-12):
    """Same as :func:`normalized_channel_logits` for the token-minor layout:
    q, k: (..., C, N) -> fp32 (..., C, C)."""
    raw = jnp.einsum("...ct,...dt->...cd", q, k,
                     preferred_element_type=jnp.float32)
    qn = jnp.sqrt(jnp.einsum("...ct,...ct->...c", q, q,
                             preferred_element_type=jnp.float32))
    kn = jnp.sqrt(jnp.einsum("...ct,...ct->...c", k, k,
                             preferred_element_type=jnp.float32))
    denom = (jnp.maximum(qn, eps)[..., :, None]
             * jnp.maximum(kn, eps)[..., None, :])
    return raw / denom


def mdta_attention(q, k, v, temperature, num_heads: int):
    """Core MDTA contraction.

    q, k, v: (B, H, W, C); temperature: (heads, 1, 1).
    Returns (B, H, W, C). Channel layout within C is head-major, matching the
    reference rearrange 'b (head c) h w -> b head c (h w)' (Restormer.py:117).

    The per-channel L2 normalization over HW commutes with the contraction:
    normalize(q)^T normalize(k) == (q^T k) / (||q_c|| ||k_d||) — a rank-1
    rescale of the tiny (ch x ch) product. Computing it that way avoids
    materializing fp32-normalized copies of q and k (2 full HBM round trips
    per block at 512^2).
    """
    b, h, w, c = q.shape
    ch = c // num_heads
    dt = q.dtype

    def split_heads(t):
        return t.reshape(b, h * w, num_heads, ch)

    q, k, v = split_heads(q), split_heads(k), split_heads(v)
    qn = jnp.sqrt(jnp.sum(jnp.square(q.astype(jnp.float32)), axis=1))  # (b,heads,ch)
    kn = jnp.sqrt(jnp.sum(jnp.square(k.astype(jnp.float32)), axis=1))
    qn = jnp.maximum(qn, 1e-12)
    kn = jnp.maximum(kn, 1e-12)
    # raw (B, heads, ch, ch) product, fp32 accumulate on the MXU
    attn = jnp.einsum("bnhc,bnhd->bhcd", q, k, preferred_element_type=jnp.float32)
    attn = attn / (qn[:, :, :, None] * kn[:, :, None, :])
    # (heads,1,1) -> (1,heads,1,1); a per-sample (b,heads) temperature (CG-IR
    # context-predicted log-temperature) reshapes to (b,heads,1,1)
    attn = attn * temperature.reshape(-1, num_heads, 1, 1).astype(jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum(
        "bhcd,bnhd->bnhc", attn.astype(dt), v, preferred_element_type=jnp.float32
    ).astype(dt)
    return out.reshape(b, h, w, c)


class MDTA(nn.Module):
    """Multi-DConv-Head Transposed Attention (Restormer.py:99-132).

    1x1 qkv conv -> 3x3 depthwise -> per-head L2-normalized CxC attention
    with a learnable per-head temperature -> 1x1 projection.
    """

    dim: int
    num_heads: int
    use_bias: bool = False
    fold_dwconv: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dim
        temperature = self.param(
            "temperature", nn.initializers.ones, (self.num_heads, 1, 1), self.param_dtype
        )
        if self.fold_dwconv and not self.use_bias:
            # Alternative compute path: fold the (1x1 conv -> 3x3
            # depthwise) pair into ONE dense 3x3 conv K[t,c,o]=W[c,o]*d[t,o]
            # — identical math when bias-free. Trades VPU depthwise flops
            # for 9x MXU flops; roughly a wash on v5e, useful where the VPU
            # is the bottleneck and the MXU is idle.
            from image_restoration_tpu.ops.common import ConvParams

            w1, _ = ConvParams(d * 3, d, 1, False, self.param_dtype,
                               name="qkv")()
            dw, _ = ConvParams(d * 3, 1, 3, False, self.param_dtype,
                               name="qkv_dwconv")()
            dt = x.dtype if self.dtype is None else self.dtype
            kfold = (w1[0, 0][None, None, :, :] * dw[:, :, 0][:, :, None, :])
            # fp32 inputs need the 3-pass MXU algorithm to match the
            # unfolded pair's accuracy; bf16 runs at default speed
            prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32 else None)
            qkv = jax.lax.conv_general_dilated(
                x.astype(dt), kfold.astype(dt), (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=prec)
        else:
            qkv = Conv(d * 3, 1, use_bias=self.use_bias, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="qkv")(x)
            qkv = Conv(d * 3, 3, padding=1, groups=d * 3, use_bias=self.use_bias,
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="qkv_dwconv")(qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        out = mdta_attention(q, k, v, temperature, self.num_heads)
        return Conv(d, 1, use_bias=self.use_bias, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="project_out")(out)


class SparseTopKMDTA(nn.Module):
    """DRSformer-style top-k sparse channel attention (DRSformer_arch.py:101).

    Same MDTA geometry, but the (CxC) attention row keeps only its top-k
    logits (k swept over {C/2, 2C/3, 3C/4, 4C/5} and averaged in the
    reference); masked entries get -inf before softmax. Static shapes: the
    mask is computed with jax.lax.top_k.
    """

    dim: int
    num_heads: int
    use_bias: bool = False
    top_k_fracs: tuple = (1 / 2, 2 / 3, 3 / 4, 4 / 5)
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dim
        b, h, w, _ = x.shape
        heads = self.num_heads
        ch = d // heads
        temperature = self.param(
            "temperature", nn.initializers.ones, (heads, 1, 1), self.param_dtype
        )
        qkv = Conv(d * 3, 1, use_bias=self.use_bias, dtype=self.dtype,
                   param_dtype=self.param_dtype, name="qkv")(x)
        qkv = Conv(d * 3, 3, padding=1, groups=d * 3, use_bias=self.use_bias,
                   dtype=self.dtype, param_dtype=self.param_dtype, name="qkv_dwconv")(qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            return t.reshape(b, h * w, heads, ch)

        v = split_heads(v)
        logits = normalized_channel_logits(split_heads(q), split_heads(k))
        logits = logits * temperature.reshape(1, heads, 1, 1).astype(jnp.float32)

        # (1/N) * sum_f (attn_f @ v) == ((1/N) * sum_f attn_f) @ v: average
        # the tiny (heads, C, C) matrices first, then apply V once.
        attn_sum = 0.0
        for frac in self.top_k_fracs:
            kk = max(1, int(ch * frac))
            thresh = jax.lax.top_k(logits, kk)[0][..., -1:]
            masked = jnp.where(logits >= thresh, logits, -jnp.inf)
            attn_sum = attn_sum + jax.nn.softmax(masked, axis=-1)
        attn_sum = attn_sum / len(self.top_k_fracs)
        out = jnp.einsum(
            "bhcd,bnhd->bnhc", attn_sum.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype).reshape(b, h, w, d)
        return Conv(d, 1, use_bias=self.use_bias, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="project_out")(out)


class SRAttention(nn.Module):
    """SegFormer spatial-reduction attention (transweather_model.py:319-380).

    Standard token attention over HW tokens, with K/V spatially reduced by a
    strided conv of ratio ``sr_ratio`` (8/4/2/1 across stages) so the score
    matrix is (HW x HW/r^2).
    """

    dim: int
    num_heads: int
    sr_ratio: int = 1
    qkv_bias: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, h: int, w: int):
        # x: (B, N=h*w, C) token layout
        b, n, c = x.shape
        heads = self.num_heads
        ch = c // heads
        scale = ch ** -0.5
        dense = lambda f, name: nn.Dense(f, use_bias=self.qkv_bias, dtype=self.dtype,
                                         param_dtype=self.param_dtype, name=name)
        q = dense(c, "q")(x).reshape(b, n, heads, ch)
        if self.sr_ratio > 1:
            xr = x.reshape(b, h, w, c)
            xr = Conv(c, self.sr_ratio, stride=self.sr_ratio, use_bias=True,
                      dtype=self.dtype, param_dtype=self.param_dtype, name="sr")(xr)
            xr = xr.reshape(b, -1, c)
            from image_restoration_tpu.ops.layernorm import WithBiasLayerNorm

            xr = WithBiasLayerNorm(param_dtype=self.param_dtype, name="norm")(xr)
        else:
            xr = x
        kv = dense(2 * c, "kv")(xr).reshape(b, -1, 2, heads, ch)
        k, v = kv[:, :, 0], kv[:, :, 1]
        attn = jnp.einsum("bnhc,bmhc->bhnm", q, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn * scale, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bmhc->bnhc", attn, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype, name="proj")(out)
