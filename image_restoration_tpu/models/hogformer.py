"""HOGformer, TPU-native (NHWC, flax).

Re-designed from the behavior of the reference
``HOGformer-main/settingI/basicsr/models/archs/hogformer_arch.py``:

* ``Attention_DHOGSA`` (:164-309) — dual HOG-sorted attention: the first half
  of the channels is re-ordered *within 8x8 patches* by HOG-weighted gradient
  magnitude, enriched with a projected+upsampled HOG histogram map; then a
  5-way qkv produces two channel-attention branches over tokens globally
  sorted by orientation-weighted gradient magnitude — one "box" grouping
  (contiguous token chunks per head-factor) and one strided grouping — whose
  outputs are un-sorted and multiplied.
* ``FFN_DIFF`` (:106-143) — pixel-shuffle FFN: mish-gated dual dwconv branches
  (5x5 and dilated 3x3) at 2x resolution with a feature-decompose residual.
* parameter-free LayerNorms (:28-57 — affine weight/bias are commented out in
  the reference).
* U-Net assembly (:367-489) with AvgPool ``SkipPatchEmbed`` image pyramids
  injected into each encoder level (:326-339, :434-439).

TPU notes: sorts are ``jnp.argsort`` (XLA sort on device). Within-patch
permutations (64 tokens) are applied as one-hot MATMULS — a permutation
matrix ride on the MXU beats a minor-axis gather, and the inverse
permutation is the transposed matmul of the same one-hot (exact: one
nonzero per row). The global token un-sort of the reference (:299-306) is
a gather by the inverse permutation, built with a one-pass scatter of iota
rather than a second O(T log^2 T) argsort; the two attention branches are
multiplied while still sorted (elementwise product commutes with a shared
permutation) so only ONE inverse gather runs. The per-bin HOG histogram
python loop (:254-258) is a fused multiply+reduce over a one-hot;
everything is static-shape.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from image_restoration_tpu.models.registry import register_model
from image_restoration_tpu.ops.attention import normalized_channel_logits_tok_minor
from image_restoration_tpu.ops.common import (
    Conv,
    ConvParams,
    conv2d,
    layer_scale_init,
)
from image_restoration_tpu.ops.resample import (
    pixel_shuffle,
    pixel_unshuffle,
    resize_bilinear,
)


# A/B knob (import-time, like IR_TPU_PIPE): FFN_DIFF branch-1 phase-mixing
# implementation — "fold" (default: project_in folded into the mixing as one
# dense 3x3 MXU conv), "einsum" (9 per-tap (4x4)-mixing einsums on the VPU;
# benched 0.849 MP/s whole-model) or "stack" (per-output-phase full-lane
# taps + lane-group reduce; benched 0.78).
_FFN_MODE = __import__("os").environ.get("IR_HOG_FFN", "fold")


def _ln_plain(x, ln_type: str, eps: float = 1e-5):
    """Parameter-free LayerNorm (hogformer_arch.py:28-57: affine disabled)."""
    xf = x.astype(jnp.float32)
    var = jnp.var(xf, axis=-1, keepdims=True)
    if ln_type == "BiasFree":
        y = xf / jnp.sqrt(var + eps)
    else:
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        y = (xf - mu) / jnp.sqrt(var + eps)
    return y.astype(x.dtype)


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def _inverse_permutation(idx):
    """Inverse of a batch of permutations, one scatter pass (vs argsort's
    O(T log^2 T) sorting network): inv[idx[i]] = i."""
    b, t = idx.shape
    ar = jnp.broadcast_to(jnp.arange(t, dtype=idx.dtype), (b, t))
    return jnp.zeros_like(idx).at[jnp.arange(b)[:, None], idx].set(
        ar, unique_indices=True, indices_are_sorted=False)


def _sobel_kernels(c: int, dtype=jnp.float32):
    """Depthwise Sobel kernels, HWIO with I=1 (groups=c)."""
    sx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)
    kx = jnp.asarray(sx, dtype).reshape(3, 3, 1, 1) * jnp.ones((1, 1, 1, c), dtype)
    ky = jnp.asarray(sx.T, dtype).reshape(3, 3, 1, 1) * jnp.ones((1, 1, 1, c), dtype)
    return kx, ky


def _split_patches(x, p: int):
    """NHWC -> (B, nP, C, p*p) patch tokens (hogformer_arch.py:223-231)."""
    b, h, w, c = x.shape
    ph, pw = (-h) % p, (-w) % p
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    nh, nw = (h + ph) // p, (w + pw) // p
    x = x.reshape(b, nh, p, nw, p, c)
    x = x.transpose(0, 1, 3, 5, 2, 4).reshape(b, nh * nw, c, p * p)
    return x, (h, w, nh, nw)


def _merge_patches(x, p: int, info):
    h, w, nh, nw = info
    b = x.shape[0]
    c = x.shape[2]
    x = x.reshape(b, nh, nw, c, p, p).transpose(0, 1, 4, 2, 5, 3)
    x = x.reshape(b, nh * p, nw * p, c)
    return x[:, :h, :w, :]


class ElementScale(nn.Module):
    """Learnable per-channel scale (hogformer_arch.py:92-103)."""

    dim: int
    init_value: float = 0.0
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", layer_scale_init(self.init_value),
                           (self.dim,), self.param_dtype)
        return x * scale


class _DWParams(nn.Module):
    """Param twin of a bare GroupedConv depthwise (kernel at '<name>/kernel',
    no 'conv' nesting — matches the reference dwconv_dilated2_1 layout)."""

    q: int
    k: int
    use_bias: bool
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        kern = self.param("kernel", nn.initializers.lecun_normal(),
                          (self.k, self.k, 1, self.q), self.param_dtype)
        bias = (self.param("bias", nn.initializers.zeros, (self.q,),
                           self.param_dtype) if self.use_bias else None)
        return kern, bias


class FFN_DIFF(nn.Module):
    """hogformer_arch.py:106-143.

    Computed entirely in PRE-shuffle (polyphase) space: the reference runs
    its two dwconv branches at 2x resolution on hidden//2 = 64 channels —
    a half-lane layout that measures ~10x off the HBM roofline on v5e, with
    two pixel-(un)shuffle relayouts around it. Here every tensor stays at
    base resolution with 4*q full-lane channels ordered (ch, phase) — which
    is exactly the torch PixelShuffle/Unshuffle channel nesting, so
    project_in/project_out weights apply verbatim and no shuffle ever
    materializes:

    * the 5x5 dwconv at 2x res == a 3x3 block conv whose taps mix the 4
      subpixel phases (out pixel (2i+py+a-1-ish...) reads source phase
      (py-u) mod 2 at block offset floor((py+u-2)/2)); applied as 9 shifted
      per-channel 4x4 phase-mixing einsums.
    * the dilation-2 3x3 dwconv at 2x res has all-even offsets == a plain
      3x3 depthwise conv per (ch, phase) channel — phases never mix.
    * decompose (1x1 to 1 channel) / sigma / mish / gelu are pointwise:
      phase-broadcast in block space.

    Exact same function (contractions reassociated only).
    """

    dim: int
    expansion: float = 2.667
    use_bias: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = int(self.dim * self.expansion)
        q = hidden // 4
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        dt = x.dtype if self.dtype is None else self.dtype
        k5, b5 = ConvParams(q, 1, 5, self.use_bias, self.param_dtype,
                            name="dwconv_5")()
        if _FFN_MODE == "fold":
            # project_in declared as params only; its x1 half is folded into
            # the phase-mixing conv below, its x2 half applied as a matmul
            pin_w, pin_b = ConvParams(hidden * 2, x.shape[-1], 1,
                                      self.use_bias, self.param_dtype,
                                      name="project_in")()
            pw = pin_w[0, 0].astype(dt)  # (dim_in, 8q)
            x2 = jnp.einsum("bhwj,jc->bhwc", x.astype(dt), pw[:, 4 * q :])
            if pin_b is not None:
                x2 = x2 + pin_b[4 * q :].astype(dt)
            x1 = None  # produced by the folded conv
        else:
            xp = Conv(hidden * 2, 1, use_bias=self.use_bias,
                      name="project_in", **kw)(x)
            # channels = (ch, py, px) nested: ch*4 + py*2 + px (pixel_shuffle
            # order); x1 = shuffled channels [0:q) == flat [0:4q)
            x1, x2 = xp[..., : 4 * q], xp[..., 4 * q :]

        # --- branch 1: 5x5 dw at 2x res -> 9-tap phase-mixing block conv ---
        # route[a, b, ip, op] selects tap (u, v) of the 5x5 kernel:
        # u = 2(a-1) + rho - py + 2, v = 2(b-1) + sig - px + 2
        kb = k5[:, :, 0, :].astype(dt)  # (5, 5, q)
        b_, h_, w_, _ = x.shape
        if _FFN_MODE == "fold":
            # project_in (x1 half) folded into the phase-mixing: one DENSE
            # 3x3 conv (dim_in -> 4q) on the MXU. Mixing tensor
            # m[a,b,c,ip,op] = K5[u,v,c] with u = 2(a-1)+rho-py+2 etc.;
            # K_fold[a,b,j,(c,op)] = sum_ip pin_w[j,(c,ip)] * m[a,b,c,ip,op].
            # Exact: dwconv(shuffle(proj(x))) is linear in x, and zero
            # padding commutes (proj is 1x1). With bias, the bias's border
            # attenuation is reproduced by convolving a ones-map with the
            # bias-folded taps (a constant does NOT stay constant at the
            # border because pad happens after project_in in the unfolded
            # order).
            mix = jnp.zeros((3, 3, q, 4, 4), dt)
            for a in range(3):
                for bb in range(3):
                    for ip in range(4):
                        rho, sig = ip // 2, ip % 2
                        for op in range(4):
                            py, px = op // 2, op % 2
                            u = 2 * (a - 1) + rho - py + 2
                            v = 2 * (bb - 1) + sig - px + 2
                            if 0 <= u < 5 and 0 <= v < 5:
                                mix = mix.at[a, bb, :, ip, op].set(kb[u, v])
            p1 = pw[:, : 4 * q].reshape(-1, q, 4)      # (j, c, ip)
            kfold = jnp.einsum("jcp,abcpq->abjcq", p1, mix)
            kfold = kfold.reshape(3, 3, -1, 4 * q)
            dn = jax.lax.conv_dimension_numbers(
                x.shape, kfold.shape, ("NHWC", "HWIO", "NHWC"))
            acc1 = jax.lax.conv_general_dilated(
                x.astype(dt), kfold, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=dn).reshape(b_, h_, w_, q, 4)
            if pin_b is not None:
                bias1 = pin_b[: 4 * q].reshape(q, 4).astype(dt)
                kbias = jnp.einsum("cp,abcpq->abcq", bias1, mix
                                   ).reshape(3, 3, 1, 4 * q)
                ones = jnp.ones((b_, h_, w_, 1), dt)
                bmap = jax.lax.conv_general_dilated(
                    ones, kbias, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=jax.lax.conv_dimension_numbers(
                        ones.shape, kbias.shape, ("NHWC", "HWIO", "NHWC")))
                acc1 = acc1 + bmap.reshape(b_, h_, w_, q, 4)
        elif _FFN_MODE == "stack":
            # variant B: one full-lane 9-tap pass per OUTPUT phase with the
            # source-phase routing baked into a (3,3,4q) tap bank (taps for
            # out-phase op at lane ch*4+ip = K5[u,v,ch]), then a mod-4
            # lane-group reduction folds the 4 source phases
            outs = []
            x1pad = jnp.pad(x1, ((0, 0), (1, 1), (1, 1), (0, 0)))
            for op in range(4):
                py, px = op // 2, op % 2
                kq = jnp.zeros((3, 3, 4 * q), dt)
                for a in range(3):
                    for bb in range(3):
                        for ip in range(4):
                            rho, sig = ip // 2, ip % 2
                            u = 2 * (a - 1) + rho - py + 2
                            v = 2 * (bb - 1) + sig - px + 2
                            if 0 <= u < 5 and 0 <= v < 5:
                                kq = kq.at[a, bb, ip::4].set(kb[u, v, :])
                t = None
                for a in range(3):
                    for bb in range(3):
                        sl = jax.lax.slice(
                            x1pad, (0, a, bb, 0),
                            (b_, a + h_, bb + w_, 4 * q))
                        term = sl * kq[a, bb]
                        t = term if t is None else t + term
                outs.append(t.reshape(b_, h_, w_, q, 4).sum(-1))
            acc1 = jnp.stack(outs, axis=-1)
        else:
            x1v = x1.reshape(b_, h_, w_, q, 4)
            x1p = jnp.pad(x1v, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
            acc1 = jnp.zeros((b_, h_, w_, q, 4), dt)
            for a in range(3):
                for bb in range(3):
                    # (q, ip, op) phase-mixing matrix for this block shift,
                    # gathered from the 5x5 taps (static routing table)
                    m = jnp.zeros((q, 4, 4), dt)
                    for ip in range(4):
                        rho, sig = ip // 2, ip % 2
                        for op in range(4):
                            py, px = op // 2, op % 2
                            u = 2 * (a - 1) + rho - py + 2
                            v = 2 * (bb - 1) + sig - px + 2
                            if 0 <= u < 5 and 0 <= v < 5:
                                m = m.at[:, ip, op].set(kb[u, v, :])
                    xs = jax.lax.slice(
                        x1p, (0, a, bb, 0, 0), (b_, a + h_, bb + w_, q, 4))
                    acc1 = acc1 + jnp.einsum("bhwcp,cpq->bhwcq", xs, m)
        if b5 is not None:
            acc1 = acc1 + b5.astype(dt)[None, None, None, :, None]
        x1o = acc1.reshape(b_, h_, w_, 4 * q)

        # --- branch 2: dilation-2 3x3 dw at 2x res == plain 3x3 dw ---
        k3, b3 = _DWParams(q, 3, self.use_bias, self.param_dtype,
                           name="dwconv_dilated2_1")()
        k3r = jnp.repeat(k3, 4, axis=-1)  # (3,3,1,4q): phase-broadcast
        x2o = conv2d(x2.astype(dt), k3r.astype(dt), padding=1, groups=4 * q)
        if b3 is not None:
            x2o = x2o + jnp.repeat(b3, 4).astype(dt)

        y = mish(x2o) * x1o
        # feat_decompose (:127-130): x + sigma*(x - gelu(conv_1ch(x)));
        # decompose is 1x1 over the q "real" channels, shared across phases
        wd, bd = ConvParams(1, q, 1, True, self.param_dtype,
                            name="decompose")()
        y6 = y.reshape(b_, h_, w_, q, 4)
        d = jnp.einsum("bhwcp,c->bhwp", y6, wd[0, 0, :, 0].astype(dt))
        d = d + bd.astype(dt)[0]
        g = jax.nn.gelu(d.astype(jnp.float32), approximate=False).astype(dt)
        # same param tree as the reference ElementScale ("sigma/scale"):
        # applying the module to ones returns the scale vector itself
        sigma = ElementScale(q, 1e-5, self.param_dtype, name="sigma")(
            jnp.ones((q,), self.param_dtype))
        sig4 = jnp.repeat(sigma, 4).astype(dt)
        y = y + sig4 * (y - jnp.repeat(g[..., None, :], q, axis=-2
                                       ).reshape(b_, h_, w_, 4 * q))
        return Conv(self.dim, 1, use_bias=self.use_bias, name="project_out",
                    **kw)(y)


class Attention_DHOGSA(nn.Module):
    """hogformer_arch.py:164-309."""

    dim: int
    num_heads: int
    use_bias: bool = False
    patch_size: int = 8
    n_bins: int = 9
    dtype: Any = None
    param_dtype: Any = jnp.float32

    def _reshape_attn(self, q, k, v, temperature, box: bool):
        """Channel attention over factor-grouped tokens (:202-221).

        q/k/v: (B, T, C). Box groups tokens as (factor, hw'); strided as
        (hw', factor). Attention matrix is (c_per_head*factor)^2.
        """
        b, t, c = q.shape
        f = self.num_heads
        tp = (-t) % f
        if tp:
            pad = ((0, 0), (0, tp), (0, 0))
            q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
        tt = t + tp
        hw = tt // f
        cph = c // self.num_heads

        def arrange(x):
            if box:  # token = f_idx * hw + j
                x = x.reshape(b, f, hw, self.num_heads, cph)
                x = x.transpose(0, 3, 4, 1, 2)  # b, head, cph, factor, hw
            else:  # token = j * f + f_idx
                x = x.reshape(b, hw, f, self.num_heads, cph)
                x = x.transpose(0, 3, 4, 2, 1)
            return x.reshape(b, self.num_heads, cph * f, hw)

        def unarrange(x):
            x = x.reshape(b, self.num_heads, cph, f, hw)
            if box:
                x = x.transpose(0, 3, 4, 1, 2)  # b, factor, hw, head, cph
            else:
                x = x.transpose(0, 4, 3, 1, 2)  # b, hw, factor, head, cph
            return x.reshape(b, tt, c)

        qh, kh, vh = arrange(q), arrange(k), arrange(v)
        attn = normalized_channel_logits_tok_minor(qh, kh) * temperature
        # softmax_1 (:192-195): exp / (sum(exp) + 1)
        attn = jnp.exp(attn)
        attn = attn / (jnp.sum(attn, axis=-1, keepdims=True) + 1.0)
        out = jnp.einsum("bhcd,bhdT->bhcT", attn.astype(vh.dtype), vh)
        return unarrange(out)[:, :t, :]

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        half = c // 2
        p = self.patch_size
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        # --- HOG patch re-ordering of the first channel half (:241-264) ---
        x_half = x[..., :half]
        kx, ky = _sobel_kernels(half, x.dtype)
        gx = conv2d(x_half, kx, padding=1, groups=half)
        gy = conv2d(x_half, ky, padding=1, groups=half)
        mag = jnp.sqrt(gx * gx + gy * gy + 1e-6)
        ori = jnp.arctan2(gy, gx)
        ori_bin = (
            ((ori + math.pi) / (2 * math.pi) * self.n_bins).astype(jnp.int32)
            % self.n_bins
        )
        p_x, info = _split_patches(x_half, p)            # (b, nP, half, pp)
        p_mag, _ = _split_patches(mag, p)
        p_ori, _ = _split_patches(ori_bin.astype(x.dtype), p)
        p_bin = p_ori.astype(jnp.int32)
        # each pixel lies in exactly one bin: the reference's per-bin loop
        # (:254-257) reduces to mag*(bin+1) and a one-hot histogram
        sort_values = p_mag * (p_bin + 1).astype(p_mag.dtype)
        onehot = jax.nn.one_hot(p_bin, self.n_bins, dtype=p_mag.dtype)
        hog = jnp.mean(p_mag[..., None] * onehot, axis=(2, 3))  # (b, nP, bins)
        hog = hog / (jnp.sum(hog, axis=-1, keepdims=True) + 1e-8)
        idx_patch = jnp.argsort(jnp.sum(sort_values, axis=2), axis=-1)  # (b,nP,pp)
        # Within-patch permutation as a one-hot matmul: perm[s,t]=1 iff
        # t==idx[s]; exactly one nonzero per row makes the product exact in
        # any dtype, and a 64x64 batched matmul on the MXU beats a
        # minor-axis gather. Its transpose is the inverse permutation,
        # reused for the un-sort below.
        perm = jax.nn.one_hot(idx_patch, p * p, dtype=x.dtype)  # (b,nP,s,t)
        p_sorted = jnp.einsum("bpst,bpct->bpcs", perm, p_x)
        x_half_p = _merge_patches(p_sorted, p, info)

        _, _, nh, nw = info
        hog_map = hog.reshape(b, nh, nw, self.n_bins)
        hog_map = Conv(self.dim // 2, 1, use_bias=self.use_bias,
                       name="bin_proj", **kw)(hog_map)
        hog_map = resize_bilinear(hog_map, h, w)
        x = jnp.concatenate([x_half_p + hog_map, x[..., half:]], axis=-1)

        # --- 5-way qkv + global HOG token sort (:279-301) ---
        qkv = Conv(self.dim * 5, 1, use_bias=self.use_bias, name="qkv", **kw)(x)
        qkv = Conv(self.dim * 5, 3, padding=1, groups=self.dim * 5,
                   use_bias=self.use_bias, name="qkv_dwconv", **kw)(qkv)
        temperature = self.param(
            "temperature", nn.initializers.ones, (self.num_heads, 1, 1),
            self.param_dtype,
        )

        if self.num_heads == 1:
            # Sort-free fast path, EXACT for one head: with factor f=1 the
            # box and strided groupings coincide ((b,1,C,T) both), and C x C
            # channel attention is invariant under any token permutation —
            # q^T k and the per-channel L2 norms sum over ALL tokens, and
            # A @ v is pointwise in the token index, so sort -> attend ->
            # un-sort == attend (reference :279-306 composes to identity).
            # Skips the v-Sobel/arctan2 key, the T log^2 T argsort, the
            # (T,5c) gather and the inverse-permutation gather — the
            # dominant HBM traffic of the level-1 blocks at 512^2.
            qkv_t = qkv.reshape(b, h * w, 5 * c)
            q1, k1, q2, k2, vs = jnp.split(qkv_t, 5, axis=-1)

            def attn_f1(q, k):
                raw = jnp.einsum("btc,btd->bcd", q, k,
                                 preferred_element_type=jnp.float32)
                qn = jnp.sqrt(jnp.einsum("btc,btc->bc", q, q,
                                         preferred_element_type=jnp.float32))
                kn = jnp.sqrt(jnp.einsum("btc,btc->bc", k, k,
                                         preferred_element_type=jnp.float32))
                denom = (jnp.maximum(qn, 1e-12)[:, :, None]
                         * jnp.maximum(kn, 1e-12)[:, None, :])
                a = jnp.exp(raw / denom * temperature[0])
                a = a / (jnp.sum(a, axis=-1, keepdims=True) + 1.0)
                return a.astype(vs.dtype)

            o1 = jnp.einsum("bcd,btd->btc", attn_f1(q1, k1), vs)
            o2 = jnp.einsum("bcd,btd->btc", attn_f1(q2, k2), vs)
            out = (o1 * o2).reshape(b, h, w, c)
            out = Conv(self.dim, 1, use_bias=self.use_bias,
                       name="project_out", **kw)(out)
            p_out, info2 = _split_patches(out[..., :half], p)
            p_out = jnp.einsum("bpst,bpcs->bpct", perm, p_out)
            out_half = _merge_patches(p_out, p, info2)
            return jnp.concatenate([out_half, out[..., half:]], axis=-1)

        v = qkv[..., 4 * c:]
        kxc, kyc = _sobel_kernels(c, x.dtype)
        gxv = conv2d(v, kxc, padding=1, groups=c)
        gyv = conv2d(v, kyc, padding=1, groups=c)
        magv = jnp.sqrt(gxv * gxv + gyv * gyv + 1e-6)
        oriv = (jnp.arctan2(gyv, gxv) + math.pi) / (2 * math.pi)
        key = jnp.sum(magv * oriv, axis=-1).reshape(b, h * w)
        idx = jnp.argsort(key, axis=-1)  # (b, T)

        # one row-gather of the full (T, 5c) qkv instead of five (T, c) ones
        qkv_s = jnp.take_along_axis(qkv.reshape(b, h * w, 5 * c),
                                    idx[:, :, None], axis=1)
        q1, k1, q2, k2, vs = jnp.split(qkv_s, 5, axis=-1)
        out1 = self._reshape_attn(q1, k1, vs, temperature, box=True)
        out2 = self._reshape_attn(q2, k2, vs, temperature, box=False)
        # reference "scatter" un-sort (:299-300) = gather by inverse perm;
        # the branch product commutes with the shared permutation, so
        # multiply while sorted and run ONE inverse gather.
        inv = _inverse_permutation(idx)
        out = jnp.take_along_axis(out1 * out2, inv[:, :, None], axis=1)
        out = out.reshape(b, h, w, c)
        out = Conv(self.dim, 1, use_bias=self.use_bias, name="project_out", **kw)(out)

        # un-sort the first half at patch level (:304-308): the inverse of a
        # permutation matrix is its transpose — same one-hot, flipped einsum
        p_out, info2 = _split_patches(out[..., :half], p)
        p_out = jnp.einsum("bpst,bpcs->bpct", perm, p_out)
        out_half = _merge_patches(p_out, p, info2)
        return jnp.concatenate([out_half, out[..., half:]], axis=-1)


class TransformerBlock(nn.Module):
    """hogformer_arch.py:148-160."""

    dim: int
    num_heads: int
    expansion: float = 2.667
    use_bias: bool = False
    ln_type: str = "WithBias"
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = x + Attention_DHOGSA(self.dim, self.num_heads, self.use_bias,
                                 name="attn_g_spatial", **kw)(
            _ln_plain(x, self.ln_type)
        )
        x = x + FFN_DIFF(self.dim, self.expansion, self.use_bias,
                         name="ffn", **kw)(_ln_plain(x, self.ln_type))
        return x


class SkipPatchEmbed(nn.Module):
    """AvgPool2 + 1x1 + dwconv3 image pyramid (hogformer_arch.py:326-339)."""

    dim: int = 3
    use_bias: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = Conv(self.dim, 1, use_bias=self.use_bias, name="proj_1", **kw)(x)
        x = Conv(self.dim, 3, padding=1, groups=self.dim, use_bias=self.use_bias,
                 name="proj_2", **kw)(x)
        return x


class Downsample(nn.Module):
    """conv3 to n/2 + PixelUnshuffle(2) (hogformer_arch.py:344-352)."""

    n_feat: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv(self.n_feat // 2, 3, padding=1, use_bias=False, name="body_0",
                 dtype=self.dtype, param_dtype=self.param_dtype)(x)
        return pixel_unshuffle(x, 2)


class Upsample(nn.Module):
    """conv3 to 2n + PixelShuffle(2) (hogformer_arch.py:355-363)."""

    n_feat: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv(self.n_feat * 2, 3, padding=1, use_bias=False, name="body_0",
                 dtype=self.dtype, param_dtype=self.param_dtype)(x)
        return pixel_shuffle(x, 2)


@register_model("hogformer")
class HOGformer(nn.Module):
    """hogformer_arch.py:367-489."""

    inp_channels: int = 3
    out_channels: int = 3
    dim: int = 48
    num_blocks: Sequence[int] = (4, 6, 6, 8)
    num_refinement_blocks: int = 4
    heads: Sequence[int] = (1, 2, 4, 8)
    ffn_expansion_factor: float = 2.667
    use_bias: bool = False
    ln_type: str = "WithBias"
    dual_pixel_task: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    def _blocks(self, dim, heads, n, prefix):
        return [
            TransformerBlock(
                dim=dim, num_heads=heads, expansion=self.ffn_expansion_factor,
                use_bias=self.use_bias, ln_type=self.ln_type, dtype=self.dtype,
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
        skip1 = SkipPatchEmbed(3, False, name="skip_patch_embed1", **kw)(x)
        x2 = Conv(d * 2, 1, use_bias=self.use_bias, name="reduce_chan_level_1",
                  **kw)(jnp.concatenate([x2, skip1], axis=-1))
        enc2 = x2
        for blk in self._blocks(d * 2, self.heads[1], self.num_blocks[1], "encoder_level2"):
            enc2 = blk(enc2)

        x3 = Downsample(d * 2, name="down2_3", **kw)(enc2)
        skip2 = SkipPatchEmbed(3, False, name="skip_patch_embed2", **kw)(skip1)
        x3 = Conv(d * 4, 1, use_bias=self.use_bias, name="reduce_chan_level_2",
                  **kw)(jnp.concatenate([x3, skip2], axis=-1))
        enc3 = x3
        for blk in self._blocks(d * 4, self.heads[2], self.num_blocks[2], "encoder_level3"):
            enc3 = blk(enc3)

        x4 = Downsample(d * 4, name="down3_4", **kw)(enc3)
        skip3 = SkipPatchEmbed(3, False, name="skip_patch_embed3", **kw)(skip2)
        x4 = Conv(d * 8, 1, use_bias=self.use_bias, name="reduce_chan_level_3",
                  **kw)(jnp.concatenate([x4, skip3], axis=-1))
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
            # the reference creates skip_conv but its forward never uses it
            # (hogformer_arch.py:441-489) — instantiate for checkpoint
            # compatibility, discard the result (XLA DCEs it).
            _ = Conv(d * 2, 1, use_bias=self.use_bias, name="skip_conv", **kw)(feats)
        out = Conv(self.out_channels, 3, padding=1, use_bias=self.use_bias,
                   name="output", **kw)(dec1)
        return (out + x).astype(jnp.float32)
