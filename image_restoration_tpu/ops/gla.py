"""Gated linear attention (GLA) scan ops, TPU-native.

The reference (vig.py:14-27) imports the ``fla`` package's Triton kernels
(``chunk_gla`` / ``fused_chunk_gla`` / ``fused_recurrent_gla`` /
``bid_fused_recurrent_gla``). The recurrence they compute per head is

    S_t = diag(exp(gk_t)) @ S_{t-1} + k_t^T v_t        (state: d_k x d_v)
    o_t = (q_t * scale) @ S_t

with ``gk = logsigmoid(gate) / normalizer <= 0`` and default
``scale = d_k^-0.5``.

TPU formulations here:
* ``recurrent_gla`` — one ``lax.scan`` step per token (the semantics
  oracle; fine for short sequences / decode).
* ``chunk_gla`` — the MXU formulation: sequence split into chunks; within a
  chunk the causal pair term uses exp(G_i - G_j) which is <= 1 for i >= j
  (G is a cumsum of non-positive gates) so every exponential is stable
  without the secondary rescaling the Triton kernel needs; across chunks a
  scan carries the (d_k, d_v) state. All matmuls are chunk-sized — batched,
  static, MXU-tileable.
* ``bidirectional_gla`` — forward + time-flipped backward averaged, the
  ViG usage (vig.py:407-426: o = (o_f + flip(o_b)) / 2).

All math in fp32 regardless of input dtype (linear-attention states are
precision-sensitive).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def recurrent_gla(q, k, v, gk, scale: float | None = None):
    """q, k, gk: (B, H, N, Dk); v: (B, H, N, Dv) -> (B, H, N, Dv)."""
    dk = q.shape[-1]
    scale = dk ** -0.5 if scale is None else scale
    qf = (q * scale).astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    gf = gk.astype(jnp.float32)

    def step(S, inputs):
        qt, kt, vt, gt = inputs  # (B,H,Dk), (B,H,Dk), (B,H,Dv), (B,H,Dk)
        S = S * jnp.exp(gt)[..., None] + kt[..., None] * vt[..., None, :]
        ot = jnp.einsum("bhk,bhkv->bhv", qt, S)
        return S, ot

    B, H, N, _ = q.shape
    Dv = v.shape[-1]
    S0 = jnp.zeros((B, H, dk, Dv), jnp.float32)
    xs = (qf.transpose(2, 0, 1, 3), kf.transpose(2, 0, 1, 3),
          vf.transpose(2, 0, 1, 3), gf.transpose(2, 0, 1, 3))
    _, os = jax.lax.scan(step, S0, xs)
    return os.transpose(1, 2, 0, 3).astype(v.dtype)


def chunk_gla(q, k, v, gk, scale: float | None = None, chunk_size: int = 64):
    """Chunked-parallel GLA, numerically identical to ``recurrent_gla``."""
    B, H, N, Dk = q.shape
    Dv = v.shape[-1]
    scale = Dk ** -0.5 if scale is None else scale
    c = min(chunk_size, N)
    pad = (-N) % c
    if pad:
        zpad = lambda t: jnp.pad(t, ((0, 0), (0, 0), (0, pad), (0, 0)))
        q, k, v, gk = zpad(q), zpad(k), zpad(v), zpad(gk)
    n_chunks = (N + pad) // c

    def to_chunks(t):
        d = t.shape[-1]
        return (t.reshape(B, H, n_chunks, c, d)
                .transpose(2, 0, 1, 3, 4).astype(jnp.float32))

    qc = to_chunks(q) * scale
    kc = to_chunks(k)
    vc = to_chunks(v)
    gc = to_chunks(gk)
    G = jnp.cumsum(gc, axis=-2)  # (nc, B, H, c, Dk), inclusive cumsum

    causal = jnp.tril(jnp.ones((c, c), jnp.float32))

    def step(S, inputs):
        qi, ki, vi, Gi = inputs
        # inter-chunk: q_i decayed from chunk start attends the carried state
        o_inter = jnp.einsum("bhid,bhdv->bhiv", qi * jnp.exp(Gi), S)
        # intra-chunk: A[i,j] = sum_d q_i k_j exp(G_i - G_j), j <= i
        E = jnp.exp(Gi[:, :, :, None, :] - Gi[:, :, None, :, :])  # (B,H,i,j,D)
        A = jnp.einsum("bhid,bhjd,bhijd->bhij", qi, ki, E) * causal
        o_intra = jnp.einsum("bhij,bhjv->bhiv", A, vi)
        # state update: decay to chunk end, absorb keys decayed to chunk end
        g_last = Gi[:, :, -1:, :]  # (B,H,1,Dk)
        k_dec = ki * jnp.exp(g_last - Gi)
        S = S * jnp.exp(g_last.squeeze(2))[..., None] + jnp.einsum(
            "bhjd,bhjv->bhdv", k_dec, vi)
        return S, o_inter + o_intra

    S0 = jnp.zeros((B, H, Dk, Dv), jnp.float32)
    _, os = jax.lax.scan(step, S0, (qc, kc, vc, G))
    out = os.transpose(1, 2, 0, 3, 4).reshape(B, H, N + pad, Dv)
    return out[:, :, :N, :].astype(v.dtype)


def bidirectional_gla(q, k, v, gk_fwd, gk_bwd, scale: float | None = None,
                      chunk_size: int = 64):
    """ViG bidirectional GLA (vig.py:370-426): forward scan with the forward
    gates plus a time-reversed scan with the backward gates, averaged."""
    o_f = chunk_gla(q, k, v, gk_fwd, scale, chunk_size)
    flip = lambda t: t[:, :, ::-1, :]
    o_b = chunk_gla(flip(q), flip(k), flip(v), flip(gk_bwd), scale, chunk_size)
    return (o_f + flip(o_b)) / 2
