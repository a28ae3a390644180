"""Spatial-parallel whole-image inference with halo exchange over ICI.

The TPU-native replacement for the reference's single-GPU window tiling
(NeRD-Rain layers.py:249-304 window_partitionx, IPT forward_chop
overlap-shave, AdaptIR-main/net/ipt.py:115-248): the image's H axis is
sharded over the mesh's ``spatial`` axis, each chip exchanges ``halo`` rows
of overlap with its neighbors via ``jax.lax.ppermute`` (one hop over ICI),
runs the restorer on its strip + halo, and crops the halo away — the sharded
output strips ARE the stitched image (shard_map reassembles by construction).

With halo >= the model's CONV receptive-field radius, interior strips are
exactly equal to the unsharded forward (tests/test_halo.py measures the
decay: error -> 0 once halo reaches the radius). The first/last strips
receive zero halos, so the whole result equals the unsharded forward applied
to the image zero-extended by ``halo`` rows and cropped back — the same
boundary treatment as the reference's pad_test (cascaded per-layer SAME
padding at the true border cannot be reproduced by any input-level halo).

Models with GLOBAL per-image statistics — MDTA channel attention (q.k sums
over all pixels), SCA/GAP gates, whole-image FFT branches — can never be
halo-exact: each strip computes its own statistics, so the error does NOT
vanish as the halo grows. That is the same approximation the reference's own
serving protocol makes (window_partitionx runs each 256^2 window with its
own statistics, NeRD-Rain layers.py:249-304); ``halo=0`` here reproduces
window tiling EXACTLY (asserted in tests), and halo>0 strictly enlarges each
strip's context — use pad_test on one device when bit-parity with the
whole-image forward is required.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def _exchange_halos(x_strip, halo: int, axis: str):
    """Collect ``halo`` rows from the previous/next shard along ``axis``.

    x_strip: (B, Hs, W, C) local strip. Returns (B, Hs + 2*halo, W, C) with
    zero halos at the global top/bottom edges.
    """
    if halo == 0:
        # degenerate case = the reference's window tiling (independent
        # strips); note x_strip[:, -0:] would slice the WHOLE strip
        return x_strip
    n = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)

    top_rows = x_strip[:, :halo]        # my first rows -> next device's top halo
    bot_rows = x_strip[:, -halo:]       # my last rows  -> prev device's bottom halo

    # send my bottom rows forward (i -> i+1): received = prev device's bottom
    fwd = [(i, (i + 1) % n) for i in range(n)]
    from_prev = jax.lax.ppermute(bot_rows, axis, fwd)
    # send my top rows backward (i -> i-1): received = next device's top
    bwd = [(i, (i - 1) % n) for i in range(n)]
    from_next = jax.lax.ppermute(top_rows, axis, bwd)

    zero = jnp.zeros_like(from_prev)
    top_halo = jnp.where(idx == 0, zero, from_prev)
    bot_halo = jnp.where(idx == n - 1, jnp.zeros_like(from_next), from_next)
    return jnp.concatenate([top_halo, x_strip, bot_halo], axis=1)


def halo_tiled_apply(
    fn: Callable,
    x,
    mesh: Mesh,
    halo: int,
    axis: str = "spatial",
    scale: int = 1,
    batch_axis: str | None = None,
):
    """Run ``fn`` over the H-sharded image with halo exchange.

    fn: (B, h, W, C) -> (B, h*scale, W*scale, C') restorer (jittable).
    x: (B, H, W, C) with H divisible by mesh.shape[axis].
    batch_axis: optional mesh axis to also shard the batch over (dp x sp
    eval on a ('data','spatial') mesh); requires B divisible by its size.
    """

    def shard_fn(xs):
        padded = _exchange_halos(xs, halo, axis)
        out = fn(padded)
        return out[:, halo * scale : out.shape[1] - halo * scale]

    spec_in = P(batch_axis, axis, None, None)
    sharded = shard_map(shard_fn, mesh=mesh, in_specs=(spec_in,),
                        out_specs=spec_in, check_rep=False)
    return jax.jit(sharded)(x)


def spatial_shard(x, mesh: Mesh, axis: str = "spatial"):
    return jax.device_put(x, NamedSharding(mesh, P(None, axis, None, None)))


def suggest_halo(num_blocks=(4, 6, 6, 8), num_refinement_blocks: int = 4,
                 dwconvs_per_block: int = 2, kernel: int = 3,
                 cap: int | None = None, align: int | None = None) -> int:
    """Conv-path receptive-field RADIUS of a Restormer-geometry U-Net — the
    halo at which the spatially-local part of the model becomes exact.

    Each TransformerBlock applies ``dwconvs_per_block`` kxk depthwise convs
    at its level's stride 2^l; encoder and decoder both traverse the level,
    the latent level runs at stride 2^(L-1), and refinement at stride 1. The
    pixel-shuffle resamplers' 3x3 convs add one kernel radius per hop.
    Global-statistics ops (channel attention, GAP gates, FFT) are NOT
    covered — see the module docstring. ``cap`` clamps the suggestion (a
    halo larger than the strip height is wasted work).

    ``align`` rounds the radius UP to a multiple (pass 2^(levels-1) for a
    pixel-shuffle U-Net): the resamplers are shift-invariant only to shifts
    that are multiples of the total downsampling factor, so a halo that is
    not a multiple of it shifts every strip's downsampling grid relative to
    the unsharded forward and the interior never matches, no matter how
    large the halo is."""
    r = kernel // 2
    levels = len(num_blocks)
    radius = 0
    for l, n in enumerate(num_blocks[:-1]):
        radius += 2 * n * dwconvs_per_block * r * (2 ** l)  # enc + dec
        radius += 2 * r * (2 ** l)                          # down/up convs
    radius += num_blocks[-1] * dwconvs_per_block * r * (2 ** (levels - 1))
    radius += num_refinement_blocks * dwconvs_per_block * r
    if align and align > 1:
        radius = -(-radius // align) * align
    return min(radius, cap) if cap else radius
