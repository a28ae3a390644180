"""Spatial-parallel whole-image inference with halo exchange over ICI.

The TPU-native replacement for the reference's single-GPU window tiling
(NeRD-Rain layers.py:249-304 window_partitionx, IPT forward_chop
overlap-shave, AdaptIR-main/net/ipt.py:115-248): the image's H axis is
sharded over the mesh's ``spatial`` axis, each chip exchanges ``halo`` rows
of overlap with its neighbors via ``jax.lax.ppermute`` (one hop over ICI),
runs the restorer on its strip + halo, and crops the halo away — the sharded
output strips ARE the stitched image (shard_map reassembles by construction).

With halo >= the model's receptive field, interior strips are exactly equal
to the unsharded forward. The first/last strips receive zero halos, so the
whole result equals the unsharded forward applied to the image zero-extended
by ``halo`` rows and cropped back — the same boundary treatment as the
reference's pad_test (cascaded per-layer SAME padding at the true border
cannot be reproduced by any input-level halo).
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
