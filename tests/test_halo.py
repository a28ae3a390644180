"""Halo-exchange spatial-parallel inference: exact equality with the
unsharded forward when halo >= receptive field."""

import numpy as np
import pytest


def test_halo_conv_exact(rng):
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.core.mesh import make_mesh
    from image_restoration_tpu.parallel.halo import halo_tiled_apply, spatial_shard

    mesh = make_mesh((1, 1, 8), ("data", "expert", "spatial"))
    # a 3-layer conv stack: receptive field 3x(5//2) = 6 rows each side
    kernels = [jnp.asarray(rng.standard_normal((5, 5, 3, 8), dtype=np.float32) * 0.2),
               jnp.asarray(rng.standard_normal((5, 5, 8, 8), dtype=np.float32) * 0.2),
               jnp.asarray(rng.standard_normal((5, 5, 8, 3), dtype=np.float32) * 0.2)]

    def net(x):
        for k in kernels:
            dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
            x = jax.lax.conv_general_dilated(x, k, (1, 1), [(2, 2), (2, 2)],
                                             dimension_numbers=dn)
            x = jax.nn.gelu(x)
        return x

    x = jnp.asarray(rng.random((2, 64, 48, 3), dtype=np.float32))
    # ground truth = unsharded forward on the zero-extended image (the halo
    # boundary semantics; interior rows equal the plain forward exactly)
    halo = 6
    xp = jnp.pad(x, ((0, 0), (halo, halo), (0, 0), (0, 0)))
    ref = net(xp)[:, halo:-halo]

    with mesh:
        xs = spatial_shard(x, mesh)
        out = halo_tiled_apply(net, xs, mesh, halo=halo)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
    # interior rows also equal the plain (non-extended) forward
    plain = np.asarray(net(x))
    np.testing.assert_allclose(np.asarray(out)[:, 8:-8], plain[:, 8:-8],
                               rtol=1e-5, atol=1e-5)

    # PROBE: too-small halo must NOT match (sanity that the test is sharp)
    with mesh:
        out_bad = halo_tiled_apply(net, xs, mesh, halo=2)
    assert np.abs(np.asarray(out_bad) - np.asarray(ref)).max() > 1e-4


def test_halo_with_model(rng):
    """Restormer strip inference via halo exchange runs and stitches
    (semantics are window-local like the reference's tiling)."""
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.core.mesh import make_mesh
    from image_restoration_tpu.models.restormer import Restormer
    from image_restoration_tpu.parallel.halo import halo_tiled_apply, spatial_shard

    mesh = make_mesh((1, 1, 4), ("data", "expert", "spatial"),
                     devices=jax.devices()[:4])
    model = Restormer(dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1,
                      heads=(1, 2, 4, 8))
    x0 = jnp.zeros((1, 24, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x0)["params"]

    def fn(t):
        return model.apply({"params": params}, t)

    x = jnp.asarray(rng.random((1, 64, 32, 3), dtype=np.float32))
    with mesh:
        out = halo_tiled_apply(fn, spatial_shard(x, mesh), mesh, halo=8)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_overlap_average_apply_identity():
    """Dense-stride IPT chop reconstructs identity exactly, incl. SR scale."""
    import jax.numpy as jnp

    from image_restoration_tpu.eval.tiled import overlap_average_apply

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((2, 50, 70, 3)).astype(np.float32))
    got = overlap_average_apply(lambda t: t, x, patch=16, stride=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x), rtol=1e-6, atol=1e-6)

    # x2 "SR": nearest-repeat each patch; identity check after upscale
    def up2(t):
        return jnp.repeat(jnp.repeat(t, 2, axis=1), 2, axis=2)

    got2 = overlap_average_apply(up2, x, patch=16, stride=4, scale=2)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(up2(x)), rtol=1e-6, atol=1e-6)
