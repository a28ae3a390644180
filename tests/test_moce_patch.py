"""Patch-level MoCE: routing parity vs the reference PatchRoutingFunction
(noise suppressed — the reference adds gate noise even at eval,
moce_ir_patch.py:560) plus dense-dispatch model checks.

The reference's dispatcher itself is unrunnable scratch (combine calls
``gates.size[0]``; the eval branch tensor-indexes a ModuleList), so the
end-to-end check is dense-formulation self-consistency, not torch output
parity.
"""

import numpy as np
import pytest

from conftest import load_reference_module, nchw_to_nhwc, stub_common_modules

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_mod():
    stub_common_modules()
    return load_reference_module("moce_ir_patch.py", "ref_moce_patch")


def test_patch_routing_parity(ref_mod, rng, monkeypatch):
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.models.moce_ir_patch import PatchRoutingFunction
    from image_restoration_tpu.utils.torch_import import import_state_dict

    torch.manual_seed(0)
    tmod = ref_mod.PatchRoutingFunction(
        dim=8, freq_dim=16, num_experts=4, k=2,
        complexity=torch.ones(4), patch_size=4,
        use_complexity_bias=False).eval()
    monkeypatch.setattr(torch, "randn_like", lambda t: torch.zeros_like(t))

    jmod = PatchRoutingFunction(dim=8, freq_dim=16, num_experts=4, k=2,
                                complexity=(1.0,) * 4, patch_size=4)
    x = rng.standard_normal((2, 8, 8, 8), dtype=np.float32)
    fe = rng.standard_normal((2, 16), dtype=np.float32)
    params = jmod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(fe))["params"]
    sd = {k: v.detach().numpy() for k, v in tmod.state_dict().items()
          if k != "complexity"}
    params = import_state_dict(params, sd)

    with torch.no_grad():
        tg, tidx, tval, _ = tmod(torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2))), torch.from_numpy(fe))
    gates, top_idx, top_vals, aux = jmod.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(fe))
    # torch keeps (B, P, E); ours is flattened (B*P, E)
    np.testing.assert_allclose(np.asarray(gates).reshape(2, 4, 4),
                               tg.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(top_vals).reshape(2, 4, 2),
                               tval.numpy(), rtol=1e-5, atol=1e-6)


def test_patch_model_forward_and_train(rng):
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.models.moce_ir_patch import MoCEIRPatch

    net = MoCEIRPatch(dim=8, levels=3, heads=(1, 2, 4), num_blocks=(1, 1, 1),
                      num_dec_blocks=(1, 1), num_refinement_blocks=1,
                      rank=2, num_experts=4, topk=2, patch_size=4,
                      stage_depth=(1, 1, 1))
    x = jnp.asarray(rng.random((1, 16, 16, 3), dtype=np.float32))
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    out = net.apply({"params": params}, x)
    assert out.shape == (1, 16, 16, 3)
    # eval is deterministic
    out2 = net.apply({"params": params}, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    # train path: aux loss present + finite, noise rng threaded
    (out_t, aux), = [net.apply({"params": params}, x, train=True,
                               rngs={"moe": jax.random.PRNGKey(1)})]
    assert np.isfinite(float(aux["aux_loss"]))
    assert out_t.shape == (1, 16, 16, 3)
    # arbitrary size goes through the pad path
    x2 = jnp.asarray(rng.random((1, 19, 21, 3), dtype=np.float32))
    out3 = net.apply({"params": params}, x2)
    assert out3.shape == (1, 19, 21, 3)


def test_dense_combine_matches_manual(rng):
    """Dense gate-weighted sum == per-patch top-k hand computation."""
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.models.moce_ir_patch import (
        PatchAdapterLayer,
        patch_merge,
        patch_split,
    )
    from image_restoration_tpu.models.moce_ir import ModExpert

    layer = PatchAdapterLayer(dim=8, rank=2, num_experts=3, top_k=2,
                              freq_dim=16, patch_size=4)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 8)).astype(np.float32))
    sh = jnp.asarray(rng.standard_normal((1, 8, 8, 8)).astype(np.float32))
    fe = jnp.asarray(rng.standard_normal((1, 16)).astype(np.float32))
    variables = layer.init(jax.random.PRNGKey(0), x, fe, sh)
    out, aux = layer.apply(variables, x, fe, sh)

    # recompute by hand from the routing gates and raw expert outputs
    from flax.core import freeze

    params = variables["params"]
    from image_restoration_tpu.models.moce_ir_patch import PatchRoutingFunction
    routing = PatchRoutingFunction(8, 16, 3, 2, (1.0,) * 3, 4)
    gates, _, _, _ = routing.apply({"params": params["routing"]}, x, fe)
    xt, st = patch_split(x, 4), patch_split(sh, 4)
    acc = jnp.zeros_like(xt)
    scheds = [(2, 4, 3), (2, 8, 5), (2, 16, 7)]
    for i, (r, p, k) in enumerate(scheds):
        e = ModExpert(8, rank=r, patch_size=p, kernel_size=k)
        eo = e.apply({"params": params[f"experts_{i}_0"]}, xt, st)
        acc = acc + eo * gates[:, None, None, i : i + 1]
    manual = patch_merge(acc, 1, 8, 8, 4)
    from image_restoration_tpu.ops.common import Conv

    proj = Conv(8, 1, use_bias=False)
    manual = proj.apply({"params": params["proj_out"]}, manual)
    np.testing.assert_allclose(np.asarray(out), np.asarray(manual),
                               rtol=1e-5, atol=1e-6)
