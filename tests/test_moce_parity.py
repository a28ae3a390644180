"""MoCE-IR parity vs moce_ir_orignal.py (the runnable CVPR'25 reference)."""

import numpy as np
import pytest

from conftest import load_reference_module, nchw_to_nhwc

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_mod():
    # the reference imports fvcore only for its __main__ FLOPs print
    import sys
    import types

    from conftest import REFERENCE_ROOT, stub_common_modules

    stub_common_modules()  # fvcore + spec-equipped timm (demo_test needs to_2tuple)

    sys.path.insert(0, REFERENCE_ROOT)  # for its `from demo_test import ...`
    try:
        return load_reference_module("moce_ir_orignal.py", "ref_moce")
    finally:
        sys.path.pop(0)


CFG = dict(dim=8, levels=3, heads=[2, 4, 8], num_blocks=[1, 1, 1],
           num_dec_blocks=[1, 1], ffn_expansion_factor=2,
           num_refinement_blocks=1, rank=2, num_experts=4, depth_type="lin",
           stage_depth=[2, 1], rank_type="constant", topk=2,
           with_complexity=True, complexity_scale="max")


def _build(ref_mod, monkeypatch):
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.models.moce_ir import MoCEIR, moce_key_map
    from image_restoration_tpu.utils.torch_import import import_state_dict

    torch.manual_seed(0)
    tnet = ref_mod.MoCEIR(**CFG).eval()
    # reference adds gate noise even in eval (moce_ir_orignal.py Routing
    # forward); zero it on both sides for a deterministic comparison
    monkeypatch.setattr(torch, "randn_like", lambda t: torch.zeros_like(t))

    jnet = MoCEIR(dim=8, levels=3, heads=(2, 4, 8), num_blocks=(1, 1, 1),
                  num_dec_blocks=(1, 1), ffn_expansion_factor=2,
                  num_refinement_blocks=1, rank=2, num_experts=4,
                  depth_type="lin", stage_depth=(2, 1), rank_type="constant",
                  topk=2, with_complexity=True, complexity_scale="max")
    x0 = jnp.zeros((1, 16, 16, 3), jnp.float32)
    params = jnet.init(jax.random.PRNGKey(0), x0)["params"]
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = import_state_dict(params, sd, key_map=moce_key_map)
    return tnet, jnet, params


def test_moce_forward_parity(ref_mod, rng, monkeypatch):
    import jax.numpy as jnp

    tnet, jnet, params = _build(ref_mod, monkeypatch)
    x = rng.random((1, 3, 16, 16), dtype=np.float32)  # ref eval assumes B=1
    with torch.no_grad():
        ref_out = tnet(torch.from_numpy(x)).numpy()
    got = jnet.apply({"params": params}, jnp.asarray(nchw_to_nhwc(x)))
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref_out, rtol=3e-4, atol=3e-4)


def test_moce_train_path_and_aux_loss(ref_mod, rng, monkeypatch):
    """Train mode: dense dispatch must equal SparseDispatcher routing and the
    aux loss must match, with the gate noise zeroed on both sides."""
    import jax
    import jax.numpy as jnp

    tnet, jnet, params = _build(ref_mod, monkeypatch)
    tnet.train()
    x = rng.random((2, 3, 16, 16), dtype=np.float32)
    with torch.no_grad():
        ref_out = tnet(torch.from_numpy(x)).numpy()
        ref_aux = float(tnet.total_loss)

    # zero-noise on the jax side: rng is still threaded, so disable noise by
    # passing train=True but patching normal draws to zero via a zero key hack
    # — simplest is to exploit that noise enters additively: use the module
    # as-is but with a monkeypatched jax.random.normal.
    orig_normal = jax.random.normal
    try:
        jax.random.normal = lambda key, shape=(), dtype=jnp.float32: jnp.zeros(shape, dtype)
        out, aux = jnet.apply({"params": params}, jnp.asarray(nchw_to_nhwc(x)),
                              train=True, rngs={"moe": jax.random.PRNGKey(0)})
    finally:
        jax.random.normal = orig_normal
    got = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref_out, rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(float(aux["aux_loss"]), ref_aux, rtol=1e-3)
