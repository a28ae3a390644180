"""Numerical parity of the TPU-native MEASNet vs the reference torch one.

Eval-mode forward parity (batch=1 — the reference's MESE eval gating indexes
batch 0's expert choice, FD_MEE.py:128) plus module-level checks of the
STPG token-MoE balance loss and the FD frequency split.
"""

import os
import sys

import numpy as np
import pytest

from conftest import load_reference_module, nchw_to_nhwc, stub_common_modules

torch = pytest.importorskip("torch")

REF_NET = "/root/reference/MEASNet-main/MEASNet/net"


@pytest.fixture(scope="module")
def ref_mod():
    stub_common_modules()
    sys.path.insert(0, REF_NET)
    try:
        mod = load_reference_module("MEASNet-main/MEASNet/net/MEASNet.py")
    finally:
        sys.path.remove(REF_NET)
    return mod


TINY = dict(dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1,
            heads=(1, 2, 4, 8), ffn_expansion_factor=2.0)


def _drop_buffers(key):
    if key.endswith(("model.mean", "model.std")):
        return None
    return key


def _build_pair(ref_mod, atom_dim=64):
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.models.measnet import MEASNet
    from image_restoration_tpu.utils.torch_import import import_variables

    torch.manual_seed(0)
    tnet = ref_mod.IRmodel(
        inp_channels=3, out_channels=3, dim=TINY["dim"],
        num_blocks=list(TINY["num_blocks"]),
        num_refinement_blocks=TINY["num_refinement_blocks"],
        heads=list(TINY["heads"]),
        ffn_expansion_factor=TINY["ffn_expansion_factor"],
        bias=False, LayerNorm_type="WithBias",
    ).eval()
    # shrink the prompt dictionary for test speed: reference hardcodes 256
    # (MEASNet.py:291) — rebuild with a smaller one via direct surgery
    jnet = MEASNet(
        dim=TINY["dim"], num_blocks=TINY["num_blocks"],
        num_refinement_blocks=TINY["num_refinement_blocks"],
        heads=TINY["heads"],
        ffn_expansion_factor=TINY["ffn_expansion_factor"],
        use_bias=False, atom_dim=256,
    )
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jnet.init(jax.random.PRNGKey(0), x0)
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    variables = import_variables(dict(variables), sd, key_map=_drop_buffers)
    return tnet, jnet, variables


def test_forward_parity(ref_mod, rng):
    import jax.numpy as jnp

    tnet, jnet, variables = _build_pair(ref_mod)
    x = rng.standard_normal((1, 3, 64, 64), dtype=np.float32) * 0.5 + 0.5
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x)).numpy()
    got = jnet.apply(variables, jnp.asarray(nchw_to_nhwc(x)))
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)


def test_stpg_loss_parity(ref_mod, rng):
    """The STPG balance loss is computed identically in eval (clean logits,
    hard load counts) — compare module-level against torch."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, REF_NET)
    try:
        import importlib
        ref_stpg = importlib.import_module("STPG_G_MESE")
    finally:
        sys.path.remove(REF_NET)

    from image_restoration_tpu.models.measnet import STPG_G_MESE
    from image_restoration_tpu.utils.torch_import import import_state_dict

    torch.manual_seed(1)
    tmod = ref_stpg.STPG_G_MESE(atom_dim=16, dim=8, ffn_expansion_factor=2.0).eval()
    jmod = STPG_G_MESE(atom_dim=16, dim=8, mlp_ratio=2.0)
    x0 = jnp.zeros((2, 4, 4, 8), jnp.float32)
    p0 = jnp.zeros((2, 16), jnp.float32)
    params = jmod.init(jax.random.PRNGKey(0), x0, p0)["params"]
    sd = {k: v.detach().numpy() for k, v in tmod.state_dict().items()
          if not k.endswith(("model.mean", "model.std"))}
    params = import_state_dict(params, sd)

    x = rng.standard_normal((2, 8, 4, 4), dtype=np.float32)
    pr = rng.standard_normal((2, 16), dtype=np.float32)
    with torch.no_grad():
        ref_out, ref_loss = tmod(torch.from_numpy(x), torch.from_numpy(pr))
    got_out, got_loss = jmod.apply(
        {"params": params}, jnp.asarray(nchw_to_nhwc(x)), jnp.asarray(pr))
    np.testing.assert_allclose(
        np.transpose(np.asarray(got_out), (0, 3, 1, 2)), ref_out.numpy(),
        rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(got_loss), float(ref_loss),
                               rtol=1e-3, atol=1e-5)


def test_fd_split_parity(ref_mod, rng):
    """FD learned low-pass: 9-shift einsum vs torch unfold, eval BN."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, REF_NET)
    try:
        import importlib
        ref_fd = importlib.import_module("FD_MEE")
    finally:
        sys.path.remove(REF_NET)

    from image_restoration_tpu.models.measnet import FD
    from image_restoration_tpu.utils.torch_import import import_variables

    torch.manual_seed(2)
    tmod = ref_fd.FD(inchannels=16).eval()
    jmod = FD(channels=16)
    x0 = jnp.zeros((2, 8, 8, 16), jnp.float32)
    variables = jmod.init(jax.random.PRNGKey(0), x0)
    sd = {k: v.detach().numpy() for k, v in tmod.state_dict().items()}
    variables = import_variables(dict(variables), sd)

    x = rng.standard_normal((2, 16, 8, 8), dtype=np.float32)
    with torch.no_grad():
        ref_low, ref_high = tmod(torch.from_numpy(x))
    low, high = jmod.apply(variables, jnp.asarray(nchw_to_nhwc(x)))
    np.testing.assert_allclose(np.transpose(np.asarray(low), (0, 3, 1, 2)),
                               ref_low.numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.transpose(np.asarray(high), (0, 3, 1, 2)),
                               ref_high.numpy(), rtol=2e-4, atol=2e-4)


def test_train_mode_runs(ref_mod):
    """Train path: noisy routing + BN batch stats + aux loss, finite."""
    import jax
    import jax.numpy as jnp

    _, jnet, variables = _build_pair(ref_mod)
    x = jnp.ones((2, 64, 64, 3), jnp.float32) * 0.3
    (out, aux), mutated = jnet.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"moe": jax.random.PRNGKey(7)})
    assert out.shape == (2, 64, 64, 3)
    assert np.isfinite(float(aux["aux_loss"]))
    assert np.all(np.isfinite(np.asarray(out)))
