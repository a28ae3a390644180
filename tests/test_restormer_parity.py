"""Numerical parity of the TPU-native Restormer vs the reference PyTorch one.

Strategy (SURVEY.md §4 implication): randomly initialize the *reference*
torch model, import its state_dict through utils/torch_import, and require
the JAX model to reproduce the forward activations. This validates both the
block semantics (LN variance flavor, exact GELU, pixel-shuffle channel order,
L2-norm/temperature/softmax in MDTA) and the OIHW->HWIO importer in one shot.
"""

import numpy as np
import pytest

from conftest import load_reference_module, nchw_to_nhwc

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_mod():
    return load_reference_module("Restormer.py")


def _export(net):
    return {k: v.detach().numpy() for k, v in net.state_dict().items()}


TINY = dict(dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1,
            heads=(1, 2, 4, 8), ffn_expansion_factor=2.66)


def _build_pair(ref_mod, ln_type="WithBias", bias=False, dual_pixel=False, inp_c=3):
    from image_restoration_tpu.models.restormer import Restormer
    from image_restoration_tpu.utils.torch_import import import_state_dict
    import jax
    import jax.numpy as jnp

    torch.manual_seed(0)
    tnet = ref_mod.Restormer(
        inp_channels=inp_c, out_channels=3, dim=TINY["dim"],
        num_blocks=list(TINY["num_blocks"]),
        num_refinement_blocks=TINY["num_refinement_blocks"],
        heads=list(TINY["heads"]), ffn_expansion_factor=TINY["ffn_expansion_factor"],
        bias=bias, LayerNorm_type=ln_type, dual_pixel_task=dual_pixel,
    ).eval()

    jnet = Restormer(
        inp_channels=inp_c, out_channels=3, dim=TINY["dim"],
        num_blocks=TINY["num_blocks"],
        num_refinement_blocks=TINY["num_refinement_blocks"],
        heads=TINY["heads"], ffn_expansion_factor=TINY["ffn_expansion_factor"],
        use_bias=bias, ln_type=ln_type, dual_pixel_task=dual_pixel,
    )
    x0 = jnp.zeros((1, 16, 16, inp_c), jnp.float32)
    params = jnet.init(jax.random.PRNGKey(0), x0)["params"]
    params = import_state_dict(params, _export(tnet))
    return tnet, jnet, params


@pytest.mark.parametrize("ln_type,bias", [("WithBias", False), ("BiasFree", True)])
def test_forward_parity(ref_mod, ln_type, bias, rng):
    import jax.numpy as jnp

    tnet, jnet, params = _build_pair(ref_mod, ln_type=ln_type, bias=bias)
    x = rng.standard_normal((2, 3, 16, 16), dtype=np.float32) * 0.5 + 0.5
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x)).numpy()
    got = jnet.apply({"params": params}, jnp.asarray(nchw_to_nhwc(x)))
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_fullsize_forward_parity(ref_mod, rng):
    """VERDICT r1 item 8: the REAL Restormer-base config (dim=48, blocks
    4/6/6/8, heads 1/2/4/8) at a small spatial size — catches dim/head/
    padding bugs the dim=8 tiny configs cannot (e.g. head-split reshapes
    that only misalign at non-trivial head counts)."""
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.models.restormer import Restormer
    from image_restoration_tpu.utils.torch_import import import_state_dict

    torch.manual_seed(1)
    full = dict(dim=48, num_blocks=[4, 6, 6, 8], num_refinement_blocks=4,
                heads=[1, 2, 4, 8], ffn_expansion_factor=2.66)
    tnet = ref_mod.Restormer(bias=False, LayerNorm_type="WithBias",
                             **full).eval()
    jnet = Restormer(dim=48, num_blocks=(4, 6, 6, 8),
                     num_refinement_blocks=4, heads=(1, 2, 4, 8),
                     ffn_expansion_factor=2.66, use_bias=False,
                     ln_type="WithBias")
    x0 = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = jnet.init(jax.random.PRNGKey(0), x0)["params"]
    params = import_state_dict(params, _export(tnet))
    x = rng.standard_normal((1, 3, 32, 32), dtype=np.float32) * 0.5 + 0.5
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x)).numpy()
    got = jnet.apply({"params": params}, jnp.asarray(nchw_to_nhwc(x)))
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


def test_dual_pixel_parity(ref_mod, rng):
    import jax.numpy as jnp

    tnet, jnet, params = _build_pair(ref_mod, dual_pixel=True, inp_c=6)
    x = rng.standard_normal((1, 6, 16, 16), dtype=np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x)).numpy()
    got = jnet.apply({"params": params}, jnp.asarray(nchw_to_nhwc(x)))
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
