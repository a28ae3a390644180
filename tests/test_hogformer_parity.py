"""Numerical parity of the TPU-native HOGformer vs the reference torch one.

HOGformer relies on data-dependent token sorts (HOG-weighted magnitude); the
parity test uses random continuous inputs so sort keys are tie-free and the
permutations match between torch.sort and jnp.argsort.
"""

import numpy as np
import pytest

from conftest import load_reference_module, nchw_to_nhwc

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_mod():
    return load_reference_module(
        "HOGformer-main/settingI/basicsr/models/archs/hogformer_arch.py"
    )


TINY = dict(dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1,
            heads=(1, 2, 4, 8), ffn_expansion_factor=3.0)


def _drop_buffers(key):
    if key.endswith(("sobel_x", "sobel_y")):
        return None
    return key


def _build_pair(ref_mod, ln_type="WithBias", bias=False):
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.models.hogformer import HOGformer
    from image_restoration_tpu.utils.torch_import import import_state_dict

    torch.manual_seed(0)
    tnet = ref_mod.HOGformer(
        inp_channels=3, out_channels=3, dim=TINY["dim"],
        num_blocks=list(TINY["num_blocks"]),
        num_refinement_blocks=TINY["num_refinement_blocks"],
        heads=list(TINY["heads"]),
        ffn_expansion_factor=TINY["ffn_expansion_factor"],
        bias=bias, LayerNorm_type=ln_type, dual_pixel_task=False,
    ).eval()

    jnet = HOGformer(
        dim=TINY["dim"], num_blocks=TINY["num_blocks"],
        num_refinement_blocks=TINY["num_refinement_blocks"],
        heads=TINY["heads"],
        ffn_expansion_factor=TINY["ffn_expansion_factor"],
        use_bias=bias, ln_type=ln_type,
    )
    x0 = jnp.zeros((1, 16, 16, 3), jnp.float32)
    params = jnet.init(jax.random.PRNGKey(0), x0)["params"]
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = import_state_dict(params, sd, key_map=_drop_buffers)
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


def test_nonsquare_input(ref_mod, rng):
    """24x16 exercises the patch pad path (patch_size=8 divides both here;
    use 20x16 to hit actual padding inside DHOGSA)."""
    import jax.numpy as jnp

    tnet, jnet, params = _build_pair(ref_mod)
    x = rng.standard_normal((1, 3, 24, 16), dtype=np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x)).numpy()
    got = jnet.apply({"params": params}, jnp.asarray(nchw_to_nhwc(x)))
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
