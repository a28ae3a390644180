"""RectiFormer forward parity vs the reference experiment/RectiFormer.py."""

import numpy as np
import pytest

from conftest import load_reference_module, nchw_to_nhwc, stub_common_modules

torch = pytest.importorskip("torch")


def test_rectiformer_parity(rng):
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.models.rectiformer import RectiFormer
    from image_restoration_tpu.utils.torch_import import import_state_dict

    stub_common_modules()
    ref = load_reference_module("experiment/RectiFormer.py", "ref_rectiformer")
    torch.manual_seed(0)
    tnet = ref.RectiFormer(
        dim=8, num_encoder_blocks=[1, 1, 1, 1], num_decoder_blocks=[1, 1, 1, 1],
        num_refinement_blocks=1, heads=[1, 2, 4, 8],
        ffn_expansion_factor=2.0, bias=False, LayerNorm_type="WithBias",
        context_dim=16, num_scales=3,
    ).eval()
    jnet = RectiFormer(
        dim=8, num_encoder_blocks=(1, 1, 1, 1), num_decoder_blocks=(1, 1, 1, 1),
        num_refinement_blocks=1, heads=(1, 2, 4, 8),
        ffn_expansion_factor=2.0, context_dim=16, num_scales=3,
    )

    x = rng.random((1, 3, 32, 32), dtype=np.float32)
    with torch.no_grad():
        ref_out = tnet(torch.from_numpy(x)).numpy()
    xj = jnp.asarray(nchw_to_nhwc(x))
    params = jnet.init(jax.random.PRNGKey(0), xj)["params"]
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = import_state_dict(params, sd)
    got = jnet.apply({"params": params}, xj)
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               ref_out, rtol=5e-4, atol=5e-4)
