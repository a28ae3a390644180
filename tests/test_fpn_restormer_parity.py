"""FPN/PAFPN FFT-DSConv Restormer parity vs the owner's experiment model."""

import numpy as np
import pytest

from conftest import load_reference_module, nchw_to_nhwc, stub_common_modules

torch = pytest.importorskip("torch")

REF = ("experiment/baseline_restormer_new_train/"
       "20251120_Restormer_FFT_DSConv_Fusion_elementwise_gate_FPN_"
       "frequency_aware_task_aware/src/net/model.py")


@pytest.fixture(scope="module")
def ref_mod():
    import sys
    import types

    stub_common_modules()
    if "torchsummary" not in sys.modules:
        ts = types.ModuleType("torchsummary")
        ts.summary = lambda *a, **k: None
        sys.modules["torchsummary"] = ts
    return load_reference_module(REF, "ref_fpn_restormer")


@pytest.mark.parametrize("fusion,gate,freq_aware", [
    ("PAFPN", "elementwise", True),
    ("FPN", "headwise", False),
    ("None", None, True),
])
def test_fpn_restormer_parity(ref_mod, rng, fusion, gate, freq_aware):
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.models.fpn_restormer import FPNRestormer
    from image_restoration_tpu.utils.torch_import import import_variables

    torch.manual_seed(0)
    tnet = ref_mod.Restormer_FFT_DSConv_Fusion(
        dim=8, num_blocks=[1, 1, 1, 1], num_refinement_blocks=1,
        heads=[1, 2, 4, 8], ffn_expansion_factor=2.0, bias=False,
        LayerNorm_type="WithBias", fusion_type=fusion, gate_type=gate,
        use_frequency_aware=freq_aware, task_aware_fusion=True,
    ).eval()
    jnet = FPNRestormer(
        dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1,
        heads=(1, 2, 4, 8), ffn_expansion_factor=2.0,
        fusion_type=fusion, gate_type=gate, use_frequency_aware=freq_aware,
    )

    x = rng.random((1, 3, 32, 32), dtype=np.float32)
    with torch.no_grad():
        ref_out = tnet(torch.from_numpy(x)).numpy()
    xj = jnp.asarray(nchw_to_nhwc(x))
    variables = jnet.init(jax.random.PRNGKey(0), xj)
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    variables = import_variables(dict(variables), sd)
    got = jnet.apply(variables, xj)
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               ref_out, rtol=5e-4, atol=5e-4)
