"""LumiSenseMoE parity vs the reference torch implementation."""

import sys

import numpy as np
import pytest

from conftest import REFERENCE_ROOT, load_reference_module, nchw_to_nhwc, stub_common_modules

torch = pytest.importorskip("torch")


def test_lumisense_parity(rng, monkeypatch):
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.models.lumisense_moe import (
        LumiSenseMoEIR,
        lumisense_key_map,
    )
    from image_restoration_tpu.utils.torch_import import import_state_dict

    stub_common_modules()
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        ref = load_reference_module("LumiSenseMoE/src/net/LimiSenseMoE.py", "ref_lumi")
    finally:
        sys.path.pop(0)

    torch.manual_seed(0)
    tnet = ref.LumiSenseMoEIR(
        dim=8, levels=3, heads=[1, 2, 4], num_blocks=[1, 1, 1],
        num_dec_blocks=[1, 1], ffn_expansion_factor=2, num_refinement_blocks=1,
        rank=2, num_experts=4, depth_type="constant", stage_depth=[1, 1],
        rank_type="constant", topk=2, with_complexity=True,
        complexity_scale="max").eval()
    monkeypatch.setattr(torch, "randn_like", lambda t: torch.zeros_like(t))

    jnet = LumiSenseMoEIR(
        dim=8, levels=3, heads=(1, 2, 4), num_blocks=(1, 1, 1),
        num_dec_blocks=(1, 1), ffn_expansion_factor=2, num_refinement_blocks=1,
        rank=2, num_experts=4, depth_type="constant", stage_depth=(1, 1),
        rank_type="constant", topk=2, with_complexity=True,
        complexity_scale="max")

    x = rng.random((1, 3, 16, 16), dtype=np.float32)
    with torch.no_grad():
        ref_out = tnet(torch.from_numpy(x)).numpy()

    xj = jnp.asarray(nchw_to_nhwc(x))
    params = jnet.init(jax.random.PRNGKey(0), xj)["params"]
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = import_state_dict(params, sd, key_map=lumisense_key_map)
    got = np.transpose(np.asarray(jnet.apply({"params": params}, xj)), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref_out, rtol=3e-4, atol=3e-4)
