"""HierViG parity vs the reference vig_h.py (fla stubbed with the naive GLA
oracle — see test_vig_parity)."""

import sys

import numpy as np
import pytest

from conftest import load_reference_module, nchw_to_nhwc
from test_vig_parity import _install_fla_stub, _install_timm_stub

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_mod():
    import types

    _install_timm_stub()
    _install_fla_stub()
    from conftest import stub_torchvision

    stub_torchvision()
    return load_reference_module("vig_h.py", "ref_vig_h")


def _key_map(key):
    import re

    key = key.replace("patch_embed.", "patch_embed_")
    key = re.sub(r"layers\.(\d+)\.blocks\.(\d+)\.", r"layers_\1_blocks_\2.", key)
    key = re.sub(r"layers\.(\d+)\.downsample\.", r"layers_\1_downsample.", key)
    key = key.replace("classifier.norm.", "classifier_norm.")
    key = key.replace("classifier.head.", "classifier_head.")
    key = key.replace(".mlp.fc1.", ".mlp_fc1.")
    key = key.replace(".mlp.fc2.", ".mlp_fc2.")
    return key


@pytest.mark.parametrize("gmlp,downsample", [(False, "v2"), (True, "v1")])
def test_vig_h_parity(ref_mod, rng, gmlp, downsample):
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.models.vig_h import HierViG
    from image_restoration_tpu.utils.torch_import import import_state_dict

    torch.manual_seed(0)
    tnet = ref_mod.HierViG(
        patch_size=4, num_classes=10, depths=[1, 1], dims=[16, 32],
        num_heads=[2, 4], expand_k=0.5, expand_v=1.0, rope_mode="none",
        mlp_ratio=2.0, gmlp=gmlp, drop_path_rate=0.0,
        downsample_version=downsample, patchembed_version="v1",
        norm_layer="ln", attn_models=["fused_chunk", "fused_chunk"],
    ).train()  # halved bidirectional path
    jnet = HierViG(patch_size=4, num_classes=10, depths=(1, 1), dims=(16, 32),
                   num_heads=(2, 4), mlp_ratio=2.0, gmlp=gmlp,
                   downsample_version=downsample)

    x = rng.random((2, 3, 32, 32), dtype=np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x)).numpy()
    xj = jnp.asarray(nchw_to_nhwc(x))
    params = jnet.init(jax.random.PRNGKey(0), xj)["params"]
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = import_state_dict(params, sd, key_map=_key_map)
    got = np.asarray(jnet.apply({"params": params}, xj))
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)
