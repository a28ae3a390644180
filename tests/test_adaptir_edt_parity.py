"""EDT+AdaptIR forward parity vs the reference torch implementation."""

import sys
import types

import numpy as np
import pytest

from conftest import REFERENCE_ROOT, load_reference_module, nchw_to_nhwc, \
    stub_common_modules

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_mod():
    stub_common_modules()
    from conftest import stub_torchvision

    stub_torchvision()
    sys.path.insert(0, f"{REFERENCE_ROOT}/AdaptIR-main/net")
    try:
        return load_reference_module("AdaptIR-main/net/edt.py", "ref_edt")
    finally:
        sys.path.pop(0)


class _Cfg:
    de_type = "sr_2"


@pytest.mark.parametrize("de_type,size", [("sr_2", 48), ("denoise_30", 96)])
def test_edt_forward_parity(ref_mod, rng, de_type, size):
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.models.adaptir_edt import EDT, edt_key_map
    from image_restoration_tpu.utils.torch_import import import_variables

    torch.manual_seed(0)
    cfg = _Cfg()
    cfg.de_type = de_type
    tnet = ref_mod.EDT(cfg).eval()

    jnet = EDT(de_type=de_type)
    x = rng.random((1, 3, size, size), dtype=np.float32)
    with torch.no_grad():
        ref = tnet.forward_train(torch.from_numpy(x)).numpy()

    xj = jnp.asarray(nchw_to_nhwc(x))
    variables = jnet.init(jax.random.PRNGKey(0), xj)
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()
          if "attn_mask" not in k}
    variables = import_variables(dict(variables), sd, key_map=edt_key_map)
    got = jnet.apply(variables, xj)
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)
