"""TransWeather forward parity vs the reference torch implementation."""

import sys
import types

import numpy as np
import pytest

from conftest import REFERENCE_ROOT, load_reference_module, nchw_to_nhwc

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_mod():
    from conftest import stub_common_modules

    stub_common_modules()  # spec-equipped timm stub (DropPath/to_2tuple)
    sys.path.insert(0, f"{REFERENCE_ROOT}/TransWeather-main")
    try:
        return load_reference_module("TransWeather-main/transweather_model.py", "ref_tw")
    finally:
        sys.path.pop(0)


def test_transweather_parity(ref_mod, rng):
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.models.transweather import (
        Transweather,
        transweather_key_map,
    )
    from image_restoration_tpu.utils.torch_import import import_state_dict

    torch.manual_seed(0)
    tnet = ref_mod.Transweather().eval()
    jnet = Transweather()

    x = rng.random((1, 3, 64, 64), dtype=np.float32)
    with torch.no_grad():
        ref_out = tnet(torch.from_numpy(x)).numpy()

    xj = jnp.asarray(nchw_to_nhwc(x))
    params = jnet.init(jax.random.PRNGKey(0), xj)["params"]
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = import_state_dict(params, sd, key_map=transweather_key_map)
    got = np.transpose(np.asarray(jnet.apply({"params": params}, xj)), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref_out, rtol=3e-4, atol=3e-4)
