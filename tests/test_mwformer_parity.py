"""MWFormer forward parity vs the reference torch implementation.

Backbone parity with a random style vector, style-filter parity, and the
end-to-end composition (vec = StyleFilter(x); out = Network_top(x, vec)).
"""

import sys

import numpy as np
import pytest

from conftest import REFERENCE_ROOT, load_reference_module, nchw_to_nhwc, \
    stub_common_modules

torch = pytest.importorskip("torch")

MW_ROOT = f"{REFERENCE_ROOT}/MWFormer"


@pytest.fixture(scope="module")
def ref_mods():
    from conftest import purge_modules

    stub_common_modules()
    purge_modules("model")  # other tests cache different 'model' packages
    sys.path.insert(0, MW_ROOT)
    try:
        encdec = load_reference_module("MWFormer/model/EncDec.py", "ref_mw_encdec")
        style = load_reference_module("MWFormer/model/style_filter64.py",
                                      "ref_mw_style")
    finally:
        sys.path.pop(0)
    return encdec, style


def test_backbone_parity(ref_mods, rng):
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.models.mwformer import (
        MWFormerBackbone,
        mwformer_key_map,
    )
    from image_restoration_tpu.utils.torch_import import import_state_dict

    encdec, _ = ref_mods
    torch.manual_seed(0)
    tnet = encdec.Network_top().eval()
    jnet = MWFormerBackbone()

    x = rng.random((2, 3, 64, 64), dtype=np.float32)
    vec = rng.standard_normal((2, 64), dtype=np.float32)
    with torch.no_grad():
        ref_out = tnet(torch.from_numpy(x), torch.from_numpy(vec)).numpy()

    xj = jnp.asarray(nchw_to_nhwc(x))
    vj = jnp.asarray(vec)
    params = jnet.init(jax.random.PRNGKey(0), xj, vj)["params"]
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = import_state_dict(params, sd, key_map=mwformer_key_map)
    got = np.transpose(np.asarray(jnet.apply({"params": params}, xj, vj)),
                       (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref_out, rtol=5e-4, atol=5e-4)


def test_style_filter_parity(ref_mods, rng):
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.models.mwformer import (
        StyleFilter,
        style_filter_key_map,
    )
    from image_restoration_tpu.utils.torch_import import import_state_dict

    _, style = ref_mods
    torch.manual_seed(1)
    tnet = style.StyleFilter_Top().eval()
    jnet = StyleFilter()

    x = rng.random((2, 3, 64, 64), dtype=np.float32)
    with torch.no_grad():
        ref_out = tnet(torch.from_numpy(x)).numpy()

    xj = jnp.asarray(nchw_to_nhwc(x))
    params = jnet.init(jax.random.PRNGKey(0), xj)["params"]
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = import_state_dict(params, sd, key_map=style_filter_key_map)
    got = np.asarray(jnet.apply({"params": params}, xj))
    np.testing.assert_allclose(got, ref_out, rtol=1e-3, atol=1e-3)


def test_full_composition(ref_mods, rng):
    """End-to-end: imported style filter feeds the imported backbone."""
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.models.mwformer import (
        MWFormer,
        mwformer_key_map,
        style_filter_key_map,
    )
    from image_restoration_tpu.utils.torch_import import import_state_dict

    encdec, style = ref_mods
    torch.manual_seed(2)
    tback = encdec.Network_top().eval()
    tstyle = style.StyleFilter_Top().eval()

    jnet = MWFormer()
    x = rng.random((1, 3, 64, 64), dtype=np.float32)
    with torch.no_grad():
        vec = tstyle(torch.from_numpy(x))
        ref_out = tback(torch.from_numpy(x), vec).numpy()

    xj = jnp.asarray(nchw_to_nhwc(x))
    params = jnet.init(jax.random.PRNGKey(0), xj)["params"]
    params["style_filter"] = import_state_dict(
        params["style_filter"],
        {k: v.detach().numpy() for k, v in tstyle.state_dict().items()},
        key_map=style_filter_key_map)
    params["backbone"] = import_state_dict(
        params["backbone"],
        {k: v.detach().numpy() for k, v in tback.state_dict().items()},
        key_map=mwformer_key_map)
    got = np.transpose(np.asarray(jnet.apply({"params": params}, xj)),
                       (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref_out, rtol=2e-3, atol=2e-3)
