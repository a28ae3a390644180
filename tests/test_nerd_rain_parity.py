"""NeRD-Rain MultiscaleNet + INR parity vs the reference torch code."""

import sys

import numpy as np
import pytest

from conftest import REFERENCE_ROOT, load_reference_module, nchw_to_nhwc

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_mod():
    from conftest import stub_common_modules

    stub_common_modules()
    # the reference pins .cuda() inside modules (model.py:276, mlp.py:72-133);
    # run it on CPU by making .cuda a no-op
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    sys.path.insert(0, f"{REFERENCE_ROOT}/NeRD-Rain-main")
    try:
        return load_reference_module("NeRD-Rain-main/model.py", "ref_nerd")
    finally:
        sys.path.pop(0)


def test_inr_degeneracy(ref_mod, rng):
    """Our single-pass INR equals the reference's 4-branch local ensemble."""
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.ops.inr import INR
    from image_restoration_tpu.utils.torch_import import import_state_dict

    torch.manual_seed(0)
    tinr = ref_mod.INR(8).eval()
    x = rng.random((1, 8, 12, 16), dtype=np.float32)
    with torch.no_grad():
        ref = tinr(torch.from_numpy(x)).numpy()

    jinr = INR(8)
    xj = jnp.asarray(nchw_to_nhwc(x))
    params = jinr.init(jax.random.PRNGKey(0), xj)["params"]
    sd = {k: v.detach().numpy() for k, v in tinr.state_dict().items()}
    params = import_state_dict(params, sd)
    got = np.transpose(np.asarray(jinr.apply({"params": params}, xj)), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_multiscale_parity(ref_mod, rng):
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.models.nerd_rain import MultiscaleNet, nerd_rain_key_map
    from image_restoration_tpu.utils.torch_import import import_state_dict

    torch.manual_seed(0)
    tnet = ref_mod.MultiscaleNet(dim=8, num_blocks=[1, 1, 1], heads=[1, 2, 4]).eval()
    jnet = MultiscaleNet(dim=8, num_blocks=(1, 1, 1), heads=(1, 2, 4))

    x = rng.random((1, 3, 32, 32), dtype=np.float32)
    with torch.no_grad():
        refs = [t.numpy() for t in tnet(torch.from_numpy(x))]

    xj = jnp.asarray(nchw_to_nhwc(x))
    params = jnet.init(jax.random.PRNGKey(0), xj)["params"]
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = import_state_dict(params, sd, key_map=nerd_rain_key_map)
    outs = jnet.apply({"params": params}, xj)
    assert len(outs) == len(refs) == 7
    for i, (got, ref) in enumerate(zip(outs, refs)):
        g = np.transpose(np.asarray(got), (0, 3, 1, 2))
        np.testing.assert_allclose(g, ref, rtol=3e-4, atol=3e-4,
                                   err_msg=f"output {i}")
