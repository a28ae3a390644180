"""FCM fusion block parity vs reference FCM-and-MKP.py."""

import numpy as np
import pytest

from conftest import load_reference_module, nchw_to_nhwc

torch = pytest.importorskip("torch")


def test_fcm_parity(rng):
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.ops.fusion_blocks import FCM, fcm_key_map
    from image_restoration_tpu.utils.torch_import import import_variables

    ref = load_reference_module("FCM-and-MKP.py", "ref_fcm")
    torch.manual_seed(0)
    tmod = ref.FCM(16).eval()
    jmod = FCM(16)
    x = rng.standard_normal((2, 16, 16, 16), dtype=np.float32)
    with torch.no_grad():
        ref_out = tmod(torch.from_numpy(x)).numpy()
    xj = jnp.asarray(nchw_to_nhwc(x))
    variables = jmod.init(jax.random.PRNGKey(0), xj)
    sd = {k: v.detach().numpy() for k, v in tmod.state_dict().items()}
    variables = import_variables(dict(variables), sd, key_map=fcm_key_map)
    got = jmod.apply(variables, xj)
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               ref_out, rtol=2e-4, atol=2e-4)
