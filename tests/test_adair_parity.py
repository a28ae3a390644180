"""AdaIR forward parity vs the reference torch implementation."""

import numpy as np
import pytest

from conftest import load_reference_module, nchw_to_nhwc

torch = pytest.importorskip("torch")


@pytest.mark.parametrize("size", [(16, 16), (32, 24)])
def test_adair_parity(rng, size):
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.models.adair import AdaIR, adair_key_map
    from image_restoration_tpu.utils.torch_import import import_state_dict

    ref = load_reference_module("AdaIR-main/net/model.py", "ref_adair")
    torch.manual_seed(0)
    tnet = ref.AdaIR(dim=8, num_blocks=[1, 1, 1, 1], num_refinement_blocks=1,
                     heads=[1, 2, 4, 8], decoder=True).eval()
    # para1 zero-init would hide the FreModule path: randomize both paras
    with torch.no_grad():
        for n, p in tnet.named_parameters():
            if "para" in n:
                p.copy_(torch.randn_like(p) * 0.5)

    jnet = AdaIR(dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1,
                 heads=(1, 2, 4, 8), decoder=True)
    h, w = size
    x = rng.random((2, 3, h, w), dtype=np.float32)
    with torch.no_grad():
        ref_out = tnet(torch.from_numpy(x)).numpy()

    xj = jnp.asarray(nchw_to_nhwc(x))
    params = jnet.init(jax.random.PRNGKey(0), xj)["params"]
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = import_state_dict(params, sd, key_map=adair_key_map)
    got = np.transpose(np.asarray(jnet.apply({"params": params}, xj)), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref_out, rtol=3e-4, atol=3e-4)


def test_adaptive_rect_mask_matches_reference_loop(rng):
    """The vectorized mask equals the reference per-sample Python loop
    (model.py:348-355) including the int() truncation semantics."""
    import jax.numpy as jnp

    from image_restoration_tpu.models.adair import adaptive_rect_mask

    h, w, n = 256, 384, 64
    thr = rng.random((3, 2), dtype=np.float32)
    got = np.asarray(adaptive_rect_mask(h, w, jnp.asarray(thr[:, 0]),
                                        jnp.asarray(thr[:, 1]), n))
    for i in range(3):
        h_ = int(h // n * thr[i, 0])
        w_ = int(w // n * thr[i, 1])
        ref = np.zeros((h, w, 1), np.float32)
        ref[h // 2 - h_: h // 2 + h_, w // 2 - w_: w // 2 + w_] = 1
        np.testing.assert_array_equal(got[i], ref)
