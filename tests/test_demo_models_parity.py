"""Parity for the demo/side-project models: SFSNiD, HiLo, PINN."""

import sys

import numpy as np
import pytest

from conftest import load_reference_module, nchw_to_nhwc, stub_common_modules

torch = pytest.importorskip("torch")


def test_pinn_parity(rng):
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.models.demo_models import PINNRestoration
    from image_restoration_tpu.train.losses import gradient_smoothness_loss
    from image_restoration_tpu.utils.torch_import import import_state_dict

    ref = load_reference_module("PINN_Image_Restoration/model.py", "ref_pinn")
    torch.manual_seed(0)
    tnet = ref.ComplexCNNModel().eval()
    jnet = PINNRestoration()

    x = rng.random((1, 3, 32, 32), dtype=np.float32)
    with torch.no_grad():
        ref_out = tnet(torch.from_numpy(x))
        ref_loss = float(tnet.loss(ref_out, torch.from_numpy(x)))
        ref_out = ref_out.numpy()
    xj = jnp.asarray(nchw_to_nhwc(x))
    params = jnet.init(jax.random.PRNGKey(0), xj)["params"]
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = import_state_dict(params, sd)
    got = jnet.apply({"params": params}, xj)
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               ref_out, rtol=2e-4, atol=2e-4)
    # full PINN recipe: mse + gradient smoothness prior
    mse = float(jnp.mean((got - xj) ** 2))
    gs = float(gradient_smoothness_loss(got))
    np.testing.assert_allclose(mse + gs, ref_loss, rtol=1e-4)


def test_hilo_parity(rng):
    """The demo copy's hifi is missing its NCHW->NHWC permute (line 59 is an
    identity permute) — patch in the intended permute, then compare."""
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.models.demo_models import HiLo
    from image_restoration_tpu.utils.torch_import import import_state_dict

    ref = load_reference_module("demo/hilo(高低频注意力).py", "ref_hilo")
    torch.manual_seed(0)
    tnet = ref.HiLo(dim=32, num_heads=4, window_size=2, alpha=0.5).eval()

    def _hifi_nhwc(self, x):
        # same math as the reference but with the intended layout transform
        x = x.permute(0, 2, 3, 1).contiguous()
        B, H, W, C = x.shape
        h_group, w_group = H // self.ws, W // self.ws
        total_groups = h_group * w_group
        x = x.reshape(B, h_group, self.ws, w_group, self.ws, C).transpose(2, 3)
        qkv = self.h_qkv(x).reshape(B, total_groups, -1, 3, self.h_heads,
                                    self.h_dim // self.h_heads).permute(
            3, 0, 1, 4, 2, 5)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        attn = (attn @ v).transpose(2, 3).reshape(B, h_group, w_group, self.ws,
                                                  self.ws, self.h_dim)
        x = attn.transpose(2, 3).reshape(B, h_group * self.ws,
                                         w_group * self.ws, self.h_dim)
        x = self.h_proj(x)
        return x.permute(0, 3, 1, 2)

    tnet.hifi = _hifi_nhwc.__get__(tnet)

    jnet = HiLo(dim=32, num_heads=4, window_size=2, alpha=0.5)
    x = rng.standard_normal((2, 32, 8, 8), dtype=np.float32)
    with torch.no_grad():
        ref_out = tnet(torch.from_numpy(x)).numpy()
    xj = jnp.asarray(nchw_to_nhwc(x))
    params = jnet.init(jax.random.PRNGKey(0), xj)["params"]
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = import_state_dict(params, sd)
    got = jnet.apply({"params": params}, xj)
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               ref_out, rtol=2e-4, atol=2e-4)


def test_sfsnid_parity(rng):
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.models.demo_models import SFSNiD, sfsnid_key_map
    from image_restoration_tpu.utils.torch_import import import_state_dict

    stub_common_modules()
    ref = load_reference_module("demo/SFSNiD.py", "ref_sfsnid")
    torch.manual_seed(0)
    tnet = ref.SFSNiD(num_res=1).eval()
    jnet = SFSNiD(num_res=1)

    x = rng.random((1, 3, 32, 32), dtype=np.float32)
    with torch.no_grad():
        ref_out = tnet(torch.from_numpy(x)).numpy()
    xj = jnp.asarray(nchw_to_nhwc(x))
    params = jnet.init(jax.random.PRNGKey(0), xj)["params"]
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = import_state_dict(params, sd, key_map=sfsnid_key_map)
    got = jnet.apply({"params": params}, xj)
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               ref_out, rtol=5e-4, atol=5e-4)

    # deep-supervision train outputs at 1/4, 1/2, 1x
    outs = jnet.apply({"params": params}, xj, train=True)
    assert [o.shape[1] for o in outs] == [8, 16, 32]
