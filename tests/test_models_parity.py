"""Forward parity of SRConvNet and DarkIR vs the reference torch code."""

import sys

import numpy as np
import pytest

from conftest import REFERENCE_ROOT, load_reference_module, nchw_to_nhwc

torch = pytest.importorskip("torch")


def _legacy_fft_shim():
    """The reference SRConvNet uses the pre-1.8 torch.rfft/irfft API
    (m_block.py:58-68); reconstruct it on torch.fft for the parity run."""
    if hasattr(torch, "rfft"):
        return

    def rfft(x, signal_ndim, normalized=False):
        assert signal_ndim == 2
        z = torch.fft.rfft2(x, dim=(-2, -1), norm="ortho" if normalized else "backward")
        return torch.view_as_real(z)

    def irfft(x, signal_ndim, normalized=False, signal_sizes=None):
        assert signal_ndim == 2
        z = torch.view_as_complex(x.contiguous())
        return torch.fft.irfft2(z, s=tuple(signal_sizes), dim=(-2, -1),
                                norm="ortho" if normalized else "backward")

    torch.rfft = rfft
    torch.irfft = irfft


def test_srconvnet_parity(rng):
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.models.srconvnet import SRNet, srconvnet_key_map
    from image_restoration_tpu.utils.torch_import import import_state_dict

    _legacy_fft_shim()
    sys.path.insert(0, f"{REFERENCE_ROOT}/SRConvNet-main")
    try:
        ref = load_reference_module("SRConvNet-main/models/m_block.py", "ref_m_block")
        sys.modules["models.m_block"] = ref
        refnet_mod = load_reference_module("SRConvNet-main/models/m_network.py",
                                           "ref_m_network")
    finally:
        sys.path.pop(0)

    class Args:
        rgb_range, scale, num_heads, num_kernels, colors, dim, num_blocks = \
            1.0, 2, 2, 4, 3, 16, 2

    torch.manual_seed(0)
    tnet = refnet_mod.SRNet(Args()).eval()
    jnet = SRNet(dim=16, n_blocks=2, num_heads=2, num_kernels=4, scale=2)
    x = rng.random((2, 3, 16, 16), dtype=np.float32)
    with torch.no_grad():
        ref_out = tnet(torch.from_numpy(x)).numpy()

    params = jnet.init(jax.random.PRNGKey(0), jnp.asarray(nchw_to_nhwc(x)))["params"]
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = import_state_dict(params, sd, key_map=srconvnet_key_map)
    got = jnet.apply({"params": params}, jnp.asarray(nchw_to_nhwc(x)))
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref_out, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("side_loss", [False, True])
def test_darkir_parity(rng, side_loss):
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.models.darkir import DarkIR, darkir_key_map
    from image_restoration_tpu.utils.torch_import import import_state_dict

    sys.path.insert(0, f"{REFERENCE_ROOT}/DarkIR-main/archs")
    try:
        ref = load_reference_module("DarkIR-main/archs/DarkIR.py", "ref_darkir")
    finally:
        sys.path.pop(0)

    torch.manual_seed(0)
    tnet = ref.DarkIR(width=8, middle_blk_num_enc=1, middle_blk_num_dec=1,
                      enc_blk_nums=[1, 1, 1], dec_blk_nums=[1, 1, 1],
                      dilations=[1, 4], extra_depth_wise=True).eval()
    jnet = DarkIR(width=8, middle_blk_num_enc=1, middle_blk_num_dec=1,
                  enc_blk_nums=(1, 1, 1), dec_blk_nums=(1, 1, 1),
                  dilations=(1, 4), extra_depth_wise=True)

    # beta/gamma are zero-init; randomize so the test exercises those paths
    with torch.no_grad():
        for n, p in tnet.named_parameters():
            if n.endswith(("beta", "gamma")):
                p.copy_(torch.randn_like(p) * 0.1)

    x = rng.random((1, 3, 19, 21), dtype=np.float32)  # odd size: pad path
    with torch.no_grad():
        tout = tnet(torch.from_numpy(x), side_loss=side_loss)

    xj = jnp.asarray(nchw_to_nhwc(x))
    params = jnet.init(jax.random.PRNGKey(0), xj, side_loss=side_loss)["params"]
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = import_state_dict(
        params, sd, key_map=lambda k: darkir_key_map(k, keep_side=side_loss))
    jout = jnet.apply({"params": params}, xj, side_loss=side_loss)

    if side_loss:
        ref_side, ref_out = tout[0].numpy(), tout[1].numpy()
        got_out, aux = jout
        np.testing.assert_allclose(
            np.transpose(np.asarray(aux["side"]), (0, 3, 1, 2)), ref_side,
            rtol=2e-4, atol=2e-4)
    else:
        ref_out = tout.numpy()
        got_out = jout
    got = np.transpose(np.asarray(got_out), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref_out, rtol=2e-4, atol=2e-4)
