"""VGG16 feature / perceptual-loss / LPIPS parity.

No torchvision in this image: the test builds an architecture-identical torch
VGG16 ``features`` trunk (same Sequential layout as torchvision, which is
what the published checkpoints index into) and checks the flax trunk
reproduces its activations through the importer.
"""

import numpy as np
import pytest

from conftest import nchw_to_nhwc

torch = pytest.importorskip("torch")


def _torch_vgg16_features():
    import torch.nn as nn

    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers = []
    c = 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(c, v, 3, padding=1))
            layers.append(nn.ReLU(inplace=False))
            c = v
    return nn.Sequential(*layers)


def test_vgg16_feature_parity(rng):
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.eval.perceptual import (
        VGG16Features,
        vgg16_key_map,
    )
    from image_restoration_tpu.utils.torch_import import import_state_dict

    torch.manual_seed(0)
    tnet = _torch_vgg16_features().eval()
    taps = (3, 8, 15, 22, 29)
    jnet = VGG16Features(taps=taps)
    x = rng.random((1, 3, 64, 64), dtype=np.float32)
    feats_t = []
    with torch.no_grad():
        h = torch.from_numpy(x)
        for i, m in enumerate(tnet):
            h = m(h)
            if i in taps:
                feats_t.append(h.numpy())

    xj = jnp.asarray(nchw_to_nhwc(x))
    params = jnet.init(jax.random.PRNGKey(0), xj)["params"]
    sd = {f"features.{i}.{p}": v.detach().numpy()
          for i, m in enumerate(tnet) if hasattr(m, "weight")
          for p, v in (("weight", m.weight), ("bias", m.bias))}
    params = import_state_dict(params, sd, key_map=vgg16_key_map)
    feats_j = jnet.apply({"params": params}, xj)
    assert len(feats_j) == len(feats_t)
    for a, b in zip(feats_j, feats_t):
        np.testing.assert_allclose(
            np.transpose(np.asarray(a), (0, 3, 1, 2)), b, rtol=1e-4, atol=1e-4)


def test_perceptual_loss_matches_torch_recipe(rng):
    """TransWeather LossNetwork (perceptual.py:8-33): mean MSE over taps."""
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.eval.perceptual import (
        VGG16Features,
        perceptual_loss,
        vgg16_key_map,
    )
    from image_restoration_tpu.utils.torch_import import import_state_dict

    torch.manual_seed(1)
    tnet = _torch_vgg16_features().eval()
    jnet = VGG16Features(taps=(3, 8, 15))
    x = rng.random((1, 3, 32, 32), dtype=np.float32)
    y = rng.random((1, 3, 32, 32), dtype=np.float32)

    with torch.no_grad():
        feats = {}
        for inp, key in ((x, "x"), (y, "y")):
            h = torch.from_numpy(inp)
            fs = []
            for i, m in enumerate(tnet):
                h = m(h)
                if i in (3, 8, 15):
                    fs.append(h)
            feats[key] = fs
        ref = float(sum(torch.nn.functional.mse_loss(a, b)
                        for a, b in zip(feats["x"], feats["y"])) / 3)

    params = jnet.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    # trunk truncated at the last tap: only layers <= 15 exist flax-side
    sd = {f"features.{i}.{p}": v.detach().numpy()
          for i, m in enumerate(tnet) if hasattr(m, "weight") and i <= 15
          for p, v in (("weight", m.weight), ("bias", m.bias))}
    params = import_state_dict(params, sd, key_map=vgg16_key_map)
    got = float(perceptual_loss(jnet, params, jnp.asarray(nchw_to_nhwc(x)),
                                jnp.asarray(nchw_to_nhwc(y)), normalize=False))
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_lpips_basic(rng):
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.eval.perceptual import LPIPS

    m = LPIPS()
    x = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    params = m.init(jax.random.PRNGKey(0), x, x)["params"]
    d_same = m.apply({"params": params}, x, x)
    assert d_same.shape == (2,)
    np.testing.assert_allclose(np.asarray(d_same), 0.0, atol=1e-6)
    y = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    d = m.apply({"params": params}, x, y)
    assert np.all(np.isfinite(np.asarray(d)))
