"""VGG16 feature extractor, perceptual loss, and LPIPS — TPU-native (NHWC).

Reference recipes:
* TransWeather perceptual loss (TransWeather-main/perceptual.py:8-33 +
  train.py:161-164): mean of MSE between VGG16 features at relu1_2 / relu2_2
  / relu3_3 (torchvision ``features`` indices 3/8/15), combined as
  ``smooth_l1 + 0.04 * perceptual``.
* DarkIR perceptual (DarkIR-main/losses/loss.py via archs/vgg_arch.py):
  same VGG feature L1/MSE idea, configurable layers.
* LPIPS (MoCE-IR-main/src/test.py:88: torchmetrics
  LearnedPerceptualImagePatchSimilarity(net_type='vgg', normalize=True)):
  VGG16 relu1_2..relu5_3 features, channel-unit-normalized, squared
  difference, learned per-channel 1x1 linear heads, spatial mean, summed.

Pretrained weights are DATA this image does not ship (no torchvision /
lpips packages). The modules here reproduce the exact architectures and can
import the standard torch checkpoints (``vgg16-397923af.pth``,
``lpips vgg.pth``) via ``utils.torch_import``; with random weights the loss
is still a valid (untrained) feature metric and tests validate parity
against a torch replica.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from image_restoration_tpu.ops.common import Conv

# torchvision VGG16 ``features`` layout: conv indices + pool positions
VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512, "M")
# torchvision normalization (applied when normalize=True inputs are [0,1])
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
# LPIPS 'vgg' scaling layer (lpips.ScalingLayer constants)
LPIPS_SHIFT = (-0.030, -0.088, -0.188)
LPIPS_SCALE = (0.458, 0.448, 0.450)
# features-index of each relu tap
RELU_TAPS = {"relu1_2": 3, "relu2_2": 8, "relu3_3": 15,
             "relu4_3": 22, "relu5_3": 29}


class VGG16Features(nn.Module):
    """VGG16 ``features`` trunk; returns activations after the requested
    torchvision layer indices (ReLU outputs)."""

    taps: Sequence[int] = (3, 8, 15)
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        outs = []
        idx = 0
        for v in VGG16_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                if idx in self.taps:
                    outs.append(x)
                idx += 1
            else:
                x = Conv(v, 3, padding=1, use_bias=True, name=f"features_{idx}",
                         dtype=self.dtype, param_dtype=self.param_dtype)(x)
                if idx in self.taps:
                    outs.append(x)
                idx += 1
                x = nn.relu(x)
                if idx in self.taps:
                    outs.append(x)
                idx += 1
            if idx > max(self.taps):
                break
        return outs


def perceptual_loss(vgg: VGG16Features, vgg_params, pred, gt,
                    criterion: str = "mse", normalize: bool = True):
    """TransWeather LossNetwork semantics: mean over taps of feature MSE."""
    if normalize:
        mean = jnp.asarray(IMAGENET_MEAN, pred.dtype)
        std = jnp.asarray(IMAGENET_STD, pred.dtype)
        pred = (pred - mean) / std
        gt = (gt - mean) / std
    fp = vgg.apply({"params": vgg_params}, pred)
    fg = vgg.apply({"params": vgg_params}, gt)
    losses = []
    for a, b in zip(fp, fg):
        d = a - b
        losses.append(jnp.mean(d * d) if criterion == "mse"
                      else jnp.mean(jnp.abs(d)))
    return sum(losses) / len(losses)


class LPIPS(nn.Module):
    """LPIPS-vgg: unit-normalized feature distances with learned 1x1 heads."""

    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y, normalize: bool = True):
        if normalize:  # [0,1] -> [-1,1] (torchmetrics normalize=True)
            x = 2.0 * x - 1.0
            y = 2.0 * y - 1.0
        shift = jnp.asarray(LPIPS_SHIFT, x.dtype)
        scale = jnp.asarray(LPIPS_SCALE, x.dtype)
        x = (x - shift) / scale
        y = (y - shift) / scale
        taps = tuple(RELU_TAPS[k] for k in
                     ("relu1_2", "relu2_2", "relu3_3", "relu4_3", "relu5_3"))
        vgg = VGG16Features(taps=taps, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="net")
        fx = vgg(x)
        fy = vgg(y)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True) + 1e-10)
            b = b / jnp.sqrt(jnp.sum(b * b, axis=-1, keepdims=True) + 1e-10)
            d = (a - b) ** 2
            lin = Conv(1, 1, use_bias=False, name=f"lin{i}",
                       dtype=self.dtype, param_dtype=self.param_dtype)(d)
            total = total + jnp.mean(lin, axis=(1, 2, 3))
        return total  # (B,)


def vgg16_key_map(key: str):
    """torchvision ``features.N.weight`` -> flax ``features_N``; classifier
    layers are dropped (the trunk never uses them)."""
    if key.startswith("classifier"):
        return None
    return key.replace("features.", "features_")


def lpips_key_map(key: str):
    """lpips-pkg checkpoint: ``lin{i}.model.1.weight`` are the heads; the
    backbone ships separately (torchvision vgg16) — map both layouts."""
    import re

    m = re.fullmatch(r"lin(\d)\.model\.1\.weight", key)
    if m:
        return f"lin{m.group(1)}.weight"
    if key.startswith("net."):
        return key.replace("features.", "features_")
    return key
