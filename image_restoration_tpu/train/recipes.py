"""Named training-loss recipes — the multi-output supervision schemes the
reference zoo hand-rolls per repo, expressed as composable loss builders for
the unified trainer.

A recipe is ``fn(out, aux, batch) -> (total, logs)`` where ``out`` is the
model's primary output (an array, or a tuple of arrays for multi-scale
models), ``aux`` is the model's auxiliary dict ({} when absent), and
``batch`` has 'lq'/'gt' NHWC arrays.

Recipes:

* ``default``    — weighted pixel losses on the primary output, plus the MoE
                   balance term from ``aux['aux_loss']`` (Lightning recipe,
                   MoCE-IR-main/src/train.py:64-71).
* ``nerd_rain``  — 3-level Gaussian-pyramid supervision:
                   Charbonnier + 0.01*FFT + 0.05*Edge per scale, plus
                   0.1 * L1 on the two INR intermediate outputs vs pyramid
                   levels 1/2 (NeRD-Rain-main/train.py:155-163; output order
                   out[0..2]=max/mid/small, out[3]=INR-mid, out[5]=INR-small).
* ``darkir``     — pixel losses on the primary output + EnhanceLoss on the
                   bottleneck side head: criterion(nearest_up(side, 8), gt)
                   (DarkIR-main/losses/loss.py:502-529 via losses/__init__.py
                   :70-71; the VGG19 perceptual term is omitted — pretrained
                   VGG weights are not importable in this environment — and
                   the hook for it is ``vgg_term``).
* ``hogformer``  — L1 + (1-pearson)/2 + HOG-MSE
                   (image_restoration_model.py:303-311: l_pix + l_pear +
                   l_hog; (1-rho)/2 == 0.5 * pearson_loss exactly).
* ``transweather`` — smooth_l1 + 0.04 * VGG16 perceptual
                   (TransWeather-main/train.py:161-164; the perceptual term
                   is relu1_2/2_2/3_3 feature MSE, perceptual.py:8-33).
                   Pass ``vgg_params`` (imported via utils.torch_import from
                   a torchvision vgg16 .pth, or a random-init tree in tests).
* ``mwformer_style`` — stage-1 SupCon over StyleFilter embeddings
                   (MWFormer/main_train_style.py:1-75: the 64-d style vector
                   is trained contrastively against weather-type labels,
                   then frozen for restoration training). The model's output
                   is the (B, 64) embedding; labels ride ``batch['de_id']``.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping

import jax.numpy as jnp

from image_restoration_tpu.train import losses as L

LossFn = Callable[[Any, Mapping, Mapping], tuple]


def _primary(out):
    """First array output of a multi-output model; identity otherwise."""
    if isinstance(out, (tuple, list)):
        return out[0]
    return out


def default_recipe(loss_terms: Mapping[str, float],
                   aux_loss_weight: float = 0.0) -> LossFn:
    pixel = L.weighted_loss(dict(loss_terms))

    def fn(out, aux, batch):
        total, logs = pixel(_primary(out), batch["gt"])
        if aux_loss_weight and "aux_loss" in aux:
            total = total + aux_loss_weight * aux["aux_loss"]
            logs["aux"] = aux["aux_loss"]
        return total, logs

    return fn


def nerd_rain_recipe(char_w: float = 1.0, fft_w: float = 0.01,
                     edge_w: float = 0.05, inr_w: float = 0.1) -> LossFn:
    def fn(out, aux, batch):
        pyr = L.build_pyramid(batch["gt"], 3)
        scales = out[:3]
        char = sum(L.charbonnier_loss(o, t) for o, t in zip(scales, pyr))
        fft = sum(L.fft_abs_loss(o, t) for o, t in zip(scales, pyr))
        edge = sum(L.edge_loss(o, t) for o, t in zip(scales, pyr))
        inr = L.l1_loss(out[3], pyr[1]) + L.l1_loss(out[5], pyr[2])
        total = char_w * char + fft_w * fft + edge_w * edge + inr_w * inr
        return total, {"char": char, "fft": fft, "edge": edge, "inr_l1": inr}

    return fn


def _nearest_up(x, scale: int):
    """torch F.interpolate(mode='nearest', scale_factor=s)."""
    x = jnp.repeat(x, scale, axis=1)
    return jnp.repeat(x, scale, axis=2)


def darkir_recipe(loss_terms: Mapping[str, float] | None = None,
                  enhance_weight: float = 1.0, side_scale: int = 8,
                  criterion: str = "l1", vgg_term: LossFn | None = None) -> LossFn:
    """DarkIR mid-supervision: the side head (1/8-res bottleneck projection,
    DarkIR.py:70-72,90-91) is nearest-upsampled x8 and compared to the GT
    (losses/loss.py:527-529). ``vgg_term(up_side, gt)`` plugs the perceptual
    part in when VGG weights are available."""
    pixel = L.weighted_loss(dict(loss_terms or {"l1": 1.0}))
    crit = L.l1_loss if criterion == "l1" else L.mse_loss

    def fn(out, aux, batch):
        total, logs = pixel(_primary(out), batch["gt"])
        if "side" in aux and aux["side"] is not None:
            up = _nearest_up(aux["side"], side_scale)
            enh = crit(up, batch["gt"])
            if vgg_term is not None:
                enh = enh + vgg_term(up, batch["gt"])
            total = total + enhance_weight * enh
            logs["enhance"] = enh
        return total, logs

    return fn


def hogformer_recipe(pix_w: float = 1.0, pearson_w: float = 0.5,
                     hog_w: float = 1.0) -> LossFn:
    def fn(out, aux, batch):
        pred, gt = _primary(out), batch["gt"]
        l_pix = L.l1_loss(pred, gt)
        l_pear = pearson_w * L.pearson_loss(pred, gt)   # == (1-rho)/2 at 0.5
        l_hog = L.hog_loss(pred, gt)
        total = pix_w * l_pix + l_pear + hog_w * l_hog
        return total, {"l_pix": l_pix, "l_pear": l_pear, "l_hog": l_hog}

    return fn


def transweather_recipe(vgg_params=None, perceptual_w: float = 0.04,
                        taps=(3, 8, 15), beta: float = 1.0) -> LossFn:
    """smooth_l1 + 0.04 * perceptual (TransWeather-main/train.py:161-164).

    ``vgg_params``: param tree for eval/perceptual.VGG16Features at the
    torchvision relu1_2/2_2/3_3 taps. Without it the recipe degrades to
    smooth_l1 alone (logged so the omission is visible)."""
    from image_restoration_tpu.eval.perceptual import (
        VGG16Features, perceptual_loss,
    )

    vgg = VGG16Features(taps=tuple(taps))

    def fn(out, aux, batch):
        pred, gt = _primary(out), batch["gt"]
        sl1 = L.smooth_l1_loss(pred, gt, beta=beta)
        logs = {"smooth_l1": sl1}
        total = sl1
        if vgg_params is not None:
            perc = perceptual_loss(vgg, vgg_params, pred, gt, criterion="mse")
            total = total + perceptual_w * perc
            logs["perceptual"] = perc
        return total, logs

    return fn


def mwformer_style_recipe(temperature: float = 0.1) -> LossFn:
    """Stage-1 style training: SupCon over the StyleFilter's 64-d embeddings
    with the degradation id as the label (MWFormer/main_train_style.py:1-75).
    Use with ``--model mwformer_style``; stage 2 then freezes the trained
    filter inside the full MWFormer (cli/train.py --style_ckpt/--freeze)."""

    def fn(out, aux, batch):
        emb = _primary(out).astype(jnp.float32)
        loss = L.supcon_loss(emb, batch["de_id"], temperature=temperature)
        return loss, {"supcon": loss}

    return fn


RECIPES: dict[str, Callable[..., LossFn]] = {
    "default": default_recipe,
    "nerd_rain": nerd_rain_recipe,
    "darkir": darkir_recipe,
    "hogformer": hogformer_recipe,
    "transweather": transweather_recipe,
    "mwformer_style": mwformer_style_recipe,
}


def make_recipe(name: str, **kwargs) -> LossFn:
    if name not in RECIPES:
        raise KeyError(f"unknown recipe {name!r}; available: {sorted(RECIPES)}")
    return RECIPES[name](**kwargs)
