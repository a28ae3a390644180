"""Classification robustness evaluation — the LSNet corruption protocol.

TPU-native re-design of ``20251113_lsnet_xy/robust.py:1-147`` +
``robust_utils.py``:

* **ImageNet-C** (``--inc_path``): per-(corruption, severity) top-1 over the
  15 corruption folders x severities 1..5, then Corruption Error relative to
  AlexNet and the mean CE (robust.py:108-147).
* **ImageNet-A / -R** (``--ina_path`` / ``--inr_path``): top-1 restricted to
  the 200-class subsets via a logit mask (robust.py:66-95). The subset is
  expressed as a boolean mask over the model's 1000 logits; we derive it
  from the canonical subset wnid lists against the sorted training-class
  wnids (torchvision ImageFolder ordering).
* **FGSM / PGD** white-box attacks (robust.py:23-38, which calls an
  (unvendored) ``PGDAttack``): re-implemented as a jitted JAX gradient-sign
  loop with the standard normalized-space epsilon ball and [0,1] clipping.

Unlike the reference (eager per-batch CUDA loop), evaluation jits ONE
(params, images) -> (top1_hits, top5_hits) program and streams batches
through it; the attack is a ``lax.fori_loop`` inside the same program, so
PGD-5 costs 6 forwards + 5 backwards with no host round trips.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Iterable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Corruption display name -> ImageNet-C folder name (robust_utils.py:1-17).
CORRUPTIONS: Dict[str, str] = {
    "Brightness": "brightness",
    "Contrast": "contrast",
    "Defocus Blur": "defocus_blur",
    "Elastic Transform": "elastic_transform",
    "Fog": "fog",
    "Frost": "frost",
    "Gaussian Noise": "gaussian_noise",
    "Glass Blur": "glass_blur",
    "Impulse Noise": "impulse_noise",
    "JPEG Compression": "jpeg_compression",
    "Motion Blur": "motion_blur",
    "Pixelate": "pixelate",
    "Shot Noise": "shot_noise",
    "Snow": "snow",
    "Zoom Blur": "zoom_blur",
}

# AlexNet top-1 *error rates* on ImageNet-C, the mCE normalizer
# (robust_utils.py:19-38; Hendrycks & Dietterich 2019 protocol constants).
CE_ALEXNET: Dict[str, float] = {
    "Gaussian Noise": 0.886428,
    "Shot Noise": 0.894468,
    "Impulse Noise": 0.922640,
    "Defocus Blur": 0.819880,
    "Glass Blur": 0.826268,
    "Motion Blur": 0.785948,
    "Zoom Blur": 0.798360,
    "Snow": 0.866816,
    "Frost": 0.826572,
    "Fog": 0.819324,
    "Brightness": 0.564592,
    "Contrast": 0.853204,
    "Elastic Transform": 0.646056,
    "Pixelate": 0.717840,
    "JPEG Compression": 0.606500,
}

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def get_mce_from_accuracy(accuracy_pct: float, alexnet_error: float) -> float:
    """Corruption Error = model error / AlexNet error (robust_utils.py:40-45).

    ``accuracy_pct`` in percent; ``alexnet_error`` a fraction from
    :data:`CE_ALEXNET`. Returns CE as a fraction (x100 to print like the
    reference).
    """
    return (100.0 - accuracy_pct) / (alexnet_error * 100.0)


def subset_logit_mask(all_wnids: Sequence[str],
                      subset_wnids: Iterable[str]) -> np.ndarray:
    """Boolean (num_classes,) mask selecting the subset's logits
    (robust.py:72,86: ``[wnid in subset for wnid in all_wnids]``)."""
    subset = set(subset_wnids)
    return np.array([w in subset for w in all_wnids], bool)


def masked_topk_hits(logits, labels, mask: Optional[np.ndarray], k: int = 5):
    """Top-1/top-k hit vectors; with ``mask``, logits are restricted to the
    subset columns and ``labels`` index INTO the subset (ImageFolder class
    order of the subset dataset), matching ``output[:, mask]``
    (robust.py:51)."""
    if mask is not None:
        (cols,) = np.nonzero(mask)
        logits = logits[:, jnp.asarray(cols)]
    k = min(k, logits.shape[-1])
    top = jax.lax.top_k(logits, k)[1]
    hits = top == labels[:, None]
    return hits[:, 0], jnp.any(hits, axis=1)


def fgsm_pgd_attack(apply_fn: Callable, params, images, labels,
                    epsilon: float = 1.0 / 255.0,
                    alpha: Optional[float] = None,
                    max_iters: int = 1, random_init: bool = False,
                    rng: Optional[jax.Array] = None,
                    mean=IMAGENET_MEAN, std=IMAGENET_STD):
    """FGSM (iters=1, no random init) / PGD (iters=5, random init) in
    normalized space, as configured at robust.py:23-38.

    ``images`` are normalized NHWC; the epsilon ball and step are
    ``eps/std`` per channel, and iterates are clipped to the normalized
    image of [0, 1] (upper/lower limits, robust.py:27-29).
    """
    std = jnp.asarray(std, images.dtype)
    mean = jnp.asarray(mean, images.dtype)
    eps = epsilon / std
    step = (alpha if alpha is not None else epsilon) / std
    lower = (0.0 - mean) / std
    upper = (1.0 - mean) / std

    def loss(x):
        logits = apply_fn(params, x)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))

    x0 = images
    if random_init:
        if rng is None:
            rng = jax.random.PRNGKey(0)
        x = x0 + jax.random.uniform(rng, x0.shape, x0.dtype, -1.0, 1.0) * eps
    else:
        x = x0

    def body(_, x):
        g = jax.grad(loss)(x)
        x = x + step * jnp.sign(g)
        x = jnp.clip(x, x0 - eps, x0 + eps)
        return jnp.clip(x, lower, upper)

    return jax.lax.fori_loop(0, max_iters, body, jnp.clip(x, lower, upper))


def _list_imagefolder(root: str) -> Tuple[Sequence[str], Sequence[Tuple[str, int]]]:
    """(sorted class names, [(path, class_idx)...]) — torchvision
    ImageFolder semantics (sorted class dirs, sorted files)."""
    classes = sorted(d for d in os.listdir(root)
                     if os.path.isdir(os.path.join(root, d)))
    samples = []
    for idx, c in enumerate(classes):
        cdir = os.path.join(root, c)
        for f in sorted(os.listdir(cdir)):
            if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp", ".webp")):
                samples.append((os.path.join(cdir, f), idx))
    return classes, samples


def _load_batch(paths, size: int):
    from PIL import Image

    out = np.zeros((len(paths), size, size, 3), np.float32)
    for i, p in enumerate(paths):
        img = Image.open(p).convert("RGB")
        w, h = img.size
        # CenterCrop(size) after the eval resize protocol; corruption sets
        # ship at the right resolution already (robust.py:113 center-crops)
        if min(w, h) < size:
            s = size / min(w, h)
            img = img.resize((max(size, int(round(w * s))),
                              max(size, int(round(h * s)))), Image.BICUBIC)
            w, h = img.size
        x0, y0 = (w - size) // 2, (h - size) // 2
        arr = np.asarray(img.crop((x0, y0, x0 + size, y0 + size)), np.float32)
        out[i] = arr / 255.0
    return (out - IMAGENET_MEAN) / IMAGENET_STD


def evaluate_folder(apply_fn: Callable, params, root: str,
                    batch_size: int = 64, input_size: int = 224,
                    mask: Optional[np.ndarray] = None,
                    adv: Optional[str] = None,
                    label_of_class: Optional[Callable[[str], int]] = None):
    """Accuracy over one ImageFolder tree (robust.py:10-63).

    ``label_of_class``: maps a class-dir name to the label the hits are
    scored against (defaults to the subset-local index, which is correct
    for both plain and masked eval).
    Returns {"acc1": %, "acc5": %, "n": count}.
    """
    classes, samples = _list_imagefolder(root)
    if label_of_class is not None:
        samples = [(p, label_of_class(classes[i])) for p, i in samples]

    @jax.jit
    def hits_fn(params, images, labels):
        if adv in ("FGSM", "PGD"):
            # attack epsilon 1/255; PGD: alpha 0.5/255, 5 iters, random init
            # (robust.py:23-38)
            images = fgsm_pgd_attack(
                apply_fn, params, images, labels,
                epsilon=1.0 / 255.0,
                alpha=(0.5 / 255.0 if adv == "PGD" else 1.0 / 255.0),
                max_iters=5 if adv == "PGD" else 1,
                random_init=adv == "PGD")
        logits = apply_fn(params, images)
        return masked_topk_hits(logits, labels, mask)

    n = h1 = h5 = 0
    for i in range(0, len(samples), batch_size):
        chunk = samples[i:i + batch_size]
        imgs = _load_batch([p for p, _ in chunk], input_size)
        labels = np.array([l for _, l in chunk], np.int32)
        pad = batch_size - len(chunk)  # static batch shape: pad + trim
        if pad:
            imgs = np.concatenate([imgs, np.zeros((pad,) + imgs.shape[1:],
                                                  imgs.dtype)])
            labels = np.concatenate([labels, np.full((pad,), -1, np.int32)])
        t1, t5 = hits_fn(params, jnp.asarray(imgs), jnp.asarray(labels))
        h1 += int(np.sum(np.asarray(t1)[:len(chunk)]))
        h5 += int(np.sum(np.asarray(t5)[:len(chunk)]))
        n += len(chunk)
    return {"acc1": 100.0 * h1 / max(n, 1), "acc5": 100.0 * h5 / max(n, 1),
            "n": n}


def imagenet_c_eval(apply_fn: Callable, params, inc_path: str,
                    batch_size: int = 64, input_size: int = 224,
                    severities: Sequence[int] = (1, 2, 3, 4, 5),
                    corruptions: Optional[Dict[str, str]] = None,
                    log: Callable[[str], None] = print):
    """Full ImageNet-C protocol (robust.py:108-147): per-(corruption,
    severity) accuracy, per-corruption mean acc + CE, overall acc + mCE.

    Returns {"per_severity": {...}, "per_corruption": {name: {"acc1", "ce"}},
    "acc1": overall mean, "mce": mean CE (fraction)}.
    """
    corruptions = corruptions or CORRUPTIONS
    per_sev, per_cor = {}, {}
    mce = overall = 0.0
    for name, folder in corruptions.items():
        acc = 0.0
        for s in severities:
            stats = evaluate_folder(apply_fn, params,
                                    os.path.join(inc_path, folder, str(s)),
                                    batch_size, input_size)
            per_sev[f"{name}({s})"] = stats["acc1"]
            log(f"Accuracy on the {name}({s}): {stats['acc1']:.1f}%")
            acc += stats["acc1"]
        acc /= len(severities)
        ce = get_mce_from_accuracy(acc, CE_ALEXNET[name])
        per_cor[name] = {"acc1": acc, "ce": ce}
        log(f"{name}: Top1 accuracy {acc:.2f}, CE: {100.0 * ce:.2f}")
        mce += ce
        overall += acc
    k = len(corruptions)
    log(f"Corruption Top1 accuracy {overall / k:.2f}, mCE: {100.0 * mce / k:.2f}")
    return {"per_severity": per_sev, "per_corruption": per_cor,
            "acc1": overall / k, "mce": mce / k}
