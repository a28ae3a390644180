"""Classification training engine — the LSNet/DeiT harness, TPU-native.

Reference: 20251113_lsnet_xy/main.py (timm/DeiT engine): label-smoothing or
soft-target cross entropy (:332-340), Mixup/CutMix batch augmentation
(:268-271), model EMA (:310), grad clipping, top-1/top-5 accuracy eval.
The distillation wrapper (:361-365) pairs with train/distill.py.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def cross_entropy(logits, labels, smoothing: float = 0.0):
    """Label-smoothing CE over int labels, or soft-target CE when ``labels``
    is 2D (the Mixup path)."""
    n = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    if labels.ndim == 1:
        onehot = jax.nn.one_hot(labels, n)
        if smoothing:
            onehot = onehot * (1 - smoothing) + smoothing / n
        labels = onehot
    return -jnp.mean(jnp.sum(labels * logp, axis=-1))


def accuracy(logits, labels, topk: Tuple[int, ...] = (1, 5)):
    """timm-style top-k accuracies (fractions)."""
    k = max(topk)
    top = jnp.argsort(logits, axis=-1)[:, ::-1][:, :k]
    hits = top == labels[:, None]
    return tuple(float(jnp.mean(jnp.any(hits[:, :t], axis=1))) for t in topk)


def mixup_cutmix(rng: np.random.Generator, images: np.ndarray,
                 labels: np.ndarray, num_classes: int,
                 mixup_alpha: float = 0.8, cutmix_alpha: float = 1.0,
                 prob: float = 1.0, switch_prob: float = 0.5,
                 smoothing: float = 0.1):
    """timm Mixup (host-side): returns images and SOFT labels."""
    onehot = np.eye(num_classes, dtype=np.float32)[labels]
    if smoothing:
        onehot = onehot * (1 - smoothing) + smoothing / num_classes
    if rng.random() >= prob:
        return images, onehot
    perm = rng.permutation(images.shape[0])
    use_cutmix = cutmix_alpha > 0 and rng.random() < switch_prob
    if use_cutmix:
        lam = rng.beta(cutmix_alpha, cutmix_alpha)
        h, w = images.shape[1:3]
        rh, rw = int(h * np.sqrt(1 - lam)), int(w * np.sqrt(1 - lam))
        cy, cx = rng.integers(0, h), rng.integers(0, w)
        y0, y1 = np.clip(cy - rh // 2, 0, h), np.clip(cy + rh // 2, 0, h)
        x0, x1 = np.clip(cx - rw // 2, 0, w), np.clip(cx + rw // 2, 0, w)
        images = images.copy()
        images[:, y0:y1, x0:x1] = images[perm][:, y0:y1, x0:x1]
        lam = 1 - (y1 - y0) * (x1 - x0) / (h * w)
    else:
        lam = rng.beta(mixup_alpha, mixup_alpha) if mixup_alpha > 0 else 1.0
        images = lam * images + (1 - lam) * images[perm]
    soft = lam * onehot + (1 - lam) * onehot[perm]
    return images.astype(np.float32), soft.astype(np.float32)


def make_cls_train_step(model, tx: optax.GradientTransformation,
                        smoothing: float = 0.1,
                        ema_decay: Optional[float] = None):
    """Returns jitted (state, batch) -> (state, logs) for
    batch = {'image': NHWC, 'label': int or soft (B, n_classes)}."""
    from image_restoration_tpu.train.trainer import TrainState

    def step(state: TrainState, batch):
        def loss_fn(params):
            logits = model.apply({"params": params}, batch["image"])
            return cross_entropy(logits, batch["label"], smoothing)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None and ema_decay:
            ema = jax.tree.map(lambda e, p: ema_decay * e + (1 - ema_decay) * p,
                               ema, params)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state, ema_params=ema), {"loss": loss}

    return jax.jit(step, donate_argnums=(0,))
