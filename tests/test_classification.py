"""Classification engine: losses, accuracy, mixup, train step."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_cross_entropy_matches_torch(rng):
    import jax.numpy as jnp
    import torch.nn.functional as F

    from image_restoration_tpu.train.classification import cross_entropy

    logits = rng.standard_normal((8, 10)).astype(np.float32)
    labels = rng.integers(0, 10, 8)
    ref = float(F.cross_entropy(torch.from_numpy(logits),
                                torch.from_numpy(labels), label_smoothing=0.1))
    got = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels), 0.1))
    np.testing.assert_allclose(got, ref, rtol=1e-5)
    # soft targets
    soft = rng.random((8, 10)).astype(np.float32)
    soft /= soft.sum(1, keepdims=True)
    ref_s = float(torch.sum(-torch.from_numpy(soft)
                            * F.log_softmax(torch.from_numpy(logits), -1),
                            dim=-1).mean())
    got_s = float(cross_entropy(jnp.asarray(logits), jnp.asarray(soft)))
    np.testing.assert_allclose(got_s, ref_s, rtol=1e-5)


def test_accuracy_and_mixup(rng):
    import jax.numpy as jnp

    from image_restoration_tpu.train.classification import accuracy, mixup_cutmix

    logits = np.zeros((4, 5), np.float32)
    logits[np.arange(4), [0, 1, 2, 3]] = 5.0
    labels = np.array([0, 1, 2, 0])
    top1, top5 = accuracy(jnp.asarray(logits), jnp.asarray(labels))
    assert abs(top1 - 0.75) < 1e-6 and top5 == 1.0

    g = np.random.default_rng(0)
    imgs = g.random((4, 8, 8, 3)).astype(np.float32)
    lab = np.array([0, 1, 2, 3])
    mi, ml = mixup_cutmix(g, imgs, lab, num_classes=5)
    assert mi.shape == imgs.shape and ml.shape == (4, 5)
    np.testing.assert_allclose(ml.sum(1), 1.0, rtol=1e-5)


def test_cls_train_step(rng):
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import optax

    from image_restoration_tpu.train.classification import make_cls_train_step
    from image_restoration_tpu.train.trainer import TrainState

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = jnp.mean(x, axis=(1, 2))
            return nn.Dense(5)(x)

    model = Tiny()
    x = jnp.asarray(rng.random((4, 8, 8, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    tx = optax.adamw(1e-2)
    state = TrainState.create(params, tx, ema_decay=0.9)
    step = make_cls_train_step(model, tx, ema_decay=0.9)
    batch = {"image": x, "label": jnp.asarray(np.array([0, 1, 2, 3]))}
    l0 = None
    for _ in range(5):
        state, logs = step(state, batch)
        l0 = l0 or float(logs["loss"])
    assert float(logs["loss"]) < l0
