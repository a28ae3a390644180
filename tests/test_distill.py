"""Offline distillation runtime: losses, freeze masks, export."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_feature_distill_loss_matches_torch(rng):
    import jax.numpy as jnp
    import torch.nn.functional as F

    from image_restoration_tpu.train.distill import feature_distill_loss

    s = rng.standard_normal((4, 16)).astype(np.float32)
    t = rng.standard_normal((4, 16)).astype(np.float32)
    st, tt = torch.from_numpy(s), torch.from_numpy(t)
    fn = F.normalize(st, dim=1)
    tn = F.normalize(tt, dim=1)
    ref_cos = float(1 - torch.mean(torch.sum(fn * tn, dim=1))) * 0.7
    ref_l2 = float(F.mse_loss(fn, tn)) * 1.3
    total, logs = feature_distill_loss(jnp.asarray(s), jnp.asarray(t),
                                       cos_weight=0.7, l2_weight=1.3)
    np.testing.assert_allclose(float(total), ref_cos + ref_l2, rtol=1e-5)
    np.testing.assert_allclose(float(logs["distill_cos_loss"]), ref_cos, rtol=1e-5)


def test_freeze_mask_and_optimizer():
    import jax
    import jax.numpy as jnp
    import optax

    from image_restoration_tpu.train.distill import freeze_mask, frozen_optimizer

    params = {
        "stem": {"w": jnp.ones((2, 2))},
        "layer1": {"w": jnp.ones((2,))},
        "head": {"fc": {"w": jnp.ones((3,))}},
    }
    mask = freeze_mask(params, "freeze_all_except_last_layers")
    assert mask["head"]["fc"]["w"] and not mask["stem"]["w"]
    mask2 = freeze_mask(params, "freeze_layers", frozen_layers=("layer1",))
    assert mask2["stem"]["w"] and not mask2["layer1"]["w"]
    mask3 = freeze_mask(params, "freeze_ratio", freeze_ratio=0.67)
    # sorted top-level: head, layer1, stem -> first 2 frozen
    assert not mask3["head"]["fc"]["w"] and mask3["stem"]["w"]

    tx = frozen_optimizer(optax.sgd(0.1), mask)
    grads = jax.tree.map(jnp.ones_like, params)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.sum(jnp.abs(updates["stem"]["w"]))) == 0.0
    assert float(jnp.sum(jnp.abs(updates["head"]["fc"]["w"]))) > 0.0


def test_stablehlo_export_roundtrip(tmp_path):
    import jax.numpy as jnp

    from image_restoration_tpu.train.distill import (
        export_stablehlo,
        load_stablehlo,
    )

    f = lambda x: jnp.tanh(x) * 2.0
    x = jnp.ones((2, 3))
    blob = export_stablehlo(f, (x,), path=str(tmp_path / "m.shlo"))
    g = load_stablehlo(blob)
    np.testing.assert_allclose(np.asarray(g(x)), np.asarray(f(x)), rtol=1e-6)
