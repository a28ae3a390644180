"""Classification robustness protocol (LSNet robust.py / robust_utils.py)."""

import os

import numpy as np
import pytest

from PIL import Image


def _write_folder_tree(root, rng, classes=("n01", "n02"), n=2, size=32):
    for c in classes:
        for i in range(n):
            os.makedirs(os.path.join(root, c), exist_ok=True)
            arr = rng.integers(0, 255, (size, size, 3)).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(root, c, f"{i}.png"))


def test_mce_math():
    from image_restoration_tpu.eval.robustness import (CE_ALEXNET,
                                                       get_mce_from_accuracy)

    # 100% accuracy -> zero CE; AlexNet-level error -> CE == 1
    assert get_mce_from_accuracy(100.0, CE_ALEXNET["Fog"]) == 0.0
    alex_err = CE_ALEXNET["Gaussian Noise"]
    np.testing.assert_allclose(
        get_mce_from_accuracy(100.0 - 100.0 * alex_err, alex_err), 1.0)
    assert len(CE_ALEXNET) == 15


def test_subset_logit_mask_and_hits():
    import jax.numpy as jnp

    from image_restoration_tpu.eval.robustness import (masked_topk_hits,
                                                       subset_logit_mask)

    all_wnids = ["a", "b", "c", "d"]
    mask = subset_logit_mask(all_wnids, ["b", "d"])
    np.testing.assert_array_equal(mask, [False, True, False, True])
    # logits over 4 classes; labels index INTO the 2-class subset
    logits = jnp.array([[0.0, 9.0, 99.0, 1.0],   # subset cols (b,d) -> argmax b
                        [0.0, 1.0, 0.0, 9.0]])   # -> argmax d
    t1, _ = masked_topk_hits(logits, jnp.array([0, 1]), mask)
    np.testing.assert_array_equal(np.asarray(t1), [True, True])


def test_fgsm_pgd_ball_and_loss(rng):
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.eval.robustness import (IMAGENET_STD,
                                                       fgsm_pgd_attack)

    w = jnp.asarray(rng.standard_normal((3, 5)), jnp.float32)

    def apply_fn(params, x):  # mean-pool channels -> linear logits
        return jnp.mean(x, axis=(1, 2)) @ params

    x = jnp.asarray(rng.standard_normal((4, 8, 8, 3)) * 0.1, jnp.float32)
    y = jnp.asarray(rng.integers(0, 5, (4,)), jnp.int32)
    for adv, iters, init in (("FGSM", 1, False), ("PGD", 5, True)):
        adv_x = fgsm_pgd_attack(apply_fn, w, x, y, epsilon=1 / 255.0,
                                alpha=0.5 / 255.0, max_iters=iters,
                                random_init=init)
        delta = np.abs(np.asarray(adv_x - x))
        ball = (1 / 255.0) / np.asarray(IMAGENET_STD)
        assert (delta <= ball[None, None, None] + 1e-6).all(), adv
    # FGSM ascends the loss of a linear model by construction

    def loss(x):
        lp = jax.nn.log_softmax(apply_fn(w, x))
        return -float(jnp.mean(jnp.take_along_axis(lp, y[:, None], 1)))

    adv_x = fgsm_pgd_attack(apply_fn, w, x, y, epsilon=1 / 255.0, max_iters=1)
    assert loss(adv_x) > loss(x)


def test_imagenet_c_protocol(tmp_path, rng):
    import jax.numpy as jnp

    from image_restoration_tpu.eval.robustness import (evaluate_folder,
                                                       imagenet_c_eval)

    inc = str(tmp_path / "inc")
    sub = {"Brightness": "brightness", "Contrast": "contrast"}
    for folder in sub.values():
        for sev in (1, 2):
            _write_folder_tree(os.path.join(inc, folder, str(sev)), rng)

    w = jnp.asarray(rng.standard_normal((3, 2)), jnp.float32)

    def apply_fn(params, x):
        return jnp.mean(x, axis=(1, 2)) @ params

    logs = []
    out = imagenet_c_eval(apply_fn, w, inc, batch_size=3, input_size=32,
                          severities=(1, 2), corruptions=sub,
                          log=logs.append)
    assert set(out["per_corruption"]) == set(sub)
    assert 0.0 <= out["acc1"] <= 100.0 and out["mce"] >= 0.0
    for name in sub:
        accs = [out["per_severity"][f"{name}({s})"] for s in (1, 2)]
        np.testing.assert_allclose(out["per_corruption"][name]["acc1"],
                                   np.mean(accs))
    assert any("mCE" in l for l in logs)
    # adversarial path end-to-end (batch padding + attack inside jit)
    stats = evaluate_folder(apply_fn, w, os.path.join(inc, "contrast", "1"),
                            batch_size=3, input_size=32, adv="PGD")
    assert stats["n"] == 4 and 0.0 <= stats["acc1"] <= 100.0


def test_robust_cli_smoke(tmp_path, rng):
    """End-to-end CLI: ImageNet-A masked eval with random LSNet weights."""
    from image_restoration_tpu.cli import robust as robust_cli
    from image_restoration_tpu.eval.robust_subsets import (IMAGENET_A_WNIDS,
                                                           IMAGENET_R_WNIDS)

    assert len(IMAGENET_A_WNIDS) == 200 and len(IMAGENET_R_WNIDS) == 200
    ina = str(tmp_path / "ina")
    _write_folder_tree(ina, rng, classes=IMAGENET_A_WNIDS[:2], n=1, size=64)
    out_json = str(tmp_path / "r.json")
    res = robust_cli.main([
        "--model", "lsnet", "--ina_path", ina, "--input_size", "64",
        "--batch_size", "2", "--out_json", out_json,
        "--set", "model_kwargs.img_size=64",
        "--set", "model_kwargs.embed_dim=(16,16,16,16)",
        "--set", "model_kwargs.depth=(1,1,1,1)",
    ])
    assert "imagenet_a" in res and res["imagenet_a"]["n"] == 2
    assert os.path.exists(out_json)
