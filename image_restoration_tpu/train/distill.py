"""Offline feature-distillation runtime, TPU-native.

Reference: ``20260202_Offline_distill/`` — teacher->student feature
distillation for classification backbones:

* loss (train.py:173-186): both features L2-normalized; cosine term
  ``1 - mean(sum(f_s * f_t))`` plus an MSE term on the normalized features,
  each with a config weight.
* freeze strategies (freeze_strategy.py): freeze named layer groups /
  everything except the last layers / a ratio of leading layers. In optax
  terms a freeze is a ``masked`` zero-update transform over param subtrees —
  no requires_grad mutation needed.
* export (pth2onnx.py): the deployment hand-off. The TPU-world analog is
  ``jax.export`` StableHLO serialization, provided by ``export_stablehlo``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Sequence

import jax
import jax.numpy as jnp
import optax


def feature_distill_loss(student_feat, teacher_feat, cos_weight: float = 1.0,
                         l2_weight: float = 1.0, eps: float = 1e-12):
    """train.py:173-186: cosine + MSE on L2-normalized feature vectors.
    Returns (total, logs)."""
    f = student_feat / jnp.maximum(
        jnp.linalg.norm(student_feat, axis=1, keepdims=True), eps)
    t = teacher_feat / jnp.maximum(
        jnp.linalg.norm(teacher_feat, axis=1, keepdims=True), eps)
    cos = (1.0 - jnp.mean(jnp.sum(f * t, axis=1))) * cos_weight
    l2 = jnp.mean((f - t) ** 2) * l2_weight
    return cos + l2, {"distill_cos_loss": cos, "distill_l2_loss": l2}


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def freeze_mask(params, strategy: str = "freeze_all_except_last_layers",
                frozen_layers: Sequence[str] = (),
                freeze_ratio: float = 0.8,
                last_layers: Sequence[str] = ("head", "fc")) -> Any:
    """Boolean pytree: True = trainable (freeze_strategy.py strategies).

    * 'freeze_layers': freeze any param whose path contains one of
      ``frozen_layers``.
    * 'freeze_all_except_last_layers': only paths containing one of
      ``last_layers`` train.
    * 'freeze_ratio': the first ``ratio`` fraction of the top-level modules
      (in tree order) freeze.
    """
    if strategy == "freeze_layers":
        return jax.tree_util.tree_map_with_path(
            lambda p, _: not any(f in _path_str(p) for f in frozen_layers),
            params)
    if strategy == "freeze_all_except_last_layers":
        return jax.tree_util.tree_map_with_path(
            lambda p, _: any(t in _path_str(p) for t in last_layers), params)
    if strategy == "freeze_ratio":
        top = sorted(params.keys())
        n_frozen = int(len(top) * freeze_ratio)
        frozen = set(top[:n_frozen])
        return jax.tree_util.tree_map_with_path(
            lambda p, _: str(getattr(p[0], "key", p[0])) not in frozen, params)
    raise ValueError(f"unknown freeze strategy {strategy!r}")


def frozen_optimizer(tx: optax.GradientTransformation, mask) -> optax.GradientTransformation:
    """Wrap an optimizer so masked-out (False) params receive zero updates —
    the optax equivalent of requires_grad=False + param groups."""
    return optax.multi_transform(
        {"train": tx, "frozen": optax.set_to_zero()},
        jax.tree.map(lambda t: "train" if t else "frozen", mask))


def export_stablehlo(apply_fn: Callable, args, path: str | None = None) -> bytes:
    """Serialize a jitted forward to portable StableHLO bytes
    (the pth2onnx.py deployment analog)."""
    from jax import export as jexport

    exp = jexport.export(jax.jit(apply_fn))(*args)
    blob = exp.serialize()
    if path is not None:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load_stablehlo(blob: bytes):
    """Deserialize and return a callable running the exported function."""
    from jax import export as jexport

    exp = jexport.deserialize(blob)
    return lambda *args: exp.call(*args)
