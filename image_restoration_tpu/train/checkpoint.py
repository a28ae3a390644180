"""Checkpointing: orbax for native state, plus reference-format behaviors.

Reproduced behaviors (SURVEY.md §5 checkpoint/resume):
* save-last + periodic every N (Lightning ModelCheckpoint semantics,
  MoCE-IR-main/src/train.py:116)
* save-best-by-val-PSNR (NeRD-Rain train.py:190-196 et al.)
* auto-resume: scan the checkpoint dir for the max step
  (BasicSR settingI/basicsr/train.py:180-201)
* EMA stored alongside raw params (BasicSR params/params_ema)
* import of torch checkpoints handled by utils/torch_import.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int | None = None,
                 save_every: int = 1000):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.save_every = save_every
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True, enable_async_checkpointing=False
            ),
        )
        self.best_psnr = -np.inf

    def save(self, step: int, state, metrics: dict | None = None, force: bool = False):
        if not force and self.save_every and step % self.save_every:
            return False
        self._mgr.save(step, args=ocp.args.StandardSave(state), metrics=metrics or {})
        self._mgr.wait_until_finished()
        return True

    def maybe_save_best(self, step: int, state, psnr: float):
        """save-best-by-val-PSNR: keeps a 'best' pointer file + checkpoint."""
        if psnr > self.best_psnr:
            self.best_psnr = float(psnr)
            self.save(step, state, metrics={"psnr": float(psnr)}, force=True)
            with open(os.path.join(self.directory, "best"), "w") as f:
                f.write(f"{step} {psnr:.4f}\n")
            return True
        return False

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, state_template, step: int | None = None):
        """Auto-resume from the newest step (BasicSR .state scan analog)."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return None, None
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(state_template))
        return restored, step

    def restore_raw(self, step: int | None = None):
        """Restore as a raw nested dict (no template needed) — for eval-time
        param loading where the optimizer structure is unknown.

        Restores onto the host CPU: per-array device_put through a remote
        TPU tunnel costs a full RTT each, so materialize on host and let the
        first jitted call ship everything in one program."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return None, None
        cpu = [d for d in jax.devices("cpu")] or jax.devices()
        with jax.default_device(cpu[0]):
            restored = self._mgr.restore(step, args=ocp.args.StandardRestore())
        return jax.tree.map(np.asarray, restored), step


def save_params_npz(path: str, params: Any):
    """Flat .npz export (portable, torch-free) of a params pytree."""
    flat = {}

    def walk(tree, prefix=""):
        for k, v in tree.items():
            p = f"{prefix}{k}" if not prefix else f"{prefix}.{k}"
            if isinstance(v, dict):
                walk(v, p)
            else:
                flat[p] = np.asarray(v)

    walk(params)
    np.savez(path, **flat)


def load_params_npz(path: str, template: Any):
    data = np.load(path)

    def build(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            p = f"{prefix}{k}" if not prefix else f"{prefix}.{k}"
            if isinstance(v, dict):
                out[k] = build(v, p)
            else:
                arr = data[p]
                assert arr.shape == v.shape, f"{p}: {arr.shape} vs {v.shape}"
                out[k] = jax.numpy.asarray(arr, v.dtype)
        return out

    return build(template)
