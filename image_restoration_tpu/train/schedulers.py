"""Learning-rate schedules as pure step->lr functions (optax-compatible).

Reproduces the zoo's scheduler inventory (SURVEY.md §2.3 LR schedulers):
LinearWarmupCosineAnnealingLR (MoCE-IR schedulers.py:239+),
CosineAnnealingRestart(Cyclic)LR (schedulers.py:140-236, HOGformer's config),
MultiStepRestartLR (:11-51), LinearLR (:53-74), VibrateLR (:76-117),
GradualWarmupScheduler (NeRD-Rain warmup_scheduler/scheduler.py:5-38),
MultiStepLR / CosineAnnealingLR (torch built-ins used by SRConvNet/DarkIR).

All are closed-form in the step index: jit-safe, resume-safe (no hidden
state), and usable directly as the ``learning_rate`` of any optax optimizer.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp
import numpy as np


def linear_warmup_cosine(base_lr: float, warmup_steps: int, max_steps: int,
                         warmup_start_lr: float = 0.0, eta_min: float = 0.0):
    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_start_lr + (base_lr - warmup_start_lr) * jnp.maximum(step, 0) / max(
            warmup_steps, 1
        )
        t = (step - warmup_steps) / max(max_steps - warmup_steps, 1)
        cos = eta_min + 0.5 * (base_lr - eta_min) * (1 + jnp.cos(jnp.pi * t))
        return jnp.where(step < warmup_steps, warm, cos)

    return sched


def cosine_annealing(base_lr: float, t_max: int, eta_min: float = 0.0):
    def sched(step):
        t = jnp.asarray(step, jnp.float32) / t_max
        return eta_min + 0.5 * (base_lr - eta_min) * (1 + jnp.cos(jnp.pi * t))

    return sched


def cosine_annealing_restart_cyclic(
    base_lr: float,
    periods: Sequence[int],
    restart_weights: Sequence[float] = (1.0,),
    eta_mins: Sequence[float] = (0.0,),
):
    """HOGformer recipe: e.g. periods [92k, 208k], weights [1, 1],
    eta_mins [3e-4, 1e-6] (Allweather_HOGformer.yml)."""
    cum = np.cumsum(periods)
    starts = np.concatenate([[0], cum[:-1]])

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        # index of the current cycle: right-closest (iteration <= cumsum)
        idx = jnp.sum(step > jnp.asarray(cum, jnp.float32) - 0.5).astype(jnp.int32)
        idx = jnp.clip(idx, 0, len(periods) - 1)
        w = jnp.asarray(restart_weights, jnp.float32)[idx]
        emin = jnp.asarray(eta_mins, jnp.float32)[idx]
        start = jnp.asarray(starts, jnp.float32)[idx]
        period = jnp.asarray(periods, jnp.float32)[idx]
        return emin + w * 0.5 * (base_lr - emin) * (
            1 + jnp.cos(jnp.pi * (step - start) / period)
        )

    return sched


def cosine_annealing_restart(base_lr, periods, restart_weights=(1.0,), eta_min=0.0):
    return cosine_annealing_restart_cyclic(
        base_lr, periods, restart_weights, tuple(eta_min for _ in periods)
    )


def multistep(base_lr: float, milestones: Sequence[int], gamma: float = 0.1):
    ms = np.asarray(sorted(milestones), np.float32)

    def sched(step):
        n = jnp.sum(jnp.asarray(step, jnp.float32) >= ms)
        return base_lr * gamma**n

    return sched


def multistep_restart(base_lr, milestones, gamma=0.1, restarts=(0,), restart_weights=(1.0,)):
    """MultiStepRestartLR: gamma decays at milestones; lr resets to
    base*weight at restart iterations."""
    rs = np.asarray(restarts, np.float32)
    rw = np.asarray(restart_weights, np.float32)
    ms = np.asarray(sorted(milestones), np.float32)

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        # weight of the most recent restart at or before step
        ridx = jnp.clip(jnp.sum(step >= rs) - 1, 0, len(restarts) - 1)
        last_restart = jnp.asarray(rs)[ridx]
        w = jnp.asarray(rw)[ridx]
        n = jnp.sum((ms > last_restart) & (step >= ms))
        return base_lr * w * gamma**n

    return sched


def linear_decay(base_lr: float, total_steps: int):
    def sched(step):
        return base_lr * (1.0 - jnp.asarray(step, jnp.float32) / total_steps)

    return sched


def vibrate(base_lr: float, total_steps: int):
    """VibrateLR (schedulers.py:76-117): triangle wave of period
    total/80 under a piecewise-linear decaying envelope."""
    T = max(total_steps // 80, 2)
    Th = T // 2

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        process = step / total_steps
        f = jnp.where(process < 3 / 8, 1 - process * 8 / 3,
                      jnp.where(process < 5 / 8, 0.2, 0.1))
        t = jnp.mod(step, T)
        f2 = t / Th
        f2 = jnp.where(t >= Th, 2 - f2, f2)
        w = f * f2
        w = jnp.where(step < Th, jnp.maximum(w, 0.1), w)
        return base_lr * w

    return sched


def gradual_warmup(base_lr: float, multiplier: float, warmup_steps: int,
                   after: "callable | None" = None):
    """GradualWarmupScheduler: lr ramps base->base*multiplier over warmup,
    then hands off to ``after`` (stepped from 0)."""

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * ((multiplier - 1) * jnp.minimum(step, warmup_steps) / warmup_steps + 1)
        if after is None:
            return warm
        return jnp.where(step < warmup_steps, warm, after(step - warmup_steps))

    return sched


SCHEDULES = {
    "linear_warmup_cosine": linear_warmup_cosine,
    "cosine": cosine_annealing,
    "cosine_restart": cosine_annealing_restart,
    "cosine_restart_cyclic": cosine_annealing_restart_cyclic,
    "multistep": multistep,
    "multistep_restart": multistep_restart,
    "linear": linear_decay,
    "vibrate": vibrate,
    "gradual_warmup": gradual_warmup,
    "constant": lambda base_lr: (lambda step: jnp.asarray(base_lr, jnp.float32)),
}


def cosine_loss_weight(step: int, total_steps: int, target_weight: float) -> float:
    """Inverted-cosine loss-weight ramp 0 -> target
    (IGMoCE-IR-main/src/utils/weight_schedule.py:get_cosine_weight)."""
    import math

    return (1 - math.cos(math.pi * (step / total_steps))) / 2 * target_weight
