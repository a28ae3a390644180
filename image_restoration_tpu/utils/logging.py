"""Observability: message logger, meters, timers, param/FLOPs counters.

Replaces the zoo's scattered loggers (BasicSR MessageLogger, W&B/TB Lightning
loggers, tee stdout logs at 20260104_CG_IR/src/train.py:25-35, fvcore/ptflops
FLOPs prints, NeRD get_parameter_number.py, remaining-time estimator
SRConvNet custom/caltime.py). TPU-native profiling: `jax.profiler` trace
context + XLA cost analysis in place of CUDA-synchronized timers."""

from __future__ import annotations

import contextlib
import json
import os
import sys
import time
from typing import Any

import jax
import numpy as np


class TeeLogger:
    """Mirror stdout to a log file (CG-IR train.py:25-35 behavior)."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.file = open(path, "a")
        self.stdout = sys.stdout

    def write(self, msg):
        self.stdout.write(msg)
        self.file.write(msg)

    def flush(self):
        self.stdout.flush()
        self.file.flush()

    def install(self):
        sys.stdout = self
        return self


class AverageMeter:
    def __init__(self):
        self.sum = 0.0
        self.n = 0

    def update(self, v, k: int = 1):
        self.sum += float(v) * k
        self.n += k

    @property
    def avg(self):
        return self.sum / max(self.n, 1)


class Timer:
    """Wall-clock timer + ETA estimator (caltime.py / val_utils.timer analog)."""

    def __init__(self, total_steps: int | None = None):
        self.t0 = time.perf_counter()
        self.total = total_steps
        self.last = self.t0

    def tick(self) -> float:
        now = time.perf_counter()
        dt = now - self.last
        self.last = now
        return dt

    def eta(self, step: int) -> float:
        if not self.total or step == 0:
            return float("nan")
        elapsed = time.perf_counter() - self.t0
        return elapsed / step * (self.total - step)


def count_params(params) -> int:
    """NeRD-Rain get_parameter_number.py analog on a pytree."""
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def cost_analysis(fn, *args) -> dict:
    """XLA cost analysis: FLOPs + bytes accessed of the compiled program —
    the fvcore FlopCountAnalysis / ptflops replacement (moce_ir.py:1086-1088)."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return {"flops": ca.get("flops", float("nan")),
                "bytes_accessed": ca.get("bytes accessed", float("nan"))}
    except Exception:
        return {}


@contextlib.contextmanager
def profile_trace(logdir: str):
    """jax.profiler trace context: the torch.profiler/nvprof replacement."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class MessageLogger:
    """Console/JSONL logger (BasicSR MessageLogger analog); optional TB/W&B
    sinks are attached only if available and requested."""

    def __init__(self, exp_dir: str, total_steps: int | None = None,
                 use_tb: bool = False, use_wandb: bool = False):
        os.makedirs(exp_dir, exist_ok=True)
        self.jsonl = open(os.path.join(exp_dir, "metrics.jsonl"), "a")
        self.timer = Timer(total_steps)
        self.tb = None
        self.wandb = None
        if use_tb:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(os.path.join(exp_dir, "tb"))
            except ImportError:
                pass
        if use_wandb:
            try:
                import wandb

                self.wandb = wandb
            except ImportError:
                pass

    def log(self, step: int, scalars: dict[str, Any], prefix: str = "train"):
        rec = {"step": step, **{f"{prefix}/{k}": float(v) for k, v in scalars.items()}}
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()
        if self.tb:
            for k, v in scalars.items():
                self.tb.add_scalar(f"{prefix}/{k}", float(v), step)
        if self.wandb and getattr(self.wandb, "run", None):
            self.wandb.log(rec, step=step)
        eta = self.timer.eta(step)
        msg = " ".join(f"{k}={float(v):.4g}" for k, v in scalars.items())
        print(f"[{prefix}] step {step} {msg} eta={eta/60:.1f}min" if eta == eta
              else f"[{prefix}] step {step} {msg}")


def model_summary(params, max_depth: int = 2) -> str:
    """Per-module parameter table (MoCE-IR-main/src/utils/model_summary.py
    and NeRD-Rain get_parameter_number.py analog): aggregates leaf sizes up
    to ``max_depth`` module levels and prints counts + MB."""
    import numpy as np

    rows = {}

    def visit(tree, path):
        if isinstance(tree, dict):
            for k, v in tree.items():
                visit(v, path + (k,))
        else:
            key = "/".join(path[:max_depth])
            n = int(np.prod(tree.shape)) if hasattr(tree, "shape") else 1
            rows[key] = rows.get(key, 0) + n

    visit(params, ())
    total = sum(rows.values())
    width = max((len(k) for k in rows), default=10)
    lines = [f"{'module':<{width}}  {'params':>12}  {'MB(fp32)':>9}"]
    for k in sorted(rows):
        lines.append(f"{k:<{width}}  {rows[k]:>12,}  {rows[k]*4/1e6:>9.2f}")
    lines.append(f"{'TOTAL':<{width}}  {total:>12,}  {total*4/1e6:>9.2f}")
    return "\n".join(lines)


class CloudLog:
    """Fire-and-forget HTTP log sender (SRConvNet custom/serverLog.py:10-36
    LogClass analog, gated by the train CLI's --cloudlog flag).

    Posts `name`/`content` as URL-quoted query params to `url` from a single
    daemon worker draining a bounded queue (a slow endpoint can neither pile
    up threads nor serialize the training loop; overflow drops the oldest
    pending entry). Network failures are swallowed (the reference prints and
    continues). Off (or an empty url) makes sendLog a no-op — the default in
    this zero-egress environment.
    """

    def __init__(self, on: bool = False, url: str = "", timeout: float = 5.0,
                 max_pending: int = 64):
        self.on = on and bool(url)
        self.url = url
        self.timeout = timeout
        self._q = None
        if self.on:
            import queue
            import threading

            self._q = queue.Queue(maxsize=max_pending)
            threading.Thread(target=self._worker, daemon=True).start()

    def _worker(self) -> None:
        from urllib.parse import quote
        from urllib.request import urlopen

        while True:
            content, name = self._q.get()
            try:
                sep = "&" if "?" in self.url else "?"
                full = (f"{self.url}{sep}name={quote(name, 'utf-8')}"
                        f"&content={quote(content, 'utf-8')}")
                urlopen(full, timeout=self.timeout).read()
            except Exception:
                print("\nsendLog network error!")

    def sendLog(self, content: str, name: str) -> None:
        if not self.on:
            return
        import queue

        try:
            self._q.put_nowait((content, name))
        except queue.Full:  # drop the oldest, keep the newest
            try:
                self._q.get_nowait()
            except queue.Empty:
                pass
            try:
                self._q.put_nowait((content, name))
            except queue.Full:
                pass
