"""Multi-host bootstrap — the launcher layer.

The reference zoo launches multi-process training through three wrappers
(SURVEY.md §2.5 Launchers): SLURM env-var bootstrap
(HOGformer-main/settingI/basicsr/utils/dist_util.py:28-58), torch.distributed
RANK/WORLD_SIZE (:21-25), and mp.spawn (DarkIR-main/testing.py:81-83), all
initializing NCCL process groups. TPU-native there is ONE pattern: run the
same binary once per host and call ``jax.distributed.initialize()`` before
first backend use; JAX then exposes the global device set and
``jax.process_index()/process_count()`` (the RANK/WORLD_SIZE analog the data
pipeline already consumes, data/pipeline.py Loader).

This environment has a single host, so multi-host cannot be exercised here;
the entry point is env/flag-guarded and a no-op by default — launcher
``none`` mode, settingI/basicsr/train.py:40-42.
"""

from __future__ import annotations

import os

_initialized = False


def maybe_initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize ``jax.distributed`` when multi-host is requested.

    Trigger order (first match wins):
    1. explicit args (the torchrun-style launcher),
    2. ``IR_TPU_COORDINATOR`` / ``IR_TPU_NUM_PROCESSES`` / ``IR_TPU_PROCESS_ID``
       env vars (the SLURM-style launcher — point them at srun env vars),
    3. ``IR_TPU_MULTIHOST=1`` with no addresses: bare
       ``jax.distributed.initialize()`` using Cloud-TPU metadata
       auto-detection (the standard pod launch).

    Returns True if initialization happened (or had already happened),
    False for the single-host no-op. Safe to call more than once.
    """
    global _initialized
    if _initialized:
        return True

    env = os.environ
    if coordinator_address is None:
        coordinator_address = env.get("IR_TPU_COORDINATOR")
    if num_processes is None and env.get("IR_TPU_NUM_PROCESSES"):
        num_processes = int(env["IR_TPU_NUM_PROCESSES"])
    if process_id is None and env.get("IR_TPU_PROCESS_ID"):
        process_id = int(env["IR_TPU_PROCESS_ID"])

    explicit = coordinator_address is not None and num_processes is not None
    auto = env.get("IR_TPU_MULTIHOST") == "1"
    if not explicit and not auto:
        return False
    if explicit and num_processes <= 1:
        return False

    import jax

    if explicit:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    else:
        jax.distributed.initialize()
    _initialized = True
    return True
