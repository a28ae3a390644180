"""Multi-host launcher entry point (env/flag-guarded; multi-host itself is
untestable on one host, so the contract is verified via monkeypatching)."""

import importlib


def _fresh():
    from image_restoration_tpu.core import distributed

    importlib.reload(distributed)
    return distributed


def test_noop_without_request(monkeypatch):
    d = _fresh()
    for var in ("IR_TPU_MULTIHOST", "IR_TPU_COORDINATOR",
                "IR_TPU_NUM_PROCESSES", "IR_TPU_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert d.maybe_initialize_distributed() is False


def test_explicit_args_call_jax_distributed(monkeypatch):
    import jax

    d = _fresh()
    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: calls.append(kw))
    assert d.maybe_initialize_distributed("host0:1234", 4, 1) is True
    assert calls == [dict(coordinator_address="host0:1234",
                          num_processes=4, process_id=1)]
    # idempotent: second call returns True without re-initializing
    assert d.maybe_initialize_distributed() is True
    assert len(calls) == 1


def test_slurm_style_env(monkeypatch):
    import jax

    d = _fresh()
    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: calls.append(kw))
    monkeypatch.setenv("IR_TPU_COORDINATOR", "n0:2222")
    monkeypatch.setenv("IR_TPU_NUM_PROCESSES", "2")
    monkeypatch.setenv("IR_TPU_PROCESS_ID", "0")
    assert d.maybe_initialize_distributed() is True
    assert calls[0]["num_processes"] == 2


def test_auto_mode(monkeypatch):
    import jax

    d = _fresh()
    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: calls.append(kw))
    for var in ("IR_TPU_COORDINATOR", "IR_TPU_NUM_PROCESSES", "IR_TPU_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    monkeypatch.setenv("IR_TPU_MULTIHOST", "1")
    assert d.maybe_initialize_distributed() is True
    assert calls == [{}]
