"""Multi-host init wiring: both CLI entries must bootstrap jax.distributed
before any device use (the reference wires torch.distributed into both
entries — train.py:362-366, test.py:215-218)."""
import jax
import pytest

from svol_tpu.parallel.distributed import initialize_multihost


def test_single_host_is_noop(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda **kw: pytest.fail("initialize called on single host"),
    )
    initialize_multihost()  # must not raise, must not call initialize


def test_env_triggers_initialize(monkeypatch):
    called = {}
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "127.0.0.1:9999")
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda **kw: called.update(kw, hit=True)
    )
    initialize_multihost()
    assert called.get("hit")


@pytest.mark.parametrize("entry", ["train", "infer"])
def test_cli_entries_call_multihost_init_first(monkeypatch, entry):
    """The CLIs call initialize_multihost() before building config/devices:
    a raising fake proves the call site executes first."""
    import importlib

    mod = importlib.import_module(f"svol_tpu.cli.{entry}")

    def fake_init():
        raise RuntimeError("multihost-init-called")

    monkeypatch.setattr(
        "svol_tpu.parallel.distributed.initialize_multihost", fake_init
    )
    with pytest.raises(RuntimeError, match="multihost-init-called"):
        mod.main([])
