"""Elastic supervisor: restart-with-resume logic (no real training needed)."""
import os

from svol_tpu.cli.supervise import run_with_restarts
from svol_tpu.train.checkpoints import find_latest_checkpoint


def make_ckpt(base, name, t):
    path = os.path.join(base, name)
    os.makedirs(path, exist_ok=True)
    with open(path + ".config.json", "w") as f:
        f.write("{}")
    os.utime(path, (t, t))
    return path


def test_find_latest_checkpoint(tmp_path):
    base = str(tmp_path)
    assert find_latest_checkpoint(base) is None
    make_ckpt(base, "0100_model_x", 100)
    newest = make_ckpt(base, "best_model_x", 200)
    assert find_latest_checkpoint(base) == newest
    # directories without the config sidecar are ignored
    os.makedirs(tmp_path / "random_dir")
    assert find_latest_checkpoint(base) == newest


def test_run_with_restarts_resumes_and_succeeds(tmp_path):
    base = str(tmp_path)
    calls = []
    exit_codes = iter([1, 1, 0])  # crash twice, then finish

    def runner(cmd):
        calls.append(cmd)
        code = next(exit_codes)
        # training saves a checkpoint before "crashing"
        make_ckpt(base, f"{len(calls):04d}_model_x", 1000 + len(calls))
        return code

    def build_cmd(resume):
        return ["train"] + (["--resume", resume, "--resume_all"] if resume else [])

    rc = run_with_restarts(build_cmd, base, max_restarts=5,
                           backoff_seconds=0.0, runner=runner, log=lambda *_: None)
    assert rc == 0
    assert len(calls) == 3
    assert calls[0] == ["train"]  # fresh start
    assert "--resume_all" in calls[1]
    # each restart resumes from the newest checkpoint at the time
    assert calls[1][2].endswith("0001_model_x")
    assert calls[2][2].endswith("0002_model_x")


def test_run_with_restarts_gives_up(tmp_path):
    base = str(tmp_path)
    rc = run_with_restarts(
        lambda resume: ["train"], base, max_restarts=2,
        backoff_seconds=0.0, runner=lambda cmd: 7, log=lambda *_: None,
    )
    assert rc == 7


def test_run_with_restarts_preemption_skips_backoff(tmp_path, monkeypatch):
    """A graceful EXIT_PREEMPTED exit (train/preemption.py) relaunches
    immediately — the crash-loop backoff must not delay a planned resume."""
    import time as _time

    from svol_tpu.train.preemption import EXIT_PREEMPTED

    base = str(tmp_path)
    sleeps = []
    monkeypatch.setattr(_time, "sleep", lambda s: sleeps.append(s))

    calls = []
    exit_codes = iter([EXIT_PREEMPTED, 1, 0])  # preempt, crash, finish

    def runner(cmd):
        calls.append(cmd)
        make_ckpt(base, f"preempt_{len(calls):04d}_model_x", 1000 + len(calls))
        return next(exit_codes)

    def build_cmd(resume):
        return ["train"] + (["--resume", resume, "--resume_all"] if resume else [])

    rc = run_with_restarts(build_cmd, base, max_restarts=5,
                           backoff_seconds=30.0, runner=runner,
                           log=lambda *_: None)
    assert rc == 0
    assert len(calls) == 3
    # preemption resumed without sleeping; the real crash backed off once
    assert sleeps == [30.0]
    assert calls[1][2].endswith("preempt_0001_model_x")


def test_run_with_restarts_stops_when_supervisor_signalled(tmp_path):
    """When the SUPERVISOR was signalled (scheduler eviction) and forwarded
    it, the child's exit propagates — no relaunch against the scheduler."""
    calls = []

    class FakeForwardingRunner:
        signalled = False

        def __call__(self, cmd):
            calls.append(cmd)
            self.signalled = True  # as if SIGTERM arrived and was forwarded
            return 75

    rc = run_with_restarts(
        lambda resume: ["train"], str(tmp_path), max_restarts=5,
        backoff_seconds=0.0, runner=FakeForwardingRunner(),
        log=lambda *_: None)
    assert rc == 75
    assert len(calls) == 1


def test_forwarding_runner_forwards_sigterm_to_child(tmp_path):
    """ForwardingRunner relays a supervisor-side SIGTERM to the child and
    returns the child's (graceful) exit code."""
    import os
    import signal
    import sys
    import threading
    import time

    from svol_tpu.cli.supervise import ForwardingRunner

    # the child confirms its handler is installed via a sentinel file —
    # signalling on a timer raced child startup on the loaded 1-core host
    sentinel = str(tmp_path / "child_ready")
    child_src = (
        "import signal, sys, time\n"
        "signal.signal(signal.SIGTERM, lambda *a: sys.exit(75))\n"
        f"open({sentinel!r}, 'w').write('ready')\n"
        "time.sleep(120)\n"
    )
    runner = ForwardingRunner(grace_timeout=30.0)

    def killer():  # deliver SIGTERM to THIS process once the child is ready
        deadline = time.time() + 60
        while not os.path.exists(sentinel) and time.time() < deadline:
            time.sleep(0.05)
        os.kill(os.getpid(), signal.SIGTERM)

    threading.Thread(target=killer, daemon=True).start()
    prev = signal.getsignal(signal.SIGTERM)
    rc = runner([sys.executable, "-c", child_src])
    assert rc == 75
    assert runner.signalled
    # runner restored the previous disposition on exit
    assert signal.getsignal(signal.SIGTERM) is prev
