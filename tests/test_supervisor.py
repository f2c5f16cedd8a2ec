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
