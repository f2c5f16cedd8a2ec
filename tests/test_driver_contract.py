"""The two driver-facing surfaces — ``bench.py`` and
``__graft_entry__.dryrun_multichip`` — executed for real.

Round 1 and round 3 both shipped these red while the suite was green
(VERDICT r3: BENCH_r03.json rc=1 on a NameError, MULTICHIP_r03.json rc=124
silent timeout): the driver's contract had zero test coverage. These tests
run the actual entry points as subprocesses so the suite fails whenever the
contract breaks, whatever the cause.
"""
import json
import os
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_sub(args, timeout, extra_env=None):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    if extra_env:
        env.update(extra_env)
    return subprocess.run(
        args, capture_output=True, text=True, timeout=timeout, env=env,
        cwd=REPO,
    )


def test_bench_smoke_prints_one_json_line():
    """`python bench.py --tiny --cpu` must print EXACTLY one JSON line with
    the driver-contract keys. This is the path BENCH_r0N.json records; it
    broke in round 3 without any test noticing."""
    r = run_sub(
        [sys.executable, "bench.py", "--tiny", "--cpu", "--quantize", "none",
         "--iters", "2", "--batch-size", "1", "--attempts", "1"],
        timeout=560,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, r.stdout
    out = json.loads(lines[0])
    assert set(out) == {"metric", "value", "unit", "vs_baseline"}
    assert out["unit"] == "frames/sec/chip"
    assert out["value"] > 0 and out["vs_baseline"] > 0


def test_bench_default_int8_path_runs():
    """The driver runs plain `python bench.py` — defaults select the
    calibrated-int8 serving path, so that exact configuration (calibration
    pass included) must execute, not just --quantize none."""
    r = run_sub(
        [sys.executable, "bench.py", "--tiny", "--cpu",
         "--iters", "1", "--batch-size", "1", "--attempts", "1"],
        timeout=560,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip())
    assert out["metric"] == "inference_throughput"


def test_bench_reraises_deterministic_errors_immediately():
    """A Python bug (NameError & co.) must fail attempt 1, not sleep through
    the retry budget (round 3 burned 3x60 s on a NameError)."""
    import bench

    def boom(args):
        raise NameError("name 'ap' is not defined")

    orig = bench._measure
    bench._measure = boom
    try:
        t0 = time.perf_counter()
        with pytest.raises(NameError):
            bench.main(["--attempts", "3", "--retry-wait", "60"])
        assert time.perf_counter() - t0 < 5.0
    finally:
        bench._measure = orig


def test_bench_retries_backend_faults():
    """Transient backend faults (anything not in the deterministic set)
    retry up to --attempts times, then re-raise the last error."""
    import bench

    calls = []

    def flaky(args):
        calls.append(1)
        raise RuntimeError("TPU worker crashed")

    orig = bench._measure
    bench._measure = flaky
    try:
        with pytest.raises(RuntimeError):
            bench.main(["--attempts", "2", "--retry-wait", "0.01"])
        assert len(calls) == 2
    finally:
        bench._measure = orig


def test_dryrun_multichip_completes_in_budget():
    """dryrun_multichip(8) must finish inside the driver's time budget and
    print flushed phase lines (so a timeout's tail is diagnostic, unlike
    round 3's empty tail). Measured 264 s cold-cache on this 1-core host;
    the 560 s limit leaves headroom for slower driver hosts while still
    failing the suite before the driver would."""
    r = run_sub(
        [sys.executable, "-c",
         "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"],
        timeout=560,
    )
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-2000:])
    assert "dryrun_multichip(8): loss_overall=" in r.stdout
    assert r.stdout.strip().splitlines()[-1].endswith("]") and "OK" in r.stdout
    # phase lines precede each compile so a timeout shows where it died
    assert "compiling + running the sharded train step" in r.stdout
    assert "mesh ready: data=2 seq=2 model=2" in r.stdout


def test_graft_entry_signatures():
    """The driver imports these two names with these signatures."""
    import inspect

    import __graft_entry__ as g

    assert list(inspect.signature(g.dryrun_multichip).parameters) == ["n_devices"]
    assert list(inspect.signature(g.entry).parameters) == []
