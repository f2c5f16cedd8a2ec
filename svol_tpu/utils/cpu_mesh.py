"""XLA_FLAGS setup for virtual-CPU-mesh runs (tests, multichip dryrun).

``--xla_force_host_platform_device_count=n`` must be in XLA_FLAGS before the
backend initializes.

The three timeout flags exist because XLA:CPU guards every collective with
process-fatal timeouts: the rendezvous path (AwaitAndLogIfStuck →
LOG(FATAL) → SIGABRT, rendezvous.cc — its statics read
GetDebugOptionsFromFlags(), so only XLA_FLAGS can raise them, and the
FATAL's stderr is swallowed by pytest capture) and the communicator-level
AllReduce timeout. On a 1-core host the n device programs execute
essentially serially, so the last participant can reach an all-reduce
minutes after the first purely by scheduling skew — past the defaults.
Round 2 traced a deterministic mid-suite SIGABRT to exactly this via a core
dump. NB the warn flag's registered name contains ``_timeout_`` —
``xla_cpu_collective_call_warn_stuck_timeout_seconds`` — while the proto
field does not; an unknown name in XLA_FLAGS is itself fatal at startup.

Call before the first ``import jax`` (or at least before backend init).
"""
from __future__ import annotations

import os


def set_virtual_cpu_mesh_flags(n_devices: int | None = None,
                               warn_secs: int = 120,
                               terminate_secs: int = 1800) -> None:
    flags = os.environ.get("XLA_FLAGS", "")
    add = []
    if n_devices and "xla_force_host_platform_device_count" not in flags:
        add.append(f"--xla_force_host_platform_device_count={n_devices}")
    if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
        add.append(
            f"--xla_cpu_collective_call_warn_stuck_timeout_seconds={warn_secs}")
        add.append(
            f"--xla_cpu_collective_call_terminate_timeout_seconds={terminate_secs}")
    if "xla_cpu_collective_timeout_seconds" not in flags:
        add.append(f"--xla_cpu_collective_timeout_seconds={terminate_secs}")
    if add:
        os.environ["XLA_FLAGS"] = (flags + " " + " ".join(add)).strip()


def set_fast_compile_flags() -> None:
    """Compile-time-over-run-time XLA flags for CORRECTNESS-ONLY CPU runs
    (the driver's multichip dryrun). XLA:CPU compile time on this class of
    1-core host is dominated by LLVM optimization of the fused kernels;
    these flags trade generated-code speed (irrelevant for a one-step tiny
    dryrun) for compile wall-clock — the budget the round-3 driver artifact
    blew (MULTICHIP_r03.json rc=124). NOT for the test suite (its compile
    cache stays warm across runs and the executed code is reused many
    times) and NOT for anything that measures performance.

    Must run before backend init; respects flags already present in
    XLA_FLAGS (an explicit env setting wins).
    """
    flags = os.environ.get("XLA_FLAGS", "")
    add = []
    if "xla_llvm_disable_expensive_passes" not in flags:
        add.append("--xla_llvm_disable_expensive_passes=true")
    if "xla_backend_optimization_level" not in flags:
        add.append("--xla_backend_optimization_level=1")
    if add:
        os.environ["XLA_FLAGS"] = (flags + " " + " ".join(add)).strip()
