"""Host-fingerprinted persistent XLA compilation cache.

The persistent cache stores XLA:CPU executables as AOT machine code keyed by
HLO + compile options — NOT by the host CPU's feature set. When the same
cache directory outlives the machine (shared /tmp across driver sessions
that land on different VMs/microcode), a later process loads machine code
compiled for a different CPU; XLA warns "could lead to execution errors such
as SIGILL" and in practice the process dies with SIGILL/SIGABRT mid-test
(observed round 2: a 1 GB stale cache deterministically aborted the training
smoke test; wiping it fixed the run).

Fix: partition the cache directory by a fingerprint of the host (CPU model +
feature flags + kernel + jaxlib version). A new/changed host gets a fresh
subdirectory; stale entries can never be loaded cross-host.
"""
from __future__ import annotations

import hashlib
import os
import platform


def host_fingerprint() -> str:
    """8-hex-char digest of the properties that affect XLA AOT validity."""
    parts = [platform.machine(), platform.release()]
    try:
        import jaxlib

        parts.append(getattr(jaxlib, "__version__", "?"))
    except Exception:
        pass
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags", "microcode")):
                    parts.append(line.strip())
                if line.startswith("processor") and "processor\t: 0" not in line:
                    break  # first core only; all cores are identical
    except OSError:
        parts.append(platform.processor())
    return hashlib.sha256("\n".join(parts).encode()).hexdigest()[:8]


def enable_compile_cache(base_dir: str | None = None,
                         min_compile_secs: float = 1.0) -> str:
    """Point jax's persistent compilation cache at a host-fingerprinted
    subdirectory of ``base_dir`` (default: $JAX_COMPILATION_CACHE_DIR or
    /tmp/svol_xla_cache). Returns the directory used. Call after importing
    jax, before the first compilation."""
    import jax

    base = base_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                      "/tmp/svol_xla_cache")
    cache = os.path.join(base, host_fingerprint())
    os.makedirs(cache, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
    except Exception:
        pass
    return cache
