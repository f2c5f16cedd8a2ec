"""Host-fingerprinted compilation cache (utils/compile_cache.py): stale
XLA:CPU AOT executables from a different VM must never be loaded — they
abort the process (observed round 2; see the module docstring)."""
import os

import jax

from svol_tpu.utils.compile_cache import enable_compile_cache, host_fingerprint


def test_fingerprint_stable_and_short():
    a, b = host_fingerprint(), host_fingerprint()
    assert a == b
    assert len(a) == 8
    int(a, 16)  # hex


def test_enable_creates_fingerprinted_subdir(tmp_path):
    base = str(tmp_path / "cache")
    used = enable_compile_cache(base_dir=base)
    assert os.path.isdir(used)
    assert os.path.dirname(used) == base
    assert os.path.basename(used) == host_fingerprint()
    assert jax.config.jax_compilation_cache_dir == used
    # restore the conftest-configured cache for subsequent tests
    enable_compile_cache()
