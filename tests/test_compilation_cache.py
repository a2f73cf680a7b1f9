"""Persistent-compilation-cache bring-up (utils/compilation_cache.py).

The poison scenario these guard against: XLA:CPU AOT executables are
compiled for the build machine's exact LLVM feature set and hard-abort
when loaded on a host missing a feature, and JAX's cache key does NOT
include machine features — so a cache directory shared across
heterogeneous hosts (the driver restarts sessions on different machines)
serves unloadable executables. CPU caches are segregated per host
fingerprint; the fingerprint must capture CPU *model identity*, not just
ISA flags, because LLVM tuning features (prefer-no-scatter/gather) come
from the detected model.
"""

import os

from nnest_tpu.utils.compilation_cache import (
    _host_fingerprint, enable_compilation_cache)


def test_fingerprint_deterministic_and_short():
    fp = _host_fingerprint()
    assert fp == _host_fingerprint()
    assert len(fp) == 12
    int(fp, 16)  # hex


def test_fingerprint_keyed_on_model_identity():
    """Model name / family / stepping must feed the hash (not just the
    ISA flags line): two Xeon generations can share cpuinfo flags while
    LLVM compiles mutually unloadable AOT code for them."""
    if not os.path.exists('/proc/cpuinfo'):
        return
    with open('/proc/cpuinfo') as f:
        block = f.read().split('\n\n')[0]
    keys = {line.split(':', 1)[0].strip() for line in block.splitlines()}
    if 'model name' in keys:
        import hashlib
        flags_only = None
        for line in block.splitlines():
            if line.split(':', 1)[0].strip() == 'flags':
                flags_only = hashlib.sha1(' '.join(sorted(
                    line.split(':', 1)[1].split())).encode()
                ).hexdigest()[:12]
        # the real fingerprint must differ from a flags-only hash,
        # i.e. the model-identity lines actually contributed
        assert _host_fingerprint() != flags_only


def test_enable_respects_opt_out_and_existing_config(monkeypatch):
    import jax

    monkeypatch.setenv('NNEST_TPU_NO_CACHE', '1')
    assert enable_compilation_cache() is None
    monkeypatch.delenv('NNEST_TPU_NO_CACHE')

    prev = jax.config.jax_compilation_cache_dir
    try:
        jax.config.update('jax_compilation_cache_dir', '/tmp/user_cache_x')
        # a user-configured dir is returned untouched, never re-pointed
        assert enable_compilation_cache() == '/tmp/user_cache_x'
    finally:
        jax.config.update('jax_compilation_cache_dir', prev)


def test_enable_segregates_cpu_dir(monkeypatch, tmp_path):
    import jax

    monkeypatch.setenv('NNEST_TPU_CACHE_DIR', str(tmp_path / 'cc'))
    prev = jax.config.jax_compilation_cache_dir
    try:
        jax.config.update('jax_compilation_cache_dir', None)
        out = enable_compilation_cache()
        assert out is not None
        # tests run on the CPU backend -> per-host subdirectory
        assert os.path.basename(out) == 'cpu-%s' % _host_fingerprint()
        assert os.path.isdir(out)
        assert jax.config.jax_compilation_cache_dir == out
    finally:
        jax.config.update('jax_compilation_cache_dir', prev)
