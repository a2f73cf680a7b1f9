"""Persistent XLA compilation cache bring-up.

Every fresh ``Sampler``/``Trainer`` instance re-traces its jitted programs,
and the resulting (identical) HLO misses JAX's in-memory executable cache —
measured at ~25 s of recompiles per new 10-D sampler instance *within one
process*, and the full compile bill (~60 s to 20+ min depending on the
remote-compile service) for every new process. JAX's persistent
compilation cache eliminates both: with it enabled, a second sampler — in
the same process or a new one — loads executables from disk (measured:
warm 10-D run 61.7 s → 36.7 s; a repeat cold process skips remote compiles
entirely).

The reference has no analogue (PyTorch eager has no compile step); this is
the TPU-native counterpart of "import and go".
"""

from __future__ import annotations

import os


def _host_fingerprint():
    """Stable fingerprint of this host's CPU feature set.

    XLA:CPU executables are AOT-compiled for the build machine's exact
    feature flags and hard-abort (SIGILL-class) when *loaded* on a host
    missing one — the cache key does not include machine features, so a
    shared cache directory reused across heterogeneous hosts serves
    poison (observed: ``Fatal Python error: Aborted`` inside
    ``compilation_cache.get_executable_and_time`` after a session moved
    machines, preceded by 'Target machine feature +prefer-no-scatter is
    not supported on the host machine' load warnings). CPU caches are
    therefore segregated per feature-set; device (TPU) executables are
    backend-serialized and unaffected.

    The fingerprint must include the CPU *model identity* (family/model/
    stepping/model name), not just the ISA ``flags`` line: LLVM derives
    tuning features such as ``prefer-no-scatter``/``prefer-no-gather``
    from the detected -mcpu (model), so two hosts with identical cpuinfo
    flags can still produce mutually unloadable AOT executables (observed:
    a flags-only fingerprint collided across such a pair and the poison
    load errors returned)."""
    import hashlib
    ident = []
    try:
        with open('/proc/cpuinfo') as f:
            for line in f:
                if not line.strip():   # end of first CPU block: the
                    break              # remaining blocks repeat it per core
                key = line.split(':', 1)[0].strip()
                # x86 model identity + ARM equivalents (CPU implementer/
                # part/variant/revision + Features)
                if key in ('vendor_id', 'cpu family', 'model',
                           'model name', 'stepping', 'CPU implementer',
                           'CPU architecture', 'CPU variant', 'CPU part',
                           'CPU revision'):
                    ident.append(line.strip())
                elif key in ('flags', 'Features'):
                    ident.append(
                        ' '.join(sorted(line.split(':', 1)[1].split())))
    except OSError:
        pass
    if not ident:
        import platform
        ident = ['%s|%s' % (platform.machine(), platform.processor())]
    return hashlib.sha1('\n'.join(ident).encode()).hexdigest()[:12]


def enable_compilation_cache(cache_dir=None):
    """Idempotently enable JAX's persistent compilation cache.

    Respects an existing user setting (``jax_compilation_cache_dir`` config
    or ``JAX_COMPILATION_CACHE_DIR`` env). Opt out entirely with
    ``NNEST_TPU_NO_CACHE=1``. Default directory:
    ``$NNEST_TPU_CACHE_DIR`` or ``~/.cache/nnest_tpu_jax``, with CPU
    backends segregated into a per-host-feature-set subdirectory (see
    ``_host_fingerprint``).
    """
    if os.environ.get('NNEST_TPU_NO_CACHE'):
        return None
    import jax
    try:
        current = jax.config.jax_compilation_cache_dir
    except AttributeError:      # very old jax: nothing to do
        return None
    if current:                 # user already configured a cache
        return current
    cache_dir = (cache_dir
                 or os.environ.get('NNEST_TPU_CACHE_DIR')
                 or os.path.join(os.path.expanduser('~'), '.cache',
                                 'nnest_tpu_jax'))
    try:
        if jax.default_backend() == 'cpu':
            cache_dir = os.path.join(cache_dir,
                                     'cpu-%s' % _host_fingerprint())
    except Exception:
        pass
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        # default threshold (1 s) skips many of the small-but-remote
        # compiles that dominate here — but never clobber an explicit
        # user threshold
        if 'JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS' not in os.environ:
            jax.config.update(
                'jax_persistent_cache_min_compile_time_secs', 0.5)
    except Exception:
        return None
    return cache_dir
