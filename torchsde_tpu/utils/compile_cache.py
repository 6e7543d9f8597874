"""Persistent XLA compilation cache.

The reference pays no warmup cost (torch executes eagerly — no trace step);
on TPU a cold whole-model compile can take minutes (BENCH_NOTES §5). JAX's
persistent compilation cache stores serialized executables on disk keyed by
the HLO hash, so repeat cold-starts of the same program (bench re-runs, the
examples, CI) skip XLA entirely. This module is the one place that turns it
on with sane knobs.

Usage (before the first jit executes — config flags are read at compile
time, not process start):

    from torchsde_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()          # ~/.cache/torchsde_tpu_xla
    enable_compilation_cache("/path")   # explicit location

Honors ``TORCHSDE_TPU_COMPILE_CACHE`` (path; set to "0"/"off" to disable).
Returns the cache directory, or None when disabled/unsupported. Safe to call
multiple times and safe on backends whose PJRT plugin cannot serialize
executables — caching quietly stays off there (JAX logs a one-line notice).
"""

import os

_DEFAULT = os.path.join(os.path.expanduser("~"), ".cache", "torchsde_tpu_xla")


def enable_compilation_cache(cache_dir=None, min_compile_time_secs=1.0):
    """Point JAX's persistent compilation cache at ``cache_dir``.

    ``min_compile_time_secs``: only cache programs whose compile took at
    least this long — tiny programs recompile faster than a disk round-trip;
    the multi-minute whole-solve programs are the ones worth persisting.
    ``min_entry_size_bytes`` is left at -1 (no size floor) so a slow-compile
    small executable still caches.
    """
    env = os.environ.get("TORCHSDE_TPU_COMPILE_CACHE")
    if env is not None and env.lower() in ("0", "off", "false", ""):
        return None
    cache_dir = cache_dir or env or _DEFAULT

    import jax

    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_time_secs))
    except Exception:  # unsupported backend/config on this jax version
        return None
    return cache_dir
