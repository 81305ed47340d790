"""Persistent XLA compilation cache for the CLI entry points.

The reference CLIs are one-shot processes (decompose_with_trained_CNN.py,
filter_reflectance.py — /root/reference/README.md:71-91 invokes them per
image); this rebuild's first call on a new (H, W) shape pays a 10-40 s
TPU compile (minutes through the dev tunnel after an outage).  JAX's
persistent compilation cache serializes compiled executables to disk
keyed by HLO fingerprint, so every later process start with the same
shapes reloads instead of recompiling.

Enabled only from the CLIs — bench.py and the driver entry points keep
default behavior so measured compile/runtime characteristics stay
untouched.  Best-effort by design: backends whose PJRT plugin cannot
serialize executables silently skip caching (jax's own default;
jax_raise_persistent_cache_errors stays False).

Opt out / redirect with REFLECTANCE_XLA_CACHE_DIR ("" disables).
"""
import os


def enable_persistent_compilation_cache() -> str:
    """Point jax at a disk compilation cache; returns the dir ("" if
    disabled).  Call before the first jit execution (config updates
    after backend init are honored for the cache settings)."""
    default = os.path.join(
        os.path.expanduser("~"), ".cache", "reflectance_filtering_tpu",
        "xla")
    d = os.environ.get("REFLECTANCE_XLA_CACHE_DIR", default)
    if not d:
        return ""
    try:
        os.makedirs(d, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", d)
        # cache anything that took real compile effort; tiny programs
        # stay out so the dir doesn't fill with trivia
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as err:  # noqa: BLE001 — cache is never load-bearing
        import sys

        print("persistent compile cache disabled (%r)" % err,
              file=sys.stderr)
        return ""
    return d
