"""JAX environment setup for the device path.

The interchange contract widens everything to 8 bytes (``column_buffer.rs:17-21``)
and BASELINE requires bit-identical int64 keys, so the device path runs with x64
enabled (XLA emulates s64 on TPU as 32-bit pairs; exactness over raw speed for
keys — float32 fast paths are opt-in via EngineConfig.prefer_float32).
"""

from __future__ import annotations

_READY = False


def ensure_jax():
    global _READY
    import jax

    if not _READY:
        import os

        plats = os.environ.get("JAX_PLATFORMS")
        if plats:
            # the axon sitecustomize force-registers its TPU platform and
            # clobbers JAX_PLATFORMS; honor the user's env var explicitly so
            # JAX_PLATFORMS=cpu runs never touch the TPU relay
            try:
                jax.config.update("jax_platforms", plats)
            except Exception:
                pass
        jax.config.update("jax_enable_x64", True)
        # persistent compilation cache: TPU compiles through the remote
        # tunnel take minutes; cache them across processes
        try:
            import os

            if os.environ.get("JAX_PLATFORMS", "") == "cpu":
                raise RuntimeError("skip persistent cache on CPU test runs")
            cache_dir = os.environ.get(
                "GPU_OLAP_TPU_COMPILE_CACHE",
                os.path.expanduser("~/.cache/gpu_olap_tpu_xla"),
            )
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass
        _READY = True
    return jax
