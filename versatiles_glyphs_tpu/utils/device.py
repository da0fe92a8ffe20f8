"""Device/platform introspection.

`default_platform()` is the single predicate the framework uses to
decide between the compiled Pallas path and its jnp twin. It must look
at the effective default *device* rather than `jax.default_backend()`:
environments can have a TPU plugin registered (and thus a "tpu" default
backend) while the session pins `jax_default_device` to CPU — e.g. the
hermetic test suite.
"""

from __future__ import annotations


def default_platform() -> str:
    import jax

    dev = jax.config.jax_default_device
    if dev is not None:
        return dev.platform
    try:
        return jax.default_backend()
    except RuntimeError:
        # A configured accelerator plugin failed to initialize (e.g.
        # JAX_PLATFORMS names a backend whose registration hook didn't
        # run). Degrade to CPU rather than dying.
        return "cpu"


def on_tpu() -> bool:
    return default_platform() == "tpu"


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache so repeated CLI runs
    reuse compiled kernels instead of paying the 20-40 s first-compile
    per shape bucket. Called by the CLI entry point and bench."""
    import os

    import jax

    if path is None:
        path = os.environ.get(
            "VG_JAX_CACHE_DIR",
            os.path.join(
                os.path.expanduser("~"), ".cache", "versatiles_glyphs_tpu", "jax"
            ),
        )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is an optimization; never fail a run over it
