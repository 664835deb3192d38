"""Platform selection helpers.

This image registers the remote-TPU (axon) PJRT plugin in sitecustomize for
every python process, and that registration overrides the JAX_PLATFORMS env
var. The only reliable way to run on local CPU (tests, dryruns) is
jax.config.update("jax_platforms", "cpu") before first device use —
XLA_FLAGS for the virtual device count must be in the env before the CPU
backend initializes (lazily), so set it here too.
"""

from __future__ import annotations

import os


def force_cpu(n_devices: int = 8) -> None:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")


def ensure_devices(n_devices: int) -> None:
    """Make sure at least n_devices are visible; fall back to virtual CPU.

    Must run before any jax device use: probing jax.devices() first would
    initialize (and lock) the default backend, after which the platform
    can no longer be switched.
    """
    import jax

    # Probe WITHOUT initializing: a single real chip can never satisfy an
    # 8-device dryrun, so any n_devices > 1 request goes to virtual CPU
    # unless the process was already configured for a real multi-chip slice.
    if n_devices > 1 and os.environ.get("FROZENBILM_REAL_MULTICHIP", "") != "1":
        force_cpu(n_devices)
    got = len(jax.devices())
    assert got >= n_devices, (
        f"could not provision {n_devices} devices "
        f"(got {got} on {jax.default_backend()})"
    )


def setup_runtime(args) -> None:
    """Per-driver runtime knobs, called by every task main before first
    device use. Currently: --compile_cache DIR enables jax's persistent
    compilation cache — the executable for each (program, shapes, platform)
    is stored on disk, so restarted jobs and serving cold-starts skip XLA
    recompilation (first compiles on this backend run 20-40s)."""
    cache = getattr(args, "compile_cache", "")
    if cache:
        import jax

        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        # cache every program regardless of compile time / size
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
