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
