"""Test config: force an 8-device virtual CPU platform.

The session environment may pin JAX_PLATFORMS to the remote TPU tunnel
(axon); tests must run on local CPU. JAX reads JAX_PLATFORMS at import time,
so we both set the env var (for subprocesses) and update jax.config directly
(in case jax was already imported by a pytest plugin).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert jax.device_count() == 8, "expected 8 virtual CPU devices"
