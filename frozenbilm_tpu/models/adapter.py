"""Bottleneck adapter: down-project -> ReLU -> dropout -> up-project + residual.

Behavioral spec: reference model/adapter.py:5-45. Init is normal(std=1e-3)
clamped to +/- 2e-3 for both kernels and biases.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from frozenbilm_tpu.models.common import dropout, linear


def init_adapter_params(key, hidden_dim: int, ds_factor: int, std: float = 1e-3):
    assert hidden_dim % ds_factor == 0, "hidden_dim must be divisible by ds_factor"
    bottleneck = hidden_dim // ds_factor
    k1, k2, k3, k4 = jax.random.split(key, 4)

    def clamped(key, shape):
        return jnp.clip(jax.random.normal(key, shape) * std, -2 * std, 2 * std)

    return {
        "down": {"kernel": clamped(k1, (hidden_dim, bottleneck)), "bias": clamped(k2, (bottleneck,))},
        "up": {"kernel": clamped(k3, (bottleneck, hidden_dim)), "bias": clamped(k4, (hidden_dim,))},
    }


def adapter_forward(params, x, *, dropout_rate: float, deterministic: bool, rng=None):
    # checkpoint_name: no-ops outside a save_only_these_names remat policy
    # (models/deberta.REMAT_SAVE_NAMES). Both adapter kernels are TRAINABLE,
    # so the backward needs their inputs: "adapter_mid" covers the up-proj
    # weight grad (relu/dropout replay from it is elementwise), the down-proj
    # input is the enclosing layer's saved "out_dense".
    residual = checkpoint_name(linear(params["down"], x), "adapter_mid")
    residual = jax.nn.relu(residual)
    residual = dropout(rng, residual, dropout_rate, deterministic)
    residual = checkpoint_name(linear(params["up"], residual), "adapter_up")
    return x + residual
