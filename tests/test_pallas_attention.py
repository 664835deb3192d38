"""Fused-attention Pallas kernel vs the jnp oracle (interpret mode on CPU)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frozenbilm_tpu.ops.attention import (
    _round_up,
    attention_reference,
    fused_attention,
)


def _pallas_interpret(q, k, v, mask, scale):
    """Run the kernel body under the Pallas interpreter."""
    import functools

    from jax.experimental import pallas as pl

    from frozenbilm_tpu.ops import attention as A

    B, H, L, D = q.shape
    Lp, Dp = _round_up(L, 128), _round_up(D, 128)
    pad = lambda x: jnp.pad(x, ((0, 0), (0, 0), (0, Lp - L), (0, Dp - D)))  # noqa: E731
    if mask is None:
        mask_full = jnp.broadcast_to((jnp.arange(Lp) < L).astype(jnp.int32)[None], (B, Lp))
    else:
        mask_full = jnp.pad(mask.astype(jnp.int32), ((0, 0), (0, Lp - L)))
    mask_full = jnp.broadcast_to(mask_full[:, None, :], (B, 8, Lp))
    kernel = functools.partial(A._mha_kernel, scale=scale, l_valid=L)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, Lp, Dp), q.dtype),
        grid=(B, H),
        in_specs=[
            pl.BlockSpec((1, 1, Lp, Dp), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Lp, Dp), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Lp, Dp), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 8, Lp), lambda b, h: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, Lp, Dp), lambda b, h: (b, h, 0, 0)),
        interpret=True,
    )(pad(q), pad(k), pad(v), mask_full)
    return out[:, :, :L, :D]


@pytest.mark.parametrize("L,D,with_mask", [(17, 8, False), (40, 16, True)])
def test_kernel_matches_reference(L, D, with_mask):
    rng = np.random.default_rng(0)
    B, H = 2, 3
    q = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.float32)
    mask = None
    if with_mask:
        m = np.ones((B, L), np.int32)
        m[0, -7:] = 0
        mask = jnp.asarray(m)
    scale = 1.0 / math.sqrt(D)
    ref = np.asarray(attention_reference(q, k, v, mask, scale))
    out = np.asarray(_pallas_interpret(q, k, v, mask, scale))
    np.testing.assert_allclose(ref, out, atol=2e-5, rtol=1e-4)


def test_fused_attention_cpu_fallback():
    """On CPU (non-forced) the wrapper must take the jnp path."""
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 2, 10, 8)), jnp.float32)
    out = fused_attention(q, q, q)
    ref = attention_reference(q, q, q)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-6)
