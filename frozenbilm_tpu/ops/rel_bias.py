"""Pallas kernel for the disentangled-attention position bias.

Computes, for diagonal-reordered position tables (ops/rel_pos.py
skew_reorder_indices):

    out[b, h, i, j] = sum_d x[b, h, i, d] * table[h, (L-1) - i + j, d]

which is the c2p term with x=q / table=reordered pos_key, and the p2c term
(in [j, i] layout) with x=k / table=reordered pos_query (reference
deberta.py:870-918).

Why a kernel: the selection index depends only on (i - j), so for a fixed
query row i the needed table rows form a CONTIGUOUS window
table[(L-1)-i : (2L-1)-i]. The kernel grids over (h, i) and issues one
(B, d) @ (d, L) MXU pass per cell against that window — batch-in-rows, so
the MXU sees 128-row tiles (the round-1 per-(b,h) designs starved it), the
selection costs zero FLOPs (a dynamic sublane slice in VMEM), and the only
HBM traffic is x once + the bias out once. The XLA alternatives either
contract against the full band (skew mode: ~2x the FLOPs) or pay a
2*B*H*L*L*band one-hot contraction (onehot mode).

Backward: custom VJP in plain XLA (tables and grads are small); the
position projections are frozen in FrozenBiLM but grads still flow through
x and the rel-embedding LayerNorm, so both cotangents are exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rowbias_kernel(x_ref, tbl_ref, out_ref):
    """Grid cell (h, i): out[:, h, i, :] = x[:, h, i, :] @ win^T."""
    i = pl.program_id(1)
    L = out_ref.shape[-1]
    x = x_ref[:, 0, 0, :]  # (B, d)
    win = tbl_ref[0, pl.dslice((L - 1) - i, L), :]  # (L, d) contiguous window
    out_ref[:, 0, 0, :] = jax.lax.dot_general(
        x, win, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _rowbias_pallas(x: jax.Array, table: jax.Array,
                    interpret: bool = False) -> jax.Array:
    B, H, L, d = x.shape
    assert table.shape == (H, 2 * L - 1, d), (x.shape, table.shape)
    return pl.pallas_call(
        _rowbias_kernel,
        grid=(H, L),
        in_specs=[
            pl.BlockSpec((B, 1, 1, d), lambda h, i: (0, h, i, 0)),
            pl.BlockSpec((1, 2 * L - 1, d), lambda h, i: (h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((B, 1, 1, L), lambda h, i: (0, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, L, L), jnp.float32),
        interpret=interpret,
    )(x, table)


@functools.lru_cache(maxsize=16)
def _window_index(L: int) -> np.ndarray:
    """(L, L) int32: w[i, j] = (L-1) - i + j (index into the 2L-1 table)."""
    i = np.arange(L)[:, None]
    j = np.arange(L)[None, :]
    return ((L - 1) - i + j).astype(np.int32)


def _rowbias_xla(x: jax.Array, table: jax.Array) -> jax.Array:
    """Reference XLA formulation (also the interpret/CPU path)."""
    L = x.shape[2]
    w = jnp.asarray(_window_index(L))  # (L, L)
    win = table[:, w]  # (H, L, L, d)
    return jnp.einsum("bhid,hijd->bhij", x, win,
                      preferred_element_type=jnp.float32)


@jax.custom_vjp
def rowbias(x: jax.Array, table: jax.Array) -> jax.Array:
    """out[b,h,i,j] = x[b,h,i] . table[h, (L-1)-i+j] — Pallas on TPU,
    plain XLA elsewhere."""
    if jax.default_backend() == "tpu":
        return _rowbias_pallas(x, table)
    return _rowbias_xla(x, table)


def _rowbias_fwd(x, table):
    return rowbias(x, table), (x, table)


def _rowbias_bwd(res, g):
    x, table = res
    L = x.shape[2]
    w = jnp.asarray(_window_index(L))
    win = table[:, w]  # (H, L, L, d)
    dx = jnp.einsum("bhij,hijd->bhid", g, win,
                    preferred_element_type=jnp.float32).astype(x.dtype)
    # dtable[h,m,d] = sum over (b,i,j) with m == (L-1)-i+j of g * x
    onehot = jax.nn.one_hot(w, 2 * L - 1, dtype=g.dtype)  # (L, L, 2L-1)
    g_diag = jnp.einsum("bhij,ijm->bhim", g, onehot,
                        preferred_element_type=jnp.float32)
    dtable = jnp.einsum("bhim,bhid->hmd", g_diag, x.astype(g_diag.dtype),
                        preferred_element_type=jnp.float32).astype(table.dtype)
    return dx, dtable


rowbias.defvjp(_rowbias_fwd, _rowbias_bwd)
