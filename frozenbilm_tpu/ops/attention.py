"""Fused multi-head attention — Pallas TPU kernel + jnp reference path.

Used by the CLIP ViT extraction service (the frames/sec/chip hot loop,
SURVEY.md §2.4) and available to the text towers. One kernel instance
computes softmax(q k^T * scale + mask) v entirely in VMEM for one
(batch, head) pair — no (B, H, L, L) probability tensor ever reaches HBM.

The jnp path is the numerics oracle; `fused_attention` picks the kernel on
TPU when shapes fit VMEM and falls back otherwise. Sequence/feature dims are
zero-padded to TPU tile boundaries inside the wrapper; padded key columns
are masked out, padded query rows produce zeros that are sliced away.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def attention_reference(q, k, v, mask=None, scale: Optional[float] = None):
    """jnp oracle: softmax(q k^T * scale + additive_from(mask)) v.

    q,k,v: (B, H, L, d); mask: (B, L) 1=valid key or None.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    s = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32) * scale
    if mask is not None:
        s = jnp.where(mask[:, None, None, :].astype(bool), s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhij,bhjd->bhid", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def _mha_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, *, scale, l_valid):
    """One (batch, head): blocks (1, 1, Lp, Dp) in VMEM; mask (1, Lp) int32."""
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (Lp, Lp)
    valid = mask_ref[0, 0, :] != 0  # (Lp,)
    s = jnp.where(valid[None, :], s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    e = jnp.where(valid[None, :], e, 0.0)
    p = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
    out = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0, 0] = out.astype(out_ref.dtype)


def _pallas_mha(q, k, v, mask, scale):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, L, D = q.shape
    Lp = _round_up(L, 128)
    Dp = _round_up(D, 128)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, Lp - L), (0, Dp - D)))

    qp, kp, vp = pad(q), pad(k), pad(v)
    if mask is None:
        mask_full = jnp.broadcast_to(
            (jnp.arange(Lp) < L).astype(jnp.int32)[None], (B, Lp))
    else:
        mask_full = jnp.pad(mask.astype(jnp.int32), ((0, 0), (0, Lp - L)))
    # TPU blocks need the 2nd-minor dim divisible by 8: carry 8 mask rows
    mask_full = jnp.broadcast_to(mask_full[:, None, :], (B, 8, Lp))

    kernel = functools.partial(_mha_kernel, scale=scale, l_valid=L)
    grid = (B, H)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, Lp, Dp), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, Lp, Dp), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lp, Dp), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lp, Dp), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, Lp), lambda b, h: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, Lp, Dp), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
    )(qp, kp, vp, mask_full)
    return out[:, :, :L, :D]


def _kernel_block_shapes_ok(q) -> bool:
    B, H, L, D = q.shape
    Lp = _round_up(L, 128)
    Dp = _round_up(D, 128)
    # 3 operands + scores + output in VMEM (f32 worst case), ~16MB budget
    vmem = (3 * Lp * Dp + Lp * Lp + Lp * Dp) * 4
    return vmem < 12 * 1024 * 1024


def fused_attention(q, k, v, mask=None, scale: Optional[float] = None,
                    force: Optional[bool] = None):
    """softmax(q k^T * scale [masked]) v with a fused Pallas kernel on TPU.

    force=True always uses the kernel (tests run it in interpret mode on
    CPU); force=False always uses the jnp path.

    Default policy: measured on v5e with CLIP ViT-L/14 shapes (L=257, d=64,
    B*H=2048), XLA's batched attention beats this kernel 2x — d pads 64->128
    (doubling MXU work) and the per-(batch,head) grid underutilizes. The
    kernel therefore stays opt-in (FROZENBILM_PALLAS_ATTENTION=1 or
    force=True) until a head-packed variant lands; at long sequence lengths
    where the (B,H,L,L) probabilities stop fitting HBM comfortably it is the
    memory-safe path.
    """
    import os

    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    use_kernel = force
    if use_kernel is None:
        use_kernel = (
            os.environ.get("FROZENBILM_PALLAS_ATTENTION", "") == "1"
            and jax.default_backend() == "tpu"
            and _kernel_block_shapes_ok(q)
        )
    if not use_kernel:
        return attention_reference(q, k, v, mask, scale)
    return _pallas_mha(q, k, v, mask, scale)
