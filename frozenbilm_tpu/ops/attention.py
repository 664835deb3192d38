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


def disentangled_attention_reference(
    q, k, v, c2p, p2c, mask_1d, scale: float, p2c_is_ji: bool = True
):
    """jnp oracle for the DeBERTa score pipeline consumed by the fused kernel.

    softmax_masked((q k^T + c2p + p2c^T) / scale) v with the exact
    masked-softmax semantics of ops/masking.masked_softmax (reference
    XSoftmax, model/deberta.py:100-138; score composition deberta.py:855-918).

    q,k,v: (B, H, L, d); c2p: (B, H, L, L) in [i, j]; p2c: (B, H, L, L) in
    [j, i] when p2c_is_ji (the natural skew output) else [i, j];
    mask_1d: (B, L) 1=valid token.
    """
    from frozenbilm_tpu.ops.masking import masked_softmax

    adt = q.dtype
    s = (
        jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32)
        / scale
    ).astype(adt)
    s = s + c2p / scale
    p2c_t = jnp.swapaxes(p2c, -1, -2) if p2c_is_ji else p2c
    s = s + p2c_t / scale
    mask_outer = (mask_1d[:, :, None] * mask_1d[:, None, :]).astype(jnp.int32)
    probs = masked_softmax(s, mask_outer[:, None, :, :])
    return jnp.einsum(
        "bhij,bhjd->bhid", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)


def _dattn_kernel(
    q_ref, k_ref, v_ref, c2p_ref, p2c_ref, mask_ref, out_ref,
    *, inv_scale, hblk, p2c_is_ji,
):
    """One (batch, hblk heads): the whole (Lp, Lp) score tile lives in VMEM.

    Fuses QK^T, both disentangled bias adds, the p2c [j,i]->[i,j] transpose,
    the exact masked softmax (f32 internals, fully-masked rows -> zeros), and
    the AV contraction — none of the (B, H, L, L) score/prob tensors or the
    transposed p2c bias ever reach HBM (they were ~6 GB/layer of streamed
    traffic at the MC L=512 shape, docs/measurements/mc_hlo_attrib_r4.json).
    """
    # Row/col validity. The minor-dim insertion ([:, None]) must happen on
    # the int32 mask, not the i1 compare result: Mosaic only supports
    # non-no-op minor-dim insertion for 32-bit types ("vector<512xi1> ->
    # 512x1xi1" fails to compile; /tmp/fused_repro.log, round 4).
    mask_i = mask_ref[0, 0, :]  # (Lp,) int32
    vmask = jnp.logical_and(mask_i[:, None] != 0, mask_i[None, :] != 0)
    for hh in range(hblk):
        q = q_ref[0, hh]
        k = k_ref[0, hh]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s + c2p_ref[0, hh].astype(jnp.float32)
        p2c = p2c_ref[0, hh].astype(jnp.float32)
        if p2c_is_ji:
            p2c = p2c.T  # in-VMEM transpose (kills the HBM layout copy)
        s = (s + p2c) * inv_scale
        filled = jnp.where(vmask, s, NEG_INF)
        m = jnp.max(filled, axis=-1, keepdims=True)
        e = jnp.exp(filled - m)
        e = jnp.where(vmask, e, 0.0)
        denom = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True),
                            float(np.finfo(np.float32).tiny))
        p = e / denom
        out = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, hh], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, hh] = out.astype(out_ref.dtype)


def _pallas_dattn(q, k, v, c2p, p2c, mask_1d, scale, *, p2c_is_ji, hblk,
                  interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, L, D = q.shape
    Lp = _round_up(L, 128)
    Dp = _round_up(D, 128)
    if H % hblk:
        hblk = 1

    def pad4(x, last):
        return jnp.pad(
            x, ((0, 0), (0, 0), (0, Lp - x.shape[2]), (0, last - x.shape[3])))

    qp, kp, vp = pad4(q, Dp), pad4(k, Dp), pad4(v, Dp)
    c2pp, p2cp = pad4(c2p, Lp), pad4(p2c, Lp)
    maskp = jnp.pad(mask_1d.astype(jnp.int32), ((0, 0), (0, Lp - L)))
    # 2nd-minor dim of a block must be a multiple of 8: carry 8 mask rows
    maskp = jnp.broadcast_to(maskp[:, None, :], (B, 8, Lp))

    kernel = functools.partial(
        _dattn_kernel, inv_scale=1.0 / scale, hblk=hblk, p2c_is_ji=p2c_is_ji)
    qkv_spec = pl.BlockSpec((1, hblk, Lp, Dp), lambda b, h: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, hblk, Lp, Lp), lambda b, h: (b, h, 0, 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, Lp, Dp), v.dtype),
        grid=(B, H // hblk),
        in_specs=[
            qkv_spec, qkv_spec, qkv_spec, bias_spec, bias_spec,
            pl.BlockSpec((1, 8, Lp), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=qkv_spec,
        interpret=interpret,
    )(qp, kp, vp, c2pp, p2cp, maskp)
    return out[:, :, :L, :D]


def _dattn_isel_kernel(
    q_ref, k_ref, v_ref, wc_ref, wq_ref, mask_ref, out_ref,
    *, inv_scale, L, BI, Wp, hblk,
):
    """Disentangled attention with IN-KERNEL Toeplitz selection.

    One grid step = (batch b, hblk heads, query block i of BI rows). The
    c2p/p2c relative-position biases are built inside the kernel from the
    diagonal-reordered per-head tables (wc = c2p key projections, wq = p2c
    query projections; ops/rel_pos.skew_reorder_indices order) — the
    (B, H, L, L) bias tensors NEVER exist in HBM, and the skew relayout
    copies (the measured top cost of the MC L=512 shape: misaligned lane
    shuffles at ~1.5% of HBM bandwidth, docs/MC_ROOFLINE.md) become ONE
    hardware strided lane-rotation each:

        rect skew  T[r, j] = A[r, (C-1) - r + j]
                ==  pltpu.roll(A, Wp - C + 1, axis=1, stride=1,
                               stride_axis=0)[:, :cols]

    since roll(x, s, 1, stride=1, stride_axis=0)[r, j] = x[r, (j-s-r) mod Wp].
    This per-sublane-strided rotate is the primitive every previous
    in-kernel-selection attempt lacked (CLAUDE.md round-2/3 failures used
    per-row dynamic slices and 3D broadcasts, which Mosaic rejects).

    Per head: QK^T (BI, L) + window contractions q-block @ wc-window and
    k @ wq-window (static 128-aligned windows of width L+BI-1 sliced from
    the VMEM-resident tables), strided-roll selection, bias adds in f32,
    exact masked softmax (rows [i0, i0+BI) x all L columns fit the tile),
    AV — only the (BI, d) context leaves the kernel.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i0 = pl.multiple_of(pl.program_id(2) * BI, BI)
    mask_i = mask_ref[0, 0, :]  # (L,) int32
    # int32 first, compare after: Mosaic rejects minor-dim insertion of i1
    row_mask = mask_ref[0, 0, pl.ds(i0, BI)]
    vmask = jnp.logical_and(row_mask[:, None] != 0, mask_i[None, :] != 0)
    for hh in range(hblk):
        q = q_ref[0, hh]  # (BI, Dp) bf16
        k = k_ref[0, hh]  # (L, Dp)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BI, L)
        # c2p: window rows [L - BI - i0, +Wp) of the reordered table
        wc = wc_ref[hh, pl.ds(pl.multiple_of(L - BI - i0, BI), Wp), :]
        a = jax.lax.dot_general(
            q, wc, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BI, Wp)
        c2p = pltpu.roll(a, Wp - BI + 1, axis=1, stride=1, stride_axis=0)
        s = s + c2p[:, :L]
        # p2c: window rows [i0, +Wp); selection yields [j, i-i0] -> transpose
        wq = wq_ref[hh, pl.ds(i0, Wp), :]
        a2 = jax.lax.dot_general(
            k, wq, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (L, Wp)
        p2c_ji = pltpu.roll(a2, Wp - L + 1, axis=1, stride=1, stride_axis=0)
        s = (s + p2c_ji[:, :BI].T) * inv_scale
        filled = jnp.where(vmask, s, NEG_INF)
        m = jnp.max(filled, axis=-1, keepdims=True)
        e = jnp.exp(filled - m)
        e = jnp.where(vmask, e, 0.0)
        denom = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True),
                            float(np.finfo(np.float32).tiny))
        p = e / denom
        out = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, hh], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, hh] = out.astype(out_ref.dtype)


def _pallas_dattn_isel(q, k, v, wc, wq, mask_1d, scale, *, hblk, bi,
                       interpret=False):
    """Wrapper: pads d to 128 and the tables to (H, 2L, Dp); L must already
    be a multiple of bi (the deberta caller pads L and builds the reorder
    tables at the padded length so the diagonal geometry stays exact)."""
    from jax.experimental import pallas as pl  # noqa: F811 (kernel scope)
    from jax.experimental.pallas import tpu as pltpu  # noqa: F811

    B, H, L, D = q.shape
    assert L % bi == 0 and L % 128 == 0, (L, bi)
    Dp = _round_up(D, 128)
    Wp = _round_up(L + bi - 1, 128)
    if H % hblk:
        hblk = 1

    def pad4(x, last):
        return jnp.pad(
            x, ((0, 0), (0, 0), (0, 0), (0, last - x.shape[3])))

    qp, kp, vp = pad4(q, Dp), pad4(k, Dp), pad4(v, Dp)
    # tables arrive (H, 2L-1, D): pad rows to 2L (>= any window end:
    # max start L-BI + Wp <= 2L when Wp <= L+BI, true since bi <= 128 <= L)
    Mp = _round_up(2 * L, 8)
    wc = jnp.pad(wc, ((0, 0), (0, Mp - wc.shape[1]), (0, Dp - wc.shape[2])))
    wq = jnp.pad(wq, ((0, 0), (0, Mp - wq.shape[1]), (0, Dp - wq.shape[2])))
    maskp = jnp.broadcast_to(
        mask_1d.astype(jnp.int32)[:, None, :], (B, 8, L))

    kernel = functools.partial(
        _dattn_isel_kernel, inv_scale=1.0 / scale, L=L, BI=bi, Wp=Wp,
        hblk=hblk)
    nI = L // bi
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, L, Dp), v.dtype),
        grid=(B, H // hblk, nI),
        in_specs=[
            pl.BlockSpec((1, hblk, bi, Dp), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hblk, L, Dp), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hblk, L, Dp), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hblk, Mp, Dp), lambda b, h, i: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hblk, Mp, Dp), lambda b, h, i: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, L), lambda b, h, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hblk, bi, Dp), lambda b, h, i: (b, h, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qp, kp, vp, wc, wq, maskp)
    return out[:, :, :, :D]


def fused_disentangled_attention_isel(
    q, k, v, pos_key_r, pos_query_r, mask_1d, scale: float,
    *, hblk: Optional[int] = None, bi: Optional[int] = None,
    interpret: Optional[bool] = None,
):
    """Fused disentangled attention with IN-KERNEL Toeplitz selection.

    pos_key_r/pos_query_r: (H, 2L-1, d) per-head projections of the
    DIAGONAL-REORDERED relative embeddings (rows g_c2p / g_p2c from
    ops/rel_pos.skew_reorder_indices) — the same tables the chunked-skew
    XLA path contracts against, handed to the kernel whole so neither the
    (B, H, L, L) biases nor any skew relayout ever touches HBM.
    """
    import os

    if hblk is None:
        # on-chip sweep at the MC L=512 shape (mc_isel_sweep_r5.json, v5e):
        # (h2, bi512) 18.27 q/s > (h1, bi512) 18.07 > (h2, bi256) 17.51 >
        # (h1, bi256) 17.03 > (h2, bi128) 16.23 > (h4, bi128) 15.81 —
        # wider query blocks win monotonically (at BI=L the p2c window
        # contraction runs ONCE per (b, h) instead of once per i-block),
        # and a 2-head block amortizes the mask/table fetches
        hblk = int(os.environ.get("FROZENBILM_ISEL_HBLK", "2") or 2)
    if bi is None:
        bi = int(os.environ.get("FROZENBILM_ISEL_BI", "512") or 512)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    L = q.shape[2]
    bi = min(bi, L)
    while L % bi:
        bi //= 2
    return _pallas_dattn_isel(q, k, v, pos_key_r, pos_query_r, mask_1d,
                              scale, hblk=hblk, bi=bi, interpret=interpret)


def fused_dattn_enabled(L: int) -> bool:
    """Gate for the fused disentangled-attention kernel.

    FROZENBILM_FUSED_ATTN=1 forces it on, =0 off; default (auto) uses it on
    TPU at L >= 256 — the regime where the (B, H, L, L) score pipeline is
    HBM-bound (docs/MC_ROOFLINE.md) and the whole score tile fits VMEM.
    """
    import os

    env = os.environ.get("FROZENBILM_FUSED_ATTN", "")
    if env == "1":
        return True
    if env == "0":
        return False
    return jax.default_backend() == "tpu" and L >= 256


def fused_disentangled_attention(
    q, k, v, c2p, p2c, mask_1d, scale: float,
    *, p2c_is_ji: bool = True, hblk: Optional[int] = None,
    interpret: Optional[bool] = None,
):
    """Fused (QK^T + c2p + p2c^T)/scale -> masked softmax -> AV on TPU.

    Biases are consumed pre-selected (the Toeplitz selection stays outside —
    in-kernel selection is provably VPU-bound and Mosaic-hostile, CLAUDE.md).
    Falls back to interpret mode off-TPU so tests exercise the same kernel.
    """
    import os

    if hblk is None:
        # on-chip sweep (docs/measurements/fused_attn_ab_r4.json, v5e):
        # hblk=4 best at both L=512 (53.07 rows/s) and L=256 (124.72)
        hblk = int(os.environ.get("FROZENBILM_FUSED_ATTN_HBLK", "4") or 4)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _pallas_dattn(q, k, v, c2p, p2c, mask_1d, scale,
                         p2c_is_ji=p2c_is_ji, hblk=hblk, interpret=interpret)


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
