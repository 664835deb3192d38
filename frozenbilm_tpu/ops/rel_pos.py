"""DeBERTa log-bucketed relative positions.

Behavioral spec: reference model/deberta.py:578-618
(make_log_bucket_position, build_relative_position).

TPU-first note: sequence lengths are static under jit, so these tables are
computed in plain numpy at trace time and become compile-time constants —
no device gathers or dynamic shapes.
"""

from __future__ import annotations

import functools

import numpy as np


def make_log_bucket_position(
    relative_pos: np.ndarray, bucket_size: int, max_position: int
) -> np.ndarray:
    """Map signed relative positions to log buckets.

    Positions within (-mid, mid) stay linear; farther positions are spaced
    logarithmically up to max_position (deberta.py:578-589).
    """
    relative_pos = np.asarray(relative_pos)
    sign = np.sign(relative_pos)
    mid = bucket_size // 2
    abs_pos = np.where(
        (relative_pos < mid) & (relative_pos > -mid), mid - 1, np.abs(relative_pos)
    )
    # Guard log of zero: abs_pos >= mid-1 >= 1 for any bucket_size >= 4.
    log_pos = (
        np.ceil(np.log(abs_pos / mid) / np.log((max_position - 1) / mid) * (mid - 1))
        + mid
    )
    bucket_pos = np.where(abs_pos <= mid, relative_pos, log_pos * sign).astype(np.int64)
    return bucket_pos


@functools.lru_cache(maxsize=64)
def build_relative_position(
    query_size: int, key_size: int, bucket_size: int = -1, max_position: int = -1
) -> np.ndarray:
    """Relative position table rel[i, j] = bucket(i - j), shape (query, key).

    Reference deberta.py:592-618 (the leading singleton batch dim is dropped;
    callers broadcast as needed). Cached: the table depends only on static
    shapes and config.
    """
    q_ids = np.arange(query_size)
    k_ids = np.arange(key_size)
    rel = q_ids[:, None] - k_ids[None, :]
    if bucket_size > 0 and max_position > 0:
        rel = make_log_bucket_position(rel, bucket_size, max_position)
    return rel.astype(np.int64)


@functools.lru_cache(maxsize=64)
def build_c2p_p2c_indices(
    seq_len: int, att_span: int, bucket_size: int, max_position: int
):
    """Precompute the clamped gather indices used by disentangled attention.

    c2p[i, j] = clamp(bucket(i - j) + att_span, 0, 2*att_span - 1)
    p2c[j, i] = clamp(att_span - bucket(j - i), 0, 2*att_span - 1)

    Reference deberta.py:873 (c2p_pos) and :897 (p2c_pos). Returned as numpy
    int32 so they fold into the compiled program as constants.
    """
    rel = build_relative_position(seq_len, seq_len, bucket_size, max_position)
    c2p = np.clip(rel + att_span, 0, att_span * 2 - 1).astype(np.int32)
    p2c = np.clip(-rel + att_span, 0, att_span * 2 - 1).astype(np.int32)
    return c2p, p2c


@functools.lru_cache(maxsize=16)
def onehot_gather_tables(
    seq_len: int, att_span: int, bucket_size: int, max_position: int
):
    """One-hot matrices turning the c2p/p2c gathers into matmuls.

    TPU gathers over (B, H, L, band) force layout-transpose copies of the
    whole operand (seen in xprof: ~0.4 ms/layer of raw copies at B=32);
    contracting against a one-hot constant keeps everything in MXU-friendly
    layouts. Tables are uint8 (L, L, band), indexed [i, j, k']:
      c2p_tbl[i, j, k'] = 1 iff c2p_idx[i, j] - lo == k'
      p2c_tbl[j, i, k'] = 1 iff p2c_idx[j, i] - lo == k'
    Only worth it while L*L*band stays small (the caller gates on size).
    """
    c2p, p2c = build_c2p_p2c_indices(seq_len, att_span, bucket_size, max_position)
    lo, hi = used_bucket_range(seq_len, att_span, bucket_size, max_position)
    band = hi - lo
    eye = np.eye(band, dtype=np.uint8)
    return eye[c2p - lo], eye[p2c - lo]


@functools.lru_cache(maxsize=64)
def used_bucket_range(
    seq_len: int, att_span: int, bucket_size: int, max_position: int
):
    """[lo, hi) row range of the relative-position embedding table actually
    indexed at this sequence length.

    For seq_len L <= bucket mid-point the log bucketing is inactive and only
    2L-1 of the 2*att_span rows are touched — slicing the positional key/query
    projections to this band shrinks the (B, H, L, 2*span) bias intermediates
    (the reference always materializes the full span, deberta.py:870-918).
    """
    c2p, p2c = build_c2p_p2c_indices(seq_len, att_span, bucket_size, max_position)
    lo = int(min(c2p.min(), p2c.min()))
    hi = int(max(c2p.max(), p2c.max())) + 1
    return lo, hi


@functools.lru_cache(maxsize=64)
def skew_reorder_indices(
    seq_len: int, att_span: int, bucket_size: int, max_position: int
):
    """Diagonal-reorder vectors turning c2p/p2c selection into a skew slice.

    bucket(i - j) depends only on (i - j), so the (L, L) selection matrices
    are Toeplitz. Reordering the relative-embedding ROWS before projection
    makes the selected matrix A[i, m] with m = (L-1) - i + j, and
    T[i, j] = A[i, (L-1) - i + j] is then one pad+reshape+slice (skew_select)
    — no gather, no one-hot matmul (those cost ~2*B*H*L*L*band FLOPs/layer).

    Returns (g_c2p, g_p2c), each (2L-1,) int32 indices into the FULL
    2*att_span-row table:
      g_c2p[m] = c2p_idx at (i - j) == (L-1) - m
      g_p2c[m] = p2c_idx at (j - i) == (L-1) - m
    """
    c2p, p2c = build_c2p_p2c_indices(seq_len, att_span, bucket_size, max_position)

    def diag_value(tbl, delta):
        return tbl[delta, 0] if delta >= 0 else tbl[0, -delta]

    L = seq_len
    deltas = [(L - 1) - m for m in range(2 * L - 1)]
    g_c2p = np.asarray([diag_value(c2p, d) for d in deltas], np.int32)
    g_p2c = np.asarray([diag_value(p2c, d) for d in deltas], np.int32)
    return g_c2p, g_p2c


def skew_select(A):
    """(..., L, 2L-1) -> (..., L, L): T[..., i, j] = A[..., i, (L-1) - i + j].

    The Music-Transformer/T-XL skew: pad one column, flatten the last two
    dims, slice at offset L-1, reshape to (L, 2L-1), keep the first L
    columns. Two layout copies instead of a gather or one-hot contraction.
    """
    L = A.shape[-2]
    assert A.shape[-1] == 2 * L - 1, A.shape[-2:]
    return skew_select_rect(A, L)


def skew_select_rect(A, key_len: int):
    """(..., C, key_len+C-1) -> (..., C, key_len): T[i, j] = A[i, (C-1)-i+j].

    Rectangular skew for QUERY-CHUNKED Toeplitz selection: a chunk of C
    query rows starting at i0 only touches diagonal-reordered table rows
    [L-C-i0, 2L-1-i0) — width L+C-1 instead of 2L-1 — so both the matmul
    FLOPs and the pad/reshape copy traffic shrink by ~(L+C)/2L, and the
    peak (B, H, C, L+C-1) temp is C/L of the full-skew one (the full
    (B, H, L, 2L-1) f32 temp was 3.75 GB at the MC shape L=512, B=80 and
    OOM'd the remat variant — measured on-chip by scripts/mc_profile.py).
    Proof of the flatten trick: flat index of T[i, j] is
    i*(M+1) + (C-1) - i + j = i*M + (C-1) + j with M = key_len+C-1, so one
    pad column, a slice at offset C-1, and an (C, M) reshape realign rows.
    """
    import jax
    import jax.numpy as jnp

    *lead, C, M = A.shape
    assert M == key_len + C - 1, (C, M, key_len)
    Ap = jnp.pad(A, [(0, 0)] * len(lead) + [(0, 0), (0, 1)])  # (..., C, M+1)
    flat = Ap.reshape(*lead, C * (M + 1))
    T = jax.lax.slice_in_dim(flat, C - 1, C - 1 + C * M, axis=-1)
    return T.reshape(*lead, C, M)[..., :key_len]
