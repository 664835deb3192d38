"""Masking primitives: padding masks, masked softmax, MLM corruption.

Behavioral spec:
  - get_mask        -> reference util/misc.py:6-11
  - masked_softmax  -> reference model/deberta.py:100-138 (XSoftmax)
  - mlm_corrupt     -> reference util/misc.py:14-56 (mask_tokens, 80/10/10)

TPU-first notes: the reference's XSoftmax is a memory-optimized torch autograd
hack; under XLA a functional masked softmax fuses and rematerializes for free.
MLM corruption runs *inside* the jitted train step with threaded PRNG keys
instead of on the host per batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Large negative filler standing in for -inf: exp(x - max) flushes to exactly
# 0.0 in float32 for differences this large, matching the reference's
# -inf fill + post-softmax zeroing, while keeping gradients finite.
_MASK_FILL = -1e30

IGNORE_INDEX = -100


def get_mask(lengths: jax.Array, max_length: int) -> jax.Array:
    """Batched padding mask: mask[b, t] = 1 iff t < lengths[b].

    Reference: util/misc.py:6-11.
    """
    positions = jnp.arange(max_length, dtype=lengths.dtype)
    return (positions[None, :] < lengths[:, None]).astype(jnp.int32)


def masked_softmax(scores: jax.Array, mask: jax.Array, axis: int = -1) -> jax.Array:
    """Softmax over `axis` with masked positions excluded and zeroed.

    `mask` is 1 for valid positions, 0 for ignored; broadcastable to `scores`.
    Fully-masked rows return all zeros (not NaN), matching the reference's
    post-softmax zeroing (deberta.py:124-132).

    Carries a custom VJP: dx = p * (g - sum(p * g)) in f32 — the reference's
    XSoftmax backward (torch._softmax_backward_data, deberta.py:135-138).
    Besides skipping the exp/div recompute chains of the autodiff transpose,
    this is a CORRECTNESS fix on real TPU: XLA's fused transpose of the
    where/exp/max formulation below produced non-finite gradients from the
    first backward pass inside the 24-layer encoder-scan transpose (CPU and
    rematerialized schedules were clean — the fault is schedule-dependent;
    bisected by docs/measurements/grad_nan_probe{,2}_r4.json: plain-softmax
    and remat variants clean, everything else NaN from layer 23 down).
    Masked positions have p == 0, so their cotangent contribution vanishes
    exactly, fully-masked rows included.
    """
    return _masked_softmax_for_axis(axis)(scores, mask)


@functools.lru_cache(maxsize=None)
def _masked_softmax_for_axis(axis: int):
    """One custom-VJP closure per (static) axis — sidesteps nondiff_argnums
    argument-order pitfalls; the cache keeps jit tracing keyed on function
    identity stable across calls."""

    @jax.custom_vjp
    def f(scores, mask):
        return _masked_softmax_fwd_impl(scores, mask, axis)

    def fwd(scores, mask):
        probs = _masked_softmax_fwd_impl(scores, mask, axis)
        return probs, (probs, mask)

    def bwd(res, g):
        probs, mask = res  # probs.dtype == scores.dtype
        pf = probs.astype(jnp.float32)
        gf = g.astype(jnp.float32)
        inner = jnp.sum(pf * gf, axis=axis, keepdims=True)
        dscores = (pf * (gf - inner)).astype(probs.dtype)
        # mask is non-differentiable: int/bool masks take a float0 zero,
        # float masks a zeros_like (the forward is constant in the mask
        # away from the 0/1 switch points anyway)
        if jnp.issubdtype(mask.dtype, jnp.floating):
            dmask = jnp.zeros_like(mask)
        else:
            dmask = np.zeros(mask.shape, dtype=jax.dtypes.float0)
        return dscores, dmask

    f.defvjp(fwd, bwd)
    return f


def _masked_softmax_fwd_impl(scores, mask, axis):
    valid = mask.astype(jnp.bool_)
    # Internals run in f32 regardless of score dtype: summing hundreds of
    # bf16 exps loses mantissa bits, and XLA fuses the converts into the
    # reduce so no f32 (L, L) tensor ever materializes in HBM. The return
    # value follows the input dtype (bf16 scores -> bf16 probs).
    filled = jnp.where(valid, scores.astype(jnp.float32), _MASK_FILL)
    # Subtract a finite row max so exp never overflows; fully-masked rows have
    # max == _MASK_FILL, giving exp(0) rows that are then zeroed below.
    row_max = jnp.max(filled, axis=axis, keepdims=True)
    unnorm = jnp.exp(filled - row_max)
    unnorm = jnp.where(valid, unnorm, 0.0)
    denom = jnp.sum(unnorm, axis=axis, keepdims=True)
    return (unnorm / jnp.maximum(denom, jnp.finfo(jnp.float32).tiny)).astype(
        scores.dtype)


def mlm_corrupt(
    rng: jax.Array,
    input_ids: jax.Array,
    special_tokens_mask: jax.Array,
    *,
    mask_token_id: int,
    vocab_size: int,
    pad_token_id: int = 0,
    mlm_probability: float = 0.15,
):
    """BERT-style MLM corruption: of the selected positions, 80% -> [MASK],
    10% -> random token, 10% -> unchanged. Non-selected labels = -100.

    `special_tokens_mask` is 1 where the token must never be corrupted
    (CLS/SEP/PAD etc., computed host-side by the tokenizer).

    Reference: util/misc.py:14-56. Runs inside jit with an explicit PRNG key.
    Returns (corrupted_ids, labels).
    """
    k_select, k_replace, k_randsel, k_randtok = jax.random.split(rng, 4)
    shape = input_ids.shape

    eligible = (special_tokens_mask == 0) & (input_ids != pad_token_id)
    selected = (jax.random.uniform(k_select, shape) < mlm_probability) & eligible

    labels = jnp.where(selected, input_ids, IGNORE_INDEX)

    replaced = (jax.random.uniform(k_replace, shape) < 0.8) & selected
    randomized = (
        (jax.random.uniform(k_randsel, shape) < 0.5) & selected & ~replaced
    )
    random_tokens = jax.random.randint(k_randtok, shape, 0, vocab_size, dtype=input_ids.dtype)

    corrupted = jnp.where(replaced, mask_token_id, input_ids)
    corrupted = jnp.where(randomized, random_tokens, corrupted)
    return corrupted, labels


def cross_entropy_ignore_index(
    logits: jax.Array, labels: jax.Array, ignore_index: int = IGNORE_INDEX
) -> jax.Array:
    """Mean cross-entropy over positions whose label != ignore_index.

    Matches torch.nn.CrossEntropyLoss(ignore_index=-100) (deberta.py:1483-1488).
    logits: (..., C); labels: (...,) int.
    """
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    count = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll) / count
