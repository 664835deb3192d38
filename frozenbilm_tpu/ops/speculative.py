"""Prompt-lookup speculative decoding helpers (pure, static-shape).

Decode is HBM-bandwidth-bound: every single-token step re-reads all the
weights, so a step that verifies K tokens costs nearly the same wall-clock
as a step that produces one. Speculative decoding exploits that by
guessing the next few tokens cheaply and verifying them in ONE cached
K-token forward — each step then emits 1 + (accepted guesses) tokens with
greedy-EXACT output (a guess is kept only if it equals the model's own
argmax).

The drafter here is prompt lookup (n-gram copying): find the most recent
earlier occurrence of the current bigram in [prompt ‖ generated-so-far]
and propose the tokens that followed it. Zero extra model, zero FLOPs —
and the FrozenBiLM AR workloads (videoqa answers grounded in subtitles,
demo captioning) are exactly the copy-heavy regime where it pays. When no
match exists the draft is junk, nothing is accepted, and the step emits
exactly one token — plain greedy at ~K x the per-step FLOPs (still cheap:
the FLOP increase is attention+projections on K rows; weight reads, the
actual bottleneck, are unchanged).

The reference has no speculative path (its vendored HF generate predates
it); this is a TPU-native extension. Everything below is shape-static and
jit-safe: the host never sees the acceptance decisions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lookup_draft(hist: jax.Array, valid: jax.Array, l2: jax.Array,
                 l1: jax.Array, n_draft: int,
                 context_depth: int = 2) -> jax.Array:
    """Per-row prompt-lookup draft: bigram match, longest-suffix preferred.

    hist:  (B, H) int token history [prompt slots ‖ generated slots]
    valid: (B, H) bool — which history slots hold real tokens
    l2,l1: (B,)  the current trailing bigram (l2 precedes l1)
    n_draft: number of draft tokens to propose
    context_depth: how many tokens BEFORE the bigram to also compare
        (HF prompt-lookup's max-ngram-first rule): among bigram matches,
        the one whose preceding suffix matches deepest wins, recency
        breaking ties. Raises acceptance precision when a bigram recurs
        with different continuations; 0 recovers plain bigram+recency.

    Returns (B, n_draft) proposed continuations. Rows without a match get
    l1 repeated (a junk draft costs nothing: verification rejects it).
    Matches must have BOTH bigram slots valid, and the trailing bigram
    itself (the last two valid slots) is excluded — matching yourself
    proposes the tokens you already emitted.
    """
    B, H = hist.shape
    q = jnp.arange(H - 1)
    pair_valid = valid[:, :-1] & valid[:, 1:]
    # the current bigram ends at the last valid slot; exclude any match
    # whose continuation starts there (q + 2 > last valid index). Validity
    # is NOT contiguous (right-padded prompts leave a gap before the
    # generated region), so locate the last True positionally.
    last_idx = H - 1 - jnp.argmax(valid[:, ::-1], axis=1)  # (B,) l1's slot
    match = (pair_valid
             & (hist[:, :-1] == l2[:, None])
             & (hist[:, 1:] == l1[:, None])
             & (q[None, :] < (last_idx - 1)[:, None]))
    # longest-suffix depth per candidate: run-length of token-k-before-the-
    # bigram agreeing with the trailing context (positional — a validity
    # gap simply ends the run, falling back to bigram behavior)
    depth = jnp.zeros(match.shape, jnp.int32)
    run = match
    for k in range(1, context_depth + 1):
        # candidate side: hist[q - k] / valid[q - k] (pad-shift; q >= k)
        hk = jnp.pad(hist, ((0, 0), (k, 0)))[:, :H - 1]
        vk = jnp.pad(valid, ((0, 0), (k, 0)))[:, :H - 1]
        # trailing side: the token k before l2 (slot last_idx - 1 - k)
        cpos = last_idx - 1 - k
        ctx = jnp.take_along_axis(hist, jnp.maximum(cpos, 0)[:, None],
                                  axis=1)
        cval = jnp.take_along_axis(valid, jnp.maximum(cpos, 0)[:, None],
                                   axis=1) & (cpos >= 0)[:, None]
        run = (run & vk & cval & (q[None, :] >= k) & (hk == ctx))
        depth = depth + run.astype(jnp.int32)
    # rank matches by (suffix depth, recency): score = depth*H + q + 1
    score = jnp.where(match, depth * H + q[None, :] + 1, 0)
    best = jnp.argmax(score, axis=1)  # (B,)
    found = jnp.any(match, axis=1)
    idx = best[:, None] + 2 + jnp.arange(n_draft)[None, :]  # (B, n_draft)
    gathered = jnp.take_along_axis(hist, jnp.minimum(idx, H - 1), axis=1)
    return jnp.where(found[:, None], gathered, l1[:, None])


def accept_greedy(preds: jax.Array, drafts: jax.Array):
    """Greedy acceptance: preds (B, K) are the model's argmax tokens for
    feed positions 0..K-1 (position i predicts the token AFTER feed token
    i); drafts (B, K-1) were fed as positions 1..K-1. The accepted count
    m = longest prefix with drafts[i] == preds[i]; the step emits
    preds[0..m] (m accepted guesses + 1 bonus token).

    Returns (emitted (B, K) = preds, n_emit (B,) = m + 1).
    """
    matched = drafts == preds[:, :-1]  # (B, K-1)
    m = jnp.sum(jnp.cumprod(matched.astype(jnp.int32), axis=1), axis=1)
    return preds, m + 1


def mask_after_eos(emitted: jax.Array, n_emit: jax.Array, unfinished,
                   eos_token_id, pad_token_id: int):
    """Apply the HF unfinished_sequences semantics to a variable-length
    emission (emitted (B, K), first n_emit[b] real): rows already finished
    emit pad; a row finishes AT its first in-step eos (the eos itself is
    kept, everything after becomes pad). Returns (emitted', n_emit',
    unfinished'). With eos_token_id None this is the identity
    (unfinished stays None)."""
    if eos_token_id is None:
        return emitted, n_emit, None
    B, K = emitted.shape
    k = jnp.arange(K)[None, :]
    in_emit = k < n_emit[:, None]
    is_eos = (emitted == eos_token_id) & in_emit
    # positions strictly after the first in-step eos
    after = jnp.cumsum(is_eos.astype(jnp.int32), axis=1) - is_eos.astype(jnp.int32)
    out = jnp.where(unfinished[:, None], emitted, pad_token_id)
    out = jnp.where(unfinished[:, None] & (after > 0), pad_token_id, out)
    new_unfinished = unfinished & ~jnp.any(is_eos, axis=1)
    return out, n_emit, new_unfinished
