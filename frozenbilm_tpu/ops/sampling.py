"""Token-selection ops for incremental decoding: greedy, temperature,
top-k, and nucleus (top-p) sampling.

The reference exposes generation only through the vendored HF generate
(gptneo.py:850-1726), whose LogitsProcessor stack includes temperature,
top-k, and top-p warpers; the demo/eval paths use greedy. These are the
TPU-native equivalents: pure functions over a (B, V) logits batch with
static shapes (sort + threshold instead of boolean indexing), usable inside
lax.scan decode loops.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# python float, NOT jnp.float32: a module-level jax.Array closure
# constant is hoisted as a const_arg of every compiled program that
# touches it (jax 0.9 constants doc), and sharing ONE such array across
# several jitted programs in a process corrupts the later programs'
# const_args ("Execution supplied 24 buffers but compiled program
# expected 29" on their second call). A literal embeds instead.
NEG_INF = -1e10


def apply_top_k(logits: jax.Array, k: int) -> jax.Array:
    """Keep the k highest logits per row, mask the rest to -inf.

    HF TopKLogitsWarper semantics: threshold at the k-th largest value;
    ties at the threshold all survive (categorical renormalizes anyway).
    """
    if k <= 0 or k >= logits.shape[-1]:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def apply_top_p(logits: jax.Array, p: float) -> jax.Array:
    """Nucleus filtering (HF TopPLogitsWarper): keep the smallest set of
    tokens whose cumulative probability reaches p; always keep the top-1.

    Static-shape formulation: sort descending, exclusive cumsum of probs,
    drop tokens whose preceding mass already reached p — then mask the
    ORIGINAL logits below the per-row cutoff value (no scatter needed).
    """
    if p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1) - probs  # exclusive: mass BEFORE token i
    keep = cum < p  # top-1 always kept (exclusive mass 0 < p)
    # cutoff = smallest kept logit per row
    cutoff = jnp.min(jnp.where(keep, sorted_logits, jnp.inf), axis=-1, keepdims=True)
    return jnp.where(logits < cutoff, NEG_INF, logits)


def select_token(
    logits: jax.Array,
    rng: Optional[jax.Array] = None,
    *,
    temperature=0.0,
    top_k: int = 0,
    top_p: float = 1.0,
) -> jax.Array:
    """(B, V) logits -> (B,) int32 token ids.

    temperature == 0 (or no rng) -> greedy argmax; otherwise scale by
    1/temperature, apply top-k then top-p (HF warper order), and sample
    categorically.

    temperature may also be a per-row (B,) array (serving: requests with
    different temperatures ride one batch); rows with temperature 0 take
    the greedy token. top_k/top_p stay static (they shape the program).
    """
    logits = logits.astype(jnp.float32)
    greedy = jnp.argmax(logits, axis=-1)
    if rng is None or (isinstance(temperature, (int, float)) and temperature <= 0.0):
        return greedy
    t = jnp.asarray(temperature, jnp.float32)
    per_row = t.ndim == 1
    scale = jnp.maximum(t, 1e-6)
    logits = logits / (scale[:, None] if per_row else scale)
    logits = apply_top_k(logits, top_k)
    logits = apply_top_p(logits, top_p)
    sampled = jax.random.categorical(rng, logits, axis=-1)
    if per_row:
        return jnp.where(t > 0.0, sampled, greedy)
    return sampled


# ---------------------------------------------------------------------------
# Beam search (static shapes, scan-friendly)
#
# The reference inherits HF's beam_search through its vendored generate
# (reference model/gptneo.py:1294-1333: BeamSearchScorer + the expand/
# process/finalize loop). These are the pure static-shape equivalents:
# per-row state tensors instead of python BeamHypotheses heaps, top-k +
# stable sorts instead of per-candidate loops. Semantics mirrored exactly
# (transformers BeamSearchScorer with decoder_prompt_len=0):
#   * candidate pool per step = top 2K of (live_sum + logprob) over K*V
#   * an eos candidate finishes a hypothesis only if its rank < K; its
#     normalized score is sum / cur_len**length_penalty with cur_len
#     counting prompt + generated + the eos itself; the stored hypothesis
#     does NOT include the eos (re-appended at assembly, as HF finalize does)
#   * live beams = the K best non-eos candidates, in rank order
#   * done (early_stopping=False): kept-K worst normalized score >=
#     best candidate sum / cur_len**length_penalty
#   * finalize adds all K open beams of unfinished rows, normalized by
#     full length, then keeps the top num_return_sequences
# Tie-break at exactly-equal float scores may differ from HF (stable sort
# favors earlier-finished hypotheses; HF's heap favors later adds).
# ---------------------------------------------------------------------------

from typing import NamedTuple  # noqa: E402

_FIN_EMPTY = -1e30  # python float, not jnp: see NEG_INF note


class BeamState(NamedTuple):
    """Per-row beam bookkeeping. B = batch, K = num_beams, G = max_new_tokens.

    live_sum: (B, K) running sum of logprobs per live beam (HF beam_scores;
        beam 0 starts at 0, the rest at -1e9 so step 0 dedupes the expanded
        identical beams).
    fin_score: (B, K) length-penalized scores of finished hypotheses
        (best-K heap flattened; _FIN_EMPTY marks empty slots).
    fin_valid: (B, K) bool, slot holds a real hypothesis.
    fin_ids: (B, K, G) generated tokens of finished hypotheses (no eos).
    fin_len: (B, K) generated length of each finished hypothesis.
    done: (B,) row finished decoding (HF BeamSearchScorer._done).
    """

    live_sum: jax.Array
    fin_score: jax.Array
    fin_valid: jax.Array
    fin_ids: jax.Array
    fin_len: jax.Array
    done: jax.Array


def beam_init(batch: int, num_beams: int, max_new_tokens: int) -> BeamState:
    """Initial state (HF generate: beam_scores[:, 1:] = -1e9, view(-1))."""
    B, K, G = batch, num_beams, max_new_tokens
    live = jnp.full((B, K), -1e9, jnp.float32).at[:, 0].set(0.0)
    return BeamState(
        live_sum=live,
        fin_score=jnp.full((B, K), _FIN_EMPTY, jnp.float32),
        fin_valid=jnp.zeros((B, K), bool),
        fin_ids=jnp.zeros((B, K, G), jnp.int32),
        fin_len=jnp.zeros((B, K), jnp.int32),
        done=jnp.zeros((B,), bool),
    )


def _take_rows(x: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather along axis 1 with a (B, n) index into (B, m, ...)."""
    extra = x.ndim - 2
    return jnp.take_along_axis(x, idx.reshape(idx.shape + (1,) * extra), axis=1)


def beam_update(
    state: BeamState,
    live_gen: jax.Array,
    logprobs: jax.Array,
    step,
    *,
    prompt_len: int,
    eos_token_id: int,
    length_penalty: float = 1.0,
    early_stopping: bool = False,
    min_length: int = 0,
):
    """One beam-search bookkeeping step.

    live_gen: (B, K, G) generated tokens so far (valid up to `step`).
    logprobs: (B, K, V) log-softmax of this step's logits per live beam.
    step: tokens generated before this step (0-based; python or traced int).

    Returns (new_state, new_live_gen, tok, bidx) where tok/bidx are (B, K)
    int32: the chosen continuation token per new live beam and the index of
    the live beam it extends (the KV-cache reorder index, HF's beam_idx).
    """
    B, K, V = logprobs.shape
    cur_len = prompt_len + step + 1
    denom = jnp.asarray(cur_len, jnp.float32) ** length_penalty
    if min_length:
        # MinLengthLogitsProcessor (HF generate builds it whenever
        # min_length > 0): eos is unreachable while the sequence fed to the
        # model (prompt + generated-so-far = cur_len - 1) is < min_length
        logprobs = jnp.where(
            (cur_len - 1 < min_length)
            & (jnp.arange(V)[None, None, :] == eos_token_id),
            -jnp.inf, logprobs)

    cand = state.live_sum[:, :, None] + logprobs  # (B, K, V)
    scores2k, idx = jax.lax.top_k(cand.reshape(B, K * V), 2 * K)  # sorted desc
    bidx = idx // V
    tok = idx % V
    is_eos = tok == eos_token_id

    # -- finished-hypothesis candidates (rank < K rule, scorer.process) --
    rank = jnp.arange(2 * K)[None, :]
    add = is_eos & (rank < K) & ~state.done[:, None]
    cand_score = jnp.where(add, scores2k / denom, _FIN_EMPTY)
    cand_ids = _take_rows(live_gen, bidx)  # (B, 2K, G)
    cand_len = jnp.broadcast_to(jnp.asarray(step, jnp.int32), (B, 2 * K))

    # merge: best K by normalized score; stable sort keeps earlier (existing)
    # hypotheses on ties, mirroring the heap's "> worst_score" add rule
    all_score = jnp.concatenate([state.fin_score, cand_score], axis=1)
    order = jnp.argsort(-all_score, axis=1, stable=True)[:, :K]
    fin_score = _take_rows(all_score, order)
    fin_valid = _take_rows(
        jnp.concatenate([state.fin_valid, add], axis=1), order)
    fin_ids = _take_rows(
        jnp.concatenate([state.fin_ids, cand_ids], axis=1), order)
    fin_len = _take_rows(
        jnp.concatenate([state.fin_len, cand_len], axis=1), order)

    # -- live beams: the K best non-eos candidates, in rank order --
    live2k = jnp.where(is_eos, _FIN_EMPTY, scores2k)
    live_order = jnp.argsort(-live2k, axis=1, stable=True)[:, :K]
    live_sum = _take_rows(live2k, live_order)
    sel_bidx = _take_rows(bidx, live_order)
    sel_tok = _take_rows(tok, live_order)
    new_gen = _take_rows(live_gen, sel_bidx)
    new_gen = jax.lax.dynamic_update_slice(
        new_gen, sel_tok[:, :, None].astype(new_gen.dtype),
        (0, 0, jnp.asarray(step, jnp.int32)))

    # -- done (BeamHypotheses.is_done) --
    n_fin = jnp.sum(fin_valid, axis=1)
    if early_stopping:
        newly_done = n_fin >= K
    else:
        worst = jnp.min(
            jnp.where(fin_valid, fin_score, jnp.inf), axis=1)
        newly_done = (n_fin >= K) & (worst >= scores2k[:, 0] / denom)
    done = state.done | newly_done

    # freeze done rows (HF pads them; their live state never reaches fin)
    keep = state.done[:, None]
    new_state = BeamState(
        live_sum=jnp.where(keep, state.live_sum, live_sum),
        fin_score=jnp.where(keep, state.fin_score, fin_score),
        fin_valid=jnp.where(keep, state.fin_valid, fin_valid),
        fin_ids=jnp.where(keep[:, :, None], state.fin_ids, fin_ids),
        fin_len=jnp.where(keep, state.fin_len, fin_len),
        done=done,
    )
    new_gen = jnp.where(keep[:, :, None], live_gen, new_gen)
    sel_tok = jnp.where(keep, 0, sel_tok)
    sel_bidx = jnp.where(keep, jnp.arange(K)[None, :], sel_bidx)
    return new_state, new_gen, sel_tok, sel_bidx


def beam_finalize(
    state: BeamState,
    live_gen: jax.Array,
    *,
    prompt_len: int,
    eos_token_id: int,
    pad_token_id: int,
    length_penalty: float = 1.0,
    num_return_sequences: int = 1,
):
    """Close out decoding (scorer.finalize): open beams of unfinished rows
    join the pool normalized by full length, then the top
    num_return_sequences per row are assembled as (B, R, G) token ids —
    eos appended after finished hypotheses, pad after that.

    Returns (sequences (B, R, G) int32, scores (B, R) f32, lengths (B, R)).
    """
    B, K, G = live_gen.shape
    final_norm = state.live_sum / jnp.float32(prompt_len + G) ** length_penalty
    open_score = jnp.where(state.done[:, None], _FIN_EMPTY, final_norm)
    open_valid = jnp.broadcast_to(~state.done[:, None], (B, K))

    all_score = jnp.concatenate([state.fin_score, open_score], axis=1)
    all_valid = jnp.concatenate([state.fin_valid, open_valid], axis=1)
    all_ids = jnp.concatenate([state.fin_ids, live_gen], axis=1)
    all_len = jnp.concatenate(
        [state.fin_len, jnp.full((B, K), G, jnp.int32)], axis=1)
    order = jnp.argsort(
        -jnp.where(all_valid, all_score, _FIN_EMPTY), axis=1,
        stable=True)[:, :num_return_sequences]
    scores = _take_rows(all_score, order)
    ids = _take_rows(all_ids, order)
    lens = _take_rows(all_len, order)

    pos = jnp.arange(G)[None, None, :]
    seq = jnp.where(pos < lens[:, :, None], ids,
                    jnp.where(pos == lens[:, :, None], eos_token_id,
                              pad_token_id)).astype(jnp.int32)
    return seq, scores, lens
