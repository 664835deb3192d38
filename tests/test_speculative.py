"""Prompt-lookup speculative decoding (ops/speculative.py +
gptneo_speculative_cached): drafting/acceptance unit behavior and
token-EXACT parity with the plain greedy KV-cache decoder — speculation
must never change the output, only the number of steps. TPU-native
extension (the reference's vendored generate has no speculative mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from frozenbilm_tpu.config import GPTNeoConfig, VideoTextConfig
from frozenbilm_tpu.ops.speculative import (accept_greedy, lookup_draft,
                                            mask_after_eos)


def test_lookup_draft_finds_most_recent_match():
    # history ends with the trailing bigram (5,6); its earlier occurrence
    # at q=0 proposes the continuation [7, 8, 9]
    hist = jnp.asarray([[5, 6, 7, 8, 9, 9, 5, 6]])
    valid = jnp.ones((1, 8), bool)
    d = lookup_draft(hist, valid, jnp.asarray([5]), jnp.asarray([6]), 3)
    np.testing.assert_array_equal(np.asarray(d), [[7, 8, 9]])
    # trailing bigram (9,9)... pretend history ends at slot 5: the (9,9)
    # pair at q=4 IS the trailing bigram itself -> excluded -> fallback
    d = lookup_draft(hist[:, :6], valid[:, :6],
                     jnp.asarray([9]), jnp.asarray([9]), 3)
    np.testing.assert_array_equal(np.asarray(d), [[9, 9, 9]])
    # most-recent wins: (5,6) occurs at q=0 and q=4; trailing at q=8
    hist2 = jnp.asarray([[5, 6, 7, 8, 5, 6, 9, 9, 5, 6]])
    d = lookup_draft(hist2, jnp.ones((1, 10), bool),
                     jnp.asarray([5]), jnp.asarray([6]), 2)
    np.testing.assert_array_equal(np.asarray(d), [[9, 9]])


def test_lookup_draft_prefers_longest_suffix():
    """Among bigram matches, the one whose PRECEDING context also matches
    the trailing suffix wins over a more recent shallow match (HF
    max-ngram-first rule); with no depth difference, recency still rules."""
    # trailing trigram (3,1,2); bigram (1,2) occurs at q=1 (preceded by 3 —
    # deep match) and q=5 (preceded by 9 — shallow). Recency alone would
    # pick q=5 -> draft 7; suffix preference must pick q=1 -> draft 8.
    hist = jnp.asarray([[3, 1, 2, 8, 9, 1, 2, 7, 3, 1, 2]])
    valid = jnp.ones((1, 11), bool)
    d = lookup_draft(hist, valid, jnp.asarray([1]), jnp.asarray([2]), 2)
    np.testing.assert_array_equal(np.asarray(d), [[8, 9]])
    # context_depth=0 recovers plain recency: q=5 -> draft [7, 3]
    d0 = lookup_draft(hist, valid, jnp.asarray([1]), jnp.asarray([2]), 2,
                      context_depth=0)
    np.testing.assert_array_equal(np.asarray(d0), [[7, 3]])


def test_lookup_draft_ignores_invalid_and_gap():
    # padded prompt: [1 2 0 0] + generated [1 2 5 ...]; the pair (2, 0)
    # spans valid/invalid and must not match; (1,2) at q=0 must.
    hist = jnp.asarray([[1, 2, 0, 0, 1, 2, 5, 0]])
    valid = jnp.asarray([[True, True, False, False, True, True, True, False]])
    d = lookup_draft(hist, valid, jnp.asarray([2]), jnp.asarray([5]), 2)
    # trailing bigram is (2,5) at (5,6); no earlier (2,5) pair -> fallback
    np.testing.assert_array_equal(np.asarray(d), [[5, 5]])
    d = lookup_draft(hist, valid, jnp.asarray([1]), jnp.asarray([2]), 2)
    # matches (1,2) at q=0 (q=4 is excluded only if it is the trailing
    # bigram itself; here the trailing VALID slot is 6, so q=4 is allowed
    # and more recent) -> continuation from slot 6: [5, 0]
    np.testing.assert_array_equal(np.asarray(d), [[5, 0]])


def test_accept_greedy_prefix():
    preds = jnp.asarray([[4, 5, 6, 7], [4, 5, 6, 7]])
    drafts = jnp.asarray([[4, 5, 9], [9, 5, 6]])
    emitted, n_emit = accept_greedy(preds, drafts)
    np.testing.assert_array_equal(np.asarray(emitted), np.asarray(preds))
    # row 0: drafts 4,5 match preds[0:2], 9 != 6 -> m=2 -> emit 3
    # row 1: first draft 9 != 4 -> m=0 -> emit 1 (bonus only)
    np.testing.assert_array_equal(np.asarray(n_emit), [3, 1])


def test_mask_after_eos_semantics():
    emitted = jnp.asarray([[3, 2, 5, 6], [3, 4, 5, 6]])
    n_emit = jnp.asarray([4, 2])
    unf = jnp.asarray([True, False])
    out, n2, unf2 = mask_after_eos(emitted, n_emit, unf, eos_token_id=2,
                                   pad_token_id=0)
    # row 0: eos at slot 1 kept, rest padded; row 1 already finished -> pad
    np.testing.assert_array_equal(np.asarray(out),
                                  [[3, 2, 0, 0], [0, 0, 0, 0]])
    np.testing.assert_array_equal(np.asarray(unf2), [False, False])
    np.testing.assert_array_equal(np.asarray(n2), np.asarray(n_emit))


def _toy():
    cfg = GPTNeoConfig(vocab_size=64, hidden_size=64, num_layers=2,
                       num_heads=4, window_size=6,
                       max_position_embeddings=128)
    vt = VideoTextConfig(features_dim=16, max_feats=4, ds_factor_attn=0,
                         ds_factor_ff=0)
    from frozenbilm_tpu.models.gptneo import init_gptneo_params

    params = init_gptneo_params(jax.random.PRNGKey(0), cfg, vt)
    return cfg, vt, params


def _parity(cfg, vt, params, ids, am, video, vm, max_new, eos, **spec_kw):
    from frozenbilm_tpu.models.gptneo import (gptneo_greedy_cached,
                                              gptneo_speculative_cached)

    ref = np.asarray(gptneo_greedy_cached(
        params, cfg, vt, video=video, video_mask=vm, input_ids=ids,
        attention_mask=am, max_new_tokens=max_new, eos_token_id=eos,
        kv_int8=spec_kw.get("kv_int8", False)))
    got = np.asarray(gptneo_speculative_cached(
        params, cfg, vt, video=video, video_mask=vm, input_ids=ids,
        attention_mask=am, max_new_tokens=max_new, eos_token_id=eos,
        **spec_kw))
    np.testing.assert_array_equal(got, ref)


def test_speculative_matches_greedy_random_prompt():
    cfg, vt, params = _toy()
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(3, 64, size=(3, 10)))
    am = jnp.ones((3, 10), jnp.int32)
    video = jnp.asarray(rng.normal(size=(3, 4, 16)), jnp.float32)
    vm = jnp.ones((3, 4), jnp.int32)
    _parity(cfg, vt, params, ids, am, video, vm, 12, None, n_draft=4)


def test_speculative_matches_greedy_repetitive_prompt_and_padding():
    """Repetitive prompts drive real acceptance (the drafter finds its
    bigrams); rows have different pad lengths so per-row positions and
    masks are exercised."""
    cfg, vt, params = _toy()
    rng = np.random.default_rng(1)
    loop_row = np.tile([7, 8, 9, 10], 4)  # 16 tokens of period-4 repeats
    ids = np.stack([loop_row,
                    rng.integers(3, 64, size=16)])
    am = np.ones((2, 16), np.int64)
    am[1, 12:] = 0  # row 1 right-padded
    ids[1, 12:] = 0
    video = jnp.asarray(rng.normal(size=(2, 4, 16)), jnp.float32)
    vm = jnp.ones((2, 4), jnp.int32)
    _parity(cfg, vt, params, jnp.asarray(ids), jnp.asarray(am), video, vm,
            16, None, n_draft=6)


def test_speculative_matches_greedy_with_eos():
    """Pick eos = a token greedy actually emits mid-stream, so early
    termination + post-eos padding are exercised on a real trajectory."""
    from frozenbilm_tpu.models.gptneo import gptneo_greedy_cached

    cfg, vt, params = _toy()
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(3, 64, size=(2, 8)))
    am = jnp.ones((2, 8), jnp.int32)
    video = jnp.asarray(rng.normal(size=(2, 4, 16)), jnp.float32)
    vm = jnp.ones((2, 4), jnp.int32)
    free = np.asarray(gptneo_greedy_cached(
        params, cfg, vt, video=video, video_mask=vm, input_ids=ids,
        attention_mask=am, max_new_tokens=10, eos_token_id=None))
    eos = int(free[0, 8 + 4])  # token greedy emits at step 4 of row 0
    _parity(cfg, vt, params, ids, am, video, vm, 10, eos, n_draft=3)


def test_speculative_kv_int8_matches_greedy_kv_int8():
    """Speculation composes with the int8 KV cache: per-vector quant is
    identical whether written one at a time (kv_write) or K at a time
    (_decode_many), so outputs stay token-exact vs greedy kv_int8."""
    cfg, vt, params = _toy()
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(3, 64, size=(2, 10)))
    am = jnp.ones((2, 10), jnp.int32)
    video = jnp.asarray(rng.normal(size=(2, 4, 16)), jnp.float32)
    vm = jnp.ones((2, 4), jnp.int32)
    _parity(cfg, vt, params, ids, am, video, vm, 8, None,
            n_draft=4, kv_int8=True)


def test_gptj_speculative_matches_greedy():
    """GPT-J twin: rotary per-row positions, parallel residual, scaled
    attention — token-exact vs gptj_greedy_cached, bf16-cache and int8-KV,
    with padded rows and a repetitive prompt driving real acceptance."""
    from frozenbilm_tpu.config import GPTJConfig
    from frozenbilm_tpu.models.gptj import (gptj_greedy_cached,
                                            gptj_speculative_cached,
                                            init_gptj_params)

    cfg = GPTJConfig(vocab_size=64, hidden_size=64, num_layers=2,
                     num_heads=4, rotary_dim=8, max_position_embeddings=128)
    vt = VideoTextConfig(features_dim=16, max_feats=4, ds_factor_attn=0,
                         ds_factor_ff=0)
    params = init_gptj_params(jax.random.PRNGKey(0), cfg, vt)
    rng = np.random.default_rng(4)
    ids = np.stack([np.tile([7, 8, 9, 10], 3),
                    rng.integers(3, 64, size=12)])
    am = np.ones((2, 12), np.int64)
    am[1, 9:] = 0
    ids[1, 9:] = 0
    ids, am = jnp.asarray(ids), jnp.asarray(am)
    video = jnp.asarray(rng.normal(size=(2, 4, 16)), jnp.float32)
    vm = jnp.ones((2, 4), jnp.int32)
    for kv8 in (False, True):
        ref = np.asarray(gptj_greedy_cached(
            params, cfg, vt, video=video, video_mask=vm, input_ids=ids,
            attention_mask=am, max_new_tokens=10, eos_token_id=None,
            kv_int8=kv8))
        got = np.asarray(gptj_speculative_cached(
            params, cfg, vt, video=video, video_mask=vm, input_ids=ids,
            attention_mask=am, max_new_tokens=10, eos_token_id=None,
            n_draft=5, kv_int8=kv8))
        np.testing.assert_array_equal(got, ref)


def test_oracle_drafts_exact_and_acceptance_controlled():
    """draft_oracle replaces the lookup drafter with an injected token
    stream (the acceptance-controlled bench mode, VERDICT r3 next #5).
    Invariants: (a) emitted tokens stay greedy-exact for ANY oracle —
    perfect, corrupted, or garbage; (b) a perfect oracle (the model's own
    greedy continuation) reaches full acceptance: ceil(new/(n_draft+1))
    verify steps; (c) a corrupted oracle takes strictly more steps."""
    from frozenbilm_tpu.models.gptneo import (gptneo_greedy_cached,
                                              gptneo_speculative_cached)

    cfg, vt, params = _toy()
    rng = np.random.default_rng(7)
    B, T, new, nd = 2, 10, 12, 4
    ids = jnp.asarray(rng.integers(3, 64, size=(B, T)))
    am = jnp.ones((B, T), jnp.int32)
    video = jnp.asarray(rng.normal(size=(B, 4, 16)), jnp.float32)
    vm = jnp.ones((B, 4), jnp.int32)
    ref = np.asarray(gptneo_greedy_cached(
        params, cfg, vt, video=video, video_mask=vm, input_ids=ids,
        attention_mask=am, max_new_tokens=new))
    true_cont = ref[:, T:]

    def run(oracle):
        toks, stats = gptneo_speculative_cached(
            params, cfg, vt, video=video, video_mask=vm, input_ids=ids,
            attention_mask=am, max_new_tokens=new, n_draft=nd,
            return_stats=True, draft_oracle=jnp.asarray(oracle))
        return np.asarray(toks), int(np.asarray(stats["steps"]))

    toks_p, steps_p = run(true_cont)  # perfect oracle
    np.testing.assert_array_equal(toks_p, ref)
    assert steps_p == -(-new // (nd + 1)), steps_p  # full acceptance

    corrupted = true_cont.copy()
    corrupted[:, 1::3] = (corrupted[:, 1::3] + 1) % 64
    toks_c, steps_c = run(corrupted)
    np.testing.assert_array_equal(toks_c, ref)
    assert steps_c > steps_p

    garbage = rng.integers(3, 64, size=(B, new))
    toks_g, _ = run(garbage)
    np.testing.assert_array_equal(toks_g, ref)
