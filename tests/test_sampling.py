"""Sampled decoding (ops/sampling.py): HF warper-stack semantics +
end-to-end threading through the KV-cache decode scan."""

import jax
import jax.numpy as jnp
import numpy as np

from frozenbilm_tpu.config import GPTNeoConfig, VideoTextConfig
from frozenbilm_tpu.models.gptneo import gptneo_greedy_cached, init_gptneo_params
from frozenbilm_tpu.ops.sampling import apply_top_k, apply_top_p, select_token


def test_top_k_masks_below_kth():
    logits = jnp.asarray([[1.0, 5.0, 3.0, 2.0, 4.0]])
    out = np.asarray(apply_top_k(logits, 2))
    assert out[0, 1] == 5.0 and out[0, 4] == 4.0
    assert (out[0, [0, 2, 3]] < -1e9).all()
    # k >= V is a no-op
    np.testing.assert_array_equal(np.asarray(apply_top_k(logits, 5)), logits)
    np.testing.assert_array_equal(np.asarray(apply_top_k(logits, 0)), logits)


def test_top_p_nucleus():
    # probs ~ [0.6438, 0.2368, 0.0871, 0.0117, 0.0206] for these logits
    logits = jnp.log(jnp.asarray([[0.64, 0.24, 0.09, 0.012, 0.018]]))
    out = np.asarray(apply_top_p(logits, 0.8))
    # 0.64 < 0.8 so token1 joins; 0.64+0.24=0.88 >= 0.8 stops the set there
    assert np.isfinite(out[0, 0]) and out[0, 0] > -1e9
    assert out[0, 1] > -1e9
    assert (out[0, 2:] < -1e9).all()
    # p=1 no-op; tiny p keeps exactly the top-1
    np.testing.assert_array_equal(np.asarray(apply_top_p(logits, 1.0)), logits)
    only_top = np.asarray(apply_top_p(logits, 1e-6))
    assert only_top[0, 0] > -1e9 and (only_top[0, 1:] < -1e9).all()


def test_select_token_greedy_and_restricted_support():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(4, 32)), jnp.float32)
    greedy = np.asarray(select_token(logits))
    np.testing.assert_array_equal(greedy, np.asarray(logits).argmax(-1))
    # temperature>0 with rng: samples stay inside the top-k support
    top2 = set(map(tuple, np.argsort(np.asarray(logits), -1)[:, -2:]))
    for seed in range(20):
        s = np.asarray(select_token(logits, jax.random.PRNGKey(seed),
                                    temperature=1.0, top_k=2))
        srt = np.argsort(np.asarray(logits), -1)
        for b in range(4):
            assert s[b] in srt[b, -2:], (b, s[b])
    # temperature -> 0+ behaves like argmax under sampling too
    s = np.asarray(select_token(logits, jax.random.PRNGKey(0), temperature=1e-4))
    np.testing.assert_array_equal(s, greedy)


def test_cached_decode_topk1_equals_greedy():
    """top_k=1 sampling through the scan must reproduce greedy exactly —
    pins the rng threading + warper order inside the decode loop."""
    cfg = GPTNeoConfig(vocab_size=97, hidden_size=32, num_layers=2,
                       num_heads=2, window_size=4, max_position_embeddings=64)
    vt = VideoTextConfig(features_dim=16, max_feats=3, ds_factor_attn=0,
                         ds_factor_ff=0)
    params = init_gptneo_params(jax.random.PRNGKey(0), cfg, vt)
    rng = np.random.default_rng(0)
    B, T, F = 2, 6, 3
    ids = jnp.asarray(rng.integers(3, cfg.vocab_size, size=(B, T)))
    am = jnp.ones((B, T), jnp.int32)
    video = jnp.asarray(rng.normal(size=(B, F, 16)), jnp.float32)
    vm = jnp.ones((B, F), jnp.int32)

    greedy = np.asarray(gptneo_greedy_cached(
        params, cfg, vt, video=video, video_mask=vm, input_ids=ids,
        attention_mask=am, max_new_tokens=5))
    sampled = np.asarray(gptneo_greedy_cached(
        params, cfg, vt, video=video, video_mask=vm, input_ids=ids,
        attention_mask=am, max_new_tokens=5,
        temperature=0.7, top_k=1, rng=jax.random.PRNGKey(3)))
    np.testing.assert_array_equal(greedy, sampled)


def test_gptj_cached_decode_topk1_equals_greedy():
    from frozenbilm_tpu.config import GPTJConfig
    from frozenbilm_tpu.models.gptj import gptj_greedy_cached, init_gptj_params

    cfg = GPTJConfig(vocab_size=97, hidden_size=32, num_layers=2, num_heads=2,
                     rotary_dim=8, max_position_embeddings=64)
    vt = VideoTextConfig(features_dim=16, max_feats=3, ds_factor_attn=0,
                         ds_factor_ff=0)
    params = init_gptj_params(jax.random.PRNGKey(0), cfg, vt)
    rng = np.random.default_rng(2)
    B, T, F = 2, 6, 3
    ids = jnp.asarray(rng.integers(3, cfg.vocab_size, size=(B, T)))
    am = jnp.ones((B, T), jnp.int32)
    video = jnp.asarray(rng.normal(size=(B, F, 16)), jnp.float32)
    vm = jnp.ones((B, F), jnp.int32)

    greedy = np.asarray(gptj_greedy_cached(
        params, cfg, vt, video=video, video_mask=vm, input_ids=ids,
        attention_mask=am, max_new_tokens=5))
    sampled = np.asarray(gptj_greedy_cached(
        params, cfg, vt, video=video, video_mask=vm, input_ids=ids,
        attention_mask=am, max_new_tokens=5,
        temperature=0.5, top_k=1, rng=jax.random.PRNGKey(9)))
    np.testing.assert_array_equal(greedy, sampled)


def test_cached_decode_sampling_varies_with_seed():
    cfg = GPTNeoConfig(vocab_size=97, hidden_size=32, num_layers=2,
                       num_heads=2, window_size=4, max_position_embeddings=64)
    vt = VideoTextConfig(features_dim=0, max_feats=0, ds_factor_attn=0,
                         ds_factor_ff=0)
    params = init_gptneo_params(jax.random.PRNGKey(0), cfg, vt)
    rng = np.random.default_rng(1)
    B, T = 2, 6
    ids = jnp.asarray(rng.integers(3, cfg.vocab_size, size=(B, T)))
    am = jnp.ones((B, T), jnp.int32)

    outs = [np.asarray(gptneo_greedy_cached(
        params, cfg, vt, video=None, video_mask=None, input_ids=ids,
        attention_mask=am, max_new_tokens=8,
        temperature=1.5, rng=jax.random.PRNGKey(seed))) for seed in (0, 1)]
    assert outs[0].shape == (B, T + 8)
    assert not np.array_equal(outs[0], outs[1])  # different seeds differ
    # same seed reproduces
    again = np.asarray(gptneo_greedy_cached(
        params, cfg, vt, video=None, video_mask=None, input_ids=ids,
        attention_mask=am, max_new_tokens=8,
        temperature=1.5, rng=jax.random.PRNGKey(0)))
    np.testing.assert_array_equal(outs[0], again)
