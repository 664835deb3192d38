"""Golden parity: our JAX GPT-J / GPT-Neo vs the reference torch models,
including video prefix, causal loss with shifted labels, and the
teacher-forced score() path (argmax equality with the reference's stepwise
KV-cache loop; SURVEY.md §7.3 'AR scoring throughput')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frozenbilm_tpu.config import GPTJConfig, GPTNeoConfig, VideoTextConfig
from frozenbilm_tpu.models.gptj import gptj_forward, gptj_score, init_gptj_params
from frozenbilm_tpu.models.gptneo import (
    gptneo_forward,
    gptneo_score,
    init_gptneo_params,
)
from frozenbilm_tpu.utils.hf_import import (
    gptj_overlay_from_torch,
    gptneo_overlay_from_torch,
    numpy_tree_to_jax,
    torch_state_dict_to_numpy,
)

VT = VideoTextConfig(features_dim=16, max_feats=4, ds_factor_attn=0, ds_factor_ff=0)


def _gptj_pair(seed=0):
    import torch
    from transformers import GPTJConfig as HFGPTJConfig

    from tests.reference_loader import load_reference_gptj

    ref_mod = load_reference_gptj()
    hf_cfg = HFGPTJConfig(
        vocab_size=101, n_positions=64, n_embd=32, n_layer=3, n_head=4,
        rotary_dim=4, n_inner=None, activation_function="gelu_new",
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    torch.manual_seed(seed)
    ref = ref_mod.GPTJForCausalLM(
        hf_cfg, features_dim=16, max_feats=4, freeze_lm=True, freeze_mlm=True,
        ft_ln=True,
    )
    ref.eval()
    cfg = GPTJConfig(vocab_size=101, hidden_size=32, num_layers=3, num_heads=4,
                     rotary_dim=4, max_position_embeddings=64)
    template = init_gptj_params(jax.random.PRNGKey(0), cfg, VT)
    sd = torch_state_dict_to_numpy(ref.state_dict())
    params = numpy_tree_to_jax(gptj_overlay_from_torch(template, sd, cfg))
    return ref, params, cfg


def _gptneo_pair(seed=0):
    import torch
    from transformers import GPTNeoConfig as HFGPTNeoConfig

    from tests.reference_loader import load_reference_gptneo

    ref_mod = load_reference_gptneo()
    hf_cfg = HFGPTNeoConfig(
        vocab_size=101, max_position_embeddings=64, hidden_size=32,
        num_layers=4, attention_types=[[["global", "local"], 2]], num_heads=4,
        intermediate_size=None, window_size=5, activation_function="gelu_new",
        resid_dropout=0.0, embed_dropout=0.0, attention_dropout=0.0,
    )
    torch.manual_seed(seed)
    ref = ref_mod.GPTNeoForCausalLM(
        hf_cfg, features_dim=16, max_feats=4, freeze_lm=True, freeze_mlm=True,
        ft_ln=True,
    )
    ref.eval()
    cfg = GPTNeoConfig(vocab_size=101, hidden_size=32, num_layers=4, num_heads=4,
                       window_size=5, max_position_embeddings=64)
    template = init_gptneo_params(jax.random.PRNGKey(0), cfg, VT)
    sd = torch_state_dict_to_numpy(ref.state_dict())
    params = numpy_tree_to_jax(gptneo_overlay_from_torch(template, sd, cfg))
    return ref, params, cfg


def _inputs(seed=0, B=2, T=9, F=4):
    rng = np.random.default_rng(seed)
    ids = rng.integers(1, 101, size=(B, T))
    am = np.ones((B, T), np.int64)
    am[0, :2] = 0  # AR datasets left-pad (videoqa_ar.py:178-179)
    video = rng.normal(size=(B, F, 16)).astype(np.float32)
    vm = np.ones((B, F), np.int64)
    return ids, am, video, vm


@pytest.mark.parametrize("family", ["gptj", "gptneo"])
def test_gpt_logits_parity(family):
    import torch

    ref, params, cfg = _gptj_pair() if family == "gptj" else _gptneo_pair()
    fwd = gptj_forward if family == "gptj" else gptneo_forward
    ids, am, video, vm = _inputs()
    with torch.no_grad():
        out_ref = ref(
            video=torch.tensor(video), input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(
                np.concatenate([vm, am], 1)).float(),
        )["logits"].numpy()
    out = fwd(params, cfg, VT, jnp.asarray(ids), jnp.asarray(am),
              jnp.asarray(video), jnp.asarray(vm))
    ours = np.asarray(out.logits)
    assert ours.shape == out_ref.shape
    np.testing.assert_allclose(out_ref, ours, atol=3e-4, rtol=1e-3)


@pytest.mark.parametrize("family", ["gptj", "gptneo"])
def test_gpt_loss_parity(family):
    import torch

    ref, params, cfg = _gptj_pair() if family == "gptj" else _gptneo_pair()
    fwd = gptj_forward if family == "gptj" else gptneo_forward
    ids, am, video, vm = _inputs()
    labels = ids.copy()
    labels[am == 0] = -100
    with torch.no_grad():
        loss_ref = ref(
            video=torch.tensor(video), input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(np.concatenate([vm, am], 1)).float(),
            labels=torch.tensor(labels),
        )["loss"].item()
    out = fwd(params, cfg, VT, jnp.asarray(ids), jnp.asarray(am),
              jnp.asarray(video), jnp.asarray(vm), labels=jnp.asarray(labels))
    assert abs(loss_ref - float(out.loss)) < 2e-4


@pytest.mark.parametrize("family", ["gptj", "gptneo"])
def test_gpt_score_matches_stepwise_reference(family):
    """Our single-pass score == the reference's per-step KV-cache loop."""
    import torch

    ref, params, cfg = _gptj_pair() if family == "gptj" else _gptneo_pair()
    score = gptj_score if family == "gptj" else gptneo_score
    ids, am, video, vm = _inputs(B=3, T=7)
    rng = np.random.default_rng(3)
    targets = rng.integers(1, 101, size=(3, 4))

    full_am = np.concatenate([vm, am], 1)
    with torch.no_grad():
        ref_scores = ref.score(
            input_ids=torch.tensor(ids),
            target_ids=torch.tensor(targets),
            video=torch.tensor(video),
            attention_mask=torch.tensor(full_am).float(),
        ).numpy()
    ours = np.asarray(score(
        params, cfg, VT, video=jnp.asarray(video), video_mask=jnp.asarray(vm),
        input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(am),
        target_ids=jnp.asarray(targets),
    ))
    np.testing.assert_allclose(ref_scores, ours, atol=3e-5, rtol=1e-3)
    # the product-of-probs ranking the AR driver uses (videoqa_ar.py:100-107)
    np.testing.assert_array_equal(ref_scores.prod(-1).argmax(), ours.prod(-1).argmax())


@pytest.mark.parametrize("family", ["gptj", "gptneo"])
def test_gpt_greedy_cached_matches_full_forward(family):
    """KV-cache scan decode == full re-forward greedy, token for token.

    The cached decoder is the TPU rebuild of the reference's
    past_key_values incremental path (gptneo.py:715-745, gptj.py:737-767)."""
    from frozenbilm_tpu.models.gptj import gptj_greedy, gptj_greedy_cached
    from frozenbilm_tpu.models.gptneo import gptneo_greedy, gptneo_greedy_cached

    _, params, cfg = _gptj_pair() if family == "gptj" else _gptneo_pair()
    base_fn, fast_fn = ((gptj_greedy, gptj_greedy_cached) if family == "gptj"
                        else (gptneo_greedy, gptneo_greedy_cached))
    ids, am, video, vm = _inputs(B=3, T=7)
    kw = dict(video=jnp.asarray(video), video_mask=jnp.asarray(vm),
              input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(am),
              max_new_tokens=6)
    base = np.asarray(base_fn(params, cfg, VT, **kw))
    fast = np.asarray(jax.jit(
        lambda p, **k: fast_fn(p, cfg, VT, max_new_tokens=6, **k))(
        params, video=kw["video"], video_mask=kw["video_mask"],
        input_ids=kw["input_ids"], attention_mask=kw["attention_mask"]))
    assert fast.shape == (3, 7 + 6)
    np.testing.assert_array_equal(base, fast)


def test_gptneo_greedy_cached_matches_reference_vendored_generate():
    """Argmax parity with the reference's own vendored greedy_search
    (gptneo.py:850-1726), video dropped after prefill via its
    prepare_inputs_for_generation KV-cache path."""
    import torch

    from frozenbilm_tpu.models.gptneo import gptneo_greedy_cached

    ref, params, cfg = _gptneo_pair()
    ids, am, video, vm = _inputs(B=3, T=7)
    full_am = np.concatenate([vm, am], 1)

    # 4.17-style stopping criterion: installed transformers' (>=4.50)
    # StoppingCriteriaList returns a per-row tensor, but the vendored loop
    # (gptneo.py:1700) expects a python bool
    class _MaxLen:
        def __call__(self, input_ids, scores, **kw):
            return input_ids.shape[-1] >= 12

    with torch.no_grad():
        gen = ref.greedy_search(
            torch.tensor(ids),
            stopping_criteria=_MaxLen(),
            pad_token_id=0,
            attention_mask=torch.tensor(full_am).float(),
            video=torch.tensor(video),
            use_cache=True,
        )
    ours = np.asarray(gptneo_greedy_cached(
        params, cfg, VT, video=jnp.asarray(video), video_mask=jnp.asarray(vm),
        input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(am),
        max_new_tokens=5))
    # the reference returns [prompt ‖ generated]; so do we
    np.testing.assert_array_equal(np.asarray(gen), ours)


@pytest.mark.parametrize("family", ["gptj", "gptneo"])
def test_gpt_greedy_cached_eos_pads_finished_rows(family):
    """HF unfinished_sequences semantics: a row that emits eos keeps it and
    produces pad afterwards; rows that never emit eos are unchanged
    (vendored greedy_search, gptneo.py:1680-1700)."""
    from frozenbilm_tpu.models.gptj import gptj_greedy_cached
    from frozenbilm_tpu.models.gptneo import gptneo_greedy_cached

    _, params, cfg = _gptj_pair() if family == "gptj" else _gptneo_pair()
    fn = gptj_greedy_cached if family == "gptj" else gptneo_greedy_cached
    ids, am, video, vm = _inputs(B=3, T=7)
    kw = dict(video=jnp.asarray(video), video_mask=jnp.asarray(vm),
              input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(am))
    base = np.asarray(fn(params, cfg, VT, max_new_tokens=6, **kw))
    gen = base[:, 7:]
    # pick the 2nd generated token of row 0 as the eos id so it triggers
    eos = int(gen[0, 1])
    out = np.asarray(fn(params, cfg, VT, max_new_tokens=6,
                        eos_token_id=eos, pad_token_id=0, **kw))[:, 7:]
    for b in range(3):
        hits = np.flatnonzero(out[b] == eos)
        if hits.size:
            cut = hits[0]
            assert (out[b, cut + 1:] == 0).all(), (b, out[b])
            np.testing.assert_array_equal(out[b, :cut + 1], gen[b, :cut + 1])
        else:
            np.testing.assert_array_equal(out[b], gen[b])
    assert (out[0, 2:] == 0).all()  # row 0 finished at step 1 by construction


def test_gptneo_prefix_cached_scoring_parity():
    """gptneo_prefill + gptneo_score_with_prefix == gptneo_score on the
    (B*C)-tiled batch (SURVEY.md §3.4 prefix-KV scoring): same
    probabilities without re-running the prompt per answer. The fixture's
    window_size=5 < prefix length makes the local-layer path non-trivial."""
    from frozenbilm_tpu.models.gptneo import (gptneo_prefill, gptneo_score,
                                              gptneo_score_with_prefix)

    _, params, cfg = _gptneo_pair()
    ids, am, video, vm = _inputs()
    B = ids.shape[0]
    rng = np.random.default_rng(3)
    for L2 in (1, 2, 4):
        C = 3
        tgt = rng.integers(1, 101, size=(C, L2))
        # oracle: tile questions x answers through the full-sequence scorer
        tiled = gptneo_score(
            params, cfg, VT,
            video=jnp.repeat(jnp.asarray(video), C, 0),
            video_mask=jnp.repeat(jnp.asarray(vm), C, 0),
            input_ids=jnp.repeat(jnp.asarray(ids), C, 0),
            attention_mask=jnp.repeat(jnp.asarray(am), C, 0),
            target_ids=jnp.tile(jnp.asarray(tgt), (B, 1)),
        ).reshape(B, C, L2)
        prefix = gptneo_prefill(params, cfg, VT, video=jnp.asarray(video),
                                video_mask=jnp.asarray(vm),
                                input_ids=jnp.asarray(ids),
                                attention_mask=jnp.asarray(am))
        got = gptneo_score_with_prefix(params, cfg, prefix, jnp.asarray(tgt))
        np.testing.assert_allclose(np.asarray(got), np.asarray(tiled),
                                   rtol=2e-4, atol=1e-6,
                                   err_msg=f"L2={L2}")


def test_gptj_prefix_cached_scoring_parity():
    """gptj_prefill + gptj_score_with_prefix == gptj_score on the tiled
    batch (rotary at absolute positions, scale-after-fill, parallel
    residual all preserved)."""
    from frozenbilm_tpu.models.gptj import (gptj_prefill, gptj_score,
                                            gptj_score_with_prefix)

    _, params, cfg = _gptj_pair()
    ids, am, video, vm = _inputs()
    B = ids.shape[0]
    rng = np.random.default_rng(5)
    for L2 in (1, 3):
        C = 3
        tgt = rng.integers(1, 101, size=(C, L2))
        tiled = gptj_score(
            params, cfg, VT,
            video=jnp.repeat(jnp.asarray(video), C, 0),
            video_mask=jnp.repeat(jnp.asarray(vm), C, 0),
            input_ids=jnp.repeat(jnp.asarray(ids), C, 0),
            attention_mask=jnp.repeat(jnp.asarray(am), C, 0),
            target_ids=jnp.tile(jnp.asarray(tgt), (B, 1)),
        ).reshape(B, C, L2)
        prefix = gptj_prefill(params, cfg, VT, video=jnp.asarray(video),
                              video_mask=jnp.asarray(vm),
                              input_ids=jnp.asarray(ids),
                              attention_mask=jnp.asarray(am))
        got = gptj_score_with_prefix(params, cfg, prefix, jnp.asarray(tgt))
        np.testing.assert_allclose(np.asarray(got), np.asarray(tiled),
                                   rtol=2e-4, atol=1e-6, err_msg=f"L2={L2}")
