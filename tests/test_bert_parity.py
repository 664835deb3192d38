"""Golden parity: our JAX BERT vs the reference torch implementation
(reference model/bert.py), covering the video prefix and answer scoring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frozenbilm_tpu.config import BertConfig, VideoTextConfig
from frozenbilm_tpu.models.bert import (
    bert_forward,
    init_bert_params,
    set_answer_embeddings_bert,
)
from frozenbilm_tpu.utils.hf_import import (
    bert_overlay_from_torch,
    numpy_tree_to_jax,
    torch_state_dict_to_numpy,
)

SMALL = dict(
    vocab_size=97,
    hidden_size=32,
    num_hidden_layers=3,
    num_attention_heads=4,
    intermediate_size=64,
    max_position_embeddings=64,
    type_vocab_size=2,
    pad_token_id=0,
    layer_norm_eps=1e-12,
)


def _build_pair(features_dim=16, n_ans=5, seed=0):
    import torch
    from transformers import BertConfig as HFBertConfig

    from tests.reference_loader import load_reference_bert

    ref_mod = load_reference_bert()
    hf_cfg = HFBertConfig(**SMALL)
    torch.manual_seed(seed)
    ref = ref_mod.BertForMaskedLM(
        hf_cfg, features_dim=features_dim, max_feats=4, freeze_lm=True,
        ft_ln=True, freeze_mlm=True, n_ans=n_ans, freeze_last=True,
    )
    ref.eval()
    # HF post_init ties decoder.weight to word embeddings; mirror that tie
    # by construction (our MLM logits always use the word-embedding table).
    assert ref.cls.predictions.decoder.weight.data_ptr() == \
        ref.bert.embeddings.word_embeddings.weight.data_ptr()

    cfg = BertConfig(**SMALL)
    vt = VideoTextConfig(features_dim=features_dim, max_feats=4,
                         ds_factor_attn=0, ds_factor_ff=0, n_ans=n_ans)
    template = init_bert_params(jax.random.PRNGKey(0), cfg, vt)
    sd = torch_state_dict_to_numpy(ref.state_dict())
    params = numpy_tree_to_jax(bert_overlay_from_torch(template, sd, cfg))
    return ref, params, cfg, vt


def _inputs(features_dim=16, seed=0):
    rng = np.random.default_rng(seed)
    B, T, F = 2, 10, 4
    ids = rng.integers(1, 97, size=(B, T))
    am = np.ones((B, T), np.int64)
    am[0, -2:] = 0
    video = rng.normal(size=(B, F, features_dim)).astype(np.float32)
    vm = np.ones((B, F), np.int64)
    vm[1, -1:] = 0
    return ids, am, video, vm


@pytest.mark.parametrize("with_video", [True, False])
def test_bert_mlm_logits_parity(with_video):
    import torch

    ref, params, cfg, vt = _build_pair()
    ids, am, video, vm = _inputs()
    with torch.no_grad():
        ref_logits = ref(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(am).float(),
            video=torch.tensor(video) if with_video else None,
            video_mask=torch.tensor(vm).float() if with_video else None,
            mlm=True,
        )["logits"].numpy()
    out = bert_forward(
        params, cfg, vt, jnp.asarray(ids), jnp.asarray(am),
        jnp.asarray(video) if with_video else None,
        jnp.asarray(vm) if with_video else None, mlm=True,
    )
    ours = np.asarray(out.logits)
    assert ours.shape == ref_logits.shape
    # compare only at valid (unpadded) query positions; fully-masked rows
    # intentionally differ (see module docstring)
    full_mask = np.concatenate([vm, am], 1) if with_video else am
    valid = full_mask.astype(bool)
    np.testing.assert_allclose(ref_logits[valid], ours[valid], atol=2e-4, rtol=1e-3)


def test_bert_answer_scoring_parity():
    import torch

    ref, params, cfg, vt = _build_pair()
    ids, am, video, vm = _inputs()
    a2tok = np.array([[3, 9, 0], [5, 0, 0], [7, 8, 9], [1, 2, 0], [10, 0, 0]])
    ref.set_answer_embeddings(torch.tensor(a2tok))
    params = set_answer_embeddings_bert(params, a2tok, pad_token_id=cfg.pad_token_id)
    with torch.no_grad():
        ref_logits = ref(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(am).float(),
            video=torch.tensor(video), video_mask=torch.tensor(vm).float(), mlm=False,
        )["logits"].numpy()
    out = bert_forward(
        params, cfg, vt, jnp.asarray(ids), jnp.asarray(am),
        jnp.asarray(video), jnp.asarray(vm), mlm=False,
    )
    valid = np.concatenate([vm, am], 1).astype(bool)
    np.testing.assert_allclose(ref_logits[valid], np.asarray(out.logits)[valid],
                               atol=2e-4, rtol=1e-3)


def test_bert_mlm_loss_parity():
    import torch

    ref, params, cfg, vt = _build_pair()
    ids, am, video, vm = _inputs()
    rng = np.random.default_rng(1)
    labels = rng.integers(1, 97, size=ids.shape)
    labels[am == 0] = -100
    labels[:, 1::2] = -100
    with torch.no_grad():
        loss_ref = ref(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(am).float(),
            video=torch.tensor(video), video_mask=torch.tensor(vm).float(),
            labels=torch.tensor(labels), mlm=True,
        )["loss"].item()
    out = bert_forward(
        params, cfg, vt, jnp.asarray(ids), jnp.asarray(am),
        jnp.asarray(video), jnp.asarray(vm), labels=jnp.asarray(labels), mlm=True,
    )
    assert abs(loss_ref - float(out.loss)) < 1e-4
