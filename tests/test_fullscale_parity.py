"""FULL-SCALE (deberta-v2-xlarge config) logit parity vs the reference.

The network in this environment is blocked (no HF hub, no Google Drive), so
the released FrozenBiLM checkpoints cannot be downloaded — see ACCURACY.md.
This is the VERDICT-mandated substitute: the reference torch model is built
at the TRUE xlarge dimensions (0.9B params: vocab 128100, hidden 1536,
24 layers/heads, intermediate 6144, position buckets 256) with seeded
weights, exported through the real released-checkpoint path (torch .pth ->
load_any_checkpoint), and our forward must match its logits end to end —
video prefix, adapters, conv layer, disentangled attention, EMD, and the
answer-vocabulary scoring module. This exercises importer key-mapping and
numerics at the exact scale the released weights have.

Runtime: ~3-5 min on one CPU core (0.9B fp32 forwards on both sides).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frozenbilm_tpu.config import DebertaV2Config, VideoTextConfig
from frozenbilm_tpu.models.deberta import (
    deberta_answer_logits,
    deberta_forward,
    init_deberta_params,
    set_answer_embeddings,
)

# deberta-v2-xlarge (reference TRANSFORMERS config for the released ckpts)
XLARGE = dict(
    vocab_size=128100,
    hidden_size=1536,
    num_hidden_layers=24,
    num_attention_heads=24,
    intermediate_size=6144,
    max_position_embeddings=512,
    relative_attention=True,
    position_buckets=256,
    norm_rel_ebd="layer_norm",
    share_att_key=True,
    position_biased_input=False,
    conv_kernel_size=3,
    conv_act="gelu",
    type_vocab_size=0,
    pad_token_id=0,
    layer_norm_eps=1e-7,
)
N_ANS = 32
FEATURES_DIM = 768
MAX_FEATS = 10


@pytest.fixture(scope="module")
def xlarge_pair(tmp_path_factory):
    import torch
    from transformers import DebertaV2Config as HFDebertaV2Config

    from tests.reference_loader import load_reference_deberta

    ref_mod = load_reference_deberta()
    hf_cfg = HFDebertaV2Config(**XLARGE, pos_att_type="p2c|c2p")
    torch.manual_seed(0)
    ref = ref_mod.DebertaV2ForMaskedLM(
        hf_cfg, max_feats=MAX_FEATS, features_dim=FEATURES_DIM, freeze_lm=True,
        freeze_mlm=True, ds_factor_attn=8, ds_factor_ff=8, ft_ln=True,
        dropout=0.1, n_ans=N_ANS, freeze_last=True,
    )
    ref.eval()

    # the released-checkpoint path: torch .pth ({'model': sd}) -> native tree
    ckpt = tmp_path_factory.mktemp("xl") / "frozenbilm_like.pth"
    torch.save({"model": ref.state_dict()}, ckpt)

    cfg = DebertaV2Config(**XLARGE, pos_att_type=("p2c", "c2p"))
    vt = VideoTextConfig(features_dim=FEATURES_DIM, max_feats=MAX_FEATS,
                         ds_factor_attn=8, ds_factor_ff=8, n_ans=N_ANS)
    template = init_deberta_params(jax.random.PRNGKey(0), cfg, vt)

    from frozenbilm_tpu.utils.checkpoint import load_any_checkpoint

    params = load_any_checkpoint(str(ckpt), template, cfg, "deberta")
    params = jax.tree.map(jnp.asarray, params)
    return ref, params, cfg, vt


def _inputs(seed=0, B=2, T=24):
    rng = np.random.default_rng(seed)
    ids = rng.integers(5, XLARGE["vocab_size"], size=(B, T))
    ids[:, 7] = 128000  # [MASK]-like position for the answer path
    am = np.ones((B, T), np.int64)
    am[0, -4:] = 0
    video = rng.normal(size=(B, MAX_FEATS, FEATURES_DIM)).astype(np.float32)
    vm = np.ones((B, MAX_FEATS), np.int64)
    vm[1, -2:] = 0
    return ids, am, video, vm


def test_xlarge_mlm_logits_parity(xlarge_pair):
    """0.9B-scale MLM logits (EMD + adapters + conv + video prefix)."""
    import torch

    ref, params, cfg, vt = xlarge_pair
    ids, am, video, vm = _inputs()
    with torch.no_grad():
        out_ref = ref(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(am).float(),
            video=torch.tensor(video), video_mask=torch.tensor(vm).float(),
            mlm=True,
        )["logits"].numpy()
    out = deberta_forward(
        params, cfg, vt, jnp.asarray(ids), jnp.asarray(am),
        jnp.asarray(video), jnp.asarray(vm), mlm=True)
    ours = np.asarray(out.logits)
    assert ours.shape == out_ref.shape
    scale = np.abs(out_ref).max()
    np.testing.assert_allclose(out_ref, ours, atol=max(2e-4 * scale, 2e-4),
                               rtol=2e-3)


def test_xlarge_answer_scoring_parity(xlarge_pair):
    """The videoqa zero-shot scoring path at full scale: answer-embedding
    module built from a2tok mean pooling, logits read at the mask position
    (reference deberta.py:1342-1380, 1473-1479)."""
    import torch

    ref, params, cfg, vt = xlarge_pair
    ids, am, video, vm = _inputs(seed=1)

    rng = np.random.default_rng(7)
    a2tok = rng.integers(5, XLARGE["vocab_size"], size=(N_ANS, 5))
    a2tok[:, 3:] = 0  # pad tail like short answers
    with torch.no_grad():
        ref.set_answer_embeddings(torch.tensor(a2tok), freeze_last=True)
        out_ref = ref(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(am).float(),
            video=torch.tensor(video), video_mask=torch.tensor(vm).float(),
            mlm=False,
        )["logits"].numpy()
    params2 = set_answer_embeddings(params, a2tok, pad_token_id=cfg.pad_token_id)
    out = deberta_forward(
        params2, cfg, vt, jnp.asarray(ids), jnp.asarray(am),
        jnp.asarray(video), jnp.asarray(vm), mlm=False)
    h = out.last_hidden_state[:, MAX_FEATS + 7]
    ours = np.asarray(deberta_answer_logits(params2, cfg, h))
    ref_at_mask = out_ref[:, MAX_FEATS + 7]
    scale = np.abs(ref_at_mask).max()
    np.testing.assert_allclose(ref_at_mask, ours, atol=max(2e-4 * scale, 2e-4),
                               rtol=2e-3)
    # ranking identity — what accuracy actually depends on
    np.testing.assert_array_equal(ref_at_mask.argmax(-1), ours.argmax(-1))
