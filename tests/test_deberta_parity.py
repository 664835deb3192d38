"""Golden parity: our JAX DeBERTa-v2 vs the reference torch implementation.

The upstream model (reference model/deberta.py) is loaded read-only and run
in eval mode on fixed inputs; our forward must match its logits to fp32
tolerance — including the video prefix, adapters, conv layer, EMD decoder,
and the answer-vocabulary scoring path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frozenbilm_tpu.config import DebertaV2Config, VideoTextConfig
from frozenbilm_tpu.models.deberta import (
    deberta_forward,
    init_deberta_params,
    set_answer_embeddings,
)
from frozenbilm_tpu.utils.hf_import import (
    deberta_overlay_from_torch,
    numpy_tree_to_jax,
    torch_state_dict_to_numpy,
)

SMALL = dict(
    vocab_size=99,
    hidden_size=32,
    num_hidden_layers=3,
    num_attention_heads=4,
    intermediate_size=64,
    max_position_embeddings=64,
    relative_attention=True,
    position_buckets=8,
    norm_rel_ebd="layer_norm",
    share_att_key=True,
    position_biased_input=False,
    conv_kernel_size=3,
    conv_act="gelu",
    type_vocab_size=0,
    pad_token_id=0,
    layer_norm_eps=1e-7,
)


def _build_pair(ds_factor=4, features_dim=16, n_ans=7, seed=0, **cfg_overrides):
    import torch
    from transformers import DebertaV2Config as HFDebertaV2Config

    from tests.reference_loader import load_reference_deberta

    ref_mod = load_reference_deberta()
    cfg_kwargs = {**SMALL, **cfg_overrides}
    hf_cfg = HFDebertaV2Config(**cfg_kwargs, pos_att_type="p2c|c2p")
    torch.manual_seed(seed)
    ref = ref_mod.DebertaV2ForMaskedLM(
        hf_cfg, max_feats=4, features_dim=features_dim, freeze_lm=True,
        freeze_mlm=True, ds_factor_attn=ds_factor, ds_factor_ff=ds_factor,
        ft_ln=True, dropout=0.1, n_ans=n_ans, freeze_last=True,
    )
    ref.eval()

    cfg = DebertaV2Config(**cfg_kwargs, pos_att_type=("p2c", "c2p"))
    vt = VideoTextConfig(
        features_dim=features_dim, max_feats=4, ds_factor_attn=ds_factor,
        ds_factor_ff=ds_factor, n_ans=n_ans,
    )
    template = init_deberta_params(jax.random.PRNGKey(0), cfg, vt)
    sd = torch_state_dict_to_numpy(ref.state_dict())
    params = numpy_tree_to_jax(deberta_overlay_from_torch(template, sd, cfg))
    return ref, params, cfg, vt


def _inputs(features_dim=16, seed=0):
    rng = np.random.default_rng(seed)
    B, T, F = 2, 12, 4
    ids = rng.integers(1, 99, size=(B, T))
    am = np.ones((B, T), np.int64)
    am[0, -3:] = 0
    video = rng.normal(size=(B, F, features_dim)).astype(np.float32)
    vm = np.ones((B, F), np.int64)
    vm[1, -1:] = 0
    return ids, am, video, vm


@pytest.mark.parametrize("with_video", [True, False])
def test_mlm_logits_parity(with_video):
    import torch

    ref, params, cfg, vt = _build_pair()
    ids, am, video, vm = _inputs()
    with torch.no_grad():
        out_ref = ref(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(am).float(),
            video=torch.tensor(video) if with_video else None,
            video_mask=torch.tensor(vm).float() if with_video else None,
            mlm=True,
        )["logits"].numpy()
    out = deberta_forward(
        params, cfg, vt, jnp.asarray(ids), jnp.asarray(am),
        jnp.asarray(video) if with_video else None,
        jnp.asarray(vm) if with_video else None,
        mlm=True,
    )
    ours = np.asarray(out.logits)
    assert ours.shape == out_ref.shape
    np.testing.assert_allclose(out_ref, ours, atol=2e-4, rtol=1e-3)


def test_answer_scoring_parity():
    import torch

    ref, params, cfg, vt = _build_pair()
    ids, am, video, vm = _inputs()
    a2tok = np.array([[3, 9, 0], [5, 0, 0], [7, 8, 9], [1, 2, 0],
                      [10, 0, 0], [11, 12, 0], [13, 0, 0]])
    ref.set_answer_embeddings(torch.tensor(a2tok))
    params = set_answer_embeddings(params, a2tok, pad_token_id=cfg.pad_token_id)
    with torch.no_grad():
        out_ref = ref(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(am).float(),
            video=torch.tensor(video), video_mask=torch.tensor(vm).float(),
            mlm=False,
        )["logits"].numpy()
    out = deberta_forward(
        params, cfg, vt, jnp.asarray(ids), jnp.asarray(am),
        jnp.asarray(video), jnp.asarray(vm), mlm=False,
    )
    np.testing.assert_allclose(out_ref, np.asarray(out.logits), atol=2e-4, rtol=1e-3)


def test_mlm_loss_parity():
    import torch

    ref, params, cfg, vt = _build_pair()
    ids, am, video, vm = _inputs()
    rng = np.random.default_rng(1)
    labels = rng.integers(1, 99, size=ids.shape)
    labels[am == 0] = -100
    labels[:, ::2] = -100
    with torch.no_grad():
        loss_ref = ref(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(am).float(),
            video=torch.tensor(video), video_mask=torch.tensor(vm).float(),
            labels=torch.tensor(labels), mlm=True,
        )["loss"].item()
    out = deberta_forward(
        params, cfg, vt, jnp.asarray(ids), jnp.asarray(am),
        jnp.asarray(video), jnp.asarray(vm), labels=jnp.asarray(labels), mlm=True,
    )
    assert abs(loss_ref - float(out.loss)) < 1e-4


def test_no_adapter_no_answers_parity():
    """BERT-style config: no adapters, no answer head, text-only."""
    import torch

    ref, params, cfg, vt = _build_pair(ds_factor=0, n_ans=0)
    ids, am, _, _ = _inputs()
    with torch.no_grad():
        out_ref = ref(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(am).float(),
            mlm=True,
        )["logits"].numpy()
    out = deberta_forward(params, cfg, vt, jnp.asarray(ids), jnp.asarray(am), mlm=True)
    np.testing.assert_allclose(out_ref, np.asarray(out.logits), atol=2e-4, rtol=1e-3)


def test_position_biased_input_path():
    """position_biased_input=True skips EMD and adds absolute positions."""
    import torch

    ref, params, cfg, vt = _build_pair(position_biased_input=True, conv_kernel_size=0)
    ids, am, video, vm = _inputs()
    with torch.no_grad():
        out_ref = ref(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(am).float(),
            video=torch.tensor(video), video_mask=torch.tensor(vm).float(), mlm=True,
        )["logits"].numpy()
    out = deberta_forward(
        params, cfg, vt, jnp.asarray(ids), jnp.asarray(am),
        jnp.asarray(video), jnp.asarray(vm), mlm=True,
    )
    np.testing.assert_allclose(out_ref, np.asarray(out.logits), atol=2e-4, rtol=1e-3)


def test_jit_and_grads():
    """Forward jits; grads flow and are finite (training path smoke test)."""
    _, params, cfg, vt = _build_pair()
    ids, am, video, vm = _inputs()
    labels = np.where(am == 1, ids, -100)

    @jax.jit
    def loss_fn(p):
        return deberta_forward(
            p, cfg, vt, jnp.asarray(ids), jnp.asarray(am), jnp.asarray(video),
            jnp.asarray(vm), labels=jnp.asarray(labels), mlm=True,
        ).loss

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(g)
    assert all(bool(jnp.isfinite(x).all()) for x in leaves)
    # adapters and linear_video receive nonzero gradient
    assert float(jnp.abs(g["embeddings"]["linear_video"]["kernel"]).sum()) > 0


def test_rel_select_modes_equivalent(monkeypatch):
    """skew / onehot / gather selection paths compute the same logits —
    they are three formulations of the same torch.gather
    (reference deberta.py:870-918)."""
    ref, params, cfg, vt = _build_pair()
    ids, am, video, vm = _inputs()
    outs = {}
    # skew+chunk cases: divisible, non-divisible (forces a ragged last
    # chunk through skew_select_rect), and chunk > L (degenerates to the
    # plain skew window)
    cases = [("skew", None), ("onehot", None), ("gather", None),
             ("skew", 8), ("skew", 5), ("skew", 4096)]
    for mode, chunk in cases:
        monkeypatch.setenv("FROZENBILM_REL_SELECT", mode)
        if chunk is None:
            monkeypatch.delenv("FROZENBILM_SKEW_CHUNK", raising=False)
        else:
            monkeypatch.setenv("FROZENBILM_SKEW_CHUNK", str(chunk))
        out = deberta_forward(
            params, cfg, vt, jnp.asarray(ids), jnp.asarray(am),
            jnp.asarray(video), jnp.asarray(vm), mlm=True)
        outs[(mode, chunk)] = np.asarray(out.logits)
    ref_out = outs[("gather", None)]
    for key, got in outs.items():
        np.testing.assert_allclose(got, ref_out, atol=2e-5, rtol=1e-5,
                                   err_msg=str(key))
