"""Fused disentangled-attention kernel vs the jnp oracle (interpret on CPU).

Kernel-level: fused (QK^T + c2p + p2c^T)/scale -> masked softmax -> AV against
disentangled_attention_reference, both p2c layouts, head blocking, padding,
and fully-masked rows. Model-level: deberta_forward with the kernel forced on
must match the XLA path across all three rel-select formulations (each feeds
the kernel a different bias layout).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frozenbilm_tpu.config import DebertaV2Config, VideoTextConfig
from frozenbilm_tpu.models.deberta import deberta_forward, init_deberta_params
from frozenbilm_tpu.ops.attention import (
    disentangled_attention_reference,
    fused_disentangled_attention,
)

SMALL = dict(
    vocab_size=99,
    hidden_size=32,
    num_hidden_layers=2,
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


def _rand(rng, *shape):
    return jnp.asarray(rng.normal(size=shape), jnp.float32)


@pytest.mark.parametrize(
    "L,p2c_is_ji,hblk",
    [(24, True, 1), (40, False, 2), (136, True, 3)],  # hblk=3 !| H=4 -> fallback 1
)
def test_kernel_matches_oracle(L, p2c_is_ji, hblk):
    rng = np.random.default_rng(0)
    B, H, D = 2, 4, 8
    q, k, v = (_rand(rng, B, H, L, D) for _ in range(3))
    c2p = _rand(rng, B, H, L, L)
    p2c = _rand(rng, B, H, L, L)
    m = np.ones((B, L), np.int32)
    m[0, -5:] = 0
    m[1, :] = 0  # fully-masked batch row: reference yields all-zero context
    mask = jnp.asarray(m)
    scale = math.sqrt(D * 3)
    ref = disentangled_attention_reference(
        q, k, v, c2p, p2c, mask, scale, p2c_is_ji=p2c_is_ji)
    out = fused_disentangled_attention(
        q, k, v, c2p, p2c, mask, scale,
        p2c_is_ji=p2c_is_ji, hblk=hblk, interpret=True)
    assert np.all(np.asarray(out)[1] == 0.0)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               atol=2e-5, rtol=1e-4)


def test_kernel_bf16_close():
    rng = np.random.default_rng(1)
    B, H, L, D = 1, 2, 48, 8
    q, k, v, c2p, p2c = (
        x.astype(jnp.bfloat16)
        for x in (_rand(rng, B, H, L, D), _rand(rng, B, H, L, D),
                  _rand(rng, B, H, L, D), _rand(rng, B, H, L, L),
                  _rand(rng, B, H, L, L))
    )
    mask = jnp.ones((B, L), jnp.int32)
    scale = math.sqrt(D * 3)
    ref = disentangled_attention_reference(q, k, v, c2p, p2c, mask, scale)
    out = fused_disentangled_attention(q, k, v, c2p, p2c, mask, scale,
                                       interpret=True)
    np.testing.assert_allclose(
        np.asarray(ref, np.float32), np.asarray(out, np.float32),
        atol=3e-2, rtol=3e-2)


def test_gate_defaults(monkeypatch):
    """auto = TPU and L >= 256; env forces both ways (incl. short L)."""
    from frozenbilm_tpu.ops.attention import fused_dattn_enabled

    monkeypatch.delenv("FROZENBILM_FUSED_ATTN", raising=False)
    on_tpu = jax.default_backend() == "tpu"
    assert fused_dattn_enabled(512) == on_tpu
    assert fused_dattn_enabled(74) is False  # short L never auto-fuses
    monkeypatch.setenv("FROZENBILM_FUSED_ATTN", "1")
    assert fused_dattn_enabled(74) is True
    monkeypatch.setenv("FROZENBILM_FUSED_ATTN", "0")
    assert fused_dattn_enabled(512) is False


@pytest.mark.parametrize("rel_mode", ["onehot", "gather", "skew", "skew_chunked"])
def test_deberta_forward_fused_matches_xla(monkeypatch, rel_mode):
    cfg = DebertaV2Config(**SMALL, pos_att_type=("p2c", "c2p"))
    vt = VideoTextConfig(features_dim=16, max_feats=4, ds_factor_attn=4,
                         ds_factor_ff=4, n_ans=0)
    params = init_deberta_params(jax.random.PRNGKey(0), cfg, vt)
    rng = np.random.default_rng(2)
    B, T, F = 2, 12, 4
    ids = rng.integers(1, 99, size=(B, T))
    am = np.ones((B, T), np.int64)
    am[0, -3:] = 0
    video = rng.normal(size=(B, F, 16)).astype(np.float32)
    vm = np.ones((B, F), np.int64)

    monkeypatch.setenv(
        "FROZENBILM_REL_SELECT",
        "skew" if rel_mode == "skew_chunked" else rel_mode)
    if rel_mode == "skew_chunked":
        monkeypatch.setenv("FROZENBILM_SKEW_CHUNK", "8")

    def run():
        out = deberta_forward(
            params, cfg, vt, jnp.asarray(ids), jnp.asarray(am),
            jnp.asarray(video), jnp.asarray(vm), mlm=True,
        )
        return np.asarray(out.logits)

    monkeypatch.setenv("FROZENBILM_FUSED_ATTN", "0")
    base = run()
    monkeypatch.setenv("FROZENBILM_FUSED_ATTN", "1")
    fused = run()
    np.testing.assert_allclose(base, fused, atol=2e-4, rtol=1e-3)


def test_isel_kernel_matches_oracle():
    """In-kernel Toeplitz selection (strided lane-rotation skew) vs the
    oracle: biases built from diagonal-reordered tables must equal the
    full-skew reference, including masked tails."""
    from frozenbilm_tpu.ops.attention import fused_disentangled_attention_isel
    from frozenbilm_tpu.ops.rel_pos import skew_reorder_indices, skew_select

    B, H, L, D = 2, 2, 256, 16
    span, buckets, maxpos = 32, 16, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.float32)
    g_c2p, g_p2c = skew_reorder_indices(L, span, buckets, maxpos)
    rel = rng.normal(size=(2 * span, D)).astype(np.float32)
    Wk = jnp.asarray(np.stack([rel[g_c2p], rel[g_c2p] * 0.7]))
    Wq = jnp.asarray(np.stack([rel[g_p2c] * 0.5, rel[g_p2c]]))
    mask = np.ones((B, L), np.int32)
    mask[0, -17:] = 0
    mask = jnp.asarray(mask)
    scale = math.sqrt(D * 3)
    c2p = skew_select(jnp.einsum("bhid,hkd->bhik", q, Wk))
    p2c = skew_select(jnp.einsum("bhjd,hkd->bhjk", k, Wq))  # [j, i]
    want = disentangled_attention_reference(
        q, k, v, c2p, p2c, mask, scale, p2c_is_ji=True)
    for bi, hblk in ((128, 1), (128, 2), (256, 1)):
        got = fused_disentangled_attention_isel(
            q, k, v, Wk, Wq, mask, scale, bi=bi, hblk=hblk)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4,
            err_msg=f"bi={bi} hblk={hblk}")


def test_deberta_forward_isel_matches_chunked(monkeypatch):
    """Model-level: the in-kernel-selection path (auto at skew + L % 128)
    must match the chunked-skew + bias-consuming fused kernel exactly."""
    cfg = DebertaV2Config(**{**SMALL, "max_position_embeddings": 256},
                          pos_att_type=("p2c", "c2p"))
    vt = VideoTextConfig(features_dim=16, max_feats=4, ds_factor_attn=4,
                         ds_factor_ff=4, n_ans=0)
    params = init_deberta_params(jax.random.PRNGKey(0), cfg, vt)
    rng = np.random.default_rng(3)
    B, T, F = 2, 124, 4  # L = 128
    ids = rng.integers(1, 99, size=(B, T))
    am = np.ones((B, T), np.int64)
    am[1, -9:] = 0
    video = rng.normal(size=(B, F, 16)).astype(np.float32)
    vm = np.ones((B, F), np.int64)
    monkeypatch.setenv("FROZENBILM_REL_SELECT", "skew")
    monkeypatch.setenv("FROZENBILM_FUSED_ATTN", "1")

    def run():
        out = deberta_forward(
            params, cfg, vt, jnp.asarray(ids), jnp.asarray(am),
            jnp.asarray(video), jnp.asarray(vm), mlm=True,
        )
        return np.asarray(out.logits)

    monkeypatch.setenv("FROZENBILM_FUSED_ISEL", "0")
    base = run()
    monkeypatch.delenv("FROZENBILM_FUSED_ISEL")
    isel = run()
    np.testing.assert_allclose(base, isel, atol=2e-4, rtol=1e-3)
