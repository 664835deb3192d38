"""Selective-checkpoint (remat="names") parity: loss and grads must match
the no-remat and full-remat paths exactly — the policy only changes WHICH
intermediates are saved vs recomputed, never the math. Dropout/MLM PRNG is
replayed deterministically in the recompute, so even stochastic training
steps must agree (threefry bits are a pure function of the key)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from frozenbilm_tpu.config import DebertaV2Config, VideoTextConfig
from frozenbilm_tpu.models.deberta import deberta_forward, init_deberta_params
from frozenbilm_tpu.train.partition import merge_params, partition_params
from frozenbilm_tpu.train.trainer import make_mlm_loss_fn


def _setup():
    cfg = DebertaV2Config(
        vocab_size=128, hidden_size=32, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, position_buckets=8,
        hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1)
    vt = VideoTextConfig(features_dim=16, max_feats=3,
                         ds_factor_attn=4, ds_factor_ff=4, n_ans=0)
    params = init_deberta_params(jax.random.PRNGKey(0), cfg, vt)
    rng = np.random.default_rng(0)
    B, T = 2, 12
    batch = {
        "input_ids": jnp.asarray(rng.integers(5, 128, size=(B, T))),
        "attention_mask": jnp.ones((B, T), jnp.int32),
        "special_tokens_mask": jnp.zeros((B, T), jnp.int32),
        "video": jnp.asarray(rng.normal(size=(B, 3, 16)), jnp.float32),
        "video_mask": jnp.ones((B, 3), jnp.int32),
    }
    return cfg, vt, params, batch


def _grads(cfg, vt, params, batch, remat, rng):
    loss_fn = make_mlm_loss_fn(
        deberta_forward, cfg, vt, mask_token_id=4, vocab_size=cfg.vocab_size,
        pad_token_id=cfg.pad_token_id, mlm_probability=0.3, remat=remat)
    trainable, frozen = partition_params(params, vt)

    def compute(tr):
        loss, _ = loss_fn(merge_params(tr, frozen), batch, rng)
        return loss

    loss, grads = jax.jit(jax.value_and_grad(compute))(trainable)
    return float(loss), grads


@pytest.mark.parametrize("stochastic", [False, True])
def test_names_policy_grad_parity(stochastic):
    cfg, vt, params, batch = _setup()
    rng = jax.random.PRNGKey(7) if stochastic else None
    if rng is None:
        # deterministic loss path: make_mlm_loss_fn treats rng=None as eval
        # (no dropout), still corrupts with a fixed key — exercised via the
        # eval-style call below
        pass
    base_loss, base = _grads(cfg, vt, params, batch, False, rng)
    for remat in ("names", True):
        loss, grads = _grads(cfg, vt, params, batch, remat, rng)
        assert np.isfinite(loss)
        assert abs(loss - base_loss) < 1e-5, (remat, loss, base_loss)
        flat_a = jax.tree.leaves(base)
        flat_b = jax.tree.leaves(grads)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
                err_msg=f"remat={remat}")


def test_names_policy_trainer_step():
    """The production Trainer accepts remat='names' end-to-end and the loss
    stays finite and equal to the unremat step."""
    from frozenbilm_tpu.train.trainer import make_trainer_and_state

    cfg, vt, params, batch = _setup()
    losses = {}
    for remat in (False, "names"):
        loss_fn = make_mlm_loss_fn(
            deberta_forward, cfg, vt, mask_token_id=4,
            vocab_size=cfg.vocab_size, pad_token_id=cfg.pad_token_id,
            mlm_probability=0.3, remat=remat)
        params_i = init_deberta_params(jax.random.PRNGKey(0), cfg, vt)
        trainer, state, frozen = make_trainer_and_state(
            loss_fn, optax.adamw(1e-4), params_i, vt, mesh=None)
        key = jax.random.PRNGKey(3)
        state, metrics = trainer.train_step(state, frozen, batch, key)
        losses[remat] = float(metrics["loss"])
    assert np.isfinite(losses["names"])
    assert abs(losses[False] - losses["names"]) < 1e-5, losses
