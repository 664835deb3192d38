"""Sequence parallelism: token-axis activation sharding (parallel/sp.py).

No reference counterpart (the reference replicates all activations per GPU;
mc.py's L=512 shape just eats the memory). These tests pin (B, L, H)
activations to P(data, model) through the act_constraint hook and check the
result is numerically the unconstrained forward, under both eval and
training (grads through the constraint are identity).
"""

import jax
import jax.numpy as jnp
import numpy as np

from frozenbilm_tpu.config import DebertaV2Config, VideoTextConfig
from frozenbilm_tpu.models.deberta import deberta_forward, init_deberta_params
from frozenbilm_tpu.parallel.mesh import MeshSpec, make_mesh, shard_batch
from frozenbilm_tpu.parallel.sp import sequence_constraint

CFG = DebertaV2Config(
    vocab_size=200, hidden_size=32, num_hidden_layers=3,
    num_attention_heads=4, intermediate_size=64,
    max_position_embeddings=64, position_buckets=8,
)
VT = VideoTextConfig(features_dim=16, max_feats=4, ds_factor_attn=4,
                     ds_factor_ff=4, n_ans=0)


def _batch(B=4, T=12, F=4, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "input_ids": jnp.asarray(rng.integers(5, 200, size=(B, T))),
        "attention_mask": jnp.ones((B, T), jnp.int32),
        "video": jnp.asarray(rng.normal(size=(B, F, 16)), jnp.float32),
        "video_mask": jnp.ones((B, F), jnp.int32),
    }


def test_sp_forward_matches_replicated():
    mesh = make_mesh(MeshSpec(data=2, model=4))
    params = init_deberta_params(jax.random.PRNGKey(0), CFG, VT)
    batch = shard_batch(mesh, _batch())  # L = 4 + 12 = 16: 4 tokens/shard

    def fwd(p, b, constraint):
        return deberta_forward(
            p, CFG, VT, b["input_ids"], b["attention_mask"], b["video"],
            b["video_mask"], mlm=True, act_constraint=constraint).logits

    sp_fn = jax.jit(lambda p, b: fwd(p, b, sequence_constraint(mesh)))
    got = np.asarray(sp_fn(params, batch))
    want = np.asarray(jax.jit(lambda p, b: fwd(p, b, None))(params, batch))
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)

    # the constraint must actually reach the lowered program (a silent
    # None-plumbing bug would still pass the equality check)
    txt = sp_fn.lower(params, batch).as_text()
    assert "Sharding" in txt or "sharding" in txt


def test_mc_eval_step_under_sp():
    """make_mc_steps threads the constraint into the (B*mc, L) forward and
    rejects non-DeBERTa families loudly."""
    import pytest

    from frozenbilm_tpu.models import ModelBundle
    from frozenbilm_tpu.models.deberta import (
        deberta_answer_logits, set_answer_embeddings)
    from frozenbilm_tpu.tasks.mc import make_mc_steps

    mesh = make_mesh(MeshSpec(data=2, model=4))
    bundle = ModelBundle(
        "deberta", CFG, VT,
        init_params=lambda rng: init_deberta_params(rng, CFG, VT),
        forward=deberta_forward,
        answer_logits=lambda p, h: deberta_answer_logits(p, CFG, h),
    )
    params = init_deberta_params(jax.random.PRNGKey(0), CFG, VT)
    # the mc driver scores p(yes) through the 2-answer module
    params = set_answer_embeddings(
        params, np.array([[9, 0], [10, 0]]), pad_token_id=0)
    B, mc, T, F = 2, 4, 12, 4
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(5, 200, size=(B, mc, T)))
    ids = ids.at[:, :, 3].set(4)  # a [MASK] slot per candidate
    am = jnp.ones((B, mc, T), jnp.int32)
    video = jnp.asarray(rng.normal(size=(B, F, 16)), jnp.float32)
    vm = jnp.ones((B, F), jnp.int32)

    _, sp_step = make_mc_steps(bundle, mask_token_id=4, n_cand=mc,
                               act_constraint=sequence_constraint(mesh))
    _, plain_step = make_mc_steps(bundle, mask_token_id=4, n_cand=mc)
    got = np.asarray(sp_step(params, ids, am, video, vm))
    want = np.asarray(plain_step(params, ids, am, video, vm))
    assert got.shape == (B, mc)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)

    def gptj_forward(*a, **k):  # only the __name__ matters to the guard
        raise AssertionError("should not be called")

    bad = ModelBundle("gptj", CFG, VT, init_params=None, forward=gptj_forward)
    with pytest.raises(ValueError, match="DeBERTa"):
        make_mc_steps(bad, mask_token_id=4, n_cand=mc,
                      act_constraint=sequence_constraint(mesh))


def test_sp_gradients_match_replicated():
    """Training through the SP hook: constraint is identity under grad."""
    mesh = make_mesh(MeshSpec(data=2, model=4))
    params = init_deberta_params(jax.random.PRNGKey(0), CFG, VT)
    batch = shard_batch(mesh, _batch())
    labels = jnp.where(batch["input_ids"] % 3 == 0, batch["input_ids"], -100)

    def loss(p, b, constraint):
        out = deberta_forward(
            p, CFG, VT, b["input_ids"], b["attention_mask"], b["video"],
            b["video_mask"], labels=labels, mlm=True,
            act_constraint=constraint)
        return out.loss

    g_sp = jax.jit(jax.grad(lambda p, b: loss(p, b, sequence_constraint(mesh))))(
        params, batch)
    g_plain = jax.jit(jax.grad(lambda p, b: loss(p, b, None)))(params, batch)
    for a, b in zip(jax.tree.leaves(g_sp), jax.tree.leaves(g_plain)):
        assert np.all(np.isfinite(np.asarray(a)))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=1e-4)
