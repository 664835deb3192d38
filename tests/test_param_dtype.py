"""Tests: --param_dtype frozen-weight casting, answer-module resize quirk,
loader transform hook."""

import jax
import jax.numpy as jnp
import numpy as np

from frozenbilm_tpu.config import DebertaV2Config, VideoTextConfig
from frozenbilm_tpu.models.deberta import (
    deberta_forward,
    init_deberta_params,
    set_answer_embeddings,
)
from frozenbilm_tpu.train.partition import apply_param_dtype, trainable_mask

CFG = DebertaV2Config(vocab_size=99, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=4, intermediate_size=64,
                      max_position_embeddings=64, position_buckets=8)
VT = VideoTextConfig(features_dim=16, max_feats=4, ds_factor_attn=4,
                     ds_factor_ff=4, n_ans=5)


def test_apply_param_dtype_casts_only_frozen():
    params = init_deberta_params(jax.random.PRNGKey(0), CFG, VT)
    cast = apply_param_dtype(params, VT, "bfloat16")
    mask = trainable_mask(params, VT)

    def check(p, m):
        if hasattr(p, "dtype") and p.dtype in (jnp.float32, jnp.bfloat16):
            expected = jnp.float32 if m else jnp.bfloat16
            assert p.dtype == expected, (p.shape, p.dtype, m)

    jax.tree.map(check, cast, mask)
    # float32 is a no-op
    same = apply_param_dtype(params, VT, "float32")
    assert same["embeddings"]["word_embeddings"].dtype == jnp.float32

    # forward still runs and is close to the f32 version
    ids = jnp.asarray(np.random.default_rng(0).integers(1, 99, (2, 8)))
    f32 = deberta_forward(params, CFG, VT, ids, mlm=False).logits
    bf16 = deberta_forward(cast, CFG, VT, ids, mlm=False).logits
    np.testing.assert_allclose(np.asarray(f32), np.asarray(bf16), atol=0.15)


def test_set_answer_embeddings_resize():
    """Eval-time vocab resize (reference deberta.py:1362-1369): embeddings
    recomputed for the new size, bias reset to zeros (the reference's bias
    write is a dead attribute assignment)."""
    params = init_deberta_params(jax.random.PRNGKey(0), CFG, VT)
    a2tok_bigger = np.random.default_rng(0).integers(1, 99, (9, 3))
    new = set_answer_embeddings(params, a2tok_bigger, pad_token_id=0)
    assert new["answers"]["embeddings"].shape == (9, CFG.hidden_size)
    assert new["answers"]["bias"].shape == (9,)
    np.testing.assert_array_equal(np.asarray(new["answers"]["bias"]), 0)
    # same-size refresh keeps the (possibly ckpt-loaded) bias values
    params["answers"]["bias"] = jnp.arange(5.0)
    same = set_answer_embeddings(params, a2tok_bigger[:5], pad_token_id=0)
    np.testing.assert_array_equal(np.asarray(same["answers"]["bias"]),
                                  np.arange(5.0))


def test_loader_transform_runs_in_prefetch():
    from frozenbilm_tpu.data.loader import DataLoader

    class DS:
        def __len__(self):
            return 6

        def __getitem__(self, i):
            return {"x": i}

    calls = []

    def transform(batch):
        calls.append(len(batch["x"]))
        return {"x": [v * 10 for v in batch["x"]]}

    dl = DataLoader(DS(), 2, collate_fn=lambda items: {"x": [it["x"] for it in items]},
                    transform=transform, prefetch=2)
    out = list(dl)
    assert len(out) == 3 and out[0]["x"] == [0, 10]
    assert calls == [2, 2, 2]


def test_remat_grads_match():
    """jax.checkpoint on the layer scan must not change gradients."""
    params = init_deberta_params(jax.random.PRNGKey(0), CFG, VT)
    ids = jnp.asarray(np.random.default_rng(0).integers(1, 99, (2, 8)))
    labels = jnp.where(jnp.arange(8)[None] % 2 == 0, ids, -100)

    def loss(p, remat):
        return deberta_forward(p, CFG, VT, ids, labels=labels, mlm=True,
                               remat=remat).loss

    g0 = jax.grad(lambda p: loss(p, False))(params)
    g1 = jax.grad(lambda p: loss(p, True))(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
