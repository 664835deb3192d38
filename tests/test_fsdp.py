"""FSDP (ZeRO-3-style) parameter sharding over the 'data' axis.

The reference's only large-model answers are HF layer-sharding device maps
(gptj.py:421-454) and fp16; parallel/fsdp.py instead stores large leaves
sharded and lets GSPMD all-gather per scan step. These tests pin:
  - the layout rule (largest divisible dim, never the scan axis, small
    leaves replicated),
  - numeric equality of an FSDP train step vs the replicated-DP step,
  - composition with TP specs and quantized trees.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from frozenbilm_tpu.config import DebertaV2Config, GPTJConfig, VideoTextConfig
from frozenbilm_tpu.models.deberta import deberta_forward, init_deberta_params
from frozenbilm_tpu.parallel.fsdp import (
    fsdp_specs,
    merge_with_tp,
    place,
    sharded_bytes,
)
from frozenbilm_tpu.parallel.mesh import MeshSpec, make_mesh, shard_batch
from frozenbilm_tpu.train.optim import make_optimizer, make_schedule
from frozenbilm_tpu.train.trainer import (
    Trainer,
    create_train_state,
    fsdp_state_shardings,
    make_mlm_loss_fn,
)


def _small_cfg():
    cfg = DebertaV2Config(
        vocab_size=512, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64, position_buckets=16,
    )
    vt = VideoTextConfig(features_dim=32, max_feats=4, ds_factor_attn=4,
                         ds_factor_ff=4, n_ans=0)
    return cfg, vt


def test_fsdp_spec_rules():
    tree = {
        "encoder": {
            "layers": {
                # stacked (scan axis first): shard largest of dims 1..n
                "kernel": jnp.zeros((24, 64, 128)),
                # stacked, nothing divisible by 8 beyond dim0
                "odd": jnp.zeros((24, 63, 67)),
            }
        },
        # unstacked 2D: largest dim wins; trailing dim breaks ties
        "wide": jnp.zeros((128, 128)),
        "tall": jnp.zeros((256, 128)),
        # tiny leaf stays replicated regardless of divisibility
        "small": jnp.zeros((8, 8)),
        # scalar
        "count": jnp.zeros(()),
    }
    specs = fsdp_specs(tree, 8, min_size=4096)
    assert specs["encoder"]["layers"]["kernel"] == P(None, None, "data")
    assert specs["encoder"]["layers"]["odd"] == P()  # dim0 is the scan axis
    assert specs["wide"] == P(None, "data")  # tie -> trailing dim
    assert specs["tall"] == P("data", None)
    assert specs["small"] == P()
    assert specs["count"] == P()


def test_fsdp_train_step_matches_replicated():
    cfg, vt = _small_cfg()
    params = init_deberta_params(jax.random.PRNGKey(0), cfg, vt)
    tx = make_optimizer(make_schedule(3e-4, 100, "linear_with_warmup"),
                        clip_max_norm=0.1)
    loss_fn = make_mlm_loss_fn(deberta_forward, cfg, vt, mask_token_id=4,
                               vocab_size=cfg.vocab_size)
    mesh = make_mesh(MeshSpec(data=8, model=1), devices=jax.devices()[:8])

    rng = np.random.default_rng(0)
    B, T, F = 16, 12, 4
    batch = shard_batch(mesh, {
        "input_ids": jnp.asarray(rng.integers(5, cfg.vocab_size, size=(B, T))),
        "attention_mask": jnp.ones((B, T), jnp.int32),
        "special_tokens_mask": jnp.zeros((B, T), jnp.int32),
        "video": jnp.asarray(rng.normal(size=(B, F, vt.features_dim)), jnp.float32),
        "video_mask": jnp.ones((B, F), jnp.int32),
    })
    key = jax.random.PRNGKey(7)

    # host-side copy up front: device_put aliases buffers and the donated
    # train step deletes them, so each path needs its own leaves
    params_host = jax.tree.map(lambda x: np.asarray(x), params)

    # replicated-DP reference
    trainer_rep = Trainer(loss_fn, tx, mesh=mesh)
    state_r, frozen_r = create_train_state(params, vt, tx, mesh=mesh)
    state_r, m_r = trainer_rep.train_step(state_r, frozen_r, batch, key)
    state_r, m_r2 = trainer_rep.train_step(state_r, frozen_r, batch, key)

    # FSDP: params + opt state stored sharded; min_size tiny so even this
    # toy model actually shards (default threshold would replicate it all)
    params = jax.tree.map(jnp.asarray, params_host)
    state_f, frozen_f = create_train_state(params, vt, tx, mesh=mesh)
    sh_state, sh_frozen = fsdp_state_shardings(mesh, state_f, frozen_f,
                                               min_size=1024)
    assert any(not s.is_fully_replicated for s in jax.tree.leaves(sh_frozen))
    assert any(not s.is_fully_replicated
               for s in jax.tree.leaves(sh_state.opt_state))
    state_f = jax.tree.map(jax.device_put, state_f, sh_state)
    frozen_f = jax.tree.map(jax.device_put, frozen_f, sh_frozen)
    trainer_f = Trainer(loss_fn, tx, mesh=mesh, state_shardings=sh_state,
                        frozen_shardings=sh_frozen)
    state_f, m_f = trainer_f.train_step(state_f, frozen_f, batch, key)
    state_f, m_f2 = trainer_f.train_step(state_f, frozen_f, batch, key)

    assert np.allclose(float(m_r["loss"]), float(m_f["loss"]), atol=1e-5)
    assert np.allclose(float(m_r2["loss"]), float(m_f2["loss"]), atol=1e-5)
    # updated trainable params agree leaf-for-leaf
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5),
        state_r.trainable, state_f.trainable)
    # the sharded state kept its layout after the step (out_shardings held)
    jax.tree.map(
        lambda x, s: (_ for _ in ()).throw(AssertionError(str(s.spec)))
        if x.sharding.spec != s.spec else None,
        state_f.trainable, sh_state.trainable)


def test_fsdp_shards_at_fullscale_thresholds():
    """At deberta-v2-xlarge scale the DEFAULT min_size shards the backbone:
    per-device bytes under FSDP-8 must be <20% of replicated."""
    cfg = DebertaV2Config()  # 0.9B
    vt = VideoTextConfig(features_dim=768, max_feats=10, ds_factor_attn=8,
                         ds_factor_ff=8, n_ans=0)
    shapes = jax.eval_shape(
        lambda k: init_deberta_params(k, cfg, vt), jax.random.PRNGKey(0))
    specs = fsdp_specs(shapes, 8)
    per_dev, total = sharded_bytes(shapes, specs, 8)
    assert per_dev < 0.2 * total, (per_dev, total)


def test_fsdp_composes_with_tp_specs():
    from frozenbilm_tpu.parallel.tp import gpt_param_specs

    cfg = GPTJConfig(vocab_size=256, hidden_size=64, num_layers=2,
                     num_heads=4, rotary_dim=8, max_position_embeddings=64)
    vt = VideoTextConfig(features_dim=32, max_feats=4, ds_factor_attn=0,
                         ds_factor_ff=0)
    params = init_gptj_params_cached(cfg, vt)
    tp = gpt_param_specs(params)
    fs = fsdp_specs(params, 4, min_size=1024)
    merged = merge_with_tp(tp, fs)

    flat_tp = dict(_flat(tp))
    flat_fs = dict(_flat(fs))
    for path, spec in _flat(merged):
        if any(a is not None for a in flat_tp[path]):
            assert spec == flat_tp[path], path  # TP wins where it shards
        else:
            assert spec == flat_fs[path], path  # FSDP fills the rest
        for entry in spec:
            assert entry in (None, "data", "model"), (path, spec)


def test_fsdp_tp_execution():
    """2D layout actually executes: TP shards over 'model', FSDP shards the
    TP-replicated leaves over 'data'; scoring matches the replicated run."""
    from frozenbilm_tpu.models.gptj import gptj_score
    from frozenbilm_tpu.parallel.tp import gpt_param_specs

    cfg = GPTJConfig(vocab_size=256, hidden_size=64, num_layers=2,
                     num_heads=4, rotary_dim=8, max_position_embeddings=64)
    vt = VideoTextConfig(features_dim=32, max_feats=4, ds_factor_attn=0,
                         ds_factor_ff=0)
    params = init_gptj_params_cached(cfg, vt)
    mesh = make_mesh(MeshSpec(data=4, model=2), devices=jax.devices()[:8])
    specs = merge_with_tp(gpt_param_specs(params),
                          fsdp_specs(params, 4, min_size=1024))
    placed = place(mesh, params, specs)

    rng = np.random.default_rng(0)
    B, T, F = 4, 10, 4
    ids = jnp.asarray(rng.integers(1, 256, size=(B, T)))
    am = jnp.ones((B, T), jnp.int32)
    video = jnp.asarray(rng.normal(size=(B, F, 32)), jnp.float32)
    vm = jnp.ones((B, F), jnp.int32)
    tgt = jnp.asarray(rng.integers(1, 256, size=(B, 3)))

    score = jax.jit(lambda p, v, m, i, a, t: gptj_score(
        p, cfg, vt, video=v, video_mask=m, input_ids=i, attention_mask=a,
        target_ids=t))
    ref = np.asarray(score(params, video, vm, ids, am, tgt))
    got = np.asarray(score(placed, video, vm, ids, am, tgt))
    np.testing.assert_allclose(ref, got, rtol=2e-5, atol=2e-5)


def test_fsdp_quantized_tree():
    """The shape-based rule applies unchanged to W8A8 trees: int8 kernels
    shard, per-channel scales stay replicated (small)."""
    from frozenbilm_tpu.ops.quant import quantize_tree

    cfg, vt = _small_cfg()
    params = init_deberta_params(jax.random.PRNGKey(0), cfg, vt)
    q = quantize_tree(params, min_features=8)
    mesh = make_mesh(MeshSpec(data=8, model=1), devices=jax.devices()[:8])
    specs = fsdp_specs(q, 8, min_size=1024)
    placed = place(mesh, q, specs)

    out_rep = jax.jit(lambda p, i, a, v, m: deberta_forward(
        p, cfg, vt, i, a, v, m, mlm=True).logits)
    rng = np.random.default_rng(0)
    B, T, F = 8, 10, 4
    ids = jnp.asarray(rng.integers(5, cfg.vocab_size, size=(B, T)))
    am = jnp.ones((B, T), jnp.int32)
    video = jnp.asarray(rng.normal(size=(B, F, vt.features_dim)), jnp.float32)
    vm = jnp.ones((B, F), jnp.int32)
    ref = np.asarray(out_rep(q, ids, am, video, vm))
    got = np.asarray(out_rep(placed, ids, am, video, vm))
    np.testing.assert_allclose(ref, got, atol=2e-5)


def _flat(tree):
    import jax.tree_util as tu

    for path, leaf in tu.tree_flatten_with_path(
            tree, is_leaf=lambda x: isinstance(x, P))[0]:
        yield tuple(str(getattr(k, "key", getattr(k, "idx", k))) for k in path), leaf


_GPTJ_CACHE = {}


def init_gptj_params_cached(cfg, vt):
    from frozenbilm_tpu.models.gptj import init_gptj_params

    key = (cfg.vocab_size, cfg.hidden_size, cfg.num_layers)
    if key not in _GPTJ_CACHE:
        _GPTJ_CACHE[key] = init_gptj_params(jax.random.PRNGKey(0), cfg, vt)
    return _GPTJ_CACHE[key]
