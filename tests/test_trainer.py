"""Trainer tests: partition correctness, DP-equality across mesh sizes
(SURVEY.md §4 'Distributed: DP loss equality vs single-device'), and loss
descent on a toy MLM task."""

import jax
import jax.numpy as jnp
import numpy as np

from frozenbilm_tpu.config import DebertaV2Config, VideoTextConfig
from frozenbilm_tpu.models.deberta import deberta_forward, init_deberta_params
from frozenbilm_tpu.parallel.mesh import MeshSpec, make_mesh, shard_batch
from frozenbilm_tpu.train.optim import make_optimizer, make_schedule
from frozenbilm_tpu.train.partition import (
    count_params,
    merge_params,
    partition_params,
    trainable_mask,
)
from frozenbilm_tpu.train.trainer import Trainer, create_train_state, make_mlm_loss_fn

CFG = DebertaV2Config(
    vocab_size=120, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
    intermediate_size=64, max_position_embeddings=64, position_buckets=8,
)
VT = VideoTextConfig(features_dim=16, max_feats=4, ds_factor_attn=4, ds_factor_ff=4, n_ans=0)


def _params():
    return init_deberta_params(jax.random.PRNGKey(0), CFG, VT)


def test_partition_respects_freeze_rules():
    params = _params()
    mask = trainable_mask(params, VT)
    # visual projection + adapters + LayerNorms trainable
    assert mask["embeddings"]["linear_video"]["kernel"]
    assert mask["encoder"]["layers"]["attention"]["output"]["adapter"]["down"]["kernel"]
    assert mask["embeddings"]["LayerNorm"]["weight"]
    assert mask["lm_head"]["LayerNorm"]["weight"]
    # backbone + head frozen
    assert not mask["embeddings"]["word_embeddings"]
    assert not mask["encoder"]["layers"]["attention"]["self"]["qkv_proj"]["kernel"]
    assert not mask["lm_head"]["dense"]["kernel"]
    assert not mask["lm_head"]["bias"]

    trainable, frozen = partition_params(params, VT)
    merged = merge_params(trainable, frozen)
    assert count_params(merged) == count_params(params)
    # trainable share should be small (the FrozenBiLM premise)
    assert count_params(trainable) < 0.2 * count_params(params)


def test_partition_ft_ln_false():
    params = _params()
    vt = VideoTextConfig(features_dim=16, max_feats=4, ds_factor_attn=4,
                         ds_factor_ff=4, ft_ln=False)
    mask = trainable_mask(params, vt)
    assert not mask["embeddings"]["LayerNorm"]["weight"]
    assert not mask["lm_head"]["LayerNorm"]["weight"]
    assert mask["encoder"]["layers"]["attention"]["output"]["adapter"]["down"]["kernel"]


def _make_batch(n=8, t=12, f=4, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(5, 120, size=(n, t))
    return {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((n, t), jnp.int32),
        "special_tokens_mask": jnp.zeros((n, t), jnp.int32),
        "video": jnp.asarray(rng.normal(size=(n, f, 16)).astype(np.float32)),
        "video_mask": jnp.ones((n, f), jnp.int32),
    }


def _run_steps(mesh, n_steps=2, lr=1e-3, gather=0):
    params = _params()
    tx = make_optimizer(make_schedule(lr, 100), clip_max_norm=0.1)
    loss_fn = make_mlm_loss_fn(deberta_forward, CFG, VT, mask_token_id=4, vocab_size=120,
                               gather_loss_positions=gather)
    trainer = Trainer(loss_fn, tx, mesh=mesh)
    state, frozen = create_train_state(params, VT, tx)
    batch = _make_batch()
    if mesh is not None:
        batch = shard_batch(mesh, batch)
    losses = []
    for _ in range(n_steps):
        state, metrics = trainer.train_step(state, frozen, batch, jax.random.PRNGKey(42))
        losses.append(float(metrics["loss"]))
    return trainer, state, frozen, batch, losses


def test_dp_equality_8dev_vs_1dev():
    mesh8 = make_mesh(MeshSpec(data=8, model=1))
    mesh1 = make_mesh(MeshSpec(data=1, model=1), devices=jax.devices()[:1])
    _, s8, _, _, l8 = _run_steps(mesh8)
    _, s1, _, _, l1 = _run_steps(mesh1)
    np.testing.assert_allclose(l8, l1, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s8.trainable), jax.tree.leaves(s1.trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_dp_equality_with_gathered_head():
    """The per-row masked-position gather (top_k on the unsharded length
    axis) must not perturb DP: 8-device sharded steps == single device."""
    mesh8 = make_mesh(MeshSpec(data=8, model=1))
    mesh1 = make_mesh(MeshSpec(data=1, model=1), devices=jax.devices()[:1])
    _, s8, _, _, l8 = _run_steps(mesh8, gather=8)
    _, s1, _, _, l1 = _run_steps(mesh1, gather=8)
    np.testing.assert_allclose(l8, l1, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s8.trainable), jax.tree.leaves(s1.trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_loss_decreases():
    # eval on a fixed batch before/after training (corruption in eval mode is
    # deterministic), so stochastic per-step masking can't flake the check
    trainer, state, frozen, batch, _ = _run_steps(None, n_steps=0, lr=3e-3)
    before = float(trainer.eval_step(state, frozen, batch)["loss"])
    for _ in range(12):
        state, _ = trainer.train_step(state, frozen, batch, jax.random.PRNGKey(42))
    after = float(trainer.eval_step(state, frozen, batch)["loss"])
    assert after < before


def test_frozen_leaves_untouched():
    mesh = make_mesh(MeshSpec(data=8, model=1))
    params = _params()
    tx = make_optimizer(make_schedule(1e-3, 100))
    loss_fn = make_mlm_loss_fn(deberta_forward, CFG, VT, mask_token_id=4, vocab_size=120)
    trainer = Trainer(loss_fn, tx, mesh=mesh)
    state, frozen = create_train_state(params, VT, tx)
    word_emb_before = np.asarray(frozen["embeddings"]["word_embeddings"]).copy()
    adapter_before = np.asarray(
        state.trainable["encoder"]["layers"]["attention"]["output"]["adapter"]["down"]["kernel"]
    ).copy()
    batch = shard_batch(mesh, _make_batch())
    state, _ = trainer.train_step(state, frozen, batch, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(
        word_emb_before, np.asarray(frozen["embeddings"]["word_embeddings"])
    )
    adapter_after = np.asarray(
        state.trainable["encoder"]["layers"]["attention"]["output"]["adapter"]["down"]["kernel"]
    )
    assert np.abs(adapter_after - adapter_before).max() > 0


def test_lr_schedule_matches_reference():
    import torch

    from tests.reference_loader import load_reference_misc

    misc = load_reference_misc()

    class Args:
        lr = 3e-4
        schedule = "linear_with_warmup"
        fraction_warmup_steps = 0.1

    opt = torch.optim.Adam([torch.nn.Parameter(torch.zeros(1))], lr=Args.lr)
    sched = make_schedule(Args.lr, 100, "linear_with_warmup", 0.1)
    # The reference adjusts lr AFTER optimizer.step (main.py:84-88): update k
    # runs at the lr set by adjust(k-1), and update 0 at the constructor lr.
    # Our optax schedule receives the update's own count, so sched(k) must
    # reproduce the lr the reference's k-th update actually used.
    np.testing.assert_allclose(float(sched(0)), Args.lr, rtol=1e-6)
    for step in [0, 3, 9, 10, 11, 50, 99, 100]:
        misc.adjust_learning_rate(opt, step, 100, Args)
        ref_lr_after = opt.param_groups[0]["lr"]
        np.testing.assert_allclose(float(sched(step + 1)), ref_lr_after, rtol=1e-6)


def test_dist_helpers_single_process():
    """Single-process semantics of the multi-host helpers: init is a no-op
    ('Not using distributed mode', reference dist.py:218-221), gathers and
    reductions are identities, loader shards are 1/0."""
    import jax

    from frozenbilm_tpu.parallel.mesh import (
        fetch_local_rows,
        host_gather_results,
        init_distributed,
        loader_shard_kwargs,
        reduce_metrics,
        sync_global_devices,
    )

    assert init_distributed(verbose=False) is False
    assert loader_shard_kwargs() == {"num_shards": 1, "shard_index": 0}
    assert host_gather_results({"q": 1}) == {"q": 1}
    assert reduce_metrics({"loss": 2.5}) == {"loss": 2.5}
    sync_global_devices("noop")
    x = jnp.arange(6).reshape(3, 2)
    np.testing.assert_array_equal(fetch_local_rows(None, x), np.asarray(x))


def test_grad_accum_matches_full_batch():
    """grad_accum=N: one update from N averaged microbatch grads equals the
    full-batch update when the loss is rng-independent (per-sample mean CE
    is linear in the batch mean). Uses a deterministic loss (no corruption,
    no dropout) so only the accumulation math is under test."""

    def det_loss_fn(params, batch, rng):
        del rng
        out = deberta_forward(
            params, CFG, VT, batch["input_ids"], batch["attention_mask"],
            batch["video"], batch["video_mask"],
            labels=batch["input_ids"], mlm=True, deterministic=True)
        return out.loss, {"aux": out.loss * 2.0}

    params = _params()
    tx = make_optimizer(make_schedule(1e-3, 100), clip_max_norm=0.1)
    batch = _make_batch()

    results = {}
    for accum in (1, 4):
        trainer = Trainer(det_loss_fn, tx, grad_accum=accum)
        state, frozen = create_train_state(params, VT, tx)
        state, metrics = trainer.train_step(
            state, frozen, batch, jax.random.PRNGKey(7))
        results[accum] = (state, metrics)

    m1, m4 = results[1][1], results[4][1]
    np.testing.assert_allclose(float(m4["loss"]), float(m1["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m4["aux"]), float(m1["aux"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(results[1][0].trainable),
                    jax.tree.leaves(results[4][0].trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-6, rtol=1e-5)


def test_grad_accum_weighted_matches_full_batch_for_mlm_style_loss():
    """A loss normalized by a data-dependent count (MLM's masked-token CE)
    accumulates EXACTLY when the loss_fn reports the count as the
    'loss_weight' metric: Trainer._accumulate then computes
    sum_i(n_i * g_i) / sum_i(n_i) == the full-batch gradient. Rows carry
    deliberately uneven label counts per microbatch so the unweighted
    mean-of-means provably differs — proving the weighting is load-bearing."""
    from frozenbilm_tpu.ops.masking import IGNORE_INDEX

    batch = _make_batch(n=8)
    # row r keeps (r % 4) + 1 labeled positions -> microbatch 0 (even rows)
    # and microbatch 1 (odd rows) see different totals under accum=2
    n, t = batch["input_ids"].shape
    keep = np.zeros((n, t), bool)
    for r in range(n):
        keep[r, : (r % 4) + 1] = True
    labels = jnp.where(jnp.asarray(keep), batch["input_ids"], IGNORE_INDEX)
    batch = dict(batch, labels=labels)

    def make_loss(report_weight):
        def det_loss_fn(params, b, rng):
            del rng
            out = deberta_forward(
                params, CFG, VT, b["input_ids"], b["attention_mask"],
                b["video"], b["video_mask"],
                labels=b["labels"], mlm=True, deterministic=True)
            metrics = {}
            if report_weight:
                metrics["loss_weight"] = jnp.sum(
                    b["labels"] != IGNORE_INDEX).astype(jnp.float32)
            return out.loss, metrics
        return det_loss_fn

    params = _params()
    tx = make_optimizer(make_schedule(1e-3, 100), clip_max_norm=0.1)

    def run(accum, report_weight):
        trainer = Trainer(make_loss(report_weight), tx, grad_accum=accum)
        state, frozen = create_train_state(params, VT, tx)
        return trainer.train_step(state, frozen, batch, jax.random.PRNGKey(7))

    full, m_full = run(1, True)
    acc_w, m_w = run(2, True)
    acc_uw, _ = run(2, False)

    # weighted accumulation reproduces the full-batch loss, weight and update
    np.testing.assert_allclose(float(m_w["loss"]), float(m_full["loss"]),
                               rtol=1e-5)
    assert float(m_w["loss_weight"]) == float(m_full["loss_weight"]) == np.sum(keep)
    for a, b in zip(jax.tree.leaves(full.trainable),
                    jax.tree.leaves(acc_w.trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-6, rtol=1e-5)
    # ...and the unweighted mean-of-means does NOT (uneven counts)
    deltas = [float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
              for a, b in zip(jax.tree.leaves(full.trainable),
                              jax.tree.leaves(acc_uw.trainable))]
    assert max(deltas) > 1e-5


def test_rng_impls_through_train_step():
    """--rng_impl: threefry/rbg/unsafe_rbg keys all drive the train step
    (incl. the grad-accum scan's fold_in) to a finite loss; typed keys keep
    their impl through fold_in/split (a raw uint32 key would silently
    rewrap as threefry)."""
    import pytest

    from frozenbilm_tpu.train.optim import train_key

    params = _params()
    tx = make_optimizer(make_schedule(1e-3, 100), clip_max_norm=0.1)
    loss_fn = make_mlm_loss_fn(deberta_forward, CFG, VT, mask_token_id=4,
                               vocab_size=120)
    batch = _make_batch()
    for impl in ("threefry", "rbg", "unsafe_rbg"):
        trainer = Trainer(loss_fn, tx, grad_accum=2)
        state, frozen = create_train_state(params, VT, tx)
        state, m = trainer.train_step(state, frozen, batch,
                                      train_key(7, impl))
        assert np.isfinite(float(m["loss"])), impl
        assert float(m["loss_weight"]) > 0
    with pytest.raises(ValueError, match="rng_impl"):
        train_key(0, "philox")


def test_grad_accum_on_mesh_and_validation():
    """Accumulation under a sharded batch (microbatch split must not break
    DP), and the divisibility / >=1 guards."""
    import pytest

    mesh = make_mesh(MeshSpec(data=8, model=1))
    params = _params()
    tx = make_optimizer(make_schedule(1e-3, 100), clip_max_norm=0.1)
    loss_fn = make_mlm_loss_fn(deberta_forward, CFG, VT,
                               mask_token_id=4, vocab_size=120)
    trainer = Trainer(loss_fn, tx, mesh=mesh, grad_accum=2)
    state, frozen = create_train_state(params, VT, tx, mesh=mesh)
    batch = shard_batch(mesh, _make_batch(n=16))
    state, metrics = trainer.train_step(state, frozen, batch,
                                        jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))

    with pytest.raises(ValueError, match="grad_accum"):
        Trainer(loss_fn, tx, grad_accum=0)
    bad = Trainer(loss_fn, tx, grad_accum=3)
    st2, fz2 = create_train_state(params, VT, tx)
    with pytest.raises(ValueError, match="not divisible"):
        bad.train_step(st2, fz2, _make_batch(n=8), jax.random.PRNGKey(0))
    # microbatch must still fill the data axis (16/4=4 rows on 8 devices
    # would force resharding + idle chips — refused at trace time).
    # fresh params: the earlier donated train_step consumed the dev-0
    # buffers the replicated state aliased
    bad_mesh = Trainer(loss_fn, tx, mesh=mesh, grad_accum=4)
    st3, fz3 = create_train_state(_params(), VT, tx, mesh=mesh)
    with pytest.raises(ValueError, match="data axis"):
        bad_mesh.train_step(st3, fz3, shard_batch(mesh, _make_batch(n=16)),
                            jax.random.PRNGKey(0))


def test_skip_nonfinite_guard():
    """--skip_nonfinite: a NaN batch leaves params AND optimizer state
    untouched in-jit (where-selection in the train step — opt_state pytree
    is identical with the flag on/off, so checkpoints stay resume-
    compatible), and NonfiniteLossPolicy tolerates N consecutive bad steps
    before aborting (reference aborts on the first, main.py:75-78)."""
    import pytest

    from frozenbilm_tpu.train.optim import NonfiniteLossPolicy

    params = _params()
    tx = make_optimizer(make_schedule(1e-3, 100), clip_max_norm=0.1)
    loss_fn = make_mlm_loss_fn(deberta_forward, CFG, VT,
                               mask_token_id=4, vocab_size=120)
    trainer = Trainer(loss_fn, tx, skip_nonfinite=True)
    state, frozen = create_train_state(params, VT, tx)
    # same optimizer, same state topology whether the guard is on or off
    plain_state, _ = create_train_state(params, VT, tx)
    assert (jax.tree.structure(state.opt_state)
            == jax.tree.structure(plain_state.opt_state))
    before = jax.tree.map(lambda x: np.asarray(x).copy(), state.trainable)
    opt_before = jax.tree.map(lambda x: np.asarray(x).copy(), state.opt_state)

    bad = _make_batch()
    bad["video"] = bad["video"].at[0, 0, 0].set(jnp.nan)
    state, metrics = trainer.train_step(state, frozen, bad,
                                        jax.random.PRNGKey(0))
    assert not np.isfinite(float(metrics["loss"]))
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(state.trainable)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(opt_before),
                    jax.tree.leaves(state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # a following good batch still updates
    state, metrics = trainer.train_step(state, frozen, _make_batch(),
                                        jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    changed = any(np.abs(np.asarray(a) - np.asarray(b)).max() > 0
                  for a, b in zip(jax.tree.leaves(before),
                                  jax.tree.leaves(state.trainable)))
    assert changed

    # host policy: 0 = abort immediately; N = abort after N+1 consecutive
    with pytest.raises(RuntimeError):
        NonfiniteLossPolicy(0).step(float("nan"))
    pol = NonfiniteLossPolicy(2)
    assert pol.step(float("nan")) and pol.step(float("nan"))
    with pytest.raises(RuntimeError, match="consecutive"):
        pol.step(float("nan"))
    pol2 = NonfiniteLossPolicy(1)
    assert pol2.step(float("nan"))
    assert not pol2.step(1.0)  # finite resets the streak
    assert pol2.step(float("nan"))
    # backward-only overflow: finite loss, non-finite grad norm still counts
    with pytest.raises(RuntimeError):
        NonfiniteLossPolicy(0).step(1.0, float("inf"))


def test_prune_checkpoints(tmp_path):
    from frozenbilm_tpu.utils.checkpoint import prune_checkpoints

    for name in ["checkpoint0000", "checkpoint0001", "checkpoint0002",
                 "checkpoint0003", "best_model", "ckpt", "checkpoint_preempt"]:
        (tmp_path / name).mkdir()
    prune_checkpoints(str(tmp_path), keep=2)
    left = sorted(p.name for p in tmp_path.iterdir())
    assert left == ["best_model", "checkpoint0002", "checkpoint0003",
                    "checkpoint_preempt", "ckpt"]
    prune_checkpoints(str(tmp_path), keep=0)  # 0 = keep everything
    assert sorted(p.name for p in tmp_path.iterdir()) == left


def test_mlm_gathered_head_loss_equals_full():
    """Masked-position gather before the MLM head (TPU-BERT
    max_predictions_per_seq trick, deberta_forward gather_loss_positions):
    loss AND grads equal the full (B, L, vocab) path exactly while every
    row's label count fits the per-row capacity."""
    import numpy as np

    from frozenbilm_tpu.models.deberta import deberta_forward
    from frozenbilm_tpu.train.trainer import make_mlm_loss_fn

    params = _params()
    batch = _make_batch()
    full = make_mlm_loss_fn(deberta_forward, CFG, VT, mask_token_id=4,
                            vocab_size=120, gather_loss_positions=0)
    gathered = make_mlm_loss_fn(deberta_forward, CFG, VT, mask_token_id=4,
                                vocab_size=120, gather_loss_positions=12)
    for seed in range(4):
        k = jax.random.PRNGKey(seed)
        lf = float(jax.jit(lambda p: full(p, batch, k)[0])(params))
        lg = float(jax.jit(lambda p: gathered(p, batch, k)[0])(params))
        assert abs(lf - lg) < 3e-6, (seed, lf, lg)
    g1 = jax.jit(jax.grad(lambda p: full(p, batch, jax.random.PRNGKey(7))[0]))(params)
    g2 = jax.jit(jax.grad(lambda p: gathered(p, batch, jax.random.PRNGKey(7))[0]))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
