"""Subprocess worker for the TP / FSDP legs of tests/test_multihost.py.

Runs as one of WORLD_SIZE=2 processes (2 local CPU devices each -> 4 global
devices). Unlike multihost_worker.py (DP: params replicated, batch sharded),
these legs shard PARAMS across processes — the layouts where
device_put/host_local_array_to_global_array handling of non-batch axes can
silently break (VERDICT r2 #8; the multi-process reality emulated is
reference util/dist.py:201-238 + the GPU device_map in gptj.py:421-454).

LEG=tp   : GPT-J train step, model axis (size 4) spanning both processes —
           every head/ffn shard crosses the process boundary
           (parallel/tp.py gpt_param_specs + shard_params).
LEG=fsdp : DeBERTa adapter train step with FSDP storage, data axis (size 4)
           spanning both processes (trainer.fsdp_state_shardings + Trainer).

Each leg also computes the identical step on a LOCAL 1-device mesh (this
process's own device, fully replicated) as the single-process oracle, and
asserts loss + updated-trainable equality. Prints one "RESULT {json}" line.
"""

import json
import os

import jax

# the axon sitecustomize overrides JAX_PLATFORMS; config update is the only
# reliable CPU switch (see CLAUDE.md)
jax.config.update("jax_platforms", "cpu")


def _tree_l2_delta(a, b):
    """L2 distance between two pytrees, on host (the trees may live on
    different meshes — mixing them in one jit is an error)."""
    import numpy as np
    from jax.experimental import multihost_utils

    def fetch(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            # cross-process shards: materialize the full value on every host
            x = multihost_utils.process_allgather(x, tiled=True)
        return np.asarray(jax.device_get(x), np.float32)

    leaves = jax.tree.leaves(jax.tree.map(
        lambda x, y: float(np.sum((fetch(x) - fetch(y)) ** 2)), a, b))
    return float(sum(leaves)) ** 0.5


def _leg_tp(mesh, result):
    """Model-parallel GPT-J train step; model axis crosses processes."""
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from frozenbilm_tpu.config import GPTJConfig, VideoTextConfig
    from frozenbilm_tpu.models.gptj import gptj_forward, init_gptj_params
    from frozenbilm_tpu.parallel.mesh import replicate
    from frozenbilm_tpu.parallel.tp import gpt_param_specs, shard_params
    from frozenbilm_tpu.train.partition import merge_params, partition_params

    cfg = GPTJConfig(vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
                     rotary_dim=8, max_position_embeddings=32)
    vt = VideoTextConfig(features_dim=16, max_feats=2, ds_factor_attn=0,
                         ds_factor_ff=0)
    params = init_gptj_params(jax.random.PRNGKey(0), cfg, vt)
    trainable, frozen = partition_params(params, vt)
    specs = gpt_param_specs(frozen)
    frozen_sh = shard_params(mesh, frozen, specs)
    # the point of the leg: at least one frozen leaf is truly sharded over a
    # model axis that spans both processes
    sharded = [x for x in jax.tree.leaves(frozen_sh)
               if not x.sharding.is_fully_replicated]
    assert sharded, "no leaf actually model-sharded"
    procs = {d.process_index for d in sharded[0].sharding.device_set}
    assert procs == {0, 1}, f"model shards confined to processes {procs}"
    result["tp_sharded_leaves"] = len(sharded)
    trainable_sh = replicate(mesh, trainable)

    tx = optax.sgd(0.1)
    B, T, F = 4, 8, 2
    rng = np.random.default_rng(0)
    batch_np = {
        "ids": rng.integers(1, cfg.vocab_size, size=(B, T)).astype(np.int32),
        "am": np.ones((B, T), np.int32),
        "video": rng.normal(size=(B, F, 16)).astype(np.float32),
        "vm": np.ones((B, F), np.int32),
    }

    def make_step():
        @jax.jit
        def step(trainable, frozen, opt_state, b):
            def loss_fn(tr):
                p = merge_params(tr, frozen)
                return gptj_forward(p, cfg, vt, b["ids"], b["am"], b["video"],
                                    b["vm"], labels=b["ids"]).loss

            loss, grads = jax.value_and_grad(loss_fn)(trainable)
            updates, opt2 = tx.update(grads, opt_state, trainable)
            return optax.apply_updates(trainable, updates), loss

        return step

    batch = replicate(mesh, batch_np)
    opt_state = jax.tree.map(lambda x: x, tx.init(trainable))
    new_tr, loss = make_step()(trainable_sh, frozen_sh,
                               replicate(mesh, opt_state), batch)
    result["tp_loss"] = float(loss)

    # local single-device oracle (addressable-only mesh is legal multiprocess)
    from jax.sharding import Mesh

    lmesh = Mesh(np.asarray(jax.local_devices()[:1]).reshape(1, 1),
                 ("data", "model"))
    lrep = NamedSharding(lmesh, P())
    put = lambda t: jax.tree.map(lambda x: jax.device_put(x, lrep), t)
    ref_tr, ref_loss = make_step()(put(trainable), put(frozen),
                                   put(tx.init(trainable)), put(batch_np))
    result["tp_ref_loss"] = float(ref_loss)
    result["tp_update_l2_delta"] = _tree_l2_delta(new_tr, ref_tr)


def _leg_fsdp(mesh, result):
    """FSDP-storage DeBERTa train step; data axis crosses processes."""
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from frozenbilm_tpu.config import DebertaV2Config, VideoTextConfig
    from frozenbilm_tpu.models.deberta import deberta_forward, init_deberta_params
    from frozenbilm_tpu.parallel.mesh import shard_batch
    from frozenbilm_tpu.train.optim import make_optimizer, make_schedule
    from frozenbilm_tpu.train.trainer import (
        Trainer,
        TrainState,
        create_train_state,
        fsdp_state_shardings,
        make_mlm_loss_fn,
    )

    cfg = DebertaV2Config(vocab_size=128, hidden_size=32, num_hidden_layers=1,
                          num_attention_heads=4, intermediate_size=64,
                          max_position_embeddings=32, position_buckets=8)
    vt = VideoTextConfig(features_dim=16, max_feats=2, ds_factor_attn=4,
                         ds_factor_ff=4, n_ans=0)
    params = init_deberta_params(jax.random.PRNGKey(0), cfg, vt)
    tx = make_optimizer(make_schedule(3e-4, 100, "linear_with_warmup"),
                        clip_max_norm=0.1)
    loss_fn = make_mlm_loss_fn(deberta_forward, cfg, vt, mask_token_id=4,
                               vocab_size=cfg.vocab_size)

    pid = jax.process_index()
    B, T, F = 8, 10, 2
    rng = np.random.default_rng(0)
    gbatch = {
        "input_ids": rng.integers(5, cfg.vocab_size, size=(B, T)).astype(np.int32),
        "attention_mask": np.ones((B, T), np.int32),
        "special_tokens_mask": np.zeros((B, T), np.int32),
        "video": rng.normal(size=(B, F, 16)).astype(np.float32),
        "video_mask": np.ones((B, F), np.int32),
    }
    local = {k: v[pid * 4:(pid + 1) * 4] for k, v in gbatch.items()}

    state, frozen = create_train_state(params, vt, tx)
    st_sh, fz_sh = fsdp_state_shardings(mesh, state, frozen, min_size=256)
    state = jax.tree.map(jax.device_put, state, st_sh)
    frozen = jax.tree.map(jax.device_put, frozen, fz_sh)
    sharded = [x for x in jax.tree.leaves(frozen)
               if not x.sharding.is_fully_replicated]
    assert sharded, "no frozen leaf actually fsdp-sharded"
    procs = {d.process_index for d in sharded[0].sharding.device_set}
    assert procs == {0, 1}, f"fsdp shards confined to processes {procs}"
    result["fsdp_sharded_leaves"] = len(sharded)

    trainer = Trainer(loss_fn, tx, mesh=mesh, state_shardings=st_sh,
                      frozen_shardings=fz_sh)
    batch = shard_batch(mesh, local)
    state, metrics = trainer.train_step(state, frozen, batch,
                                        jax.random.PRNGKey(0))
    result["fsdp_loss"] = float(metrics["loss"])

    # local oracle: same GLOBAL batch, replicated storage, 1 local device.
    # train_step donates its state, so re-init params (CLAUDE.md gotcha).
    lmesh = Mesh(np.asarray(jax.local_devices()[:1]).reshape(1, 1),
                 ("data", "model"))
    params2 = init_deberta_params(jax.random.PRNGKey(0), cfg, vt)
    state2, frozen2 = create_train_state(params2, vt, tx)
    lrep = NamedSharding(lmesh, P())
    put = lambda t: jax.tree.map(lambda x: jax.device_put(x, lrep), t)
    state2 = TrainState(*put(tuple(state2)))
    frozen2 = put(frozen2)
    ltrainer = Trainer(loss_fn, tx, mesh=lmesh)
    lbatch = jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x), NamedSharding(lmesh, P("data"))),
        gbatch)
    state2, m2 = ltrainer.train_step(state2, frozen2, lbatch,
                                     jax.random.PRNGKey(0))
    result["fsdp_ref_loss"] = float(m2["loss"])
    result["fsdp_update_l2_delta"] = _tree_l2_delta(state.trainable,
                                                    state2.trainable)


def main():
    import numpy as np

    from frozenbilm_tpu.parallel.mesh import (
        MeshSpec,
        init_distributed,
        make_mesh,
        sync_global_devices,
    )

    assert init_distributed(verbose=False), "env:// rendezvous not detected"
    assert jax.process_count() == 2 and jax.device_count() == 4

    leg = os.environ["LEG"]
    result = {"pid": jax.process_index(), "leg": leg}
    if leg == "tp":
        mesh = make_mesh(MeshSpec(data=1, model=4))
        _leg_tp(mesh, result)
    elif leg == "fsdp":
        mesh = make_mesh(MeshSpec(data=4, model=1))
        _leg_fsdp(mesh, result)
    else:
        raise SystemExit(f"unknown LEG {leg!r}")
    sync_global_devices("tp-fsdp-done")
    print("RESULT " + json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
