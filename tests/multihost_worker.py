"""Subprocess worker for tests/test_multihost.py.

Runs as one of WORLD_SIZE processes rendezvousing over localhost — the CPU
analogue of one host in a multi-host TPU pod. Exercises every multi-process
code path that is dead under single-process tests (VERDICT r1):
  init_distributed (env:// detection), loader sharding, shard_batch global
  arrays, a true-DP train step, fetch_local_rows, host_gather_results,
  reduce_metrics, SmoothedValue sync, and the global barrier.

Prints one "RESULT {json}" line for the parent test to assert on.
"""

import json
import os

import jax

# the axon sitecustomize overrides JAX_PLATFORMS; config update is the only
# reliable CPU switch (see CLAUDE.md)
jax.config.update("jax_platforms", "cpu")


def main():
    import numpy as np

    from frozenbilm_tpu.parallel.mesh import (
        MeshSpec,
        fetch_local_rows,
        host_gather_results,
        init_distributed,
        is_main_process,
        loader_shard_kwargs,
        make_mesh,
        reduce_metrics,
        replicate,
        shard_batch,
        sync_global_devices,
    )

    assert init_distributed(verbose=False), "env:// rendezvous not detected"
    pid = jax.process_index()
    n_proc = jax.process_count()
    assert n_proc == 2 and jax.device_count() == 4, (n_proc, jax.device_count())

    import jax.numpy as jnp
    import optax

    from frozenbilm_tpu.data.loader import DataLoader
    from frozenbilm_tpu.train.trainer import Trainer, TrainState
    from frozenbilm_tpu.utils.metrics import SmoothedValue

    mesh = make_mesh(MeshSpec())  # (data=4, model=1) over 2 procs x 2 devices

    # --- loader sharding: 8 samples, per-host batch 2 -> 2 disjoint batches
    data = list(range(8))
    loader = DataLoader(
        data, 2, collate_fn=lambda b: {"i": np.asarray(b)}, **loader_shard_kwargs())
    seen = [int(i) for b in loader for i in b["i"]]

    # --- one true-DP train step over the global batch (hosts feed halves)
    w0 = (np.arange(3, dtype=np.float32).reshape(3, 1) + 1) / 10
    trainable = {"w": jnp.asarray(w0)}
    frozen = {"w": None}
    tx = optax.sgd(0.1)

    def loss_fn(params, batch, rng):
        pred = batch["x"] @ params["w"]
        return jnp.mean((pred - batch["y"]) ** 2), {}

    trainer = Trainer(loss_fn, tx, mesh=mesh)
    state = TrainState(jnp.zeros((), jnp.int32), trainable, tx.init(trainable))
    state = TrainState(*replicate(mesh, tuple(state)))

    xs = np.arange(24, dtype=np.float32).reshape(8, 3) / 10
    ys = np.ones((8, 1), np.float32)
    local = {"x": xs[pid * 4:(pid + 1) * 4], "y": ys[pid * 4:(pid + 1) * 4]}
    batch = shard_batch(mesh, local)
    state, metrics = trainer.train_step(state, frozen, batch, jax.random.PRNGKey(0))
    loss = float(metrics["loss"])
    w_after = np.asarray(state.trainable["w"]).reshape(-1).tolist()

    # --- grad-accum microbatch scan across processes: same update as the
    # full-batch step (deterministic loss, so accumulation math is exact)
    ga_trainer = Trainer(loss_fn, tx, mesh=mesh, grad_accum=2)
    ga_state = TrainState(jnp.zeros((), jnp.int32), {"w": jnp.asarray(w0)},
                          tx.init({"w": jnp.asarray(w0)}))
    ga_state = TrainState(*replicate(mesh, tuple(ga_state)))
    ga_batch = shard_batch(mesh, {"x": xs[pid * 4:(pid + 1) * 4],
                                  "y": ys[pid * 4:(pid + 1) * 4]})
    ga_state, _ = ga_trainer.train_step(ga_state, frozen, ga_batch,
                                        jax.random.PRNGKey(0))
    ga_w = np.asarray(ga_state.trainable["w"]).reshape(-1).tolist()

    # --- fetch_local_rows returns exactly this host's contributed rows
    back = fetch_local_rows(mesh, batch["x"])
    assert np.array_equal(back, local["x"]), (back, local["x"])

    # --- host-side collectives (reference util/dist.py analogues)
    gathered = host_gather_results({f"q{pid}_{k}": pid for k in range(3)})
    red = reduce_metrics({"loss": float(pid)})
    sv = SmoothedValue()
    sv.update(float(pid + 1))
    sv.synchronize_between_processes()
    sync_global_devices("test-barrier")

    print("RESULT " + json.dumps({
        "pid": pid,
        "seen": seen,
        "loss": loss,
        "w": w_after,
        "ga_w": ga_w,
        "gathered": sorted(gathered),
        "reduced": red["loss"],
        "sv_avg": sv.global_avg,
        "main": is_main_process(),
    }), flush=True)


if __name__ == "__main__":
    main()
