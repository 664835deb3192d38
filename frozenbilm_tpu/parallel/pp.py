"""Pipeline parallelism over a 'pipe' mesh axis (GPipe schedule, shard_map).

The reference's multi-device answer for the GPT family is HF
`parallelize(device_map)` (gptj.py:421-454): layers are placed on
successive GPUs and ONE sample crawls through them — a sequential pipeline
with no overlap. The TPU-native rebuild keeps the layer placement idea but
runs a real GPipe schedule: the batch is split into M microbatches, every
stage computes a different microbatch each tick, and activations hop to the
next stage over ICI via `ppermute`. Utilization is M/(M+S-1) of ideal for S
stages — vs 1/S for the reference's device map.

Design (jax-idiomatic, mirrors the shard_map pipelining recipe from the
scaling-book):
  - the stacked-layer tree (leading axis = num_layers, the lax.scan axis)
    is sharded over 'pipe' with P('pipe'): each device holds a contiguous
    chunk of layers — no resharding, the SAME parameter pytree the scan
    path uses;
  - inside shard_map each tick runs the local chunk (a lax.scan) on the
    stage's current microbatch state, then ppermutes the state pytree one
    stage forward;
  - stage 0 injects microbatch t at tick t; stage S-1 collects microbatch
    t-(S-1); a masked psum replicates the collected outputs at the end.

The per-microbatch state is an arbitrary pytree (hidden + whatever
constants must travel with it, e.g. the padding mask); `layer_fn` must
return it with identical structure/shapes.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

PIPE_AXIS = "pipe"


def make_pipe_mesh(n_stages: int, devices=None) -> Mesh:
    """1D pipeline mesh of n_stages devices."""
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices[:n_stages]), (PIPE_AXIS,))


def microbatch(tree, n_micro: int):
    """(B, ...) pytree -> (M, B/M, ...): leading microbatch axis."""

    def split(x):
        B = x.shape[0]
        if B % n_micro:
            raise ValueError(f"batch {B} not divisible by n_micro={n_micro}")
        return x.reshape(n_micro, B // n_micro, *x.shape[1:])

    return jax.tree.map(split, tree)


def unmicrobatch(tree):
    return jax.tree.map(lambda x: x.reshape(-1, *x.shape[2:]), tree)


def pipeline_apply(
    layer_fn: Callable,
    layers,
    states_mb,
    mesh: Mesh,
    axis: str = PIPE_AXIS,
):
    """Run `layer_fn` over all stacked layers with a GPipe schedule.

    layer_fn(layer_params, state) -> state  (structure/shape preserving)
    layers:    pytree, leading axis = num_layers (divisible by the axis size)
    states_mb: pytree, leading axis = M microbatches; each leaf (mb, ...)

    Returns the post-all-layers states_mb (replicated on every stage).
    """
    S = mesh.shape[axis]
    n_layers = jax.tree.leaves(layers)[0].shape[0]
    if n_layers % S:
        raise ValueError(f"{n_layers} layers not divisible by {S} stages")
    M = jax.tree.leaves(states_mb)[0].shape[0]

    def per_stage(layers_local, states):
        stage = jax.lax.axis_index(axis)

        def run_chunk(st):
            return jax.lax.scan(
                lambda c, lp: (layer_fn(lp, c), None), st, layers_local)[0]

        # the carry becomes device-varying over 'pipe' inside the loop
        # (axis_index-dependent injection/collection), so the initial value
        # must carry the same varying-axes type
        state0 = jax.tree.map(
            lambda x: jax.lax.pcast(jnp.zeros_like(x[0]), (axis,), to='varying'), states)
        outs0 = jax.tree.map(
            lambda x: jax.lax.pcast(jnp.zeros_like(x), (axis,), to='varying'), states)

        def tick(t, carry):
            st, outs = carry
            idx = jnp.clip(t, 0, M - 1)
            inj = jax.tree.map(
                lambda x: jax.lax.dynamic_index_in_dim(x, idx, 0, keepdims=False),
                states)
            st = jax.tree.map(
                lambda a, b: jnp.where(stage == 0, a, b), inj, st)
            st = run_chunk(st)
            oidx = jnp.clip(t - (S - 1), 0, M - 1)
            take = (stage == S - 1) & (t >= S - 1)
            outs = jax.tree.map(
                lambda o, s: jnp.where(
                    take, jax.lax.dynamic_update_index_in_dim(o, s, oidx, 0), o),
                outs, st)
            st = jax.tree.map(
                lambda x: jax.lax.ppermute(
                    x, axis, [(i, (i + 1) % S) for i in range(S)]), st)
            return st, outs

        _, outs = jax.lax.fori_loop(0, M + S - 1, tick, (state0, outs0))
        # replicate the last stage's collected outputs everywhere
        last = stage == S - 1
        return jax.tree.map(
            lambda o: jax.lax.psum(jnp.where(last, o, jnp.zeros_like(o)), axis),
            outs)

    fn = jax.shard_map(per_stage, mesh=mesh,
                       in_specs=(P(axis), P()), out_specs=P())
    return fn(layers, states_mb)
