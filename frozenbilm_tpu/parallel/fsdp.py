"""Fully-sharded parameter layout (FSDP / ZeRO-3) over the mesh 'data' axis.

The reference has no analogue — its only answers to "the model does not fit"
are HF layer-sharding device maps (gptj.py:421-454) and fp16 (args.py:318).
The TPU-native answer: store every large parameter leaf sharded across the
data-parallel devices and let XLA GSPMD insert the per-layer all-gather
right before use (and the reduce-scatter on the gradient). Because the
models here execute stacked layers with one lax.scan, the all-gather happens
per scan step — peak live memory is one layer's weights plus the shard of
everything else, which is exactly the FSDP schedule.

Layout rule (shape-based, so it applies uniformly to parameter trees,
optimizer-state trees — adam mu/nu mirror the param shapes — and W8A8
quantized trees from ops/quant.py):
  - leaves smaller than min_size elements stay replicated (tiny all-gathers
    cost more in latency + fragmentation than they save in HBM);
  - stacked-layer leaves (path containing 'layers') never shard dim 0 —
    that's the lax.scan axis;
  - shard the LARGEST eligible dim divisible by the axis size, breaking
    ties toward the trailing (output-feature) dim;
  - nothing divisible -> replicated (e.g. GPT-Neo's 50257 vocab head).

Composes with tensor parallelism: on a (data, model) mesh apply
tp.gpt_param_specs first, then fsdp_specs on the leaves TP left replicated
(merge_with_tp below).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from frozenbilm_tpu.parallel.mesh import DATA_AXIS


def _path_names(path):
    out = []
    for k in path:
        out.append(str(k.key) if hasattr(k, "key") else str(getattr(k, "idx", k)))
    return out


def _leaf_spec(names, leaf, axis_size: int, axis: str, min_size: int) -> P:
    shape = tuple(getattr(leaf, "shape", ()))
    size = int(np.prod(shape)) if shape else 1
    ndim = len(shape)
    if ndim == 0 or size < min_size:
        return P()
    start = 1 if ("layers" in names and ndim >= 2) else 0  # dim 0 = scan axis
    best = None  # (dim_len, dim_index) — prefer larger dim, then later dim
    for d in range(start, ndim):
        if shape[d] % axis_size == 0 and shape[d] >= axis_size:
            if best is None or (shape[d], d) >= best:
                best = (shape[d], d)
    if best is None:
        return P()
    spec = [None] * ndim
    spec[best[1]] = axis
    return P(*spec)


def fsdp_specs(tree, axis_size: int, *, axis: str = DATA_AXIS,
               min_size: int = 2 ** 13) -> Dict:
    """PartitionSpec pytree sharding every large leaf over `axis`.

    Works on parameter trees, partitioned (None-leaf) trees, optimizer
    states, and quantized trees — the rule is shape/path-based only.
    """
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _leaf_spec(_path_names(path), leaf, axis_size,
                                      axis, min_size),
        tree,
    )


def merge_with_tp(tp_specs, fs_specs):
    """Combine TP specs with FSDP specs: TP wins where it shards; leaves TP
    left fully replicated take the FSDP spec (axes never overlap — TP uses
    'model', FSDP 'data')."""

    def pick(tp_s, fs_s):
        return fs_s if all(a is None for a in tp_s) else tp_s

    return jax.tree.map(pick, tp_specs, fs_specs,
                        is_leaf=lambda x: isinstance(x, P))


def place(mesh: Mesh, tree, specs):
    """device_put each leaf with its NamedSharding."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs)


def shardings(mesh: Mesh, specs):
    """Spec pytree -> NamedSharding pytree (for jit in/out_shardings)."""
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))


def sharded_bytes(tree, specs, axis_size: int) -> tuple:
    """(per_device_bytes, replicated_bytes): what FSDP saves.

    per_device counts each sharded leaf at 1/axis_size; replicated counts
    every leaf whole — the difference is the per-chip HBM saving."""
    per_dev = 0
    total = 0
    for leaf, spec in zip(jax.tree.leaves(tree),
                          jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P))):
        nbytes = leaf.size * leaf.dtype.itemsize
        total += nbytes
        per_dev += nbytes // axis_size if any(a is not None for a in spec) else nbytes
    return per_dev, total
