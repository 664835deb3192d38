"""Tensor-parallel parameter shardings for the GPT family.

The reference offers layer-sharding model parallelism for GPT-J/Neo via HF
parallelize(device_map) with per-layer device hops (gptj.py:421-454,
577-638) — a sequential pipeline that would serialize on TPU. The TPU-native
equivalent is Megatron-style tensor parallelism over the mesh 'model' axis:
column-parallel qkv/fc_in, row-parallel out_proj/fc_out, sharded vocab
head; XLA GSPMD inserts the all-reduces over ICI.

Specs are path-based so they apply to the stacked-layer trees (leading
layer axis stays unsharded).
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from frozenbilm_tpu.parallel.mesh import MODEL_AXIS


def _gpt_spec_for(path_names, leaf) -> P:
    names = list(path_names)
    ndim = np.ndim(leaf) if not hasattr(leaf, "ndim") else leaf.ndim
    stacked = names and names[0] == "layers"
    lead = (None,) if stacked else ()

    def spec(*dims):
        return P(*(lead + dims))

    joined = "/".join(names)
    # quant scales: per-channel (out,) shards like the bias; GROUPED int4
    # scales are (G, out) — 2D like the kernel — and must follow the
    # kernel's own layout so each K-slab keeps its group scales local.
    grouped_scale = names[-1] == "scale" and ndim - len(lead) == 2
    # column-parallel: shard the output features ('kernel' matches the int8
    # 'kernel_q' / int4 'kernel_q4' too)
    if any(f"{n}/kernel" in joined for n in ("q_proj", "k_proj", "v_proj", "fc_in", "c_fc")):
        return spec(None, MODEL_AXIS)
    if any(f"{n}/{v}" in joined for n in ("q_proj", "k_proj", "v_proj", "fc_in", "c_fc")
           for v in ("bias", "scale")):
        return spec(None, MODEL_AXIS) if grouped_scale else spec(MODEL_AXIS)
    # row-parallel: shard the input features; bias and per-channel scale
    # replicated (the dynamic activation abs-max over the sharded feature
    # dim becomes a GSPMD max all-reduce, so every shard quantizes
    # identically); grouped scales shard their G axis with the kernel's K
    if any(f"{n}/kernel" in joined for n in ("out_proj", "fc_out", "c_proj")):
        return spec(MODEL_AXIS, None)
    if grouped_scale and any(
            f"{n}/scale" in joined for n in ("out_proj", "fc_out", "c_proj")):
        return spec(MODEL_AXIS, None)
    # vocab head: shard the vocabulary dim
    if names[:1] == ["lm_head"] and names[-1] in ("kernel", "kernel_q", "kernel_q4"):
        return P(None, MODEL_AXIS)
    if names[:1] == ["lm_head"] and names[-1] in ("bias", "scale"):
        return P(None, MODEL_AXIS) if grouped_scale else P(MODEL_AXIS)
    if names[:1] == ["wte"]:
        return P(None, None)
    return spec(*([None] * (ndim - len(lead))))


def gpt_param_specs(params: Dict) -> Dict:
    """PartitionSpec pytree for GPT-J / GPT-Neo parameter trees."""

    def path_names(path):
        out = []
        for k in path:
            out.append(str(k.key) if hasattr(k, "key") else str(getattr(k, "idx", k)))
        return out

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _gpt_spec_for(path_names(path), leaf), params
    )


def shard_params(mesh: Mesh, params: Dict, specs: Dict) -> Dict:
    """Place each leaf with its NamedSharding (replicates where spec is P()).

    Leaves whose sharded dims don't divide by the axis size fall back to
    replication (e.g. GPT-Neo's odd 50257-token vocab head)."""

    def place(x, s):
        for dim, axis in enumerate(s):
            if axis is not None and x.shape[dim] % mesh.shape[axis] != 0:
                s = P()
                break
        return jax.device_put(x, NamedSharding(mesh, s))

    return jax.tree.map(place, params, specs)


def validate_divisibility(params: Dict, specs: Dict, model_axis_size: int) -> None:
    """Every sharded dim must divide by the model-axis size."""

    def check(x, s):
        for dim, axis in enumerate(s):
            if axis == MODEL_AXIS and x.shape[dim] % model_axis_size != 0:
                raise ValueError(
                    f"dim {dim} of shape {x.shape} not divisible by model={model_axis_size}")

    jax.tree.map(check, params, specs)
