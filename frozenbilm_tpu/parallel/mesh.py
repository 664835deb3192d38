"""Device mesh + sharding utilities — the TPU-native replacement for the
reference's torch.distributed/NCCL layer (reference util/dist.py).

Reference semantics -> TPU mapping (SURVEY.md §2.5, §5.8):
  - process-group init / rendezvous  -> jax.distributed.initialize (multi-host)
  - DistributedSampler data sharding -> batch sharded over the 'data' mesh axis
  - (absent) gradient all-reduce     -> automatic: params replicated under
    pjit, XLA inserts the psum for replicated-param grads. This *fixes* the
    reference's unsynchronized-replica divergence (dist.py is launch-only;
    grads are never synced there — see SURVEY.md §2.5) and we document it.
  - pickled-object all_gather of eval result dicts (dist.py:25-86)
                                      -> host-side process_allgather
  - rank-0-only printing/saving      -> jax.process_index() == 0
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def init_distributed(verbose: bool = True) -> bool:
    """Multi-host process-group init (reference util/dist.py:201-238).

    Rendezvous detection, in order:
      1. already initialized (process_count > 1) -> no-op
      2. torchrun-style env://  (MASTER_ADDR [+ MASTER_PORT] + RANK +
         WORLD_SIZE, reference dist.py:203-206)
      3. SLURM (SLURM_PROCID etc., dist.py:207-217) and any other cluster
         jax auto-detects -> jax.distributed.initialize() with no args
      4. none of the above -> single-process, returns False
         ("Not using distributed mode", dist.py:218-221)

    On success every host passes a global barrier (dist.py:237).

    NOTE: must run before anything initializes the XLA backend (jax.devices,
    device_put, ...), so the already-initialized check avoids backend calls.
    """
    if jax.distributed.is_initialized():
        return jax.process_count() > 1
    env = os.environ
    if "RANK" in env and "WORLD_SIZE" in env and "MASTER_ADDR" in env:
        if int(env["WORLD_SIZE"]) <= 1:
            return False
        jax.distributed.initialize(
            coordinator_address=f"{env['MASTER_ADDR']}:{env.get('MASTER_PORT', '29500')}",
            num_processes=int(env["WORLD_SIZE"]),
            process_id=int(env["RANK"]),
        )
    elif "SLURM_PROCID" in env and int(env.get("SLURM_NTASKS", "1")) > 1:
        jax.distributed.initialize()  # jax's SLURM cluster auto-detection
    else:
        if verbose:
            print("Not using distributed mode")
        return False
    if verbose and is_main_process():
        print(f"| distributed init: {jax.process_count()} processes, "
              f"{jax.device_count()} devices")
    sync_global_devices("init_distributed")
    return jax.process_count() > 1


def loader_shard_kwargs() -> Dict[str, int]:
    """DataLoader sharding kwargs — the DistributedSampler analogue
    (reference main.py:193-200): each host reads its 1/Nth of the index
    stream."""
    return {"num_shards": jax.process_count(), "shard_index": jax.process_index()}


@dataclass(frozen=True)
class MeshSpec:
    data: int = -1  # -1 -> all remaining devices
    model: int = 1


def order_devices_hybrid(devices, slice_index_of=None):
    """Order devices slice-major for multi-slice (DCN-connected) pods.

    With devices grouped by slice, reshaping into a (data, model) mesh
    keeps every 'model' (tensor-parallel) group and each contiguous run of
    'data' neighbors INSIDE one slice, so TP collectives and the intra-
    slice stage of XLA's hierarchical grad all-reduce ride ICI; only the
    cross-slice combine crosses DCN (the scaling-book layout; the reference
    has no multi-slice story at all — its NCCL DP is single-cluster,
    util/dist.py:226). Single-slice (or CPU) device lists come back
    unchanged. The sort is stable, preserving jax.devices() order within a
    slice."""
    key = slice_index_of or (lambda d: getattr(d, "slice_index", 0) or 0)
    return sorted(devices, key=key)


def make_mesh(spec: MeshSpec = MeshSpec(), devices=None) -> Mesh:
    """Build a 2D (data, model) mesh. 'model' is the tensor-parallel axis
    (used by GPT-J/Neo shardings); encoder models typically run model=1.
    Multi-slice device lists are ordered slice-major first
    (order_devices_hybrid) so model groups never straddle DCN."""
    devices = devices if devices is not None else jax.devices()
    devices = order_devices_hybrid(devices)
    n = len(devices)
    model = max(1, spec.model)
    data = spec.data if spec.data > 0 else n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch (pytree of arrays) batch-sharded on the mesh.

    Single-host: a plain device_put. Multi-host: each host's local batch is
    this host's shard of the global batch (the loader already read disjoint
    1/Nth index streams, loader_shard_kwargs), so build global arrays via
    host_local_array_to_global_array — device_put alone cannot create
    arrays spanning non-addressable devices.
    """
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return jax.tree.map(
            lambda x: multihost_utils.host_local_array_to_global_array(
                np.asarray(x), mesh, P(DATA_AXIS)),
            batch)
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree over the whole mesh. Multi-host requires every
    host to hold identical values (same seed init / same checkpoint)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return jax.tree.map(
            lambda x: multihost_utils.host_local_array_to_global_array(
                np.asarray(x), mesh, P()),
            tree)
    s = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def fetch_local_rows(mesh: Optional[Mesh], x) -> np.ndarray:
    """Batch-sharded device output -> this host's local numpy rows.

    Single-process: np.asarray of the (fully addressable) array. Multi-host:
    resharded back to the host-local layout, returning exactly the rows this
    host contributed via shard_batch.
    """
    if jax.process_count() == 1 or mesh is None:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.global_array_to_host_local_array(
        x, mesh, P(DATA_AXIS)))


def reduce_metrics(d: Dict[str, float]) -> Dict[str, float]:
    """Average a dict of python scalars across processes — the reference's
    per-step reduce_dict for logged losses (util/dist.py:89-113).
    Single-process: identity."""
    if jax.process_count() == 1 or not d:
        return dict(d)
    from jax.experimental import multihost_utils

    keys = sorted(d)
    vals = np.asarray([float(d[k]) for k in keys], np.float64)
    total = np.asarray(multihost_utils.process_allgather(vals)).reshape(
        jax.process_count(), len(keys)).sum(0)
    return {k: float(v) / jax.process_count() for k, v in zip(keys, total)}


def is_main_process() -> bool:
    """Analogue of reference util/dist.py:190 (is_main_process)."""
    return jax.process_index() == 0


def host_gather_results(local: Dict[str, Any]) -> Dict[str, Any]:
    """Merge per-host python result dicts across processes.

    Multi-host path mirrors the reference's pickle -> padded byte-tensor
    all_gather (util/dist.py:25-86): the local dict pickles to bytes, pads
    to the global max length, gathers via process_allgather, and every host
    merges all shards (reduce(dict.update), videoqa.py:214-216).
    Single-process (including multi-device single-host) is a no-op merge.
    """
    if jax.process_count() == 1:
        return dict(local)
    return _gather_pyobj_multihost(local)


def _gather_pyobj_multihost(local: Any) -> Dict[str, Any]:
    import pickle

    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(local), dtype=np.uint8)
    local_len = np.array([len(payload)], dtype=np.int64)
    all_lens = np.asarray(multihost_utils.process_allgather(local_len)).reshape(-1)
    max_len = int(all_lens.max())
    padded = np.zeros(max_len, dtype=np.uint8)
    padded[: len(payload)] = payload
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    merged: Dict[str, Any] = {}
    for shard, n in zip(gathered.reshape(jax.process_count(), max_len), all_lens):
        merged.update(pickle.loads(shard[: int(n)].tobytes()))
    return merged


def sync_global_devices(tag: str = "barrier") -> None:
    """Cross-host barrier (reference util/dist.py:237 post-init barrier)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)
