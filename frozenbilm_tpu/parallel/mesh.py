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

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclass(frozen=True)
class MeshSpec:
    data: int = -1  # -1 -> all remaining devices
    model: int = 1


def make_mesh(spec: MeshSpec = MeshSpec(), devices=None) -> Mesh:
    """Build a 2D (data, model) mesh. 'model' is the tensor-parallel axis
    (used by GPT-J/Neo shardings); encoder models typically run model=1."""
    devices = devices if devices is not None else jax.devices()
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
    """Place a host batch (pytree of arrays) batch-sharded on the mesh."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    s = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


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
