"""Sequence parallelism (SP): shard the token axis of activations.

The reference has no counterpart (its longest shape, mc.py max_tokens=512
with subtitles, simply burns activation memory per GPU). On TPU the
long-context recipe is to pin (B, L, H) activations to P(data, model) —
every layernorm / FFN / adapter / head op then computes on L/model tokens
per chip, and XLA inserts the minimal collectives where full sequence is
genuinely needed (K/V all-gather inside attention; the rel-pos selection
partitions over the query axis for free). This composes with DP on the
batch axis: the same 2D (data, model) mesh serves both.

Wiring: models take an `act_constraint` callable applied at every layer
boundary (models/deberta.py: encoder input, each scan step's output, the
two EMD query iterations). `sequence_constraint(mesh)` builds that callable.
Semantics are identity — outputs equal the unconstrained forward bitwise —
so the dryrun/test equality checks are exact.

When to use: eval/serving at L >= ~256 where per-chip activation HBM (not
weights) binds; weights stay replicated (use FSDP/TP for those). See
docs/SCALING.md.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from frozenbilm_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def sequence_constraint(mesh: Mesh, axis: str = MODEL_AXIS):
    """Callable pinning (B, L, H) activations to P(data, axis, None).

    Pass as deberta_forward(..., act_constraint=...). Rank-3 activation
    tensors get batch sharded over 'data' and the token axis over `axis`;
    anything else passes through untouched (defensive: the hook only ever
    sees hidden states today, but a no-op beats a wrong constraint).
    """
    sharding = NamedSharding(mesh, P(DATA_AXIS, axis, None))

    def constrain(x):
        if getattr(x, "ndim", None) != 3:
            return x
        return jax.lax.with_sharding_constraint(x, sharding)

    return constrain
