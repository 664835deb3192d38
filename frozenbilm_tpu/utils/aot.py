"""Ahead-of-time program export (jax.export / StableHLO).

Deployment story the reference lacks entirely (its serving answer is "run
the torch module in python"): the jitted serving program — e.g. the
answer-vocab scoring step behind tasks/serve.py — is traced ONCE, exported
to a versioned StableHLO artifact, and shipped. A serving process (python
here; any PJRT host in principle) deserializes and calls it without the
model-building python on its path; weights stay separate inputs, so one
artifact serves every checkpoint of the same shape.

Complements --compile_cache (utils/platform.setup_runtime): the artifact
removes python tracing + model code from the serving boundary, the
compilation cache removes XLA compile time on restart.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp


def _specs(tree):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)), tree)


def export_program(fn: Callable, *example_args: Any,
                   platforms: Sequence[str] | None = None) -> bytes:
    """Trace fn at example_args' shapes/dtypes and serialize to bytes.

    platforms defaults to the current default backend; pass e.g.
    ("tpu", "cpu") to build one artifact servable on both."""
    from jax import export as jexport

    jitted = fn if isinstance(fn, jax.stages.Wrapped) else jax.jit(fn)
    exp = jexport.export(jitted, platforms=platforms)(*_specs(example_args))
    return exp.serialize()


def save_program(path: str, fn: Callable, *example_args: Any,
                 platforms: Sequence[str] | None = None) -> None:
    with open(path, "wb") as f:
        f.write(export_program(fn, *example_args, platforms=platforms))


def load_program(path: str) -> Callable:
    """Deserialize an exported program; the result is called with concrete
    arrays matching the export-time structure (and jit-compiles per backend,
    hitting --compile_cache when enabled)."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exp = jexport.deserialize(f.read())
    return jax.jit(exp.call)
