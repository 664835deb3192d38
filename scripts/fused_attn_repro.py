"""Minimal on-chip repro for the fused dattn kernel: prints the FULL Mosaic
error, bisecting kernel features: full kernel, no-transpose, no-rowmask."""
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from frozenbilm_tpu.ops import attention as A

    B, H, L, D = 2, 2, 512, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.bfloat16)
    c2p = jnp.asarray(rng.normal(size=(B, H, L, L)), jnp.bfloat16)
    p2c = jnp.asarray(rng.normal(size=(B, H, L, L)), jnp.bfloat16)
    mask = jnp.ones((B, L), jnp.int32)

    def attempt(name, fn):
        try:
            r = fn()
            print(f"=== {name}: OK {np.asarray(r, np.float32).mean():.4f}",
                  flush=True)
        except Exception as e:
            print(f"=== {name}: FAIL\n{str(e)[:4000]}", flush=True)
            traceback.print_exc(limit=3)

    attempt("full", lambda: A.fused_disentangled_attention(
        q, q, q, c2p, p2c, mask, 13.86, p2c_is_ji=True, hblk=1,
        interpret=False))
    attempt("no_transpose", lambda: A.fused_disentangled_attention(
        q, q, q, c2p, p2c, mask, 13.86, p2c_is_ji=False, hblk=1,
        interpret=False))

    # hand-rolled variant without the row-mask (column mask only)
    def colmask_kernel(q_ref, k_ref, v_ref, c2p_ref, p2c_ref, mask_ref,
                       out_ref, *, inv_scale):
        valid = mask_ref[0, 0, :] != 0
        qb = q_ref[0, 0]
        s = jax.lax.dot_general(qb, k_ref[0, 0], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s + c2p_ref[0, 0].astype(jnp.float32)
        s = (s + p2c_ref[0, 0].astype(jnp.float32)) * inv_scale
        filled = jnp.where(valid[None, :], s, A.NEG_INF)
        m = jnp.max(filled, axis=-1, keepdims=True)
        e = jnp.exp(filled - m)
        e = jnp.where(valid[None, :], e, 0.0)
        p = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
        out = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[0, 0] = out.astype(out_ref.dtype)

    def run_colmask():
        maskp = jnp.broadcast_to(mask.astype(jnp.int32)[:, None, :], (B, 8, L))
        spec = pl.BlockSpec((1, 1, L, 128), lambda b, h: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)
        bspec = pl.BlockSpec((1, 1, L, L), lambda b, h: (b, h, 0, 0),
                             memory_space=pltpu.VMEM)
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, 64)))
        return pl.pallas_call(
            functools.partial(colmask_kernel, inv_scale=1 / 13.86),
            out_shape=jax.ShapeDtypeStruct((B, H, L, 128), q.dtype),
            grid=(B, H),
            in_specs=[spec, spec, spec, bspec, bspec,
                      pl.BlockSpec((1, 8, L), lambda b, h: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=spec,
        )(qp, qp, qp, c2p, p2c, maskp)

    attempt("colmask_no_transpose_no_rowmask", run_colmask)


if __name__ == "__main__":
    main()
