"""Probe: can a Pallas s8xs8 matmul beat XLA's int8 lowering on v5e?

Evidence so far (scripts/int8_micro.py, round 3): XLA's s8xs8->s32 dot runs
only 1.15-1.35x bf16 at FrozenBiLM shapes, far from the 2x int8 MXU peak.
This probe times a blocked Pallas int8 matmul (fused per-column rescale ->
bf16 out, so the s32 accumulator never hits HBM) against the XLA int8 and
bf16 equivalents.

Run: python scripts/int8_pallas_probe.py   (real chip; ~3 min)
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_pallas_matmul(bm, bn, bk):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(x_ref, w_ref, os_ref, out_ref, acc_ref, *, k_steps):
        @pl.when(pl.program_id(2) == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

        @pl.when(pl.program_id(2) == k_steps - 1)
        def _():
            out_ref[:] = (acc_ref[:].astype(jnp.float32)
                          * os_ref[:]).astype(jnp.bfloat16)

    def matmul(xq, wq, oscale):
        M, K = xq.shape
        _, N = wq.shape
        k_steps = K // bk
        return pl.pallas_call(
            functools.partial(kern, k_steps=k_steps),
            grid=(M // bm, N // bn, k_steps),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
                pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
                pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        )(xq, wq, oscale)

    return matmul


def bench(M, K, N, iters=32):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl  # noqa: F401

    try:
        from jax.experimental.pallas import tpu as pltpu
    except ImportError:
        pltpu = None

    rng = np.random.default_rng(0)
    xq = jnp.asarray(rng.integers(-127, 128, size=(M, K)), jnp.int8)
    wq = jnp.asarray(rng.integers(-127, 128, size=(K, N)), jnp.int8)
    oscale = jnp.asarray(rng.uniform(0.01, 0.02, size=(1, N)), jnp.float32)
    x16 = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
    w16 = jnp.asarray(rng.normal(size=(K, N)), jnp.bfloat16)

    flops = 2 * M * K * N

    def timed(fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)

        @jax.jit
        def loop(*a):
            def body(i, acc):
                x0 = a[0]
                x0 = (x0 + i.astype(x0.dtype)) if x0.dtype == jnp.int8 \
                    else x0 + jnp.bfloat16(i % 3) * jnp.bfloat16(1e-3)
                y = fn(x0, *a[1:])
                return acc + y.astype(jnp.float32).mean()

            return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

        _ = float(loop(*args))
        t0 = time.perf_counter()
        _ = float(loop(*args))
        dt = time.perf_counter() - t0
        return flops * iters / dt / 1e12

    rec = {"M": M, "K": K, "N": N}

    def xla_int8(x, w, os_):
        acc = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * os_).astype(jnp.bfloat16)

    def xla_bf16(x, w):
        return jnp.dot(x, w, preferred_element_type=jnp.float32) \
            .astype(jnp.bfloat16)

    rec["xla_bf16"] = round(timed(xla_bf16, x16, w16), 2)
    rec["xla_int8"] = round(timed(xla_int8, xq, wq, oscale), 2)

    # pallas variants: block sizes (bm, bn, bk)
    # M=9472=74*128 -> bm in {128, 256}; bn/bk must divide N/K
    for bm, bn, bk in ((256, 256, 512), (128, 512, 512), (256, 512, 512),
                       (256, 512, 1536), (256, 256, 1536)):
        if M % bm or N % bn or K % bk:
            continue
        name = f"pallas_{bm}x{bn}x{bk}"
        try:
            mm = make_pallas_matmul(bm, bn, bk)
            got = mm(xq, wq, oscale)
            want = xla_int8(xq, wq, oscale)
            np.testing.assert_allclose(
                np.asarray(got, np.float32), np.asarray(want, np.float32),
                rtol=2e-2, atol=2e-2)
            rec[name] = round(timed(mm, xq, wq, oscale), 2)
        except Exception as e:
            rec[name] = f"err: {repr(e)[:120]}"
    print(json.dumps(rec), flush=True)
    return rec


def main():
    import jax

    for i in range(10):
        try:
            print(f"# device: {jax.devices()[0].device_kind}", flush=True)
            break
        except RuntimeError as e:
            print(f"# retry {i}: {e}", flush=True)
            try:
                from jax.extend.backend import clear_backends

                clear_backends()
            except Exception:
                pass
            time.sleep(60)

    results = [
        bench(9472, 1536, 1536),
        bench(9472, 1536, 6144),
        bench(9472, 6144, 1536),
    ]
    with open("/tmp/int8_pallas_probe.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
