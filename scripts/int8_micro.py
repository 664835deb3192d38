"""Int8 matmul microbenchmarks at FrozenBiLM shapes — the evidence base for
the W8A8 redesign (VERDICT r2 weak #1: int8 delivers 1.15x of a 2x peak).

Questions answered on the real chip:
  1. raw-dot: does XLA's s8xs8->s32 dot actually run ~2x bf16 at our shapes?
  2. w8a8-dyn: cost of the CURRENT per-row dynamic path (amax+quant+rescale)
  3. w8a8-static: same matmul with a precomputed scalar act scale and the
     activation->int8 cast fused (no amax pass, rescale folded into one
     per-column vector) — the proposed replacement
  4. w8a8-ln-fused: static quant where the input arrives as bf16 but the
     quantize is the only extra elementwise op (models would fuse it into
     the producing LayerNorm)

Run: python scripts/int8_micro.py   (real chip; ~2 min)
Prints one JSON line per (shape, variant) with tflops and x_vs_bf16.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_one(M, K, N, iters=32):
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(K, N)), jnp.bfloat16)
    wq = jnp.asarray(rng.integers(-127, 128, size=(K, N)), jnp.int8)
    wscale = jnp.asarray(rng.uniform(0.01, 0.02, size=(N,)), jnp.float32)
    xq = jnp.asarray(rng.integers(-127, 128, size=(M, K)), jnp.int8)
    act_scale = jnp.float32(0.05)

    def mk_loop(body):
        @jax.jit
        def loop(*args):
            def f(i, acc):
                return acc + body(i, *args)

            return jax.lax.fori_loop(0, iters, f, jnp.zeros((), jnp.float32))

        return loop

    flops = 2 * M * K * N

    def timed(loop, *args):
        _ = float(loop(*args))
        t0 = time.perf_counter()
        _ = float(loop(*args))
        dt = time.perf_counter() - t0
        return flops * iters / dt / 1e12

    out = {}

    # bf16 baseline: x@w -> f32 acc, cast back (the models' linear())
    def bf16_body(i, x, w):
        xi = x + jnp.bfloat16(i % 3) * jnp.bfloat16(1e-3)
        y = jnp.dot(xi, w, preferred_element_type=jnp.float32)
        return y.astype(jnp.bfloat16).mean().astype(jnp.float32)

    out["bf16"] = timed(mk_loop(bf16_body), x, w)

    # raw int8 dot: both operands already int8 (peak-rate probe)
    def raw_body(i, xq, wq):
        xi = (xq + (i % 3).astype(jnp.int8))
        y = jax.lax.dot_general(xi, wq, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return y.astype(jnp.float32).mean()

    out["int8_raw"] = timed(mk_loop(raw_body), xq, wq)

    # current dynamic per-row path (ops/quant.linear_w8a8 inline)
    def dyn_body(i, x, wq, wscale):
        xi = x + jnp.bfloat16(i % 3) * jnp.bfloat16(1e-3)
        xf = xi.astype(jnp.float32)
        xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8) / 127.0
        xq_ = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(xq_, wq, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        y = (acc.astype(jnp.float32) * xs * wscale).astype(jnp.bfloat16)
        return y.mean().astype(jnp.float32)

    out["w8a8_dyn"] = timed(mk_loop(dyn_body), x, wq, wscale)

    # proposed static path: scalar act scale known ahead; rescale is one
    # per-column vector (act_scale * wscale precombined)
    oscale = act_scale * wscale

    def static_body(i, x, wq, oscale):
        xi = x + jnp.bfloat16(i % 3) * jnp.bfloat16(1e-3)
        xq_ = jnp.clip(jnp.round(xi.astype(jnp.float32) * (1.0 / 0.05)),
                       -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(xq_, wq, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * oscale).astype(jnp.bfloat16) \
            .mean().astype(jnp.float32)

    out["w8a8_static"] = timed(mk_loop(static_body), x, wq, oscale)

    # int8 weights, bf16 activation matmul (weight-only quant, W8A16):
    # halves weight HBM traffic; MXU runs mixed at bf16 rate
    def w8a16_body(i, x, wq, wscale):
        xi = x + jnp.bfloat16(i % 3) * jnp.bfloat16(1e-3)
        wde = (wq.astype(jnp.bfloat16) * wscale.astype(jnp.bfloat16))
        y = jnp.dot(xi, wde, preferred_element_type=jnp.float32)
        return y.astype(jnp.bfloat16).mean().astype(jnp.float32)

    out["w8a16_dequant"] = timed(mk_loop(w8a16_body), x, wq, wscale)

    rec = {"M": M, "K": K, "N": N,
           **{k: round(v, 2) for k, v in out.items()},
           **{f"x_{k}": round(out[k] / out["bf16"], 3)
              for k in out if k != "bf16"}}
    print(json.dumps(rec), flush=True)
    return rec


def main():
    import jax

    for i in range(10):
        try:
            print(f"# device: {jax.devices()[0].device_kind}", flush=True)
            break
        except RuntimeError as e:
            print(f"# device init failed ({e}); retry {i + 1}/10", flush=True)
            try:
                from jax.extend.backend import clear_backends

                clear_backends()
            except Exception:
                pass
            time.sleep(60)

    results = []
    # deberta-xl eval batch: B=128 x S=74 tokens = 9472 rows; h=1536
    results.append(bench_one(9472, 1536, 1536))   # qkv/out proj
    results.append(bench_one(9472, 1536, 6144))   # FF in
    results.append(bench_one(9472, 6144, 1536))   # FF out
    # CLIP ViT-L/14: B=128 x 257 tokens = 32896 rows; h=1024
    results.append(bench_one(32896, 1024, 1024))
    results.append(bench_one(32896, 1024, 4096))
    # decode shape: B=16 single-token rows (bandwidth-bound)
    results.append(bench_one(16, 2048, 2048, iters=64))
    results.append(bench_one(16, 2048, 8192, iters=64))
    out = os.environ.get("FROZENBILM_MICRO_OUT", "/tmp/int8_micro.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
