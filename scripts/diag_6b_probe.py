"""Measure actual free HBM around 6B w8a8 quantization on the axon tunnel
(memory_stats() returns zeros there, so probe by allocation instead).

Answers ONE question for the generate6b_int8_inflight OOM: does the bf16
source tree actually get freed by apply_quantization's donation on this
backend, or do 11.3 GB bf16 + 5.7 GB int8 coexist through engine warm?

Run on the real chip: python scripts/diag_6b_probe.py
"""

import gc
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))


def probe_free_gb(tag, step_gb: float = 0.5, cap_gb: float = 20.0):
    """Free HBM by cumulative allocation: append step_gb iota chunks (iota
    defeats any zero-page/constant dedup — jnp.zeros 'succeeded' at 12 GB
    next to an 11.3 GB tree here, so lazy zero pages exist) until the
    first failure, forcing a readback of each chunk's tail so the buffer
    must be real. Prints the terminating exception: a compile/tunnel fault
    must not masquerade as 0 GB free."""
    import jax
    import jax.numpy as jnp

    n = int(step_gb * 1e9 / 4)  # int32 iota chunks
    iota = jax.jit(lambda: jax.lax.iota(jnp.int32, n))
    held, free, stop = [], 0.0, "cap reached"
    while free < cap_gb:
        try:
            x = iota()
            if int(x[-1]) != n - 1:  # force real materialization
                raise RuntimeError("iota readback mismatch")
        except Exception as e:
            stop = repr(e)[:200]
            break
        held.append(x)
        free += step_gb
    del held
    gc.collect()
    print(f"[probe] {tag}: cumulative alloc before OOM ~{free:.1f} GB "
          f"(stop: {stop})", flush=True)
    return free


def main():
    # ONE probe per process: the first RESOURCE_EXHAUSTED this backend
    # throws poisons every later dispatch (measured: after an OOM'd probe
    # even PRNGKey(0) dies), so each stage needs a fresh process.
    stage = sys.argv[1] if len(sys.argv) > 1 else "quant"
    assert stage in ("empty", "init", "initdel", "quant", "warm", "steponly")

    import serve_load

    root = tempfile.mkdtemp(prefix="diag6bp_")
    gen_dir = serve_load._mk_gptj_env(root)
    argv = [
        "--combine_datasets", "none", "--combine_datasets_val", "none",
        "--model_name", "gpt-j-6b", "--tokenizer_path", gen_dir,
        "--max_feats", "10", "--features_dim", "768",
        "--max_tokens", "32", "--batch_size_val", "4",
        "--param_dtype", "bfloat16", "--serve_max_new_tokens", "16",
        "--quantize", "w8a8", "--serve_inflight", "2",
        "--serve_inflight_chunk", "8", "--serve_admit_batch", "0",
    ]
    from frozenbilm_tpu.tasks.serve import (
        _finalize_params,
        _load_serving_params,
        get_serve_parser,
    )

    args = get_serve_parser().parse_args(argv)

    import jax

    print(f"devices: {jax.devices()}", flush=True)
    if stage == "empty":
        probe_free_gb("empty device")
        return 0

    from frozenbilm_tpu.models import build_model

    bundle = build_model(args)
    params = _load_serving_params(args, bundle)
    # HONEST sync: block_until_ready lies on this backend (CLAUDE.md) — a
    # D2H fetch is the only proof the program actually ran to completion
    import numpy as np

    tail_sum = sum(
        float(np.asarray(l[..., -1]).ravel()[-1])
        for l in jax.tree.leaves(params) if hasattr(l, "ndim") and l.ndim)
    print(f"[sync] init leaf-tail checksum {tail_sum:.3f}", flush=True)
    if stage == "init":
        probe_free_gb("after bf16 init (~11.3 GB tree)")
        return 0
    if stage == "initdel":
        del params
        gc.collect()
        probe_free_gb("after bf16 init then del+gc (tree freed?)")
        return 0

    qparams = _finalize_params(args, bundle, params)
    del params
    gc.collect()
    try:
        qsum = sum(
            float(np.asarray(l[..., -1]).ravel()[-1])
            for l in jax.tree.leaves(qparams) if hasattr(l, "ndim") and l.ndim)
        print(f"[sync] quantized leaf-tail checksum {qsum:.3f}", flush=True)
    except Exception as e:
        print(f"[sync] QUANTIZE ITSELF FAILED (async): {e!r}"[:300],
              flush=True)
        return 1
    if stage == "quant":
        probe_free_gb("after w8a8 quantize (lowmem, donated), bf16 ref dropped")
        return 0

    from frozenbilm_tpu.models import family_of
    from frozenbilm_tpu.tasks.engine import InflightEngine

    engine = InflightEngine(
        qparams, bundle.cfg, bundle.vt, family_of(args.model_name),
        spec_draft=0, slots=2, max_len=10 + 32 + 16, chunk=8,
        prompt_buckets=[16, 32], eos_token_id=None, pad_token_id=0,
        top_k=0, top_p=0.0, kv_int8=False, rng_seed=0, max_new_cap=16,
        pipeline=True, admit_batch=0, adaptive_chunk=True)
    import numpy as np

    if stage == "steponly":
        # trace + run the decode step program with NO admissions: if this
        # alone dies, the int8 6B step program itself is the problem; if
        # it passes, the admission executables' footprint is
        import jax.numpy as jnp2

        active = jnp2.asarray(np.array([True, False]))
        try:
            state2, toks = engine._step_fn(engine.params, engine.state,
                                           active, engine._rng, np.int32(0))
            print(f"[steponly] step program traced+ran: toks {np.asarray(toks).shape}",
                  flush=True)
            engine.state = state2
            probe_free_gb("after step-only (no admissions)")
        except Exception as e:
            print(f"[steponly] STEP PROGRAM FAILED: {e!r}"[:300], flush=True)
            return 1
        return 0

    # admissions only (what warm does before drain): all buckets x video
    for b in engine.buckets:
        ids = np.full(b, engine.pad, np.int32)
        engine.submit(ids, max_new_tokens=1)
        engine.submit(ids, video=np.zeros((10, 768), np.float32),
                      max_new_tokens=1)
    engine._admit_waiting()
    jax.block_until_ready(engine.state["cur"])
    probe_free_gb("after admissions (pre-step)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
