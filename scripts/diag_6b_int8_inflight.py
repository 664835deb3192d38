"""Diagnose the generate6b_int8_inflight OOM (serve_load r4 rc=1 / r5
RESOURCE_EXHAUSTED during engine warm).

Reproduces the leg's exact stack stage by stage with HBM stats after each:
  1. 6B init->bf16 (fused jit)           [expect ~11.3 GB]
  2. w8a8 quantize (donated)             [expect ~5.8 GB]
  3. InflightEngine(...)  (KV pool etc.) [tiny delta]
  4. engine.warm admissions per bucket   [executables + workspaces]
  5. step_once (decode-program compile)  [where r5 died]

Run on the real chip: python scripts/diag_6b_int8_inflight.py
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))


def hbm(tag):
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats() or {}
    except Exception as e:  # stats can lag on the tunnel
        print(f"[hbm] {tag}: stats unavailable ({e!r})", flush=True)
        return
    used = stats.get("bytes_in_use", 0) / 1e9
    peak = stats.get("peak_bytes_in_use", 0) / 1e9
    lim = stats.get("bytes_limit", 0) / 1e9
    print(f"[hbm] {tag}: in_use={used:.2f} GB peak={peak:.2f} GB "
          f"limit={lim:.2f} GB", flush=True)


def main():
    import serve_load  # scripts/serve_load.py helpers

    root = tempfile.mkdtemp(prefix="diag6b_")
    gen_dir = serve_load._mk_gptj_env(root)
    argv = [
        "--combine_datasets", "none", "--combine_datasets_val", "none",
        "--model_name", "gpt-j-6b", "--tokenizer_path", gen_dir,
        "--max_feats", "10", "--features_dim", "768",
        "--max_tokens", "32", "--batch_size_val", "4",
        "--serve_host", "127.0.0.1", "--port", "0",
        "--param_dtype", "bfloat16", "--serve_max_new_tokens", "16",
        "--serve_window_ms", "10",
        "--quantize", "w8a8", "--serve_inflight", "2",
        "--serve_inflight_chunk", "8", "--serve_admit_batch", "0",
    ]
    from frozenbilm_tpu.tasks.serve import get_serve_parser

    args = get_serve_parser().parse_args(argv)

    import jax

    print(f"devices: {jax.devices()}", flush=True)
    hbm("start")

    from frozenbilm_tpu.models import build_model
    from frozenbilm_tpu.tasks.serve import _finalize_params, _load_serving_params

    bundle = build_model(args)
    params = _load_serving_params(args, bundle)
    jax.block_until_ready(jax.tree.leaves(params)[0])
    hbm("after bf16 init")

    params = _finalize_params(args, bundle, params)
    jax.block_until_ready(jax.tree.leaves(params)[0])
    hbm("after w8a8 quantize (donated)")

    from frozenbilm_tpu.models import family_of
    from frozenbilm_tpu.tasks.engine import InflightEngine

    buckets, b = [], 16
    while b < args.max_tokens:
        buckets.append(b)
        b *= 2
    buckets.append(args.max_tokens)
    # pipeline=False: every admission fetches its first token SYNCHRONOUSLY,
    # so an async RESOURCE_EXHAUSTED inside an admission execution surfaces
    # AT that admission instead of at the next unrelated device sync (the
    # pipelined warm died at the step trace's constant transfer, which only
    # says "something before me failed")
    engine = InflightEngine(
        params, bundle.cfg, bundle.vt, family_of(args.model_name),
        spec_draft=0, slots=2, max_len=10 + 32 + 16, chunk=8,
        prompt_buckets=buckets, eos_token_id=None, pad_token_id=0,
        top_k=0, top_p=0.0, kv_int8=False, rng_seed=0, max_new_cap=16,
        pipeline=False, admit_batch=0, adaptive_chunk=True)
    hbm("after InflightEngine ctor")

    import numpy as np

    try:
        for b in engine.buckets:
            for vid in (None, np.zeros((10, 768), np.float32)):
                tag = f"admit b={b} video={vid is not None}"
                engine.submit(np.full(b, engine.pad, np.int32), video=vid,
                              max_new_tokens=1)
                ok = engine.step_once()  # sync admission (pipeline off)
                print(f"[stage] {tag}: step_once={ok}", flush=True)
        while engine._active.any() or not engine._waiting.empty():
            engine.step_once()
        print("[stage] drained", flush=True)
    except Exception as e:
        import traceback

        traceback.print_exc()
        print(f"FAILED: {type(e).__name__}", flush=True)
        return 1
    engine.step_once()
    print("OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
