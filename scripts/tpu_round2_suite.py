"""One-process round-2 TPU measurement suite (one chip claim, no gaps):

1. rel-select A/B: onehot vs skew vs Pallas-kernel at bench shapes
2. input-pipeline bench (200 steps, B=128, 200k-sample synthetic corpus)
3. bench.py main: all tracked metrics + MFU + decode tokens/sec, incl. the
   prefix-cached AR scoring legs (1.3B + env-gated 6B) and int8 variants

Prints each result as its own JSON line, prefixed for easy grepping.
"""

import json
import sys


def main():
    import jax

    jax.devices()  # fail fast (claim not yet released) before any sub-bench

    import scripts.rel_select_ab as ab

    for mode in ("onehot", "skew", "kernel"):
        try:
            ab.run(mode)
        except Exception as e:  # keep going — a mode-specific failure is data
            print(json.dumps({"mode": mode, "error": repr(e)[:500]}), flush=True)

    from scripts.pipeline_bench import main as pipe_main

    try:
        pipe_main(["--steps", "200", "--batch_size", "128"])
    except Exception as e:
        print(json.dumps({"metric": "pretrain_input_pipeline",
                          "error": repr(e)[:500]}), flush=True)

    import os

    os.environ.setdefault("FROZENBILM_BENCH_6B", "1")  # 6B-on-one-chip leg
    import bench

    bench.main()


if __name__ == "__main__":
    sys.exit(main())
