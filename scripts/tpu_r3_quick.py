"""Round-3 quick chip measurements, batched in ONE process (single axon
claim, per CLAUDE.md): (1) rel-select A/B across deployed lengths,
(2) GPT-J-6B one-chip scoring legs (bf16 / int8 / prefix).

Run: python scripts/tpu_r3_quick.py   (real chip; ~30-45 min)
Writes /tmp/rel_ab_r3.json and /tmp/gptj6b_r3.json.
"""

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))


def main():
    import jax

    # ride out claim lag (see bench.py main)
    for i in range(10):
        try:
            kind = jax.devices()[0].device_kind
            break
        except RuntimeError as e:
            print(f"# device init failed ({e}); retry {i + 1}/10", flush=True)
            try:
                from jax.extend.backend import clear_backends

                clear_backends()
            except Exception:
                pass
            time.sleep(60)
    print(f"# device: {kind}", flush=True)

    import rel_select_ab

    results = []
    b_for = {64: 128, 118: 128, 256: 32, 502: 16}
    for T in (64, 118, 256, 502):
        for mode in ("onehot", "skew", "gather"):
            try:
                results.append(rel_select_ab.run(mode, T=T, B=b_for[T]))
            except Exception as e:
                rec = {"mode": mode, "L": T + 10, "error": repr(e)[:200]}
                print(json.dumps(rec), flush=True)
                results.append(rec)
            gc.collect()
    with open("/tmp/rel_ab_r3.json", "w") as f:
        json.dump(results, f, indent=1)
    print("# rel-select sweep done", flush=True)

    import bench

    res = bench.bench_gptj6b(False)
    with open("/tmp/gptj6b_r3.json", "w") as f:
        json.dump(res, f, indent=1, default=str)
    print(json.dumps(res, default=str), flush=True)
    print("# 6B legs done", flush=True)


if __name__ == "__main__":
    main()
