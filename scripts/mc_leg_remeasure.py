"""Re-measure the bench MC leg after the fused-kernel C=8 chunk retune.

The round-4 final bench record (bench_r4_stdout.json: 8.26 q/s, 17.3% MFU)
predates both the fused dattn kernel and the C=8 default. This runs the
exact bench.bench_mc leg and records the post-fusion number.

Run on chip: python scripts/mc_leg_remeasure.py -> /tmp/mc_leg_remeasure.json
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/tmp/mc_leg_remeasure.json"


def main():
    import jax

    small = os.environ.get("FROZENBILM_PROBE_SMALL", "") == "1"
    if small:
        from frozenbilm_tpu.utils.platform import force_cpu

        force_cpu(1)

    import bench

    peak = bench.peak_bf16_flops(jax.devices()[0].device_kind)
    mc = bench.bench_mc(small)
    mc["mfu"] = round(mc["tflops"] * 1e12 / peak, 4)
    out = {"device_kind": jax.devices()[0].device_kind, "small": small,
           "mc": {k: round(v, 4) for k, v in mc.items()},
           "prior": {"questions_per_sec": 8.26, "mfu": 0.1734,
                     "source": "bench_r4_stdout.json (pre-fusion, C=24)"}}
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
