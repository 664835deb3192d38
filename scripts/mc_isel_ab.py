"""On-chip A/B: in-kernel-selection fused attention vs chunked-skew + bias
kernel at the MC L=512 shape (VERDICT r4 next #3).

Runs the exact bench.bench_mc leg twice: FROZENBILM_FUSED_ISEL=0 (round-4
path: C=8 chunked skew -> (B,H,L,L) biases in HBM -> bias-consuming fused
kernel) vs default (strided-lane-rotation selection INSIDE the kernel, no
bias materialization). Writes /tmp/mc_isel_ab.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/tmp/mc_isel_ab.json"


def main():
    import jax

    small = os.environ.get("FROZENBILM_PROBE_SMALL", "") == "1"
    if small:
        from frozenbilm_tpu.utils.platform import force_cpu

        force_cpu(1)

    import bench

    peak = bench.peak_bf16_flops(jax.devices()[0].device_kind)
    out = {"device_kind": jax.devices()[0].device_kind, "small": small}
    for name, env in (("isel_off", "0"), ("isel_on", "")):
        os.environ["FROZENBILM_FUSED_ISEL"] = env
        try:
            mc = bench.bench_mc(small)
            mc["mfu"] = round(mc["tflops"] * 1e12 / peak, 4)
            out[name] = {k: round(v, 4) for k, v in mc.items()}
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": repr(e)[:300]}
        print(f"# {name}: {out[name]}", flush=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(f"# wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
