"""On-chip sweep of the isel kernel's block knobs at the MC L=512 shape.

Variants: (hblk, BI) over the bench mc leg. hblk>1 amortizes the k/v/table
fetches across heads per grid step; BI=256 halves the p2c window count but
doubles the in-flight A2 tile. Writes /tmp/mc_isel_sweep.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/tmp/mc_isel_sweep.json"


def main():
    import jax

    small = os.environ.get("FROZENBILM_PROBE_SMALL", "") == "1"
    if small:
        from frozenbilm_tpu.utils.platform import force_cpu

        force_cpu(1)

    import bench

    peak = bench.peak_bf16_flops(jax.devices()[0].device_kind)
    out = {"device_kind": jax.devices()[0].device_kind, "small": small}
    spec = os.environ.get("FROZENBILM_ISEL_SWEEP",
                          "1x128,2x128,4x128,1x256,2x256")
    variants = [tuple(int(v) for v in s.split("x")) for s in spec.split(",")]
    for hblk, bi in variants:
        os.environ["FROZENBILM_ISEL_HBLK"] = str(hblk)
        os.environ["FROZENBILM_ISEL_BI"] = str(bi)
        name = f"h{hblk}_bi{bi}"
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
