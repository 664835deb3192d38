"""Attribute the MC L=512 forward's device time to named HLO ops.

mc_profile_r4.json showed L=512 at ~27 TF/s (14% useful MFU) with the time
inside `while.3` split across anonymous fusions. This script compiles the
same forward, captures one traced execution, and for every top self-time op
extracts its HLO definition (op kind, shapes, and the fused computation's
body ops) from the SAME compiled module, so the fusion numbers match.

Run on chip: python scripts/mc_hlo_attrib.py  -> /tmp/mc_hlo_attrib.json
"""

import glob
import gzip
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from frozenbilm_tpu.config import DebertaV2Config, VideoTextConfig
    from frozenbilm_tpu.models.deberta import deberta_forward, init_deberta_params

    small = os.environ.get("FROZENBILM_PROBE_SMALL", "") == "1"
    if small:
        from frozenbilm_tpu.utils.platform import force_cpu

        force_cpu(1)
        cfg = DebertaV2Config(
            vocab_size=256, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=128,
            max_position_embeddings=64, position_buckets=16)
        rows, T, F, feat_dim = 4, 20, 4, 32
    else:
        cfg = DebertaV2Config()
        rows, T, F, feat_dim = 80, 502, 10, 768

    vt = VideoTextConfig(features_dim=feat_dim, max_feats=F,
                         ds_factor_attn=8, ds_factor_ff=8, n_ans=0)
    params = jax.jit(lambda k: init_deberta_params(k, cfg, vt))(
        jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(5, cfg.vocab_size, size=(rows, T)))
    am = jnp.ones((rows, T), jnp.int32)
    video = jnp.asarray(rng.normal(size=(rows, F, feat_dim)), jnp.bfloat16)
    vm = jnp.ones((rows, F), jnp.int32)

    def fwd(params, ids, am, video, vm):
        out = deberta_forward(params, cfg, vt, ids, am, video, vm, mlm=False)
        return out.last_hidden_state.astype(jnp.float32).mean()

    jitted = jax.jit(fwd)
    lowered = jitted.lower(params, ids, am, video, vm)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    print(f"# optimized HLO: {len(hlo) / 1e6:.1f} MB", flush=True)

    # index HLO instruction definitions and fused computations
    # instruction lines look like:  %fusion.690 = bf16[...]{...} fusion(...)
    inst_def = {}
    for m in re.finditer(
            r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*([^\n]*)$", hlo, re.M):
        inst_def.setdefault(m.group(1), m.group(2))
    # computation bodies keyed by name: %fused_computation.N (...) { ... }
    comp_body = {}
    for m in re.finditer(r"^%?([\w.\-]+)\s(?:\([^)]*\))?[^\n{]*\{", hlo, re.M):
        name = m.group(1)
        start = m.end()
        depth = 1
        i = start
        while depth and i < len(hlo):
            c = hlo[i]
            depth += c == "{"
            depth -= c == "}"
            i += 1
        comp_body[name] = hlo[start:i]

    def classify(body):
        """Histogram of interesting op kinds with shapes inside a fusion."""
        out = []
        for bm in re.finditer(
                r"=\s*((?:[a-z0-9]+)\[[^\]]*\])[^ ]*\s+([a-z\-]+)\(", body):
            shape, op = bm.group(1), bm.group(2)
            if op in ("dot", "convolution", "transpose", "copy", "exponential",
                      "reduce", "divide", "concatenate", "dynamic-slice",
                      "dynamic-update-slice", "reshape", "broadcast", "gather",
                      "convert", "add", "multiply"):
                out.append(f"{op} {shape}")
        # compress: count duplicates; surface the expensive op kinds first
        from collections import Counter

        rank = {"dot": 0, "convolution": 0, "copy": 1, "transpose": 1,
                "concatenate": 1, "gather": 1, "dynamic-update-slice": 2,
                "dynamic-slice": 2, "reduce": 3, "exponential": 3}
        c = Counter(out)
        keys = sorted(c, key=lambda k: (rank.get(k.split()[0], 9), -c[k]))
        return [f"{c[k]}x {k}" if c[k] > 1 else k for k in keys[:14]]

    # warm + trace one execution
    _ = float(jitted(params, ids, am, video, vm))
    tdir = "/tmp/mc_attrib_trace"
    jax.profiler.start_trace(tdir)
    t0 = time.perf_counter()
    _ = float(jitted(params, ids, am, video, vm))
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()

    tot = {}
    for f in glob.glob(tdir + "/**/*.trace.json.gz", recursive=True):
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "X" and "dur" in ev:
                tot.setdefault(ev.get("name", ""), 0.0)
                tot[ev["name"]] += ev["dur"] / 1e6

    top = sorted(tot.items(), key=lambda kv: -kv[1])[:45]
    out = {"device_kind": jax.devices()[0].device_kind, "small": small,
           "shape": {"rows": rows, "T": T}, "wall_s": round(dt, 3),
           "ops": []}
    for name, sec in top:
        base = name.split("(")[0].strip()
        if base.startswith(("$", "np.", "jit_", "while", "profiler")):
            if base.startswith("while"):
                out["ops"].append({"name": base, "sec": round(sec, 3)})
            continue
        d = inst_def.get(base) or inst_def.get(base.replace("%", ""))
        rec = {"name": base, "sec": round(sec, 3)}
        if d:
            rec["def"] = d[:220]
            cm = re.search(r"calls=%?([\w.\-]+)", d)
            if cm and cm.group(1) in comp_body:
                rec["body"] = classify(comp_body[cm.group(1)])
        out["ops"].append(rec)
    with open("/tmp/mc_hlo_attrib.json", "w") as f:
        json.dump(out, f, indent=1)
    for rec in out["ops"][:20]:
        print(f"{rec['sec']:8.3f}s  {rec['name']:<40} "
              f"{(rec.get('body') or [rec.get('def', '')[:80]])[:3]}",
              flush=True)
    print("# wrote /tmp/mc_hlo_attrib.json", flush=True)


if __name__ == "__main__":
    main()
