"""Attribute the 0.9B train step's device time to named HLO ops.

BENCH_r04 train.base runs at 24.4% MFU vs 52.4% for the eval forward of the
same model — train_xprof_r4.json only resolved "two big while loops"
(fwd scan 83 ms + bwd scan 68 ms of a 175 ms step). This script compiles the
EXACT bench_train "base" step (0.9B deberta-v2-xlarge, B=32, T=64, F=10,
production Trainer with AdamW + donated state), traces one execution, and
maps every top self-time op back to its HLO definition in the same compiled
module — fusion bodies classified by op kind so the time lands on names like
"dynamic-update-slice of (24,32,24,74,74) residual stack" instead of
"fusion.2700".

Adds a class rollup (matmul / residual-stack dus / copy-transpose / rng /
softmax-elementwise / other) so the round-5 attack target is one number.

Run on chip: python scripts/train_hlo_attrib.py -> /tmp/train_hlo_attrib.json
"""

import glob
import gzip
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def index_hlo(hlo: str):
    """(instruction defs by name, computation bodies by name)."""
    inst_def = {}
    for m in re.finditer(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*([^\n]*)$", hlo, re.M):
        inst_def.setdefault(m.group(1), m.group(2))
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
    return inst_def, comp_body


def classify_body(body: str):
    """Histogram of interesting op kinds with shapes inside a fusion."""
    from collections import Counter

    out = []
    for bm in re.finditer(
            r"=\s*((?:[a-z0-9]+)\[[^\]]*\])[^ ]*\s+([a-z\-]+)\(", body):
        shape, op = bm.group(1), bm.group(2)
        if op in ("dot", "convolution", "transpose", "copy", "exponential",
                  "reduce", "divide", "concatenate", "dynamic-slice",
                  "dynamic-update-slice", "reshape", "broadcast", "gather",
                  "convert", "add", "multiply", "rng-bit-generator", "select",
                  "compare", "iota"):
            out.append(f"{op} {shape}")
    rank = {"dot": 0, "convolution": 0, "rng-bit-generator": 0,
            "copy": 1, "transpose": 1, "concatenate": 1, "gather": 1,
            "dynamic-update-slice": 2, "dynamic-slice": 2,
            "reduce": 3, "exponential": 3}
    c = Counter(out)
    keys = sorted(c, key=lambda k: (rank.get(k.split()[0], 9), -c[k]))
    return [f"{c[k]}x {k}" if c[k] > 1 else k for k in keys[:14]]


def op_class(rec):
    """Rollup bucket for one attributed op record."""
    d = (rec.get("def") or "") + " ".join(rec.get("body") or [])
    name = rec["name"]
    if "rng-bit-generator" in d or "rng" in name:
        return "rng"
    if "dot(" in d or " dot " in d or re.search(r"\bdot \w+\[", d):
        return "matmul"
    if "convolution" in d:
        return "matmul"
    if "dynamic-update-slice" in d or "dynamic-update-slice" in name:
        return "residual_stack_dus"
    if "dynamic-slice" in d:
        return "dynamic_slice"
    if name.startswith("copy") or "copy " in d or "transpose" in d:
        return "copy_transpose"
    if "exponential" in d or "reduce" in d or "divide" in d:
        return "softmax_reduce_elemwise"
    return "other"


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from frozenbilm_tpu.config import DebertaV2Config, VideoTextConfig
    from frozenbilm_tpu.models.deberta import deberta_forward, init_deberta_params
    from frozenbilm_tpu.train.optim import train_key
    from frozenbilm_tpu.train.partition import apply_param_dtype
    from frozenbilm_tpu.train.trainer import (
        make_mlm_loss_fn,
        make_trainer_and_state,
    )

    small = os.environ.get("FROZENBILM_PROBE_SMALL", "") == "1"
    if small:
        from frozenbilm_tpu.utils.platform import force_cpu

        force_cpu(1)
        cfg = DebertaV2Config(
            vocab_size=256, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=128,
            max_position_embeddings=64, position_buckets=16)
        B, T, F, feat_dim = 4, 16, 4, 32
    else:
        cfg = DebertaV2Config()  # deberta-v2-xlarge, 0.9B
        B, T, F, feat_dim = 32, 64, 10, 768

    vt = VideoTextConfig(features_dim=feat_dim, max_feats=F,
                         ds_factor_attn=8, ds_factor_ff=8, n_ans=0)
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(rng.integers(5, cfg.vocab_size, size=(B, T))),
        "attention_mask": jnp.ones((B, T), jnp.int32),
        "special_tokens_mask": jnp.zeros((B, T), jnp.int32),
        "video": jnp.asarray(rng.normal(size=(B, F, feat_dim)), jnp.bfloat16),
        "video_mask": jnp.ones((B, F), jnp.int32),
    }
    loss_fn = make_mlm_loss_fn(
        deberta_forward, cfg, vt, mask_token_id=4, vocab_size=cfg.vocab_size,
        pad_token_id=cfg.pad_token_id, mlm_probability=0.15,
        remat=os.environ.get("FROZENBILM_ATTRIB_REMAT", "") == "1")
    params = jax.jit(lambda k: init_deberta_params(k, cfg, vt))(
        jax.random.PRNGKey(0))
    params = apply_param_dtype(params, vt, "bfloat16")
    trainer, state, frozen = make_trainer_and_state(
        loss_fn, tx=optax.adamw(1.5e-5), params=params, vt=vt, mesh=None)
    key = train_key(1, os.environ.get("FROZENBILM_ATTRIB_RNG", "threefry"))

    lowered = trainer._train_step.lower(state, frozen, batch, key)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    print(f"# optimized HLO: {len(hlo) / 1e6:.1f} MB", flush=True)
    inst_def, comp_body = index_hlo(hlo)

    # warm (compile reuse) + one timed/traced step. train_step donates the
    # state, so thread it through.
    state, metrics = trainer.train_step(state, frozen, batch, key)
    _ = float(metrics["loss"])
    tdir = "/tmp/train_attrib_trace"
    jax.profiler.start_trace(tdir)
    t0 = time.perf_counter()
    state, metrics = trainer.train_step(state, frozen, batch, key)
    warm = float(metrics["loss"])
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

    top = sorted(tot.items(), key=lambda kv: -kv[1])[:80]
    out = {"device_kind": jax.devices()[0].device_kind, "small": small,
           "shape": {"B": B, "T": T, "F": F}, "wall_s": round(dt, 3),
           "loss": round(warm, 4), "ops": []}
    whiles = []
    for name, sec in top:
        base = name.split("(")[0].strip()
        if base.startswith(("$", "np.", "jit_", "profiler", "0")):
            continue
        if base.startswith("while"):
            whiles.append({"name": base, "sec": round(sec, 3)})
            continue
        d = inst_def.get(base) or inst_def.get(base.replace("%", ""))
        rec = {"name": base, "sec": round(sec, 3)}
        if d:
            rec["def"] = d[:260]
            cm = re.search(r"calls=%?([\w.\-]+)", d)
            if cm and cm.group(1) in comp_body:
                rec["body"] = classify_body(comp_body[cm.group(1)])
        rec["class"] = op_class(rec)
        out["ops"].append(rec)
    out["whiles"] = whiles

    # class rollup over attributed (non-while) ops
    classes = {}
    for rec in out["ops"]:
        classes[rec["class"]] = classes.get(rec["class"], 0.0) + rec["sec"]
    out["class_sec"] = {k: round(v, 3)
                        for k, v in sorted(classes.items(), key=lambda kv: -kv[1])}
    out["attributed_sec"] = round(sum(classes.values()), 3)

    path = "/tmp/train_hlo_attrib.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["class_sec"]), flush=True)
    for rec in out["ops"][:25]:
        print(f"{rec['sec']:8.3f}s  {rec['class']:<22} {rec['name']:<38} "
              f"{(rec.get('body') or [rec.get('def', '')[:90]])[:3]}",
              flush=True)
    print(f"# wrote {path}", flush=True)


if __name__ == "__main__":
    main()
