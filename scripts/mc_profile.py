"""Profile the MC-shape (L=512) DeBERTa forward on-chip: where do 14s go?

Sweeps L to find the cliff, then xprof-traces the L=512 case and prints the
top ops by self time. Writes /tmp/mc_profile.json.
"""
import glob
import gzip
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from frozenbilm_tpu.config import DebertaV2Config, VideoTextConfig
from frozenbilm_tpu.models.deberta import deberta_forward, init_deberta_params


def run_once(cfg, vt, rows, T, F, feat_dim, n_layers=None):
    params = jax.jit(lambda k: init_deberta_params(k, cfg, vt))(jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(5, cfg.vocab_size, size=(rows, T)))
    am = jnp.ones((rows, T), jnp.int32)
    video = jnp.asarray(rng.normal(size=(rows, F, feat_dim)), jnp.bfloat16)
    vm = jnp.ones((rows, F), jnp.int32)

    @jax.jit
    def fwd(params, ids, am, video, vm):
        out = deberta_forward(params, cfg, vt, ids, am, video, vm, mlm=False)
        return out.last_hidden_state.astype(jnp.float32).mean()

    v = float(fwd(params, ids, am, video, vm))  # compile+warmup
    t0 = time.perf_counter()
    v = float(fwd(params, ids, am, video, vm))
    dt = time.perf_counter() - t0
    return dt, (params, ids, am, video, vm, fwd)


def main():
    cfg = DebertaV2Config()
    feat_dim, F = 768, 10
    vt = VideoTextConfig(features_dim=feat_dim, max_feats=F,
                         ds_factor_attn=8, ds_factor_ff=8, n_ans=0)
    out = {"device_kind": jax.devices()[0].device_kind}
    # fixed token budget ~40960 tokens: rows x (T + F) const
    for T, rows in ((54, 640), (118, 320), (246, 160), (502, 80)):
        S = T + F
        dt, _ = run_once(cfg, vt, rows, T, F, feat_dim)
        h, inter = cfg.hidden_size, cfg.intermediate_size
        per_tok = 8 * h * h + 4 * h * inter + h * h + 4 * S * h
        fl = rows * S * (cfg.num_hidden_layers + 2) * per_tok
        out[f"L{S}_rows{rows}"] = {
            "sec": round(dt, 3), "tflops_per_sec": round(fl / dt / 1e12, 1)}
        print(out[f"L{S}_rows{rows}"], flush=True)

    # trace the L=512 case
    dt, (params, ids, am, video, vm, fwd) = run_once(cfg, vt, 80, 502, F, feat_dim)
    tdir = "/tmp/mc_trace"
    jax.profiler.start_trace(tdir)
    float(fwd(params, ids, am, video, vm))
    jax.profiler.stop_trace()

    # parse: sum self-time by op name from the trace events
    files = glob.glob(tdir + "/**/*.trace.json.gz", recursive=True)
    tot = {}
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "X" and "dur" in ev:
                name = ev.get("name", "")
                tot.setdefault(name, 0.0)
                tot[name] += ev["dur"] / 1e6
    top = sorted(tot.items(), key=lambda kv: -kv[1])[:40]
    out["top_ops"] = [[n[:120], round(s, 3)] for n, s in top]
    for n, s in top[:25]:
        print(f"{s:9.3f}s  {n[:110]}", flush=True)
    with open("/tmp/mc_profile.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
