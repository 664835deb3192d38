"""Xprof account of the W8A8 int8 DeBERTa eval program (VERDICT r2 next #1):
where does the time go, and why does int8 not deliver the nominal 2x?

Traces ONE full-scale (0.9B, B=128, T=64) eval forward for bf16, int8
(dynamic per-row act scales), and int8_static (calibrated scalar scales),
sums device self-time by op, and buckets ops into classes:
  - matmul-class fusions (contain 'dot'/'convolution')
  - quant/elementwise fusions (everything else fusion-ish)
Writes /tmp/int8_xprof_r3.json. Companion evidence:
docs/measurements/int8_micro_r3.json (shape-level ceilings) and
int8_pallas_probe_r3.json (hand-written kernels also below XLA's raw int8).

Run on the real chip: bash scripts/tpu_run.sh scripts/int8_xprof.py
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _trace_one(tag, fwd, *args):
    import jax

    out = {}
    # warm/compile outside the trace
    float(fwd(*args))
    tdir = tempfile.mkdtemp(prefix=f"int8prof_{tag}_")
    jax.profiler.start_trace(tdir)
    float(fwd(*args))
    jax.profiler.stop_trace()

    from frozenbilm_tpu.utils.profiling import device_op_times, matmul_class_split

    tot = device_op_times(tdir)
    top = sorted(tot.items(), key=lambda kv: -kv[1])[:40]
    out["top_ops"] = [[n[:120], round(s * 1e3, 3)] for n, s in top]  # ms
    classes = matmul_class_split(tot)
    out["class_ms"] = {k: round(v * 1e3, 3) for k, v in classes.items()}
    print(f"# {tag}: {out['class_ms']}", flush=True)
    for n, s in top[:12]:
        print(f"  {s * 1e3:9.3f}ms  {n[:100]}", flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from frozenbilm_tpu.config import DebertaV2Config, VideoTextConfig
    from frozenbilm_tpu.models.deberta import (
        deberta_answer_logits,
        deberta_forward,
        init_deberta_params,
        set_answer_embeddings,
    )
    from frozenbilm_tpu.ops.quant import quantize_tree

    cfg = DebertaV2Config()  # 0.9B xlarge
    B, T, F, n_ans, feat_dim = 128, 64, 10, 4000, 768
    vt = VideoTextConfig(features_dim=feat_dim, max_feats=F,
                         ds_factor_attn=8, ds_factor_ff=8, n_ans=0)
    params = jax.jit(lambda k: init_deberta_params(k, cfg, vt))(
        jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    a2tok = rng.integers(5, cfg.vocab_size, size=(n_ans, 5))
    a2tok[:, 3:] = 0
    params = set_answer_embeddings(params, a2tok, pad_token_id=cfg.pad_token_id)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    ids = jnp.asarray(rng.integers(5, cfg.vocab_size, size=(B, T)))
    am = jnp.ones((B, T), jnp.int32)
    video = jnp.asarray(rng.normal(size=(B, F, feat_dim)), jnp.bfloat16)
    vm = jnp.ones((B, F), jnp.int32)

    @jax.jit
    def fwd(p, ids, am, video, vm):
        out = deberta_forward(p, cfg, vt, ids, am, video, vm, mlm=False)
        h = out.last_hidden_state[:, F + 7]
        return deberta_answer_logits(p, cfg, h).astype(jnp.float32).mean()

    qparams = jax.jit(quantize_tree)(params)
    sparams = bench._with_static_scales(qparams)

    results = {
        "device_kind": jax.devices()[0].device_kind,
        "shape": {"B": B, "T": T, "F": F},
        "bf16": _trace_one("bf16", fwd, params, ids, am, video, vm),
        "int8_dyn": _trace_one("int8_dyn", fwd, qparams, ids, am, video, vm),
        "int8_static": _trace_one("int8_static", fwd, sparams, ids, am,
                                  video, vm),
    }
    with open("/tmp/int8_xprof_r3.json", "w") as f:
        json.dump(results, f, indent=1)
    print("# wrote /tmp/int8_xprof_r3.json", flush=True)


if __name__ == "__main__":
    main()
