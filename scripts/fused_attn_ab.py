"""Fused disentangled-attention kernel A/B at the MC long-L shapes (round 4).

docs/measurements/mc_hlo_attrib_r4.json puts ~0.5s of the 2.44s L=512
forward in the score pipeline's HBM streams (scores/probs round trips, bias
adds, the p2c layout copy). ops/attention.fused_disentangled_attention keeps
the whole (L,L) tile of one (batch, head-block) in VMEM; this script times
the full 0.9B forward with the kernel off/on (head-block sweep) and checks
on-chip numerics vs the XLA path.

Run on chip: python scripts/fused_attn_ab.py -> /tmp/fused_attn_ab.json
Shapes via FROZENBILM_FUSED_SWEEP="512:80,256:160" (L:rows).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/tmp/fused_attn_ab.json"


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
        feat_dim, F = 32, 4
        sweep = [(20, 4)]
        hblks = ["1", "2"]
    else:
        cfg = DebertaV2Config()
        feat_dim, F = 768, 10
        sweep = [
            tuple(int(v) for v in part.split(":"))
            for part in os.environ.get(
                "FROZENBILM_FUSED_SWEEP", "512:80,256:160").split(",")
        ]
        hblks = os.environ.get("FROZENBILM_FUSED_HBLKS", "1,2,4").split(",")

    vt = VideoTextConfig(features_dim=feat_dim, max_feats=F,
                         ds_factor_attn=8, ds_factor_ff=8, n_ans=0)
    params = jax.jit(lambda k: init_deberta_params(k, cfg, vt))(
        jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)

    out = {"device_kind": jax.devices()[0].device_kind, "small": small,
           "legs": {}}
    os.environ["FROZENBILM_REL_SELECT"] = "skew"

    for L, rows in sweep:
        T = L - F  # video prefix takes F tokens
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(5, cfg.vocab_size, size=(rows, T)))
        am = jnp.ones((rows, T), jnp.int32)
        video = jnp.asarray(rng.normal(size=(rows, F, feat_dim)), jnp.bfloat16)
        vm = jnp.ones((rows, F), jnp.int32)
        leg = {}
        out["legs"][f"L{L}"] = leg
        base_out = None

        def run_variant(name, env):
            nonlocal base_out
            for k, v in env.items():
                os.environ[k] = v
            # FRESH jit closure per setting: env is read at trace time
            fwd = jax.jit(lambda p, i, a, v, m: deberta_forward(
                p, cfg, vt, i, a, v, m, mlm=False).last_hidden_state)
            try:
                r = fwd(params, ids, am, video, vm)
                val = float(r.astype(jnp.float32).mean())  # sync + warm
                assert np.isfinite(val), val
                t0 = time.perf_counter()
                val = float(fwd(params, ids, am, video, vm)
                            .astype(jnp.float32).mean())
                dt = time.perf_counter() - t0
                leg[name] = {"sec": round(dt, 3),
                             "rows_per_sec": round(rows / dt, 2)}
                if name == "xla":
                    base_out = np.asarray(r.astype(jnp.float32))
                elif base_out is not None and "maxdiff_vs_xla" not in leg:
                    d = np.max(np.abs(np.asarray(r.astype(jnp.float32))
                                      - base_out))
                    scale = max(1e-9, float(np.max(np.abs(base_out))))
                    leg["maxdiff_vs_xla"] = {"abs": float(d),
                                             "rel": float(d / scale)}
            except Exception as e:  # noqa: BLE001 — record Mosaic rejections
                leg[name] = {"error": repr(e)[:400]}
            print(f"# L={L} {name}: {leg[name]}", flush=True)
            with open(OUT, "w") as f:
                json.dump(out, f, indent=1)

        run_variant("xla", {"FROZENBILM_FUSED_ATTN": "0"})
        for hb in hblks:
            run_variant(f"fused_hblk{hb}", {
                "FROZENBILM_FUSED_ATTN": "1",
                "FROZENBILM_FUSED_ATTN_HBLK": hb,
            })

    for k in ("FROZENBILM_REL_SELECT", "FROZENBILM_FUSED_ATTN",
              "FROZENBILM_FUSED_ATTN_HBLK"):
        os.environ.pop(k, None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
