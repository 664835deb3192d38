"""Re-tune the skew chunk size WITH the fused dattn kernel enabled (round 4).

The C=24 optimum in docs/measurements/mc_chunk_ab_r4.json was measured
against the XLA score pipeline. The fused kernel removed the pipeline's HBM
streams (fused_attn_ab_r4.json), so the selection relayouts are now a larger
relative share and the best window may shift. Sweep FROZENBILM_SKEW_CHUNK at
the MC shape with FROZENBILM_FUSED_ATTN=1, hblk=4.

Run on chip: python scripts/fused_chunk_resweep.py -> /tmp/fused_chunk_resweep.json
Override: FROZENBILM_RESWEEP="512:80" FROZENBILM_RESWEEP_CHUNKS="16,24,32,48"
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/tmp/fused_chunk_resweep.json"


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
        chunks = ["4", "8"]
    else:
        cfg = DebertaV2Config()
        feat_dim, F = 768, 10
        sweep = [
            tuple(int(v) for v in part.split(":"))
            for part in os.environ.get("FROZENBILM_RESWEEP", "512:80").split(",")
        ]
        chunks = os.environ.get(
            "FROZENBILM_RESWEEP_CHUNKS", "16,24,32,48,64").split(",")

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
    os.environ["FROZENBILM_FUSED_ATTN"] = "1"

    for L, rows in sweep:
        T = L - F
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(5, cfg.vocab_size, size=(rows, T)))
        am = jnp.ones((rows, T), jnp.int32)
        video = jnp.asarray(rng.normal(size=(rows, F, feat_dim)), jnp.bfloat16)
        vm = jnp.ones((rows, F), jnp.int32)
        leg = {}
        out["legs"][f"L{L}"] = leg

        for c in chunks:
            os.environ["FROZENBILM_SKEW_CHUNK"] = c
            fwd = jax.jit(lambda p, i, a, v, m: deberta_forward(
                p, cfg, vt, i, a, v, m, mlm=False).last_hidden_state)
            try:
                val = float(fwd(params, ids, am, video, vm)
                            .astype(jnp.float32).mean())  # compile + warm
                assert np.isfinite(val), val
                t0 = time.perf_counter()
                val = float(fwd(params, ids, am, video, vm)
                            .astype(jnp.float32).mean())
                dt = time.perf_counter() - t0
                leg[f"C{c}"] = {"sec": round(dt, 3),
                                "rows_per_sec": round(rows / dt, 2)}
            except Exception as e:  # noqa: BLE001
                leg[f"C{c}"] = {"error": repr(e)[:400]}
            print(f"# L={L} C={c}: {leg[f'C{c}']}", flush=True)
            with open(OUT, "w") as f:
                json.dump(out, f, indent=1)

    for k in ("FROZENBILM_REL_SELECT", "FROZENBILM_FUSED_ATTN",
              "FROZENBILM_SKEW_CHUNK"):
        os.environ.pop(k, None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
