"""Skew-chunk sweep at the MC L=512 shape (round 4).

mc_hlo_attrib_r4.json attributed ~25% of the L=512 forward to the chunked
skew's relayout copies (8x misaligned (B,H,128,639) reshapes at ~12 GB/s
effective — VPU sublane shuffles, not DMA) plus the p2c transpose. The
relayout pattern depends on the chunk size, so sweep
FROZENBILM_SKEW_CHUNK in {32, 64, 128, 256, 0=full skew} and time the
full 0.9B forward at rows=80, T=502 (the bench mc leg shape).

Run on chip: python scripts/mc_chunk_ab.py  -> /tmp/mc_chunk_ab.json
"""

import json
import os
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
        sweep = ("8", "0")
    else:
        cfg = DebertaV2Config()
        rows, T, F, feat_dim = 80, 502, 10, 768
        sweep = tuple(os.environ.get("FROZENBILM_CHUNK_SWEEP", "32,64,128,256,0").split(","))

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

    out = {"device_kind": jax.devices()[0].device_kind, "small": small,
           "shape": {"rows": rows, "T": T}, "sweep": {}}
    os.environ["FROZENBILM_REL_SELECT"] = "skew"
    for c in sweep:
        os.environ["FROZENBILM_SKEW_CHUNK"] = c
        # a FRESH jit closure per setting: the env is read at trace time,
        # so reusing one jitted function would silently keep the first value
        fwd = jax.jit(lambda p, i, a, v, m: deberta_forward(
            p, cfg, vt, i, a, v, m, mlm=False
        ).last_hidden_state.astype(jnp.float32).mean())
        try:
            _ = float(fwd(params, ids, am, video, vm))  # compile + warm
            t0 = time.perf_counter()
            val = float(fwd(params, ids, am, video, vm))
            dt = time.perf_counter() - t0
            assert np.isfinite(val)
            out["sweep"][f"C{c}"] = {"sec": round(dt, 3),
                                     "rows_per_sec": round(rows / dt, 2)}
        except Exception as e:  # noqa: BLE001 — C=0 may OOM at this shape
            out["sweep"][f"C{c}"] = {"error": repr(e)[:300]}
        print(f"# C={c}: {out['sweep'][f'C{c}']}", flush=True)
        with open("/tmp/mc_chunk_ab.json", "w") as f:
            json.dump(out, f, indent=1)
    del os.environ["FROZENBILM_REL_SELECT"]
    del os.environ["FROZENBILM_SKEW_CHUNK"]


if __name__ == "__main__":
    main()
