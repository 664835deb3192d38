"""On-chip A/B of the disentangled-attention selection modes
(skew / onehot / gather) at the deployed sequence lengths
(xlarge config; L = T + 10 video tokens).

Run: python scripts/rel_select_ab.py [modes...]        (real chip)
     FROZENBILM_AB_LENGTHS=64,118,256,502 to override the T sweep.
Prints one JSON line per (mode, L) with qa_pairs/sec; the winner table
is encoded in models/deberta.py's `auto` resolution (commit the JSON
whenever the measured crossovers move).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(mode: str, T: int = 64, B: int = 128):
    # "skewc" = query/key-chunked skew (C=128); "skew" pins chunking OFF so
    # the two stay distinguishable at L >= 256 where auto-chunk kicks in.
    if mode == "skewc":
        os.environ["FROZENBILM_REL_SELECT"] = "skew"
        os.environ["FROZENBILM_SKEW_CHUNK"] = "128"
    elif mode == "skew":
        os.environ["FROZENBILM_REL_SELECT"] = mode
        os.environ["FROZENBILM_SKEW_CHUNK"] = "0"
    else:
        os.environ["FROZENBILM_REL_SELECT"] = mode
        os.environ.pop("FROZENBILM_SKEW_CHUNK", None)
    import importlib

    import jax
    import jax.numpy as jnp
    import numpy as np

    from frozenbilm_tpu.config import DebertaV2Config, VideoTextConfig
    from frozenbilm_tpu.models import deberta as m

    cfg = DebertaV2Config()
    F, iters, feat_dim = 10, 8, 768
    vt = VideoTextConfig(features_dim=feat_dim, max_feats=F,
                         ds_factor_attn=8, ds_factor_ff=8, n_ans=0)
    params = jax.jit(lambda k: m.init_deberta_params(k, cfg, vt))(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    a2tok = rng.integers(5, cfg.vocab_size, size=(4000, 5))
    a2tok[:, 3:] = 0
    params = m.set_answer_embeddings(params, a2tok, pad_token_id=cfg.pad_token_id)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params)
    ids = jnp.asarray(rng.integers(5, cfg.vocab_size, size=(B, T)))
    am = jnp.ones((B, T), jnp.int32)
    video = jnp.asarray(rng.normal(size=(B, F, feat_dim)), jnp.bfloat16)
    vm = jnp.ones((B, F), jnp.int32)

    @jax.jit
    def loop(params, ids, am, video, vm):
        def body(i, acc):
            ids_i = (ids + i) % cfg.vocab_size
            out = m.deberta_forward(params, cfg, vt, ids_i, am, video, vm, mlm=False)
            h = out.last_hidden_state[:, F + 7]
            return acc + m.deberta_answer_logits(params, cfg, h).mean()

        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    _ = float(loop(params, ids, am, video, vm))
    t0 = time.perf_counter()
    checksum = float(loop(params, ids, am, video, vm))
    dt = time.perf_counter() - t0
    assert np.isfinite(checksum)
    rec = {"mode": mode, "L": T + F, "B": B,
           "qa_pairs_per_sec": round(B * iters / dt, 2),
           "ms_per_batch": round(dt / iters * 1e3, 2)}
    print(json.dumps(rec), flush=True)
    return rec


if __name__ == "__main__":
    import sys

    modes = sys.argv[1:] or ["onehot", "skew", "gather"]
    # T=502 is the longest legal text length: L = T+10 video tokens must
    # stay <= 512 (the EMD position table; the reference has the identical
    # cap — its emd_context_layer adds (1, 512, E) z_states)
    lengths = [int(t) for t in os.environ.get(
        "FROZENBILM_AB_LENGTHS", "64,118,150,182,256,502").split(",")]
    # shrink B as L grows: keep B*L^2 attention footprint roughly level
    b_for = {64: 128, 118: 128, 150: 64, 182: 64, 256: 32, 502: 16}
    results = []
    for T in lengths:
        for mode in modes:
            try:
                results.append(run(mode, T=T, B=b_for.get(T, 16)))
            except Exception as e:  # a mode may be unsupported at a shape
                print(json.dumps({"mode": mode, "L": T + 10,
                                  "error": repr(e)[:200]}), flush=True)
    out = os.environ.get("FROZENBILM_AB_OUT", "")
    if out:
        with open(out, "w") as f:
            json.dump(results, f, indent=1)
