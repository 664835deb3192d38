"""Benchmark: DeBERTa-v2-XLarge VideoQA eval throughput (QA pairs/sec/chip).

Measures the BASELINE.json headline metric: answer-vocabulary scoring over a
4k answer vocab with 10 visual tokens + 64 text tokens — the videoqa.py eval
hot path — on jax.default_backend() (the driver runs it on one real TPU chip).

Methodology note: the remote-TPU runtime's block_until_ready can return
before device execution finishes, so naive per-call timing lies. We run K
forwards *inside one jitted fori_loop* (inputs varied per iteration to defeat
CSE) and force a scalar device->host fetch; the round trip is amortized
over K real forwards.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "qa_pairs/sec/chip", "vs_baseline": N}

vs_baseline compares against bench_baseline.json committed in the repo
(round-1 self-baseline; later rounds show the speedup factor).
"""

import json
import os
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from frozenbilm_tpu.config import DebertaV2Config, VideoTextConfig
    from frozenbilm_tpu.models.deberta import (
        deberta_forward,
        init_deberta_params,
        set_answer_embeddings,
    )

    small = os.environ.get("FROZENBILM_BENCH_SMALL", "") == "1"
    if small:
        cfg = DebertaV2Config(
            vocab_size=512, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=128,
            max_position_embeddings=64, position_buckets=16,
        )
        B, T, F, n_ans, iters = 4, 16, 4, 64, 2
        feat_dim = 32
    else:
        cfg = DebertaV2Config()  # deberta-v2-xlarge (0.9B)
        # B=128 is the measured throughput knee on v5e (B=32: 636 qa/s,
        # B=128: 843, B=256: 764); eval batching is free for serving
        B, T, F, n_ans, iters = 128, 64, 10, 4000, 8
        feat_dim = 768

    vt = VideoTextConfig(features_dim=feat_dim, max_feats=F,
                         ds_factor_attn=8, ds_factor_ff=8, n_ans=0)

    # one-dispatch on-device init (per-leaf host RNG costs minutes over the tunnel)
    params = jax.jit(lambda k: init_deberta_params(k, cfg, vt))(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    a2tok = rng.integers(5, cfg.vocab_size, size=(n_ans, 5))
    a2tok[:, 3:] = 0
    params = set_answer_embeddings(params, a2tok, pad_token_id=cfg.pad_token_id)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
    )

    ids = jnp.asarray(rng.integers(5, cfg.vocab_size, size=(B, T)))
    am = jnp.ones((B, T), jnp.int32)
    video = jnp.asarray(rng.normal(size=(B, F, feat_dim)), jnp.bfloat16)
    vm = jnp.ones((B, F), jnp.int32)

    from frozenbilm_tpu.models.deberta import deberta_answer_logits

    @jax.jit
    def timed_loop(params, ids, am, video, vm):
        def body(i, acc):
            ids_i = (ids + i) % cfg.vocab_size  # defeat CSE across iterations
            out = deberta_forward(params, cfg, vt, ids_i, am, video, vm, mlm=False)
            # the videoqa eval computation: answer head at the [MASK] position
            h = out.last_hidden_state[:, F + 7]
            logits = deberta_answer_logits(params, cfg, h)
            return acc + logits.mean()

        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    # compile + warmup, force real completion with a host fetch
    _ = float(timed_loop(params, ids, am, video, vm))

    t0 = time.perf_counter()
    checksum = float(timed_loop(params, ids, am, video, vm))
    dt = time.perf_counter() - t0
    assert np.isfinite(checksum)
    qa_per_sec = B * iters / dt

    baseline_path = os.path.join(os.path.dirname(__file__), "bench_baseline.json")
    vs = 1.0
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        if base.get("value"):
            vs = qa_per_sec / base["value"]

    print(json.dumps({
        "metric": "deberta_xl_videoqa_eval_throughput",
        "value": round(qa_per_sec, 2),
        "unit": "qa_pairs/sec/chip",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
