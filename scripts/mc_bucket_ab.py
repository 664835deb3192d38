"""On-chip A/B: --length_buckets vs longest-pad on the MC eval shape.

The reference mc.py pads every row to max_tokens=512 (mc.py:49-72 via the
tokenizer's padding="max_length"); our drivers can instead encode each batch
at the smallest enabled bucket that fits (config --length_buckets,
data/loader bucketed encode). This measures the end-to-end win on a
realistic mixed-length population: video+text L in {128, 256, 512} with a
subtitle-ish mix (half short, a third medium, the rest full-length).

Run on the real chip (one process, one axon claim):
    PYTHONPATH=/root/repo python scripts/mc_bucket_ab.py
Writes FROZENBILM_AB_OUT (default /tmp/mc_bucket_ab.json).
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
    from frozenbilm_tpu.models.deberta import (
        deberta_answer_logits,
        deberta_forward,
        init_deberta_params,
        set_answer_embeddings,
    )

    small = os.environ.get("FROZENBILM_MCAB_SMALL", "") == "1"
    if small:  # CPU smoke: tiny model, same control flow
        cfg = DebertaV2Config(
            vocab_size=256, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=128,
            max_position_embeddings=512, position_buckets=16)
        F, feat_dim, rows_per_batch = 4, 32, 2
    else:
        cfg = DebertaV2Config()  # xlarge 0.9B
        F, feat_dim, rows_per_batch = 10, 768, 16
    vt = VideoTextConfig(features_dim=feat_dim, max_feats=F,
                         ds_factor_attn=8, ds_factor_ff=8, n_ans=0)
    params = jax.jit(lambda k: init_deberta_params(k, cfg, vt))(
        jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    a2tok = rng.integers(5, cfg.vocab_size, size=(2, 5))
    a2tok[:, 2:] = 0
    params = set_answer_embeddings(params, a2tok, pad_token_id=cfg.pad_token_id)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)

    # mixed-length population: (bucket text length, number of batches).
    # 8 batches fit L=118, 5 need L=246, 3 need the full 502 — the shape of
    # a subtitle dataset where most clips are short (How2QA per-minute
    # features cap most rows well under the 512 ceiling).
    population = ([(20, 2), (44, 1)] if small
                  else [(118, 8), (246, 5), (502, 3)])

    def timed_batches(T, n_batches):
        """One jitted fori_loop running n_batches forwards at text len T."""
        ids = jnp.asarray(
            rng.integers(5, cfg.vocab_size, size=(rows_per_batch, T)))
        am = jnp.ones((rows_per_batch, T), jnp.int32)
        video = jnp.asarray(
            rng.normal(size=(rows_per_batch, F, feat_dim)), jnp.bfloat16)
        vm = jnp.ones((rows_per_batch, F), jnp.int32)

        @jax.jit
        def loop(params, ids, am, video, vm, n):
            def body(i, acc):
                ids_i = (ids + i) % cfg.vocab_size  # defeat CSE
                out = deberta_forward(params, cfg, vt, ids_i, am, video, vm,
                                      mlm=False)
                p_yes = jax.nn.softmax(deberta_answer_logits(
                    params, cfg, out.last_hidden_state[:, F + 7]), -1)[:, 0]
                return acc + p_yes.astype(jnp.float32).mean()

            return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

        n = jnp.asarray(n_batches)
        _ = float(loop(params, ids, am, video, vm, n))  # compile+warm
        t0 = time.perf_counter()
        v = float(loop(params, ids, am, video, vm, n))
        dt = time.perf_counter() - t0
        assert np.isfinite(v)
        return dt

    total_rows = sum(n for _, n in population) * rows_per_batch

    # A: bucketed — each length class at its own compiled shape
    bucketed_dt = sum(timed_batches(T, n) for T, n in population)
    # B: longest-pad — same row population, everything at the max length
    T_max = max(T for T, _ in population)
    longest_dt = timed_batches(T_max, sum(n for _, n in population))

    rec = {
        "device_kind": jax.devices()[0].device_kind,
        "small": small,
        "population": [{"T": T, "batches": n} for T, n in population],
        "rows": total_rows,
        "bucketed_rows_per_sec": round(total_rows / bucketed_dt, 2),
        "longest_pad_rows_per_sec": round(total_rows / longest_dt, 2),
        "speedup": round(longest_dt / bucketed_dt, 3),
    }
    print(json.dumps(rec), flush=True)
    out = os.environ.get("FROZENBILM_AB_OUT", "/tmp/mc_bucket_ab.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    return rec


if __name__ == "__main__":
    main()
