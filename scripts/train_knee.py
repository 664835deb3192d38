"""Training throughput knee (VERDICT r3 next #6): sweep the 0.9B adapter-MLM
train-step batch size B in {32, 64, 128} at the bench shape (T=64, F=10,
frozen bf16 / trainable f32) and report steps/s, items/s, analytic TFLOP/s
and static peak HBM per B — the knee is where items/s stops scaling.

Each B gets fresh params (train_step donates; create_train_state may alias
— CLAUDE.md) and transient-compile retries with 60s backoff (round 3's
base_b64 died on a single HTTP-500, VERDICT r3 weak #6).

Run: python scripts/train_knee.py  (on the real chip)
Writes /tmp/train_knee_r4.json.
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
    import optax

    from frozenbilm_tpu.config import DebertaV2Config, VideoTextConfig
    from frozenbilm_tpu.models.deberta import deberta_forward, init_deberta_params
    from frozenbilm_tpu.train.optim import train_key
    from frozenbilm_tpu.train.partition import apply_param_dtype
    from frozenbilm_tpu.train.trainer import make_mlm_loss_fn, make_trainer_and_state

    small = os.environ.get("FROZENBILM_PROBE_SMALL", "") == "1"
    if small:
        from frozenbilm_tpu.utils.platform import force_cpu

        force_cpu(1)
        cfg = DebertaV2Config(
            vocab_size=512, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=128,
            max_position_embeddings=64, position_buckets=16)
        T, F, FEAT, steps, bs = 16, 4, 32, 2, (4, 8)
    else:
        cfg = DebertaV2Config()
        T, F, FEAT, steps, bs = 64, 10, 768, 10, (32, 64, 128)

    for i in range(20):
        try:
            kind = jax.devices()[0].device_kind
            break
        except Exception as e:  # noqa: BLE001
            print(f"# device init failed ({e!r:.120}); retry {i}", flush=True)
            time.sleep(60)
            jax.extend.backend.clear_backends()
    print(f"# device: {kind}", flush=True)

    vt = VideoTextConfig(features_dim=FEAT, max_feats=F,
                         ds_factor_attn=8, ds_factor_ff=8, n_ans=0)
    rng = np.random.default_rng(0)

    def mk_loss(remat):
        return make_mlm_loss_fn(
            deberta_forward, cfg, vt, mask_token_id=4,
            vocab_size=cfg.vocab_size, pad_token_id=cfg.pad_token_id,
            mlm_probability=0.15, remat=remat)

    # analytic FLOPs per item (same terms as bench.bench_train)
    h, inter = cfg.hidden_size, cfg.intermediate_size
    L_layers = cfg.num_hidden_layers + 2
    S = T + F
    adapter_tok = h * h // 8 if vt.ds_factor_attn else 0
    frozen_tok = 8 * h * h + 4 * h * inter + 4 * S * h + 8 * h * cfg.position_buckets
    mean_masked = T * 0.15
    K_head = int(mean_masked + 6.0 * (mean_masked * 0.85) ** 0.5) + 8
    K_head = min((K_head + 7) // 8 * 8, T)
    per_item = (2 * (S * L_layers * frozen_tok + 2 * K_head * h * cfg.vocab_size)
                + 3 * (S * L_layers * adapter_tok + 2 * F * FEAT * h))

    out = {"device_kind": kind, "shape": {"T": T, "F": F}, "sweep": {}}
    transient = ("remote_compile", "FAILED_PRECONDITION", "HTTP 5")
    for B in bs:
        batch = {
            "input_ids": jnp.asarray(
                rng.integers(5, cfg.vocab_size, size=(B, T))),
            "attention_mask": jnp.ones((B, T), jnp.int32),
            "special_tokens_mask": jnp.zeros((B, T), jnp.int32),
            "video": jnp.asarray(
                rng.normal(size=(B, F, FEAT)), jnp.bfloat16),
            "video_mask": jnp.ones((B, F), jnp.int32),
        }
        # attempts 0-1: plain loss (transient-retry); attempt 2: remat —
        # round 4 found the B>=64 compile 500 is DETERMINISTIC (static HBM
        # at B32 is already 12.9 GB of the v5e's 16; the backward's stored
        # activations double per B doubling, so the compiler aborts). The
        # knee table records which variant actually fit.
        for attempt in range(3):
            remat = attempt == 2
            try:
                params = jax.jit(lambda k: init_deberta_params(k, cfg, vt))(
                    jax.random.PRNGKey(0))
                params = apply_param_dtype(params, vt, "bfloat16")
                trainer, state, frozen = make_trainer_and_state(
                    mk_loss(remat), optax.adamw(1.5e-5), params, vt,
                    mesh=None)
                key = train_key(1, "threefry")
                hbm_gb = 0.0
                try:
                    ma = trainer._train_step.lower(
                        state, frozen, batch, key).compile().memory_analysis()
                    hbm_gb = (ma.argument_size_in_bytes + ma.temp_size_in_bytes
                              + ma.output_size_in_bytes
                              - getattr(ma, "alias_size_in_bytes", 0)) / 1024**3
                except Exception:  # noqa: BLE001
                    pass
                state, metrics = trainer.train_step(state, frozen, batch, key)
                first = float(metrics["loss"])
                t0 = time.perf_counter()
                for _ in range(steps):
                    state, metrics = trainer.train_step(
                        state, frozen, batch, key)
                last = float(metrics["loss"])
                dt = time.perf_counter() - t0
                out["sweep"][f"B{B}"] = {
                    "steps_per_sec": round(steps / dt, 3),
                    "items_per_sec": round(B * steps / dt, 2),
                    "tflops": round(per_item * B * steps / dt / 1e12, 2),
                    "static_hbm_gb": round(hbm_gb, 2),
                    "remat": remat,
                    "loss_first": first, "loss_last": last,
                }
                print(json.dumps({f"B{B}": out["sweep"][f"B{B}"]}),
                      flush=True)
                break
            except Exception as e:  # noqa: BLE001
                out["sweep"][f"B{B}"] = {
                    "error": repr(e)[:300],
                    "error_full": repr(e)[:2500],
                    "remat": remat,
                }
                if attempt < 2 and any(s in repr(e) for s in transient):
                    time.sleep(60)
                    continue
                break
        with open("/tmp/train_knee_r4.json", "w") as f:
            json.dump(out, f, indent=1, default=str)
    # knee: largest B whose items/s still improves >10% over the previous
    ok = [(int(k[1:]), v["items_per_sec"]) for k, v in out["sweep"].items()
          if "items_per_sec" in v]
    ok.sort()
    knee = ok[0][0] if ok else None
    for (b0, r0), (b1, r1) in zip(ok, ok[1:]):
        knee = b1 if r1 > 1.10 * r0 else knee
        if r1 <= 1.10 * r0:
            break
    out["knee_batch"] = knee
    with open("/tmp/train_knee_r4.json", "w") as f:
        json.dump(out, f, indent=1, default=str)
    print(f"# knee_batch = {knee}", flush=True)


if __name__ == "__main__":
    main()
