"""On-chip proof of the train-NaN fix (VERDICT r3 next #1 done-criterion):
all bench train variants run >= 20 steps with every per-step loss finite and
a decreasing trend, at the exact bench shape (0.9B, B=32, T=64, F=10,
frozen bf16 / trainable f32, lr=1.5e-5).

Root cause (docs/measurements/grad_nan_probe{,2}_r4.json): XLA's fused
transpose of the old masked_softmax formulation emitted non-finite grads
inside the encoder-scan backward on real TPU. Fix: custom VJP
(ops/masking.masked_softmax, p*(g - sum(p*g)) — the reference XSoftmax
backward).

Run: python scripts/train_fix_proof.py   -> /tmp/train_fix_proof.json
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 20


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
        B, T, F, FEAT, lr = 4, 16, 4, 32, 1e-3
    else:
        cfg = DebertaV2Config()
        B, T, F, FEAT, lr = 32, 64, 10, 768, 1.5e-5

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
    batch = {
        "input_ids": jnp.asarray(rng.integers(5, cfg.vocab_size, size=(B, T))),
        "attention_mask": jnp.ones((B, T), jnp.int32),
        "special_tokens_mask": jnp.zeros((B, T), jnp.int32),
        "video": jnp.asarray(rng.normal(size=(B, F, FEAT)), jnp.bfloat16),
        "video_mask": jnp.ones((B, F), jnp.int32),
    }
    out = {"device_kind": kind, "steps": STEPS, "lr": lr, "runs": {}}
    variants = (("base", False, 1, "threefry"),
                ("base_rbg", False, 1, "rbg"),
                ("remat", True, 1, "threefry"),
                ("grad_accum4", False, 4, "threefry"))
    for name, remat, accum, impl in variants:
        t0 = time.time()
        try:
            loss_fn = make_mlm_loss_fn(
                deberta_forward, cfg, vt, mask_token_id=4,
                vocab_size=cfg.vocab_size, pad_token_id=cfg.pad_token_id,
                mlm_probability=0.15, remat=remat)
            params = jax.jit(lambda k: init_deberta_params(k, cfg, vt))(
                jax.random.PRNGKey(0))
            params = apply_param_dtype(params, vt, "bfloat16")
            trainer, state, frozen = make_trainer_and_state(
                loss_fn, optax.adamw(lr), params, vt, mesh=None,
                grad_accum=accum)
            key = train_key(1, impl)
            losses, gnorms = [], []
            for _ in range(STEPS):
                state, metrics = trainer.train_step(state, frozen, batch, key)
                losses.append(float(metrics["loss"]))
                if "grad_norm" in metrics:
                    gnorms.append(float(metrics["grad_norm"]))
            finite = all(np.isfinite(losses)) and all(np.isfinite(gnorms))
            # decreasing trend: mean of last 5 below mean of first 5
            trend = float(np.mean(losses[-5:]) - np.mean(losses[:5]))
            out["runs"][name] = {
                "losses": [round(x, 4) for x in losses],
                "grad_norm_last": round(gnorms[-1], 3) if gnorms else None,
                "all_finite": bool(finite),
                "loss_trend_last5_minus_first5": round(trend, 4),
                "wall_s": round(time.time() - t0, 1),
            }
        except Exception as e:  # noqa: BLE001
            out["runs"][name] = {"error": repr(e)[:300]}
        print(json.dumps({name: {k: v for k, v in out["runs"][name].items()
                                 if k != "losses"}}), flush=True)
        with open("/tmp/train_fix_proof.json", "w") as f:
            json.dump(out, f, indent=1, default=str)
    ok = all(r.get("all_finite") for r in out["runs"].values())
    print(f"# ALL FINITE: {ok}", flush=True)
    sys.exit(0 if ok else 19)


if __name__ == "__main__":
    main()
