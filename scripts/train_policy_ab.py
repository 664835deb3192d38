"""On-chip A/B of the selective-checkpoint train step (round-5 item 1).

Variants over the EXACT bench_train "base" setup (0.9B deberta-v2-xlarge,
B=32, T=64, F=10, production Trainer, AdamW, donated state):
  base        remat=False, threefry   (BENCH_r04: 5.67 steps/s, 24.4% MFU)
  names       remat="names", threefry (save-list: models/deberta.REMAT_SAVE_NAMES)
  names_rbg   remat="names", rbg      (hardware RNG for the dropout bits)
  b64_names   remat="names", threefry, B=64 (unremat B=64 was an HBM capacity
              wall, train_knee_r4.json — 2.65 GB of stacks vs 7.42 should fit)

Writes /tmp/train_policy_ab.json. Run: scripts/tpu_run.sh scripts/train_policy_ab.py
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
            vocab_size=256, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=128,
            max_position_embeddings=64, position_buckets=16)
        B, T, F, feat_dim, steps = 4, 16, 4, 32, 3
    else:
        cfg = DebertaV2Config()
        B, T, F, feat_dim, steps = 32, 64, 10, 768, 20

    vt = VideoTextConfig(features_dim=feat_dim, max_feats=F,
                         ds_factor_attn=8, ds_factor_ff=8, n_ans=0)
    rng = np.random.default_rng(0)

    def make_batch(Bv):
        return {
            "input_ids": jnp.asarray(rng.integers(5, cfg.vocab_size, size=(Bv, T))),
            "attention_mask": jnp.ones((Bv, T), jnp.int32),
            "special_tokens_mask": jnp.zeros((Bv, T), jnp.int32),
            "video": jnp.asarray(rng.normal(size=(Bv, F, feat_dim)), jnp.bfloat16),
            "video_mask": jnp.ones((Bv, F), jnp.int32),
        }

    # same analytic FLOP convention as bench.bench_train
    h, inter = cfg.hidden_size, cfg.intermediate_size
    L_layers = cfg.num_hidden_layers + 2
    S = T + F
    adapter_tok = h * h // 8 if vt.ds_factor_attn else 0
    frozen_tok = (8 * h * h + 4 * h * inter + 4 * S * h
                  + 8 * h * cfg.position_buckets)
    mean_masked = T * 0.15
    K_head = int(mean_masked + 6.0 * (mean_masked * 0.85) ** 0.5) + 8
    K_head = min((K_head + 7) // 8 * 8, T)
    if K_head >= T:
        K_head = S

    def flops_for(Bv):
        fwd_frozen = Bv * (S * L_layers * frozen_tok
                           + 2 * K_head * h * cfg.vocab_size)
        fwd_train = Bv * (S * L_layers * adapter_tok
                          + 2 * F * vt.features_dim * h)
        return 2 * fwd_frozen + 3 * fwd_train

    peak = {"TPU v5 lite": 197e12}.get(jax.devices()[0].device_kind, 197e12)

    default = "base,names,names_rbg,b64_names"
    spec = os.environ.get("FROZENBILM_TRAIN_AB", default).split(",")
    all_variants = {
        "base": (False, "threefry", B),
        "base_rbg": (False, "rbg", B),
        "names": ("names", "threefry", B),
        "names_rbg": ("names", "rbg", B),
        "b64_names": ("names", "threefry", 2 * B),
        "b64_names_rbg": ("names", "rbg", 2 * B),
    }
    variants = [(n, *all_variants[n]) for n in spec if n in all_variants]
    if small:
        variants = variants[:3]

    out = {"device_kind": jax.devices()[0].device_kind, "small": small}
    for name, remat, rng_impl, Bv in variants:
        batch = make_batch(Bv)
        loss_fn = make_mlm_loss_fn(
            deberta_forward, cfg, vt, mask_token_id=4,
            vocab_size=cfg.vocab_size, pad_token_id=cfg.pad_token_id,
            mlm_probability=0.15, remat=remat)
        try:
            params = jax.jit(lambda k: init_deberta_params(k, cfg, vt))(
                jax.random.PRNGKey(0))
            params = apply_param_dtype(params, vt, "bfloat16")
            trainer, state, frozen = make_trainer_and_state(
                loss_fn, optax.adamw(1.5e-5), params, vt, mesh=None)
            key = train_key(1, rng_impl)
            static_hbm_gb = 0.0
            try:
                ma = trainer._train_step.lower(
                    state, frozen, batch, key).compile().memory_analysis()
                static_hbm_gb = (
                    ma.argument_size_in_bytes + ma.temp_size_in_bytes
                    + ma.output_size_in_bytes
                    - getattr(ma, "alias_size_in_bytes", 0)) / 1024**3
            except Exception:
                pass
            state, metrics = trainer.train_step(state, frozen, batch, key)
            warm = float(metrics["loss"])
            hist = []
            t0 = time.perf_counter()
            for _ in range(steps):
                state, metrics = trainer.train_step(state, frozen, batch, key)
                hist.append(metrics["loss"])
            final = float(metrics["loss"])
            dt = time.perf_counter() - t0
            hist = [float(x) for x in hist]
            out[name] = {
                "steps_per_sec": round(steps / dt, 3),
                "items_per_sec": round(Bv * steps / dt, 2),
                "mfu": round(flops_for(Bv) * steps / dt / peak, 4),
                "static_hbm_gb": round(static_hbm_gb, 2),
                "loss_first": round(warm, 4), "loss_final": round(final, 4),
                "losses_all_finite": bool(np.isfinite(np.asarray(hist)).all()),
            }
        except Exception as e:  # noqa: BLE001 — record and move on
            out[name] = {"error": repr(e)[:300]}
        print(f"# {name}: {out[name]}", flush=True)

    with open("/tmp/train_policy_ab.json", "w") as f:
        json.dump(out, f, indent=1)
    print("# wrote /tmp/train_policy_ab.json", flush=True)


if __name__ == "__main__":
    main()
