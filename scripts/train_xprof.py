"""Xprof account of the 0.9B adapter-MLM train step: where the 186 ms go.

The round-3 bench measured the production train step at ~25% MFU
(deberta_xl_adapter_train.base) with no breakdown. This traces ONE donated
train step at the bench shape (B=32, T=64, frozen bf16 / trainable f32)
and sums device self-time into classes:
  - matmul (dot/conv fusions: fwd + bwd-data + trainable weight grads)
  - big-vocab ops (lm head / log-softmax CE fusions touching the 128k axis
    are named by their producing HLO, counted in matmul/other like any op)
  - other (elementwise, layernorm, corruption, adam update, copies)
Writes /tmp/train_xprof_r3.json.

Run on the real chip: bash scripts/tpu_run.sh scripts/train_xprof.py
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from frozenbilm_tpu.config import DebertaV2Config, VideoTextConfig
    from frozenbilm_tpu.models.deberta import deberta_forward, init_deberta_params
    from frozenbilm_tpu.train.partition import apply_param_dtype
    from frozenbilm_tpu.train.trainer import make_mlm_loss_fn, make_trainer_and_state

    cfg = DebertaV2Config()
    B, T, F, feat_dim = 32, 64, 10, 768
    vt = VideoTextConfig(features_dim=feat_dim, max_feats=F,
                         ds_factor_attn=8, ds_factor_ff=8, n_ans=0)
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(rng.integers(5, cfg.vocab_size, size=(B, T))),
        "attention_mask": jnp.ones((B, T), jnp.int32),
        "special_tokens_mask": jnp.zeros((B, T), jnp.int32),
        "video": jnp.asarray(rng.normal(size=(B, F, feat_dim)), jnp.bfloat16),
        "video_mask": jnp.ones((B, F), jnp.int32),
    }
    params = jax.jit(lambda k: init_deberta_params(k, cfg, vt))(
        jax.random.PRNGKey(0))
    params = apply_param_dtype(params, vt, "bfloat16")
    loss_fn = make_mlm_loss_fn(
        deberta_forward, cfg, vt, mask_token_id=4, vocab_size=cfg.vocab_size,
        pad_token_id=cfg.pad_token_id, mlm_probability=0.15)
    trainer, state, frozen = make_trainer_and_state(
        loss_fn, optax.adamw(1.5e-5), params, vt, mesh=None)
    key = jax.random.PRNGKey(1)

    state, metrics = trainer.train_step(state, frozen, batch, key)
    _ = float(metrics["loss"])  # compile + warm barrier

    tdir = tempfile.mkdtemp(prefix="trainprof_")
    jax.profiler.start_trace(tdir)
    state, metrics = trainer.train_step(state, frozen, batch, key)
    _ = float(metrics["loss"])
    jax.profiler.stop_trace()

    from frozenbilm_tpu.utils.profiling import device_op_times, matmul_class_split

    tot = device_op_times(tdir)
    top = sorted(tot.items(), key=lambda kv: -kv[1])[:40]
    classes = matmul_class_split(tot)
    out = {
        "device_kind": jax.devices()[0].device_kind,
        "shape": {"B": B, "T": T, "F": F},
        "top_ops": [[n[:120], round(s * 1e3, 3)] for n, s in top],
        "class_ms": {k: round(v * 1e3, 3) for k, v in classes.items()},
    }
    print(json.dumps(out["class_ms"]), flush=True)
    for n, s in top[:15]:
        print(f"  {s * 1e3:9.3f}ms  {n[:100]}", flush=True)
    with open("/tmp/train_xprof_r3.json", "w") as f:
        json.dump(out, f, indent=1)
    return out


if __name__ == "__main__":
    main()
