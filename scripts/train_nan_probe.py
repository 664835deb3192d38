"""On-chip probe for the bench train-leg NaN (BENCH_r03: base/base_rbg/
grad_accum4 report loss_final=NaN after 6 steps while remat stays finite —
implausible as training dynamics at lr=1.5e-5, so suspect an infra artifact).

Discriminating runs (each a fresh trainer + params, per CLAUDE.md donation
aliasing rules):
  A. base, per-step loss fetch                -> which step goes NaN?
  B. base WITHOUT the lower()/memory_analysis
     pre-pass bench.py does                   -> const-corruption interaction?
  C. base with skip_nonfinite=True            -> does the in-jit guard see a
                                                 nonfinite loss/grad too, and
                                                 does training then continue?
  D. base at lr=0                             -> pure fwd/bwd numerics vs
                                                 optimizer update path
  E. base, bench fetch pattern (warm fetch,
     then STEPS-1 back-to-back donated steps,
     fetch only the last)                     -> async-pipelining artifact of
                                                 the unfetched donation chain
                                                 over the tunnel?
After each run the trainable params + opt state are scanned for non-finites
(how far the corruption propagated).

Writes /tmp/train_nan_probe.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from frozenbilm_tpu.config import DebertaV2Config, VideoTextConfig
from frozenbilm_tpu.models.deberta import deberta_forward, init_deberta_params
from frozenbilm_tpu.train.partition import apply_param_dtype
from frozenbilm_tpu.train.trainer import make_mlm_loss_fn, make_trainer_and_state
from frozenbilm_tpu.train.optim import train_key

B, T, F, feat_dim = 32, 64, 10, 768
STEPS = 8


def make_batch(cfg, rng):
    return {
        "input_ids": jnp.asarray(rng.integers(5, cfg.vocab_size, size=(B, T))),
        "attention_mask": jnp.ones((B, T), jnp.int32),
        "special_tokens_mask": jnp.zeros((B, T), jnp.int32),
        "video": jnp.asarray(rng.normal(size=(B, F, feat_dim)), jnp.bfloat16),
        "video_mask": jnp.ones((B, F), jnp.int32),
    }


def run(name, *, premem: bool, skip_nonfinite: bool = False, lr: float = 1.5e-5,
        fetch_every_step: bool = True):
    cfg = DebertaV2Config()
    vt = VideoTextConfig(features_dim=feat_dim, max_feats=F,
                         ds_factor_attn=8, ds_factor_ff=8, n_ans=0)
    rng = np.random.default_rng(0)
    batch = make_batch(cfg, rng)
    params = jax.jit(lambda k: init_deberta_params(k, cfg, vt))(
        jax.random.PRNGKey(0))
    params = apply_param_dtype(params, vt, "bfloat16")
    loss_fn = make_mlm_loss_fn(
        deberta_forward, cfg, vt, mask_token_id=4,
        vocab_size=cfg.vocab_size, pad_token_id=cfg.pad_token_id,
        mlm_probability=0.15, remat=False)
    tx = optax.adamw(lr)
    trainer, state, frozen = make_trainer_and_state(
        loss_fn, tx, params, vt, mesh=None, grad_accum=1,
        skip_nonfinite=skip_nonfinite)
    key = train_key(1, "threefry")
    if premem:
        ma = trainer._train_step.lower(
            state, frozen, batch, key).compile().memory_analysis()
        del ma
    losses, extras = [], []
    t0 = time.time()
    for i in range(STEPS):
        state, metrics = trainer.train_step(state, frozen, batch, key)
        if fetch_every_step or i == 0 or i == STEPS - 1:
            losses.append(float(metrics["loss"]))
            extras.append({k: float(v) for k, v in metrics.items()
                           if k != "loss" and jnp.ndim(v) == 0})
    # scan trainable params + opt state for non-finites (corruption reach)
    def count_nonfinite(tree):
        tot = 0
        for leaf in jax.tree.leaves(tree):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                tot += int(jnp.sum(~jnp.isfinite(leaf.astype(jnp.float32))))
        return tot
    nf_params = count_nonfinite(state.trainable)
    nf_opt = count_nonfinite(state.opt_state)
    rec = {"name": name, "premem": premem, "skip_nonfinite": skip_nonfinite,
           "lr": lr, "fetch_every_step": fetch_every_step,
           "losses": [round(x, 4) for x in losses],
           "metrics_last": extras[-1] if extras else {},
           "nonfinite_params": nf_params, "nonfinite_opt": nf_opt,
           "wall_s": round(time.time() - t0, 1)}
    print(rec, flush=True)
    return rec


def main():
    out = {"device_kind": jax.devices()[0].device_kind, "runs": []}
    for name, kw in (
        ("A_base_premem", dict(premem=True)),
        ("B_base_nopremem", dict(premem=False)),
        ("C_skip_nonfinite", dict(premem=True, skip_nonfinite=True)),
        ("D_lr0", dict(premem=True, lr=0.0)),
        ("E_bench_pattern", dict(premem=True, fetch_every_step=False)),
    ):
        try:
            out["runs"].append(run(name, **kw))
        except Exception as e:  # noqa: BLE001 — record and continue
            out["runs"].append({"name": name, "error": repr(e)[:300]})
            print(f"{name} FAILED: {e!r}", flush=True)
    with open("/tmp/train_nan_probe.json", "w") as f:
        json.dump(out, f, indent=1)
    print("# wrote /tmp/train_nan_probe.json", flush=True)


if __name__ == "__main__":
    main()
