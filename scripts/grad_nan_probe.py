"""Localize the on-chip backward-pass NaN (round-4 follow-up to
scripts/train_nan_probe.py, whose committed result shows: forward loss
finite every step, grad_norm non-finite from the FIRST backward in every
variant incl. lr=0, CPU fine, remat fine).

Key observation shaping this probe: in the round-3 data the first call of
the compiled train step is finite and the SECOND call is NaN — the same
"program corrupted from its 2nd call" signature as the known axon/jax-0.9
const-arg hazard (CLAUDE.md). And train_step donates its state. So each
variant here (a) runs its grad program THREE times, (b) runs in its own
subprocess (`all` mode forks one python per variant so programs can't
contaminate each other), and (c) tests donation explicitly.

Variants:
  base        value_and_grad, no donation, stochastic rng, auto rel-select
  donate      same program but jit(donate_argnums=0) threading the trainable
              tree through, mimicking Trainer.train_step's buffer reuse
  det         rng=None (no dropout; fixed corruption)  -> dropout backward?
  f32         whole tree f32                           -> bf16 sensitivity?
  sel_gather  FROZENBILM_REL_SELECT=gather             -> selection backward?
  sel_skew    FROZENBILM_REL_SELECT=skew
  fullhead    gather_loss_positions=0 (full (B,L,vocab) head)
  remat       remat=True (known-finite control from BENCH_r03)
  trainer     the real Trainer.train_step at lr=0 (known-NaN control)

Usage:  python scripts/grad_nan_probe.py all      # subprocess per variant
        python scripts/grad_nan_probe.py base     # one variant, this process
Writes /tmp/grad_nan_probe.json (merged in `all` mode).
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, T, F, FEAT = 32, 64, 10, 768
CALLS = 3

VARIANTS = ("base", "donate", "det", "f32", "sel_gather", "sel_skew",
            "fullhead", "remat", "trainer")


def leaf_name(path):
    import jax

    parts = []
    for p in path:
        k = getattr(p, "key", None)
        parts.append(str(k) if k is not None else str(getattr(p, "idx", p)))
    return "/".join(parts)


def build(small):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from frozenbilm_tpu.config import DebertaV2Config, VideoTextConfig

    global B, T, F, FEAT
    if small:
        B, T, F, FEAT = 4, 16, 4, 32
        cfg = DebertaV2Config(
            vocab_size=512, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=128,
            max_position_embeddings=64, position_buckets=16)
    else:
        cfg = DebertaV2Config()
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
    return cfg, vt, batch


def run_variant(name, small):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from frozenbilm_tpu.models.deberta import (
        deberta_forward, init_deberta_params)
    from frozenbilm_tpu.train.partition import (
        apply_param_dtype, merge_params, partition_params)
    from frozenbilm_tpu.train.trainer import make_mlm_loss_fn

    # retry first device touch through claim lag (CLAUDE.md)
    for i in range(20):
        try:
            kind = jax.devices()[0].device_kind
            break
        except Exception as e:  # noqa: BLE001
            print(f"# device init failed ({e!r:.120}); retry {i}", flush=True)
            time.sleep(60)
            jax.extend.backend.clear_backends()

    cfg, vt, batch = build(small)
    dtype = "float32" if name == "f32" else "bfloat16"
    rel = {"sel_gather": "gather", "sel_skew": "skew"}.get(name)
    if rel is None:
        os.environ.pop("FROZENBILM_REL_SELECT", None)
    else:
        os.environ["FROZENBILM_REL_SELECT"] = rel

    t0 = time.time()
    params = jax.jit(
        lambda k: init_deberta_params(k, cfg, vt))(jax.random.PRNGKey(0))
    params = apply_param_dtype(params, vt, dtype)
    loss_fn = make_mlm_loss_fn(
        deberta_forward, cfg, vt, mask_token_id=4,
        vocab_size=cfg.vocab_size, pad_token_id=cfg.pad_token_id,
        mlm_probability=0.15, remat=(name == "remat"),
        gather_loss_positions=0 if name == "fullhead" else None)

    def counts(tree):
        out = {}
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                out[leaf_name(path)] = jnp.sum(
                    ~jnp.isfinite(leaf.astype(jnp.float32)))
        return out

    rec = {"name": name, "device_kind": kind, "calls": []}

    if name == "trainer":
        import optax

        from frozenbilm_tpu.train.optim import train_key
        from frozenbilm_tpu.train.trainer import make_trainer_and_state

        trainer, state, frozen = make_trainer_and_state(
            loss_fn, optax.adamw(0.0), params, vt, mesh=None)
        key = train_key(1, "threefry")
        count_tr = jax.jit(counts)
        for c in range(CALLS):
            state, metrics = trainer.train_step(state, frozen, batch, key)
            nf = jax.tree.map(int, jax.tree.map(np.asarray,
                                                count_tr(state.trainable)))
            rec["calls"].append({
                "loss": float(metrics["loss"]),
                "grad_norm": float(metrics.get("grad_norm", float("nan"))),
                "nonfinite_params": sum(nf.values()),
            })
            print(json.dumps(rec["calls"][-1]), flush=True)
    else:
        trainable, frozen = partition_params(params, vt)

        def objective(tr, fz, b, key):
            loss, _ = loss_fn(merge_params(tr, fz), b, key)
            return loss

        def probe(tr, fz, b, key):
            loss, grads = jax.value_and_grad(objective)(tr, fz, b, key)
            return tr, loss, counts(grads)

        donate = (0,) if name == "donate" else ()
        probe_j = jax.jit(probe, donate_argnums=donate)
        base_key = jax.random.PRNGKey(7)
        for c in range(CALLS):
            key = None if name == "det" else jax.random.fold_in(base_key, c)
            trainable, loss, nf = probe_j(trainable, frozen, batch, key)
            nf = {k: int(v) for k, v in
                  jax.tree.map(np.asarray, nf).items()}
            bad = {k: v for k, v in nf.items() if v}
            call = {"loss": float(loss),
                    "total_nonfinite_grads": sum(nf.values()),
                    "n_bad_leaves": len(bad),
                    "bad_leaves_sample": dict(list(bad.items())[:8])}
            rec["calls"].append(call)
            print(json.dumps(
                {k: call[k] for k in
                 ("loss", "total_nonfinite_grads", "n_bad_leaves")}),
                flush=True)

    rec["wall_s"] = round(time.time() - t0, 1)
    return rec


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    small = os.environ.get("FROZENBILM_PROBE_SMALL", "") == "1"
    if small:
        from frozenbilm_tpu.utils.platform import force_cpu

        force_cpu(1)
    path = "/tmp/grad_nan_probe.json"
    if mode == "all":
        out = {"runs": []}
        for v in VARIANTS:
            print(f"### variant {v}", flush=True)
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), v],
                capture_output=True, text=True, timeout=3600,
                env=os.environ.copy())
            sys.stdout.write(p.stdout)
            if p.returncode != 0:
                out["runs"].append({"name": v,
                                    "error": p.stderr[-400:]})
            else:
                try:
                    with open(path + "." + v) as f:
                        out["runs"].append(json.load(f))
                except Exception as e:  # noqa: BLE001
                    out["runs"].append({"name": v, "error": repr(e)})
            with open(path, "w") as f:
                json.dump(out, f, indent=1, default=str)
            time.sleep(5 if small else 60)  # claim release lag
        print(f"# wrote {path}", flush=True)
    else:
        rec = run_variant(mode, small)
        with open(path + "." + mode, "w") as f:
            json.dump(rec, f, indent=1, default=str)


if __name__ == "__main__":
    main()
