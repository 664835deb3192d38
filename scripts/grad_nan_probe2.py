"""Phase-2 localization of the on-chip backward NaN (follow-up to
scripts/grad_nan_probe.py phase 1, which established: first grad call
already NaN in 20/22 trainable leaves, loss finite, donation / dropout /
rel-select mode / program order all exonerated, CPU clean).

Phase 2 adds (a) PER-LAYER non-finite counts for stacked leaves — backprop
runs layers 24->1, so the first NaN layer is the creation site — plus the
full clean-leaf list, and (b) structural toggles that remove one suspect
subsystem at a time at full 0.9B scale:

  perlayer   base program, per-layer breakdown + full bad/clean leaf lists
  plainsm    masked_softmax -> naive where/softmax/zero (same semantics,
             different backward fusion)
  nobias     pos_att_type=() — no disentangled c2p/p2c bias at all
  noconv     conv_kernel_size=0 — no ConvLayer branch in the scan
  noemd      position_biased_input=True — abs pos at input, NO EMD rerun
  noadapt    ds_factor 0 — trainable = LNs + linear_video only
  b8         base at B=8 (batch dependence)
  f32b8      whole tree f32 at B=8 (fits HBM, unlike phase 1's B=32)

Usage: python scripts/grad_nan_probe2.py all   (subprocess per variant)
Writes /tmp/grad_nan_probe2.json.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T, F, FEAT = 64, 10, 768

VARIANTS = ("perlayer", "plainsm", "nobias", "noconv", "noemd", "noadapt",
            "b8", "f32b8")


def leaf_name(path):
    parts = []
    for p in path:
        k = getattr(p, "key", None)
        parts.append(str(k) if k is not None else str(getattr(p, "idx", p)))
    return "/".join(parts)


def run_variant(name, small):
    import jax
    import jax.numpy as jnp
    import numpy as np

    import frozenbilm_tpu.models.deberta as deb
    from frozenbilm_tpu.config import DebertaV2Config, VideoTextConfig
    from frozenbilm_tpu.train.partition import (
        apply_param_dtype, merge_params, partition_params)
    from frozenbilm_tpu.train.trainer import make_mlm_loss_fn

    for i in range(20):
        try:
            kind = jax.devices()[0].device_kind
            break
        except Exception as e:  # noqa: BLE001
            print(f"# device init failed ({e!r:.120}); retry {i}", flush=True)
            time.sleep(60)
            jax.extend.backend.clear_backends()

    B = 8 if name in ("b8", "f32b8") else 32
    kw = {}
    if name == "nobias":
        kw["pos_att_type"] = ()
    if name == "noconv":
        kw["conv_kernel_size"] = 0
    if name == "noemd":
        kw["position_biased_input"] = True
    if small:
        B, t, f, feat = 4, 16, 4, 32
        cfg = DebertaV2Config(
            vocab_size=512, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=128,
            max_position_embeddings=64, position_buckets=16, **kw)
    else:
        t, f, feat = T, F, FEAT
        cfg = DebertaV2Config(**kw)
    ds = 0 if name == "noadapt" else 8
    vt = VideoTextConfig(features_dim=feat, max_feats=f,
                         ds_factor_attn=ds, ds_factor_ff=ds, n_ans=0)

    if name == "plainsm":
        def plain_masked_softmax(scores, mask, axis=-1):
            valid = mask.astype(jnp.bool_)
            filled = jnp.where(valid, scores.astype(jnp.float32), -30000.0)
            p = jax.nn.softmax(filled, axis=axis)
            return (p * valid).astype(scores.dtype)

        deb.masked_softmax = plain_masked_softmax

    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(rng.integers(5, cfg.vocab_size, size=(B, t))),
        "attention_mask": jnp.ones((B, t), jnp.int32),
        "special_tokens_mask": jnp.zeros((B, t), jnp.int32),
        "video": jnp.asarray(rng.normal(size=(B, f, feat)), jnp.bfloat16),
        "video_mask": jnp.ones((B, f), jnp.int32),
    }

    t0 = time.time()
    params = jax.jit(
        lambda k: deb.init_deberta_params(k, cfg, vt))(jax.random.PRNGKey(0))
    params = apply_param_dtype(
        params, vt, "float32" if name == "f32b8" else "bfloat16")
    loss_fn = make_mlm_loss_fn(
        deb.deberta_forward, cfg, vt, mask_token_id=4,
        vocab_size=cfg.vocab_size, pad_token_id=cfg.pad_token_id,
        mlm_probability=0.15)
    trainable, frozen = partition_params(params, vt)
    n_layers = cfg.num_hidden_layers

    def counts(tree):
        out = {}
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            if not jnp.issubdtype(leaf.dtype, jnp.floating):
                continue
            bad = ~jnp.isfinite(leaf.astype(jnp.float32))
            nm = leaf_name(path)
            out[nm] = jnp.sum(bad)
            if leaf.ndim >= 1 and leaf.shape[0] == n_layers:
                out[nm + "#L"] = jnp.sum(bad, axis=tuple(range(1, leaf.ndim)))
        return out

    def objective(tr, fz, b, key):
        loss, _ = loss_fn(merge_params(tr, fz), b, key)
        return loss

    @jax.jit
    def probe(tr, fz, b, key):
        loss, grads = jax.value_and_grad(objective)(tr, fz, b, key)
        return loss, counts(grads)

    loss, nf = probe(trainable, frozen, batch, jax.random.PRNGKey(7))
    nf = jax.tree.map(np.asarray, nf)
    scalar = {k: int(v) for k, v in nf.items() if v.ndim == 0}
    per_layer = {k: v.tolist() for k, v in nf.items() if v.ndim == 1}
    rec = {"name": name, "device_kind": kind, "B": B,
           "loss": float(loss),
           "total_nonfinite_grads": sum(scalar.values()),
           "bad_leaves": {k: v for k, v in scalar.items() if v},
           "clean_leaves": [k for k, v in scalar.items() if not v],
           "per_layer": per_layer,
           "wall_s": round(time.time() - t0, 1)}
    print(json.dumps({k: rec[k] for k in
                      ("name", "loss", "total_nonfinite_grads")}), flush=True)
    return rec


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    small = os.environ.get("FROZENBILM_PROBE_SMALL", "") == "1"
    if small:
        from frozenbilm_tpu.utils.platform import force_cpu

        force_cpu(1)
    path = "/tmp/grad_nan_probe2.json"
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
                out["runs"].append({"name": v, "error": p.stderr[-400:]})
            else:
                try:
                    with open(path + "." + v) as fh:
                        out["runs"].append(json.load(fh))
                except Exception as e:  # noqa: BLE001
                    out["runs"].append({"name": v, "error": repr(e)})
            with open(path, "w") as fh:
                json.dump(out, fh, indent=1, default=str)
            time.sleep(5 if small else 60)
        print(f"# wrote {path}", flush=True)
    else:
        rec = run_variant(mode, small)
        with open(path + "." + mode, "w") as fh:
            json.dump(rec, fh, indent=1, default=str)


if __name__ == "__main__":
    main()
