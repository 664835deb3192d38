"""Inventory the residual stacks the train step's fwd scan saves for bwd.

The round-5 train attribution (/tmp/train_hlo_attrib.json) shows the 0.9B
step spending most of its non-matmul time writing/reading stacked per-layer
residuals (dus into (24, ...) arrays) and regenerating threefry dropout
bits. This script traces the EXACT bench_train grad computation (no device
execution — pure jaxpr) and lists every scan-stacked residual with shape,
dtype, and MB, so save-policy decisions are made against numbers.

Run anywhere: python scripts/train_residuals.py [--remat]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from frozenbilm_tpu.utils.platform import force_cpu

    force_cpu(1)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from frozenbilm_tpu.config import DebertaV2Config, VideoTextConfig
    from frozenbilm_tpu.models.deberta import deberta_forward, init_deberta_params
    from frozenbilm_tpu.train.partition import (
        apply_param_dtype,
        merge_params,
        partition_params,
    )
    from frozenbilm_tpu.train.trainer import make_mlm_loss_fn

    cfg = DebertaV2Config()
    B, T, F, feat_dim = 32, 64, 10, 768
    vt = VideoTextConfig(features_dim=feat_dim, max_feats=F,
                         ds_factor_attn=8, ds_factor_ff=8, n_ans=0)
    remat = "--remat" in sys.argv
    if "--names" in sys.argv:
        remat = "names"

    loss_fn = make_mlm_loss_fn(
        deberta_forward, cfg, vt, mask_token_id=4, vocab_size=cfg.vocab_size,
        pad_token_id=cfg.pad_token_id, mlm_probability=0.15, remat=remat)

    # abstract params: eval_shape the init, then make ShapeDtypeStructs
    p_shapes = jax.eval_shape(
        lambda k: init_deberta_params(k, cfg, vt), jax.random.PRNGKey(0))
    p_shapes = jax.eval_shape(
        lambda p: apply_param_dtype(p, vt, "bfloat16"), p_shapes)
    trainable_s, frozen_s = jax.eval_shape(
        lambda p: partition_params(p, vt), p_shapes)

    batch = {
        "input_ids": jax.ShapeDtypeStruct((B, T), jnp.int32),
        "attention_mask": jax.ShapeDtypeStruct((B, T), jnp.int32),
        "special_tokens_mask": jax.ShapeDtypeStruct((B, T), jnp.int32),
        "video": jax.ShapeDtypeStruct((B, F, feat_dim), jnp.bfloat16),
        "video_mask": jax.ShapeDtypeStruct((B, F), jnp.int32),
    }
    rng = jax.ShapeDtypeStruct((2,), jnp.uint32)

    def compute(trainable, frozen, batch, r):
        params = merge_params(trainable, frozen)
        loss, _ = loss_fn(params, batch, r)
        return loss

    grad_fn = jax.grad(compute)
    jaxpr = jax.make_jaxpr(grad_fn)(trainable_s, frozen_s, batch, rng)

    # find every scan; for the fwd scan of a grad, the residual stacks are
    # outputs whose leading dim == the scan length (num_layers)
    stacks = []

    def walk(jaxpr_):
        for eqn in jaxpr_.eqns:
            if eqn.primitive.name == "scan":
                length = eqn.params.get("length")
                for ov in eqn.outvars:
                    a = ov.aval
                    if a.ndim >= 1 and a.shape[0] == length and length > 1:
                        stacks.append(a)
                walk(eqn.params["jaxpr"].jaxpr)
            for p in ("jaxpr", "call_jaxpr"):
                pj = eqn.params.get(p)
                if pj is not None and eqn.primitive.name != "scan":
                    walk(getattr(pj, "jaxpr", pj))

    walk(jaxpr.jaxpr)

    def mb(a):
        return float(np.prod(a.shape)) * a.dtype.itemsize / 1e6

    seen = {}
    for a in stacks:
        key = (str(a.dtype), tuple(a.shape))
        seen[key] = seen.get(key, 0) + 1
    rows = sorted(seen.items(),
                  key=lambda kv: -mb_of(kv[0]) * kv[1]) if False else sorted(
        seen.items(),
        key=lambda kv: -(float(np.prod(kv[0][1])) *
                         jnp.dtype(kv[0][0]).itemsize * kv[1]))
    total = 0.0
    print(f"# remat={remat}  (dtype, shape) x count  MB_total")
    for (dt, shp), n in rows:
        m = float(np.prod(shp)) * jnp.dtype(dt).itemsize / 1e6 * n
        total += m
        print(f"{n}x {dt}{list(shp)}  {m:10.1f} MB")
    print(f"# TOTAL stacked residuals: {total / 1000:.2f} GB "
          f"(write fwd + read bwd = {2 * total / 1000:.2f} GB traffic)")


if __name__ == "__main__":
    main()
