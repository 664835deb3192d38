"""Run the 6B int8 in-flight engine warm with a DIRECTLY-BUILT random int8
tree (bench.py's _random_tree_like pattern) — no on-device quantization.

Discriminates the generate6b_int8 OOM:
  - passes  -> the engine's int8 programs are fine; the quantize step's
               residue (fragmentation / plugin-specific free behavior) is
               what kills the following admission execution;
  - fails   -> the int8 admission/step EXECUTION itself is the problem
               (contradicting its 0-temp AOT memory analysis).

Run on the real chip: python scripts/diag_6b_direct_int8.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from frozenbilm_tpu.config import GPTJConfig, VideoTextConfig
    from frozenbilm_tpu.models.gptj import init_gptj_params
    from frozenbilm_tpu.ops.quant import quantize_tree
    from frozenbilm_tpu.tasks.engine import InflightEngine

    cfg = GPTJConfig(vocab_size=258, hidden_size=4096, num_layers=28,
                     num_heads=16, rotary_dim=64)
    vt = VideoTextConfig(features_dim=768, max_feats=10, ds_factor_attn=0,
                         ds_factor_ff=0, n_ans=0)
    print(f"devices: {jax.devices()}", flush=True)

    shapes = jax.eval_shape(
        lambda k: init_gptj_params(k, cfg, vt), jax.random.PRNGKey(0))
    qshapes = jax.eval_shape(lambda p: quantize_tree(p), shapes)
    leaves, treedef = jax.tree_util.tree_flatten(qshapes)

    @jax.jit
    def mk(key):
        keys = jax.random.split(key, len(leaves))
        out = []
        for k, s in zip(keys, leaves):
            if s.dtype == jnp.int8:
                out.append(jax.random.randint(k, s.shape, -127, 128, jnp.int32)
                           .astype(jnp.int8))
            elif s.dtype in (jnp.float32, jnp.bfloat16):
                out.append(jax.random.normal(k, s.shape, jnp.bfloat16)
                           .astype(s.dtype) * 0.02 + (0.01 if s.ndim <= 2 else 0))
            else:
                out.append(jnp.zeros(s.shape, s.dtype))
        return jax.tree_util.tree_unflatten(treedef, out)

    params = mk(jax.random.PRNGKey(2))
    # honest sync
    ck = sum(float(np.asarray(l[..., -1]).ravel()[-1])
             for l in jax.tree.leaves(params) if hasattr(l, "ndim") and l.ndim)
    print(f"[sync] direct int8 tree ready, checksum {ck:.3f}", flush=True)

    engine = InflightEngine(
        params, cfg, vt, "gptj", spec_draft=0, slots=2,
        max_len=10 + 32 + 16, chunk=8, prompt_buckets=[16, 32],
        eos_token_id=None, pad_token_id=0, top_k=0, top_p=0.0,
        kv_int8=False, rng_seed=0, max_new_cap=16, pipeline=False,
        admit_batch=0, adaptive_chunk=True)
    print("[stage] engine ctor ok", flush=True)
    try:
        for b in engine.buckets:
            for vid in (None, np.zeros((10, 768), np.float32)):
                engine.submit(np.full(b, engine.pad, np.int32), video=vid,
                              max_new_tokens=1)
                ok = engine.step_once()
                print(f"[stage] admit b={b} video={vid is not None}: {ok}",
                      flush=True)
        while engine._active.any() or not engine._waiting.empty():
            engine.step_once()
        print("OK: engine int8 warm + drain clean with direct tree",
              flush=True)
        return 0
    except Exception as e:
        import traceback

        traceback.print_exc()
        print(f"FAILED: {type(e).__name__}", flush=True)
        return 1


if __name__ == "__main__":
    sys.exit(main())
