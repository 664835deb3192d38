"""AOT memory analysis of the 6B int8 in-flight engine programs.

The generate6b_int8 leg OOMs at the FIRST B=1 admission execution even on
an idle chip holding only the 5.8 GB int8 tree (diag_6b_int8_inflight with
pipeline=False). Hypothesis: XLA hoists an s8->bf16 convert of the stacked
(28, ...) kernels out of the layer scan for tiny-batch matmuls, creating
~11 GB of loop-invariant temps. This script proves or kills that WITHOUT
allocating the tree: engine programs are lowered from ShapeDtypeStructs
and compiled remotely; compiled.memory_analysis() reports temp bytes.

Run: python scripts/diag_6b_memanalysis.py [nlayers]
(nlayers defaults to 28 = real GPT-J; small values sanity-check fast)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def analyze(tag, jitted, *argshapes):
    import jax

    try:
        compiled = jitted.lower(*argshapes).compile()
    except Exception as e:
        print(f"[{tag}] compile FAILED: {e!r}"[:400], flush=True)
        return
    try:
        ma = compiled.memory_analysis()
        gb = 1e9
        print(f"[{tag}] args={ma.argument_size_in_bytes / gb:.2f} GB "
              f"out={ma.output_size_in_bytes / gb:.2f} GB "
              f"TEMP={ma.temp_size_in_bytes / gb:.2f} GB "
              f"(alias={ma.alias_size_in_bytes / gb:.2f})", flush=True)
    except Exception as e:
        print(f"[{tag}] memory_analysis unavailable: {e!r}"[:200], flush=True)


def main():
    nl = int(sys.argv[1]) if len(sys.argv) > 1 else 28

    import jax
    import numpy as np

    from frozenbilm_tpu.config import GPTJConfig, VideoTextConfig
    from frozenbilm_tpu.models import family_of  # noqa: F401 (parity import)
    from frozenbilm_tpu.models.gptj import init_gptj_params
    from frozenbilm_tpu.ops.quant import quantize_tree
    from frozenbilm_tpu.tasks.engine import InflightEngine

    cfg = GPTJConfig(vocab_size=258, hidden_size=4096, num_layers=nl,
                     num_heads=16, rotary_dim=64)
    vt = VideoTextConfig(features_dim=768, max_feats=10, ds_factor_attn=0,
                         ds_factor_ff=0, n_ans=0)

    pshapes = jax.eval_shape(
        lambda k: init_gptj_params(k, cfg, vt), jax.random.PRNGKey(0))
    # bf16 storage like --param_dtype bfloat16 (frozen leaves)
    pshapes = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(
            s.shape, jax.numpy.bfloat16 if s.dtype == jax.numpy.float32
            else s.dtype), pshapes)
    qshapes = jax.eval_shape(lambda p: quantize_tree(p), pshapes)

    engine = InflightEngine(
        qshapes, cfg, vt, "gptj", spec_draft=0, slots=2,
        max_len=10 + 32 + 16, chunk=8, prompt_buckets=[16, 32],
        eos_token_id=None, pad_token_id=0, top_k=0, top_p=0.0,
        kv_int8=False, rng_seed=0, max_new_cap=16, pipeline=False,
        admit_batch=0, adaptive_chunk=False)
    sshapes = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), engine.state)
    i32 = jax.ShapeDtypeStruct((), np.int32)
    ids16 = jax.ShapeDtypeStruct((1, 16), np.int32)
    temp = jax.ShapeDtypeStruct((1,), np.float32)
    rng = jax.ShapeDtypeStruct((), jax.random.key(0).dtype)

    admit = engine._make_admit(False)
    analyze(f"admit b=16 nl={nl} INT8", admit, qshapes, sshapes, i32,
            ids16, ids16, None, None, temp, rng)

    step = engine._make_step(8)
    active = jax.ShapeDtypeStruct((2,), np.bool_)
    analyze(f"step C=8 nl={nl} INT8", step, qshapes, sshapes, active,
            rng, i32)

    # bf16 control: the leg that PASSES on-chip
    engine_bf = InflightEngine(
        pshapes, cfg, vt, "gptj", spec_draft=0, slots=2,
        max_len=10 + 32 + 16, chunk=8, prompt_buckets=[16, 32],
        eos_token_id=None, pad_token_id=0, top_k=0, top_p=0.0,
        kv_int8=False, rng_seed=0, max_new_cap=16, pipeline=False,
        admit_batch=0, adaptive_chunk=False)
    sshapes_bf = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), engine_bf.state)
    admit_bf = engine_bf._make_admit(False)
    analyze(f"admit b=16 nl={nl} BF16", admit_bf, pshapes, sshapes_bf, i32,
            ids16, ids16, None, None, temp, rng)
    step_bf = engine_bf._make_step(8)
    analyze(f"step C=8 nl={nl} BF16", step_bf, pshapes, sshapes_bf, active,
            rng, i32)
    return 0


def analyze_fused_init_quant():
    """AOT temp footprint of ONE jit doing init->bf16 cast->quantize at 6B:
    if XLA's scheduler frees each bf16 leaf at its convert, temps stay far
    below the 11.3 GB tree and this becomes the serving init path."""
    import jax
    import numpy as np

    from frozenbilm_tpu.config import GPTJConfig, VideoTextConfig
    from frozenbilm_tpu.models.gptj import init_gptj_params
    from frozenbilm_tpu.ops.quant import quantize_tree
    from frozenbilm_tpu.train.partition import apply_param_dtype, trainable_mask

    cfg = GPTJConfig(vocab_size=258, hidden_size=4096, num_layers=28,
                     num_heads=16, rotary_dim=64)
    vt = VideoTextConfig(features_dim=768, max_feats=10, ds_factor_attn=0,
                         ds_factor_ff=0, n_ans=0)
    shapes = jax.eval_shape(
        lambda k: init_gptj_params(k, cfg, vt), jax.random.PRNGKey(0))
    mask = trainable_mask(shapes, vt)

    def fused(k):
        p = apply_param_dtype(init_gptj_params(k, cfg, vt), vt, "bfloat16")
        return quantize_tree(p, mask)

    kshape = jax.ShapeDtypeStruct((2,), np.uint32)
    analyze("FUSED init+cast+quant 6B", jax.jit(fused), kshape)


if __name__ == "__main__":
    if os.environ.get("FUSED_ONLY"):
        analyze_fused_init_quant()
        sys.exit(0)
    sys.exit(main())
