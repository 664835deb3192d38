"""Export the serving QA scoring program to a StableHLO artifact.

The artifact is the exact jitted program tasks/serve.py compiles for /qa
(make_qa_steps eval_step: forward -> [MASK]-position answer logits ->
softmax top-k), traced at the serving batch shape and serialized with
jax.export. Weights remain inputs, so the artifact pairs with any
checkpoint of the same architecture. Serve it back with
`tasks/serve.py --program <artifact>` (skips model tracing at startup) or
any consumer of serialized StableHLO.

Usage:
  python scripts/export_program.py --out qa_program.stablehlo \
      --msrvtt_vocab_path vocab.json --tokenizer_path ... [--platforms tpu,cpu]
"""

from __future__ import annotations

import json

import numpy as np


def export_qa_program(args) -> None:
    import jax.numpy as jnp

    from frozenbilm_tpu.data.tokenization import get_tokenizer
    from frozenbilm_tpu.models import build_model
    from frozenbilm_tpu.tasks.videoqa import make_qa_steps
    from frozenbilm_tpu.utils.aot import save_program

    tokenizer = get_tokenizer(args)
    vocab = json.load(open(args.msrvtt_vocab_path))
    args.n_ans = len(vocab)
    bundle = build_model(args)
    import jax

    from frozenbilm_tpu.data.tokenization import answers_to_token_ids

    # seeded params only fix the exported tree STRUCTURE (incl. the answer
    # module rows); real weights are inputs at serve time
    params = jax.jit(bundle.init_params)(jax.random.PRNGKey(args.seed))
    answers = [a for a, _ in sorted(vocab.items(), key=lambda kv: kv[1])]
    a2tok = answers_to_token_ids(tokenizer, answers, args.max_atokens)
    params = bundle.set_answer_embeddings(params, a2tok)
    # same dtype/quantization finalization the server applies, so the traced
    # program matches the params the server will feed it
    from frozenbilm_tpu.tasks.serve import _finalize_params

    params = _finalize_params(args, bundle, params)
    _, eval_step = make_qa_steps(bundle, tokenizer.mask_token_id, "export",
                                 topk=min(10, len(vocab)))

    B, L = args.batch_size_val, args.max_tokens
    F, D = args.max_feats, args.features_dim
    example = (
        params,
        jnp.zeros((B, L), jnp.int32),   # input_ids
        jnp.zeros((B, L), jnp.int32),   # attention_mask
        jnp.zeros((B, F, D), jnp.float32),  # video
        jnp.zeros((B, F), jnp.int32),   # video_mask
    )
    platforms = args.platforms.split(",") if args.platforms else None
    save_program(args.out, eval_step, *example, platforms=platforms)
    meta = {
        "model_name": args.model_name, "n_ans": args.n_ans,
        "batch_size": B, "max_tokens": L, "max_feats": F,
        "features_dim": D, "platforms": platforms,
    }
    with open(args.out + ".json", "w") as f:
        json.dump(meta, f, indent=1)
    print(f"exported QA scoring program -> {args.out} "
          f"(batch {B}, {args.n_ans} answers)")


def main(argv=None):
    from frozenbilm_tpu.config import get_args_parser

    import argparse

    parser = argparse.ArgumentParser(parents=[get_args_parser()])
    parser.add_argument("--out", required=True,
                        help="output artifact path (.stablehlo)")
    parser.add_argument("--platforms", default="",
                        help="comma-separated lowering targets, e.g. "
                             "'tpu,cpu'; default = current backend")
    args = parser.parse_args(argv)
    export_qa_program(args)


if __name__ == "__main__":
    main()
