"""Offline converters: torch artifacts -> TPU-native formats.

The released FrozenBiLM assets are torch pickles (SURVEY.md §2.4): model
checkpoints (`.pth`), monolithic feature dicts (`clipvitl14.pth`). This CLI
converts them ONCE so the runtime never needs torch:

  checkpoint: .pth -> native params dir (npz) for a given model family
    python scripts/convert.py checkpoint --pth frozenbilm.pth \
        --model_name deberta-v2-xlarge --out ckpts/frozenbilm \
        [--n_ans 0 --ds_factor 8 --features_dim 768]

  features: clipvitl14.pth dict -> memory-mapped packed store
    python scripts/convert.py features --pth clipvitl14.pth --out data/clipvitl14

  clip: OpenAI/HF CLIP weights -> native vision+text params dirs
    python scripts/convert.py clip --pth ViT-L-14.pt --out ckpts/clip
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def convert_checkpoint(args):
    import jax

    from frozenbilm_tpu.config import (
        VideoTextConfig,
        model_config_for,
    )
    from frozenbilm_tpu.models import family_of
    from frozenbilm_tpu.utils.checkpoint import _overlay_family, save_params
    from frozenbilm_tpu.utils.hf_import import load_pth_state_dict

    family = family_of(args.model_name)
    cfg = model_config_for(args.model_name)
    vt = VideoTextConfig(
        features_dim=args.features_dim,
        ds_factor_attn=args.ds_factor if family == "deberta" else 0,
        ds_factor_ff=args.ds_factor if family == "deberta" else 0,
        n_ans=args.n_ans,
    )
    if family == "deberta":
        from frozenbilm_tpu.models.deberta import init_deberta_params as init
    elif family == "bert":
        from frozenbilm_tpu.models.bert import init_bert_params as init
    elif family == "gptneo":
        from frozenbilm_tpu.models.gptneo import init_gptneo_params as init
    else:
        from frozenbilm_tpu.models.gptj import init_gptj_params as init

    template = jax.eval_shape(lambda k: init(k, cfg, vt), jax.random.PRNGKey(0))
    import numpy as np

    template = jax.tree.map(lambda x: np.zeros(x.shape, x.dtype), template)
    sd = load_pth_state_dict(args.pth)
    params = _overlay_family(template, sd, cfg, family)
    meta = {"model_name": args.model_name, "source": args.pth}
    if args.quantize != "none":
        # pre-quantized deployment export: int8 kernels on disk (half the
        # bytes of bf16), loaded directly by eval drivers; training rejects
        # quantized params (zero VJP through round/clip)
        from frozenbilm_tpu.train.partition import apply_quantization

        params = apply_quantization(params, vt, args.quantize)
        meta["quantize"] = args.quantize
    save_params(args.out, params, meta, fmt=args.fmt)
    print(f"wrote {args.out}")


def convert_features(args):
    from frozenbilm_tpu.data.features import DictFeatureStore, PackedFeatureStore

    store = DictFeatureStore.from_pth(args.pth, dim=args.features_dim)
    PackedFeatureStore.write(args.out, store._d, dim=args.features_dim,
                             dtype=args.dtype)
    print(f"packed {len(store._d)} videos -> {args.out}")


def convert_clip(args):
    from frozenbilm_tpu.config import CLIPTextConfig, CLIPVisionConfig
    from frozenbilm_tpu.models.clip import clip_params_from_hf, clip_params_from_openai
    from frozenbilm_tpu.utils.checkpoint import save_params
    from frozenbilm_tpu.utils.hf_import import load_pth_state_dict

    sd = load_pth_state_dict(args.pth)
    vcfg, tcfg = CLIPVisionConfig(), CLIPTextConfig()
    if any(k.startswith("visual.") for k in sd):
        vision, text = clip_params_from_openai(sd, vcfg, tcfg)
    else:
        vision, text = clip_params_from_hf(sd, vcfg, tcfg)
    save_params(args.out + "_vision", vision, {"source": args.pth})
    save_params(args.out + "_text", text, {"source": args.pth})
    print(f"wrote {args.out}_vision and {args.out}_text")


def main():
    parser = argparse.ArgumentParser("frozenbilm-tpu converters")
    sub = parser.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("checkpoint")
    c.add_argument("--pth", required=True)
    c.add_argument("--model_name", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--n_ans", type=int, default=0)
    c.add_argument("--ds_factor", type=int, default=8)
    c.add_argument("--features_dim", type=int, default=768)
    c.add_argument("--quantize", default="none", choices=["none", "w8a8"],
                   help="export W8A8 int8 frozen kernels (eval-only ckpt)")
    c.add_argument("--fmt", default="npz", choices=["npz", "orbax"])
    c.set_defaults(fn=convert_checkpoint)

    f = sub.add_parser("features")
    f.add_argument("--pth", required=True)
    f.add_argument("--out", required=True)
    f.add_argument("--features_dim", type=int, default=768)
    f.add_argument("--dtype", default="float16")
    f.set_defaults(fn=convert_features)

    cl = sub.add_parser("clip")
    cl.add_argument("--pth", required=True)
    cl.add_argument("--out", required=True)
    cl.set_defaults(fn=convert_clip)

    args = parser.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
