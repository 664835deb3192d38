"""Configuration system: model config dataclasses + the CLI flag surface.

The CLI mirrors the reference parser (reference: args.py:22-471) flag-for-flag
so that README commands translate mechanically, and adds TPU-specific options
(mesh shape, precision, bucketing) under a `TPU options` group.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from dataclasses import dataclass, field
from typing import Optional, Tuple

PRESAVE_DIR = os.environ.get("FROZENBILM_PRESAVE_DIR", "")
MODEL_DIR = os.environ.get("FROZENBILM_MODEL_DIR", "")
DATA_DIR = os.environ.get("FROZENBILM_DATA_DIR", "")
SSD_DIR = os.environ.get("FROZENBILM_SSD_DIR", "")

# Dataset name -> data folder (reference: args.py:8-19).
name2folder = {
    "webvid": "WebVid",
    "lsmdc": "LSMDC",
    "ivqa": "iVQA",
    "msrvtt": "MSRVTT-QA",
    "msvd": "MSVD-QA",
    "activitynet": "ActivityNet-QA",
    "tgif": "TGIF-QA",
    "how2qa": "How2QA",
    "tvqa": "TVQA",
    "vqa": "VQA",
}


# ---------------------------------------------------------------------------
# Model configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class DebertaV2Config:
    """DeBERTa-v2 architecture config (behavioral spec: reference model/deberta.py).

    Defaults are microsoft/deberta-v2-xlarge, the FrozenBiLM flagship backbone.
    """

    vocab_size: int = 128100
    hidden_size: int = 1536
    num_hidden_layers: int = 24
    num_attention_heads: int = 24
    intermediate_size: int = 6144
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 512
    type_vocab_size: int = 0
    initializer_range: float = 0.02
    layer_norm_eps: float = 1e-7
    relative_attention: bool = True
    max_relative_positions: int = -1  # -1 -> max_position_embeddings
    position_buckets: int = 256
    norm_rel_ebd: str = "layer_norm"
    share_att_key: bool = True
    pos_att_type: Tuple[str, ...] = ("p2c", "c2p")
    position_biased_input: bool = False
    conv_kernel_size: int = 3
    conv_act: str = "gelu"
    embedding_size: Optional[int] = None  # None -> hidden_size
    pad_token_id: int = 0

    @property
    def effective_embedding_size(self) -> int:
        return self.embedding_size or self.hidden_size

    @property
    def effective_max_relative_positions(self) -> int:
        if self.max_relative_positions < 1:
            return self.max_position_embeddings
        return self.max_relative_positions

    @property
    def pos_ebd_size(self) -> int:
        """Half-span of the relative-position embedding table (att_span)."""
        if self.position_buckets > 0:
            return self.position_buckets
        return self.effective_max_relative_positions

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


@dataclass(frozen=True)
class BertConfig:
    """BERT architecture config (behavioral spec: reference model/bert.py).

    Defaults are bert-base-uncased.
    """

    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    initializer_range: float = 0.02
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


@dataclass(frozen=True)
class GPTNeoConfig:
    """GPT-Neo architecture config (behavioral spec: reference model/gptneo.py).

    Defaults are EleutherAI/gpt-neo-1.3B. `attention_layers` alternates
    global and local sliding-window attention (gptneo.py:159-176).
    """

    vocab_size: int = 50257
    hidden_size: int = 2048
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: Optional[int] = None  # None -> 4 * hidden
    window_size: int = 256
    max_position_embeddings: int = 2048
    hidden_act: str = "gelu_new"
    resid_dropout: float = 0.0
    embed_dropout: float = 0.0
    attention_dropout: float = 0.0
    layer_norm_epsilon: float = 1e-5
    initializer_range: float = 0.02

    @property
    def attention_types(self) -> Tuple[str, ...]:
        return tuple("global" if i % 2 == 0 else "local" for i in range(self.num_layers))

    @property
    def effective_intermediate_size(self) -> int:
        return self.intermediate_size or 4 * self.hidden_size

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


@dataclass(frozen=True)
class GPTJConfig:
    """GPT-J architecture config (behavioral spec: reference model/gptj.py).

    Defaults are EleutherAI/gpt-j-6B (rotary_dim=64).
    """

    vocab_size: int = 50400
    hidden_size: int = 4096
    num_layers: int = 28
    num_heads: int = 16
    rotary_dim: int = 64
    intermediate_size: Optional[int] = None  # None -> 4 * hidden
    max_position_embeddings: int = 2048
    hidden_act: str = "gelu_new"
    resid_dropout: float = 0.0
    embed_dropout: float = 0.0
    attention_dropout: float = 0.0
    layer_norm_epsilon: float = 1e-5
    initializer_range: float = 0.02

    @property
    def effective_intermediate_size(self) -> int:
        return self.intermediate_size or 4 * self.hidden_size

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


@dataclass(frozen=True)
class CLIPVisionConfig:
    """OpenAI CLIP ViT-L/14 vision tower (used for frame feature extraction)."""

    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    projection_dim: int = 768  # output feature dim == args.features_dim
    layer_norm_eps: float = 1e-5


@dataclass(frozen=True)
class CLIPTextConfig:
    """OpenAI CLIP text tower (used for the CLIP zero-shot baselines)."""

    vocab_size: int = 49408
    context_length: int = 77
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    projection_dim: int = 768
    layer_norm_eps: float = 1e-5


@dataclass(frozen=True)
class VideoTextConfig:
    """Cross-modal wrapper options shared by every backbone.

    Mirrors the constructor args of the reference models
    (deberta.py:1293-1319): visual prefix, adapters, freezing, answer module.
    """

    features_dim: int = 768  # 0 disables video
    max_feats: int = 10
    freeze_lm: bool = True
    freeze_mlm: bool = True
    ft_ln: bool = True
    ds_factor_attn: int = 8  # 0 disables the post-attention adapter
    ds_factor_ff: int = 8  # 0 disables the post-FF adapter
    adapter_dropout: float = 0.1
    n_ans: int = 0
    freeze_last: bool = True


# Known HF model names for each family (reference: args.py:309-319).
MODEL_NAME_CHOICES = (
    "bert-base-uncased",
    "bert-large-uncased",
    "deberta-v2-xlarge",
    "gpt-neo-1p3b",
    "gpt-neo-2p7b",
    "gpt-j-6b",
)

BERT_LARGE_OVERRIDES = dict(
    hidden_size=1024, num_hidden_layers=24, num_attention_heads=16, intermediate_size=4096
)
GPTNEO_2P7B_OVERRIDES = dict(hidden_size=2560, num_layers=32, num_heads=20)


def model_config_for(model_name: str):
    """Map a --model_name to an architecture config dataclass."""
    if "deberta" in model_name:
        return DebertaV2Config()
    if "bert-large" in model_name:
        return BertConfig(**BERT_LARGE_OVERRIDES)
    if "bert" in model_name:
        return BertConfig()
    if "gpt-neo-2p7b" in model_name or "2.7B" in model_name:
        return GPTNeoConfig(**GPTNEO_2P7B_OVERRIDES)
    if "gpt-neo" in model_name:
        return GPTNeoConfig()
    if "gpt-j" in model_name:
        return GPTJConfig()
    raise NotImplementedError(f"unknown model_name {model_name!r}")


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------


def _add_dataset_paths(parser: argparse.ArgumentParser) -> None:
    d = lambda ds, f: os.path.join(DATA_DIR, name2folder[ds], f)  # noqa: E731
    parser.add_argument("--webvid_features_path", default=os.path.join(SSD_DIR, "webvid_clipvitl14_features"))
    parser.add_argument("--webvid_train_csv_path", default=d("webvid", "train_captions.csv"))
    parser.add_argument("--webvid_val_csv_path", default=d("webvid", "val_captions.csv"))
    for ds in ("lsmdc", "ivqa", "msrvtt", "msvd", "activitynet"):
        parser.add_argument(f"--{ds}_features_path", default=d(ds, "clipvitl14.pth"))
        parser.add_argument(f"--{ds}_vocab_path", default=d(ds, "vocab.json"))
        if ds != "lsmdc":
            parser.add_argument(f"--{ds}_train_csv_path", default=d(ds, "train.csv"))
            parser.add_argument(f"--{ds}_val_csv_path", default=d(ds, "val.csv"))
            parser.add_argument(f"--{ds}_test_csv_path", default=d(ds, "test.csv"))
        if ds != "tgif":
            parser.add_argument(f"--{ds}_subtitles_path", default=d(ds, "subtitles.pkl"))
    parser.add_argument("--lsmdc_train_csv_path", default=d("lsmdc", "training.csv"))
    parser.add_argument("--lsmdc_val_csv_path", default=d("lsmdc", "val.csv"))
    parser.add_argument("--lsmdc_test_csv_path", default=d("lsmdc", "test.csv"))
    parser.add_argument("--tgif_features_path", default=d("tgif", "clipvitl14.pth"))
    parser.add_argument("--tgif_frameqa_train_csv_path", default=d("tgif", "train_frameqa.csv"))
    parser.add_argument("--tgif_frameqa_test_csv_path", default=d("tgif", "test_frameqa.csv"))
    parser.add_argument("--tgif_vocab_path", default=d("tgif", "vocab.json"))
    parser.add_argument("--how2qa_features_path", default=d("how2qa", "clipvitl14_split.pth"))
    parser.add_argument("--how2qa_train_csv_path", default=d("how2qa", "train.csv"))
    parser.add_argument("--how2qa_val_csv_path", default=d("how2qa", "public_val.csv"))
    parser.add_argument("--how2qa_subtitles_path", default=d("how2qa", "subtitles.pkl"))
    parser.add_argument("--tvqa_features_path", default=d("tvqa", "clipvitl14.pth"))
    parser.add_argument("--tvqa_train_csv_path", default=d("tvqa", "train.csv"))
    parser.add_argument("--tvqa_val_csv_path", default=d("tvqa", "val.csv"))
    parser.add_argument("--tvqa_test_csv_path", default=d("tvqa", "test_public.csv"))
    parser.add_argument("--tvqa_subtitles_path", default=d("tvqa", "subtitles.pkl"))
    parser.add_argument("--vqa_features_path", default=d("vqa", "clipvitl14.pth"))
    parser.add_argument("--vqa_train_pkl_path", default=d("vqa", "train_list.pkl"))
    parser.add_argument("--vqa_val_pkl_path", default=d("vqa", "val_list.csv"))
    parser.add_argument("--vqa_vocab_path", default=d("vqa", "vocab.json"))


def get_args_parser() -> argparse.ArgumentParser:
    """Full CLI parser; flag surface mirrors reference args.py:22-471."""
    parser = argparse.ArgumentParser("FrozenBiLM-TPU", add_help=False)

    # Dataset specific
    parser.add_argument("--combine_datasets", nargs="+", required=True,
                        help="list of datasets to combine for training")
    parser.add_argument("--combine_datasets_val", nargs="+", required=True,
                        help="list of datasets to combine for eval")
    _add_dataset_paths(parser)

    # Training hyper-parameters
    parser.add_argument("--mlm_prob", type=float, default=0.15)
    parser.add_argument("--lr", default=3e-4, type=float)
    parser.add_argument("--beta1", default=0.9, type=float)
    parser.add_argument("--beta2", default=0.95, type=float)
    parser.add_argument("--batch_size", default=32, type=int)
    parser.add_argument("--batch_size_val", default=32, type=int)
    parser.add_argument("--weight_decay", default=0, type=float)
    parser.add_argument("--epochs", default=10, type=int)
    parser.add_argument("--lr_drop", default=10, type=int)
    parser.add_argument("--optimizer", default="adam", type=str)
    parser.add_argument("--clip_max_norm", default=0.1, type=float)
    parser.add_argument("--schedule", default="", choices=["", "linear_with_warmup"])
    parser.add_argument("--fraction_warmup_steps", default=0.1, type=float)
    parser.add_argument("--eval_skip", default=1, type=int)
    parser.add_argument("--print_freq", type=int, default=100)

    # Model parameters
    parser.add_argument("--ft_lm", dest="freeze_lm", action="store_false")
    parser.add_argument("--model_name", default="deberta-v2-xlarge", choices=MODEL_NAME_CHOICES)
    parser.add_argument("--ds_factor_attn", type=int, default=0)
    parser.add_argument("--ds_factor_ff", type=int, default=0)
    parser.add_argument("--freeze_ln", dest="ft_ln", action="store_false")
    parser.add_argument("--ft_mlm", dest="freeze_mlm", action="store_false")
    parser.add_argument("--dropout", default=0.1, type=float)
    parser.add_argument("--scratch", action="store_true")
    parser.add_argument("--n_ans", type=int, default=0)
    parser.add_argument("--ft_last", dest="freeze_last", action="store_false")

    # Run specific
    parser.add_argument("--test", action="store_true")
    parser.add_argument("--save_dir", default="")
    parser.add_argument("--presave_dir", default=PRESAVE_DIR)
    parser.add_argument("--device", default="tpu")
    parser.add_argument("--seed", default=42, type=int)
    parser.add_argument("--load", default="", help="path to load checkpoint")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--start-epoch", default=0, type=int, dest="start_epoch")
    parser.add_argument("--eval", action="store_true")
    parser.add_argument("--num_workers", default=3, type=int)

    # Distributed parameters
    parser.add_argument("--world-size", default=1, type=int, dest="world_size")
    parser.add_argument("--dist-url", default="env://", dest="dist_url")

    # Video and text parameters
    parser.add_argument("--max_feats", type=int, default=10)
    parser.add_argument("--features_dim", type=int, default=768)
    parser.add_argument("--no_video", dest="use_video", action="store_false")
    parser.add_argument("--no_context", dest="use_context", action="store_false")
    parser.add_argument("--max_tokens", type=int, default=64)
    parser.add_argument("--max_atokens", type=int, default=5)
    parser.add_argument("--prefix", default="", type=str)
    parser.add_argument("--suffix", default="", type=str)

    # Few-shot train-split selection (the reference reads args.n_shots in
    # videoqa_dataset_clip.py:175-179 but never declares it — fixed here)
    parser.add_argument("--n_shots", type=int, default=0,
                        help="use the <n_shots>p.csv few-shot train split")

    # Demo
    parser.add_argument("--question_example", default="", type=str)
    parser.add_argument("--video_example", default="", type=str)

    # TPU options (new)
    parser.add_argument("--mesh_data", type=int, default=-1,
                        help="data-parallel mesh axis size; -1 = all devices")
    parser.add_argument("--mesh_model", type=int, default=1,
                        help="tensor-parallel mesh axis size (GPT-J/Neo)")
    parser.add_argument("--mesh_fsdp", action="store_true",
                        help="store params + optimizer state sharded over the "
                             "data axis (FSDP/ZeRO-3; XLA all-gathers per "
                             "layer) instead of replicated")
    parser.add_argument("--sequence_parallel", action="store_true",
                        help="shard activations' token axis over the model "
                             "mesh axis (sequence parallelism; needs "
                             "--mesh_model >= 2; DeBERTa/BERT mc eval + MLM "
                             "pretrain) — for long-L shapes (mc's 512) "
                             "where activation HBM binds before weights")
    parser.add_argument("--rng_impl", default="rbg",
                        choices=["threefry", "rbg", "unsafe_rbg"],
                        help="PRNG for train-step randomness (dropout / MLM "
                             "corruption). Default rbg: the TPU-idiomatic "
                             "hardware RNG — deterministic given the key and "
                             "measurably faster than threefry's u32-add VPU "
                             "chains (+4-10%% on the 0.9B train step, "
                             "docs/TRAIN_ROOFLINE.md). threefry restores "
                             "jax's cross-platform bit-reproducible stream; "
                             "the reference has no RNG-bitstream contract "
                             "(torch CUDA RNG differs from any of these).")
    parser.add_argument("--param_dtype", default="float32",
                        choices=["float32", "bfloat16"],
                        help="dtype of frozen backbone params on device")
    parser.add_argument("--ckpt_format", default="npz", choices=["npz", "orbax"],
                        help="native checkpoint serialization (load is "
                             "auto-detected; orbax = per-leaf OCDBT storage)")
    parser.add_argument("--quantize", default="none",
                        choices=["none", "w8a8", "w8a8_static", "w4"],
                        help="quantize frozen linear layers for eval "
                             "(inference-only, see ops/quant.py). w8a8: int8 "
                             "weights + dynamic per-row int8 activations on "
                             "the s8 MXU. w8a8_static calibrates per-site "
                             "activation scales on the first val batches "
                             "instead of per-row dynamic quant. w4: "
                             "weight-only int4 (bf16 MXU, quarter weight "
                             "bytes — for the bandwidth-bound decode path)")
    parser.add_argument("--quant_calibration_batches", type=int, default=1,
                        help="batches used to calibrate w8a8_static act scales")
    parser.add_argument("--length_buckets", default="",
                        help="comma-separated token-length buckets for padding; "
                             "empty = single bucket at max_tokens")
    parser.add_argument("--tokenizer_path", default="",
                        help="HF tokenizer path; defaults to $TRANSFORMERS_CACHE/<model_name>")
    parser.add_argument("--profile_dir", default="",
                        help="capture an xprof trace window of training steps here")
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize encoder layers on backward (memory saver)")
    parser.add_argument("--compile_cache", default="",
                        help="persistent XLA compilation-cache dir: restarted "
                             "jobs and serving cold-starts reuse compiled "
                             "executables instead of recompiling")
    parser.add_argument("--keep_ckpts", type=int, default=0,
                        help="retention: keep only the newest N epoch "
                             "checkpoints (best_model/ckpt/preempt never "
                             "pruned); 0 = keep all")
    parser.add_argument("--skip_nonfinite", type=int, default=0,
                        help="tolerate up to N consecutive non-finite train "
                             "steps: the update is dropped in-jit (jnp.where "
                             "selection keeps the old opt_state, so the "
                             "pytree stays resume-compatible) and the step "
                             "excluded from metrics; 0 = abort on first "
                             "(reference)")
    parser.add_argument("--grad_accum", type=int, default=1,
                        help="split each train batch into N sequential "
                             "microbatches inside the jitted step (lax.scan), "
                             "averaging grads before one optimizer update — "
                             "large effective batches in ~1/N activation HBM")

    return parser


def build_videotext_config(args) -> VideoTextConfig:
    """Derive the cross-modal wrapper config from parsed CLI args."""
    return VideoTextConfig(
        features_dim=args.features_dim if args.use_video else 0,
        max_feats=args.max_feats,
        freeze_lm=args.freeze_lm,
        freeze_mlm=args.freeze_mlm,
        ft_ln=args.ft_ln,
        ds_factor_attn=args.ds_factor_attn,
        ds_factor_ff=args.ds_factor_ff,
        adapter_dropout=args.dropout,
        n_ans=args.n_ans,
        freeze_last=args.freeze_last,
    )


def config_from_hf_dict(family: str, d: dict):
    """Build an architecture config from an HF config.json dict."""
    if family == "deberta":
        pos_att = d.get("pos_att_type", "p2c|c2p")
        if isinstance(pos_att, str):
            pos_att = tuple(x.strip() for x in pos_att.lower().split("|") if x.strip())
        else:
            pos_att = tuple(pos_att)
        keep = {f.name for f in dataclasses.fields(DebertaV2Config)}
        kw = {k: v for k, v in d.items() if k in keep}
        kw["pos_att_type"] = pos_att
        return DebertaV2Config(**kw)
    if family == "bert":
        keep = {f.name for f in dataclasses.fields(BertConfig)}
        return BertConfig(**{k: v for k, v in d.items() if k in keep})
    if family == "gptneo":
        inter = d.get("intermediate_size")
        return GPTNeoConfig(
            vocab_size=d["vocab_size"], hidden_size=d["hidden_size"],
            num_layers=d["num_layers"], num_heads=d["num_heads"],
            intermediate_size=inter, window_size=d.get("window_size", 256),
            max_position_embeddings=d.get("max_position_embeddings", 2048),
            resid_dropout=d.get("resid_dropout", 0.0),
            embed_dropout=d.get("embed_dropout", 0.0),
            attention_dropout=d.get("attention_dropout", 0.0),
            layer_norm_epsilon=d.get("layer_norm_epsilon", 1e-5),
        )
    if family == "gptj":
        return GPTJConfig(
            vocab_size=d["vocab_size"], hidden_size=d["n_embd"],
            num_layers=d["n_layer"], num_heads=d["n_head"],
            rotary_dim=d.get("rotary_dim", 64),
            max_position_embeddings=d.get("n_positions", 2048),
            layer_norm_epsilon=d.get("layer_norm_epsilon", 1e-5),
        )
    raise NotImplementedError(family)
