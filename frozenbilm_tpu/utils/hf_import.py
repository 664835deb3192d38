"""Torch/HF state-dict -> JAX parameter-tree importers (offline converter).

Consumes numpy-valued state dicts (caller detaches torch tensors) from either
stock HF checkpoints or released FrozenBiLM `.pth` checkpoints and overlays
them onto an init-built parameter template — the analogue of the reference's
`load_state_dict(strict=False)` partial loading (reference main.py:236-240).

Layout conversions:
  torch Linear weight (out, in)        -> kernel (in, out)
  torch Conv1d weight (out, in, width) -> kernel (width, in, out)
  per-layer trees                      -> stacked along a leading axis
"""

from __future__ import annotations

import copy
from typing import Dict, Optional

import numpy as np

from frozenbilm_tpu.config import BertConfig, DebertaV2Config, GPTJConfig, GPTNeoConfig


def _lin(sd, prefix):
    out = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _ln(sd, prefix):
    return {"weight": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _set(tree, path, value):
    node = tree
    for k in path[:-1]:
        node = node[k]
    leaf = path[-1]
    if leaf in node and hasattr(node[leaf], "shape"):
        expected = tuple(node[leaf].shape)
        got = tuple(np.shape(value))
        if expected != got:
            raise ValueError(f"shape mismatch at {'/'.join(path)}: {expected} vs {got}")
    node[leaf] = np.asarray(value)


def _validate_shapes(template: Dict, out: Dict, path: str = "") -> None:
    """Every leaf present in both trees must keep the template's shape
    (a wrong-model .pth should fail loudly, not load silently)."""
    for k, v in out.items():
        t = template.get(k) if isinstance(template, dict) else None
        if t is None:
            continue
        if isinstance(v, dict):
            _validate_shapes(t, v, f"{path}/{k}")
        elif hasattr(t, "shape") and tuple(np.shape(t)) != tuple(np.shape(v)):
            raise ValueError(
                f"shape mismatch at {path}/{k}: template {tuple(np.shape(t))} "
                f"vs checkpoint {tuple(np.shape(v))}")


def _stack_layer_trees(layer_trees):
    """[tree_0, ..., tree_{N-1}] -> one tree with leaves stacked on axis 0."""
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *layer_trees)


# ---------------------------------------------------------------------------
# DeBERTa-v2
# ---------------------------------------------------------------------------


def deberta_overlay_from_torch(
    params: Dict,
    sd: Dict[str, np.ndarray],
    cfg: DebertaV2Config,
) -> Dict:
    """Overlay a torch state dict onto an init-built DeBERTa param template.

    Accepts FrozenBiLM naming (lm_predictions.lm_head.*, answer_embeddings,
    linear_video, adapters — reference model/deberta.py) and stock HF naming
    (cls.predictions.transform.*). Missing keys keep template values
    (strict=False semantics).
    """
    template = jax_tree_to_numpy(params)
    params = copy.deepcopy(template)
    p = "deberta."
    emb = params["embeddings"]

    def maybe(key, fn):
        if key in sd:
            fn()

    maybe(p + "embeddings.word_embeddings.weight",
          lambda: _set(params, ("embeddings", "word_embeddings"), sd[p + "embeddings.word_embeddings.weight"]))
    maybe(p + "embeddings.position_embeddings.weight",
          lambda: _set(params, ("embeddings", "position_embeddings"), sd[p + "embeddings.position_embeddings.weight"]))
    maybe(p + "embeddings.token_type_embeddings.weight",
          lambda: _set(params, ("embeddings", "token_type_embeddings"), sd[p + "embeddings.token_type_embeddings.weight"]))
    if p + "embeddings.LayerNorm.weight" in sd:
        emb["LayerNorm"] = _ln(sd, p + "embeddings.LayerNorm")
    if p + "embeddings.embed_proj.weight" in sd:
        emb["embed_proj"] = _lin(sd, p + "embeddings.embed_proj")
    if p + "embeddings.linear_video.weight" in sd:
        emb["linear_video"] = _lin(sd, p + "embeddings.linear_video")

    enc = params["encoder"]
    if p + "encoder.rel_embeddings.weight" in sd:
        enc["rel_embeddings"] = np.asarray(sd[p + "encoder.rel_embeddings.weight"])
    if p + "encoder.LayerNorm.weight" in sd:
        enc["LayerNorm"] = _ln(sd, p + "encoder.LayerNorm")
    if p + "encoder.conv.conv.weight" in sd:
        enc["conv"] = {
            "conv": {
                "kernel": np.ascontiguousarray(
                    np.transpose(sd[p + "encoder.conv.conv.weight"], (2, 1, 0))
                ),
                "bias": sd[p + "encoder.conv.conv.bias"],
            },
            "LayerNorm": _ln(sd, p + "encoder.conv.LayerNorm"),
        }

    n_layers = cfg.num_hidden_layers
    have_layers = any(f"{p}encoder.layer.0." in k for k in sd)
    if have_layers:
        layer_trees = []
        for i in range(n_layers):
            lp = f"{p}encoder.layer.{i}."
            # reference stores three separate (h, h) linears
            # (deberta.py:717-730); the TPU model fuses them into one
            # (h, 3h) matmul (models/deberta.py _init_layer) — concat columns
            q, k, v = (_lin(sd, lp + f"attention.self.{n}_proj")
                       for n in ("query", "key", "value"))
            attn_self = {
                "qkv_proj": {
                    "kernel": np.concatenate(
                        [q["kernel"], k["kernel"], v["kernel"]], axis=1),
                    "bias": np.concatenate([q["bias"], k["bias"], v["bias"]]),
                }
            }
            for name in ("pos_key_proj", "pos_query_proj"):
                if lp + f"attention.self.{name}.weight" in sd:
                    attn_self[name] = _lin(sd, lp + f"attention.self.{name}")
            attn_out = {
                "dense": _lin(sd, lp + "attention.output.dense"),
                "LayerNorm": _ln(sd, lp + "attention.output.LayerNorm"),
            }
            if lp + "attention.output.adapter.down.weight" in sd:
                attn_out["adapter"] = {
                    "down": _lin(sd, lp + "attention.output.adapter.down"),
                    "up": _lin(sd, lp + "attention.output.adapter.up"),
                }
            ff_out = {
                "dense": _lin(sd, lp + "output.dense"),
                "LayerNorm": _ln(sd, lp + "output.LayerNorm"),
            }
            if lp + "output.adapter.down.weight" in sd:
                ff_out["adapter"] = {
                    "down": _lin(sd, lp + "output.adapter.down"),
                    "up": _lin(sd, lp + "output.adapter.up"),
                }
            layer_trees.append({
                "attention": {"self": attn_self, "output": attn_out},
                "intermediate": {"dense": _lin(sd, lp + "intermediate.dense")},
                "output": ff_out,
            })
        stacked = _stack_layer_trees(layer_trees)
        _merge_overlay(enc["layers"], stacked)

    # MLM head: FrozenBiLM naming first, stock HF fallback.
    head = params["lm_head"]
    for hp in ("lm_predictions.lm_head", "cls.predictions.transform"):
        if f"{hp}.dense.weight" in sd:
            head["dense"] = _lin(sd, f"{hp}.dense")
            head["LayerNorm"] = _ln(sd, f"{hp}.LayerNorm")
            break
    for bk in ("lm_predictions.lm_head.bias", "cls.predictions.bias"):
        if bk in sd:
            head["bias"] = np.asarray(sd[bk])
            break

    if "answer_embeddings.weight" in sd:
        params.setdefault("answers", {})
        params["answers"]["embeddings"] = np.asarray(sd["answer_embeddings.weight"])
    if "answer_bias" in sd:
        params.setdefault("answers", {})
        params["answers"]["bias"] = np.asarray(sd["answer_bias"])

    _validate_shapes(template, params)
    return params


# ---------------------------------------------------------------------------
# GPT-J / GPT-Neo
# ---------------------------------------------------------------------------


def _gpt_overlay(params: Dict, sd: Dict[str, np.ndarray], n_layers: int,
                 attn_prefix: str, mlp_names, has_wpe: bool) -> Dict:
    template = jax_tree_to_numpy(params)
    params = copy.deepcopy(template)
    p = "transformer."
    if p + "wte.weight" in sd:
        _set(params, ("wte",), sd[p + "wte.weight"])
    if has_wpe and p + "wpe.weight" in sd:
        _set(params, ("wpe",), sd[p + "wpe.weight"])
    if p + "linear_video.weight" in sd:
        params["linear_video"] = _lin(sd, p + "linear_video")
    if p + "ln_f.weight" in sd:
        params["ln_f"] = _ln(sd, p + "ln_f")
    if "lm_head.weight" in sd:
        params["lm_head"] = _lin(sd, "lm_head")

    if any(f"{p}h.0." in k for k in sd):
        trees = []
        for i in range(n_layers):
            lp = f"{p}h.{i}."
            layer = {
                "ln_1": _ln(sd, lp + "ln_1"),
                "attn": {
                    name: _lin(sd, lp + attn_prefix + name)
                    for name in ("q_proj", "k_proj", "v_proj", "out_proj")
                },
                "mlp": {name: _lin(sd, lp + "mlp." + name) for name in mlp_names},
            }
            if lp + "ln_2.weight" in sd:
                layer["ln_2"] = _ln(sd, lp + "ln_2")
            trees.append(layer)
        _merge_overlay(params["layers"], _stack_layer_trees(trees))
    _validate_shapes(template, params)
    return params


def gptj_overlay_from_torch(params: Dict, sd: Dict[str, np.ndarray],
                            cfg: GPTJConfig) -> Dict:
    """HF/FrozenBiLM GPT-J naming: transformer.h.{i}.attn.*_proj (gptj.py)."""
    return _gpt_overlay(params, sd, cfg.num_layers, "attn.",
                        ("fc_in", "fc_out"), has_wpe=False)


def gptneo_overlay_from_torch(params: Dict, sd: Dict[str, np.ndarray],
                              cfg: GPTNeoConfig) -> Dict:
    """GPT-Neo naming: transformer.h.{i}.attn.attention.*_proj (gptneo.py)."""
    return _gpt_overlay(params, sd, cfg.num_layers, "attn.attention.",
                        ("c_fc", "c_proj"), has_wpe=True)


# ---------------------------------------------------------------------------
# BERT
# ---------------------------------------------------------------------------


def bert_overlay_from_torch(
    params: Dict,
    sd: Dict[str, np.ndarray],
    cfg: BertConfig,
) -> Dict:
    """Overlay a torch BERT state dict (FrozenBiLM naming `bert.*`/`cls.*`,
    reference model/bert.py) onto an init-built template."""
    template = jax_tree_to_numpy(params)
    params = copy.deepcopy(template)
    p = "bert."
    emb = params["embeddings"]
    for name in ("word_embeddings", "position_embeddings", "token_type_embeddings"):
        key = f"{p}embeddings.{name}.weight"
        if key in sd:
            _set(params, ("embeddings", name), sd[key])
    if p + "embeddings.LayerNorm.weight" in sd:
        emb["LayerNorm"] = _ln(sd, p + "embeddings.LayerNorm")
    if p + "embeddings.linear_video.weight" in sd:
        emb["linear_video"] = _lin(sd, p + "embeddings.linear_video")

    if any(f"{p}encoder.layer.0." in k for k in sd):
        layer_trees = []
        for i in range(cfg.num_hidden_layers):
            lp = f"{p}encoder.layer.{i}."
            layer_trees.append({
                "attention": {
                    "self": {
                        "query": _lin(sd, lp + "attention.self.query"),
                        "key": _lin(sd, lp + "attention.self.key"),
                        "value": _lin(sd, lp + "attention.self.value"),
                    },
                    "output": {
                        "dense": _lin(sd, lp + "attention.output.dense"),
                        "LayerNorm": _ln(sd, lp + "attention.output.LayerNorm"),
                    },
                },
                "intermediate": {"dense": _lin(sd, lp + "intermediate.dense")},
                "output": {
                    "dense": _lin(sd, lp + "output.dense"),
                    "LayerNorm": _ln(sd, lp + "output.LayerNorm"),
                },
            })
        _merge_overlay(params["encoder"]["layers"], _stack_layer_trees(layer_trees))

    head = params["lm_head"]
    if "cls.predictions.transform.dense.weight" in sd:
        head["dense"] = _lin(sd, "cls.predictions.transform.dense")
        head["LayerNorm"] = _ln(sd, "cls.predictions.transform.LayerNorm")
    if "cls.predictions.bias" in sd:
        head["bias"] = np.asarray(sd["cls.predictions.bias"])

    if "answer_embeddings.weight" in sd:
        params.setdefault("answers", {})
        params["answers"]["embeddings"] = np.asarray(sd["answer_embeddings.weight"])
    if "answer_bias" in sd:
        params.setdefault("answers", {})
        params["answers"]["bias"] = np.asarray(sd["answer_bias"])
    _validate_shapes(template, params)
    return params


def _merge_overlay(dst: Dict, src: Dict) -> None:
    """Recursively overwrite dst leaves with src leaves (src may be sparser)."""
    for k, v in src.items():
        if isinstance(v, dict):
            _merge_overlay(dst.setdefault(k, {}), v)
        else:
            if k in dst and hasattr(dst[k], "shape"):
                if tuple(dst[k].shape) != tuple(np.shape(v)):
                    raise ValueError(
                        f"shape mismatch at {k}: {tuple(dst[k].shape)} vs {tuple(np.shape(v))}"
                    )
            dst[k] = np.asarray(v)


def jax_tree_to_numpy(tree):
    import jax

    return jax.tree.map(lambda x: np.asarray(x), tree)


def numpy_tree_to_jax(tree, dtype=None):
    import jax
    import jax.numpy as jnp

    def conv(x):
        a = jnp.asarray(x)
        if dtype is not None and a.dtype in (jnp.float32, jnp.float64):
            a = a.astype(dtype)
        return a

    return jax.tree.map(conv, tree)


def torch_state_dict_to_numpy(sd) -> Dict[str, np.ndarray]:
    """Detach a torch state dict to float32/int numpy (offline use only)."""
    out = {}
    for k, v in sd.items():
        a = v.detach().cpu()
        if a.dtype.is_floating_point:
            a = a.float()
        out[k] = a.numpy()
    return out


def load_pth_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch .pth checkpoint ({'model': sd} or plain sd) into numpy.

    Reference checkpoints wrap the state dict under 'model'
    (reference main.py:239, 292-300).
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj and isinstance(obj["model"], dict):
        obj = obj["model"]
    # strip the DDP prefix only at the start of the key (a path legitimately
    # containing '.module.' must survive intact)
    sd = {(k[len("module."):] if k.startswith("module.") else k): v
          for k, v in obj.items() if hasattr(v, "detach")}
    return torch_state_dict_to_numpy(sd)
