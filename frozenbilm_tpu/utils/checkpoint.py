"""Checkpointing: native msgpack-free numpy archives + torch .pth import.

Reference cadence (SURVEY.md §5.4): rank-0 saves {"model", "optimizer",
"epoch", "args"} every eval_skip epochs + best_model on val acc1. Our native
format keeps the *trainable partition only* (+ answer module) — the frozen
backbone is restored from the base-model store, matching the released 114MB
downstream ckpts vs 3.7GB full ones (README.md:105-115).

Native format: a directory with
  params.npz   — flattened {path -> array}
  meta.json    — step/epoch/args + tree manifest
Optimizer state is saved the same way under opt/.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

_SEP = "::"
_BF16_TAG = "::__bf16"
try:
    import ml_dtypes

    _BF16 = np.dtype(ml_dtypes.bfloat16)
except ImportError:  # pragma: no cover - ml_dtypes ships with jax
    _BF16 = None


def _flatten(tree: Dict, prefix=()) -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (str(k),)))
    elif tree is None:
        pass
    else:
        out[_SEP.join(prefix)] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict:
    tree: Dict = {}
    for key, val in flat.items():
        node = tree
        parts = key.split(_SEP)
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


_ASYNC_CKPT = None


def _async_checkpointer():
    global _ASYNC_CKPT
    if _ASYNC_CKPT is None:
        import orbax.checkpoint as ocp

        _ASYNC_CKPT = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC_CKPT


def wait_for_pending_saves() -> None:
    """Block until every async orbax save issued so far is durable. Call
    before process exit (and before reading a just-written checkpoint)."""
    if _ASYNC_CKPT is not None:
        _ASYNC_CKPT.wait_until_finished()


def _npz_encode(flat: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """npz has no bfloat16: store such leaves as uint16 bit patterns with a
    key tag (raw np.savez silently round-trips them as void '|V2')."""
    out = {}
    for k, v in flat.items():
        if v.dtype == _BF16:
            out[k + _BF16_TAG] = v.view(np.uint16)
        else:
            out[k] = v
    return out


def _npz_decode(z) -> Dict[str, np.ndarray]:
    flat = {}
    for k in z.files:
        if k.endswith(_BF16_TAG):
            flat[k[: -len(_BF16_TAG)]] = z[k].view(_BF16)
        else:
            flat[k] = z[k]
    return flat


def save_params(path: str, tree: Dict, meta: Optional[Dict[str, Any]] = None,
                fmt: str = "npz", block: bool = True) -> None:
    """Save a (possibly partitioned, None-pruned) param tree.

    fmt="npz": one flat .npz — simple, portable, the default.
    fmt="orbax": orbax PyTree checkpoint (--ckpt_format orbax) — the
    production option: per-leaf OCDBT storage with sharding metadata,
    suited to multi-host and very large trees.

    block=False (orbax only): issue the save on orbax's AsyncCheckpointer —
    device arrays are snapshotted, serialization overlaps subsequent train
    steps. The write is durable only after wait_for_pending_saves().
    """
    os.makedirs(path, exist_ok=True)
    if fmt == "orbax":
        import shutil

        import orbax.checkpoint as ocp

        target = os.path.abspath(os.path.join(path, "params_orbax"))
        wait_for_pending_saves()  # a pending save may still hold `target`
        if os.path.exists(target):  # mirror np.savez overwrite semantics
            shutil.rmtree(target)
        # prune None leaves (frozen/trainable partitions) into a plain dict
        pruned = _unflatten(_flatten(tree))
        if block:
            ocp.PyTreeCheckpointer().save(target, pruned)
        else:
            _async_checkpointer().save(target, pruned)
    elif fmt == "npz":
        np.savez(os.path.join(path, "params.npz"), **_npz_encode(_flatten(tree)))
    else:
        raise ValueError(f"unknown checkpoint format {fmt!r}")
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta or {}, f, default=str)


def load_params(path: str) -> Tuple[Dict, Dict]:
    """Load save_params output; the format is auto-detected."""
    wait_for_pending_saves()  # the dir may belong to an in-flight async save
    npz_path = os.path.join(path, "params.npz")
    orbax_path = os.path.join(path, "params_orbax")
    if os.path.exists(npz_path):
        with np.load(npz_path) as z:
            tree = _unflatten(_npz_decode(z))
    elif os.path.exists(orbax_path):
        import orbax.checkpoint as ocp

        tree = ocp.PyTreeCheckpointer().restore(os.path.abspath(orbax_path))
    else:
        raise FileNotFoundError(f"no params.npz or params_orbax under {path}")
    meta = {}
    meta_path = os.path.join(path, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return tree, meta


def ckpt_meta(args, **extra) -> Dict[str, Any]:
    """Checkpoint metadata: epoch/metrics plus the full flag namespace,
    mirroring the reference's torch.save({'args': args, ...})
    (main.py:292-300) so a checkpoint records how it was produced.
    args=None omits the namespace. Non-JSON values are stringified at dump
    time (default=str)."""
    if args is None:
        return dict(extra)
    return {**extra, "args": dict(sorted(vars(args).items()))}


def prune_checkpoints(save_dir: str, keep: int) -> None:
    """Retention policy: keep only the newest `keep` epoch-numbered
    checkpointNNNN dirs under save_dir (--keep_ckpts). best_model, the
    rolling ckpt dir, and checkpoint_preempt are never touched. keep<=0
    keeps everything (the reference's behavior — it never prunes)."""
    if keep <= 0 or not os.path.isdir(save_dir):
        return
    import re
    import shutil

    pat = re.compile(r"^checkpoint(\d{4})$")
    numbered = sorted(e for e in os.listdir(save_dir) if pat.match(e))
    if len(numbered) <= keep:
        return
    # No drain needed: save_params serializes async saves (each new save
    # waits out the previous), so only the NEWEST numbered dir can be
    # in flight — and keep >= 1 guarantees it is never pruned.
    for name in numbered[:-keep]:
        shutil.rmtree(os.path.join(save_dir, name))


def save_opt_state(path: str, opt_state) -> None:
    """Save an optax state pytree (arbitrary namedtuples) by leaf index."""
    import jax

    os.makedirs(path, exist_ok=True)
    leaves = jax.tree.leaves(opt_state)
    np.savez(os.path.join(path, "opt_state.npz"), **_npz_encode(
        {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}))


def load_opt_state(path: str, template):
    """Restore an optax state using `template` (e.g. tx.init(params)) for
    the tree structure — the analogue of optimizer.load_state_dict
    (reference main.py:241-243)."""
    import jax

    with np.load(os.path.join(path, "opt_state.npz")) as z:
        flat = _npz_decode(z)
    leaves = [flat[f"leaf_{i}"] for i in range(len(flat))]
    treedef = jax.tree.structure(template)
    return jax.tree.unflatten(treedef, leaves)


def overlay_into(template: Dict, loaded: Dict) -> Dict:
    """strict=False load: overwrite template leaves present in `loaded`."""
    import copy

    out = copy.deepcopy(template)

    def rec(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                if "kernel_q" in v:
                    # pre-quantized linear (scripts/convert.py --quantize):
                    # replace the node wholesale so the template's full-
                    # precision 'kernel' doesn't linger next to 'kernel_q'
                    dst[k] = dict(v)
                else:
                    rec(dst.setdefault(k, {}), v)
            else:
                dst[k] = v

    rec(out, loaded)
    return out


def load_any_checkpoint(path: str, template: Dict, cfg, family: str) -> Dict:
    """Load a checkpoint into a parameter template.

    Accepts: our native dir (params.npz), a torch .pth (released FrozenBiLM
    checkpoints, reference main.py:236-240 strict=False), or an HF pretrained
    dir (pytorch_model.bin / model.safetensors).
    """
    from frozenbilm_tpu.utils.hf_import import (
        bert_overlay_from_torch,
        deberta_overlay_from_torch,
        load_pth_state_dict,
    )

    if os.path.isdir(path):
        if (os.path.exists(os.path.join(path, "params.npz"))
                or os.path.exists(os.path.join(path, "params_orbax"))):
            loaded, _ = load_params(path)
            return overlay_into(template, loaded)
        for name in ("pytorch_model.bin", "model.safetensors"):
            p = os.path.join(path, name)
            if os.path.exists(p):
                sd = _read_hf_weights(p)
                return _overlay_family(template, sd, cfg, family)
        if os.path.exists(os.path.join(path, "meta.json")):
            # meta/opt_state are written before an async orbax param save is
            # durable; a crash in that window leaves this marker without
            # params — point the user at the previous intact checkpoint
            raise FileNotFoundError(
                f"incomplete checkpoint at {path}: meta.json exists but no "
                "params (process likely died mid-save); load an earlier "
                "checkpoint")
        raise FileNotFoundError(f"no checkpoint found under {path}")
    if path.endswith((".pth", ".pt", ".bin")):
        sd = load_pth_state_dict(path)
        return _overlay_family(template, sd, cfg, family)
    raise FileNotFoundError(path)


def _read_hf_weights(p: str) -> Dict[str, np.ndarray]:
    from frozenbilm_tpu.utils.hf_import import load_pth_state_dict

    if p.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(p)
    return load_pth_state_dict(p)


def _overlay_family(template, sd, cfg, family: str):
    from frozenbilm_tpu.utils import hf_import

    if family == "deberta":
        return hf_import.deberta_overlay_from_torch(template, sd, cfg)
    if family == "bert":
        return hf_import.bert_overlay_from_torch(template, sd, cfg)
    if family == "gptneo":
        return hf_import.gptneo_overlay_from_torch(template, sd, cfg)
    if family == "gptj":
        return hf_import.gptj_overlay_from_torch(template, sd, cfg)
    raise NotImplementedError(family)
