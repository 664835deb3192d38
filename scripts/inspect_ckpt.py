"""Inspect a checkpoint: tree summary, dtypes/shapes, meta, total bytes.

Works on every format load_params understands (params.npz / params_orbax)
plus opt_state.npz. The reference has no equivalent (torch users run
python -c "torch.load(...)"); this is the supported way to answer "what is
in this checkpoint and which run produced it" (meta.json records the full
flag namespace, utils/checkpoint.ckpt_meta).

Usage: python scripts/inspect_ckpt.py <checkpoint_dir> [--leaves]
"""

from __future__ import annotations

import argparse
import json
import os


def _walk(tree, prefix=""):
    if isinstance(tree, dict):
        for k in sorted(tree):
            yield from _walk(tree[k], f"{prefix}/{k}" if prefix else str(k))
    elif tree is not None:
        yield prefix, tree


def main(argv=None):
    import numpy as np

    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("path", help="checkpoint directory")
    parser.add_argument("--leaves", action="store_true",
                        help="print every leaf (path shape dtype), not just "
                             "the summary")
    args = parser.parse_args(argv)

    from frozenbilm_tpu.utils.checkpoint import load_params

    tree, meta = load_params(args.path)
    leaves = list(_walk(tree))
    total = sum(np.asarray(v).nbytes for _, v in leaves)
    by_dtype = {}
    for _, v in leaves:
        d = str(np.asarray(v).dtype)
        by_dtype[d] = by_dtype.get(d, 0) + np.asarray(v).nbytes
    print(f"{args.path}: {len(leaves)} leaves, "
          f"{total / 1e6:.1f} MB ({', '.join(f'{d}: {b / 1e6:.1f} MB' for d, b in sorted(by_dtype.items()))})")
    opt = os.path.join(args.path, "opt_state.npz")
    if os.path.exists(opt):
        with np.load(opt) as z:
            n = len(z.files)
            ob = sum(z[f].nbytes for f in z.files)
        print(f"optimizer state: {n} leaves, {ob / 1e6:.1f} MB")
    if meta:
        shown = {k: v for k, v in meta.items() if k != "args"}
        print("meta:", json.dumps(shown))
        if "args" in meta:
            a = meta["args"]
            keys = ("model_name", "lr", "batch_size", "epochs", "seed",
                    "ckpt_format", "quantize")
            print("run:", json.dumps({k: a[k] for k in keys if k in a}))
    if args.leaves:
        for path, v in leaves:
            v = np.asarray(v)
            print(f"  {path}  {v.shape}  {v.dtype}")


if __name__ == "__main__":
    main()
