"""Autoregressive cross-modal pretraining driver (GPT-Neo / GPT-J).

Mirrors reference main_ar.py (train_one_epoch :24, evaluate :101, main :158):
causal LM on WebVid captions with visual prefix tokens; labels are the input
ids verbatim (pads included, matching main_ar.py:62-67 — GPT-2 tokenizers use
pad=eos); video positions get -100 labels inside the model and the shift
happens there too.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from frozenbilm_tpu.config import get_args_parser
from frozenbilm_tpu.data.loader import DataLoader
from frozenbilm_tpu.data.tokenization import (
    encode_batch,
    get_tokenizer,
    parse_length_buckets,
)
from frozenbilm_tpu.data.videotext import build_videotext_dataset, videotext_collate
from frozenbilm_tpu.models import build_model
from frozenbilm_tpu.ops.masking import get_mask
from frozenbilm_tpu.parallel.mesh import (
    MeshSpec,
    init_distributed,
    is_main_process,
    loader_shard_kwargs,
    make_mesh,
    shard_batch,
)
from frozenbilm_tpu.train.optim import make_optimizer, make_schedule, train_key
from frozenbilm_tpu.train.partition import count_params
from frozenbilm_tpu.train.trainer import make_trainer_and_state
from frozenbilm_tpu.utils.checkpoint import load_any_checkpoint, save_params
from frozenbilm_tpu.utils.metrics import MetricLogger


def make_ar_loss_fn(bundle, bundle_remat: bool = False):
    def loss_fn(params, batch, rng):
        out = bundle.forward(
            params, bundle.cfg, bundle.vt,
            batch["input_ids"], batch["attention_mask"],
            batch.get("video"), batch.get("video_mask"),
            labels=batch["input_ids"],  # labels == inputs (main_ar.py:62-67)
            deterministic=rng is None, rng=rng, remat=bundle_remat,
        )
        return out.loss, {}

    return loss_fn


def _device_batch(batch_dict, tokenizer, args, mesh=None):
    enc = encode_batch(tokenizer, batch_dict["text"], args.max_tokens,
                       buckets=parse_length_buckets(args))
    video = jnp.asarray(np.asarray(batch_dict["video"], np.float32))
    video_mask = jnp.asarray(get_mask(jnp.asarray(batch_dict["video_len"]), video.shape[1]))
    db = {
        "input_ids": jnp.asarray(enc["input_ids"]),
        "attention_mask": jnp.asarray(enc["attention_mask"]),
        "video": video,
        "video_mask": video_mask,
    }
    return shard_batch(mesh, db) if mesh is not None else db


def main(args):
    from frozenbilm_tpu.utils.platform import setup_runtime

    setup_runtime(args)
    init_distributed()
    if is_main_process() and args.save_dir:
        os.makedirs(args.save_dir, exist_ok=True)

    tokenizer = get_tokenizer(args)
    ds_train = None if args.eval else build_videotext_dataset("train", args)
    ds_val = build_videotext_dataset("val", args,
                                     features=ds_train.features if ds_train else None)
    loader_val = DataLoader(ds_val, args.batch_size_val, collate_fn=videotext_collate,
                            **loader_shard_kwargs())
    loader_train = None
    if ds_train:
        loader_train = DataLoader(ds_train, args.batch_size, collate_fn=videotext_collate,
                                  shuffle=True, seed=args.seed, drop_last=True,
                                  **loader_shard_kwargs())

    bundle = build_model(args)
    params = bundle.init_params(jax.random.PRNGKey(args.seed))
    base_dir = args.tokenizer_path or os.path.join(
        os.environ.get("TRANSFORMERS_CACHE", ""), args.model_name)
    if os.path.isdir(base_dir):
        try:
            params = load_any_checkpoint(base_dir, params, bundle.cfg, bundle.family)
        except FileNotFoundError:
            if is_main_process():
                print(f"no base weights under {base_dir}; using random init")
    if args.load:
        params = load_any_checkpoint(args.load, params, bundle.cfg, bundle.family)
    params = jax.tree.map(jnp.asarray, params)
    from frozenbilm_tpu.train.partition import (
        apply_param_dtype, reject_quantized_for_training)

    params = apply_param_dtype(params, bundle.vt, args.param_dtype)
    reject_quantized_for_training(params, args.eval)

    mesh = None
    if jax.device_count() > 1:
        n_data = jax.device_count() // max(1, args.mesh_model)
        n_proc = jax.process_count()
        per_host = max(1, n_data // n_proc)
        if args.batch_size % per_host == 0 and args.batch_size_val % per_host == 0:
            mesh = make_mesh(MeshSpec(data=n_data, model=args.mesh_model))
        elif n_proc > 1:
            raise ValueError(
                f"multi-host training requires per-host batch sizes divisible "
                f"by {per_host}")
        elif is_main_process():
            print(f"batch sizes not divisible by data axis {n_data}; "
                  "running unsharded on device 0")

    steps_per_epoch = len(loader_train) if loader_train else 1
    tx = make_optimizer(
        make_schedule(args.lr, steps_per_epoch * args.epochs, args.schedule,
                      args.fraction_warmup_steps),
        beta1=args.beta1, beta2=args.beta2,
        weight_decay=args.weight_decay, clip_max_norm=args.clip_max_norm,
    )
    trainer, state, frozen = make_trainer_and_state(
        make_ar_loss_fn(bundle, bundle_remat=args.remat), tx, params,
        bundle.vt, mesh, fsdp=getattr(args, "mesh_fsdp", False),
        grad_accum=getattr(args, "grad_accum", 1),
        skip_nonfinite=getattr(args, "skip_nonfinite", 0) > 0)
    if is_main_process():
        print("number of trainable params:", count_params(state.trainable))

    def run_eval():
        ml = MetricLogger()
        for batch_dict in ml.log_every(loader_val, args.print_freq, "val:"):
            metrics = trainer.eval_step(
                state, frozen, _device_batch(batch_dict, tokenizer, args, mesh))
            ml.update(loss=float(metrics["loss"]))
        ml.synchronize_between_processes()
        return {k: m.global_avg for k, m in ml.meters.items()}

    if args.eval:
        stats = run_eval()
        if is_main_process():
            print("val:", stats)
        return stats

    log = []
    from frozenbilm_tpu.train.optim import NonfiniteLossPolicy
    from frozenbilm_tpu.utils.checkpoint import ckpt_meta, prune_checkpoints

    for epoch in range(args.start_epoch, args.epochs):
        loader_train.set_epoch(epoch)
        ml = MetricLogger()
        nf_policy = NonfiniteLossPolicy(getattr(args, "skip_nonfinite", 0))
        from frozenbilm_tpu.data.loader import device_prefetch

        # tokenize + H2D one batch ahead (same overlap as tasks/pretrain.py)
        it = device_prefetch(
            iter(loader_train),
            lambda bd: _device_batch(bd, tokenizer, args, mesh))
        for db in ml.log_every(it, args.print_freq, f"Epoch: [{epoch}]",
                               total=len(loader_train)):
            state, metrics = trainer.train_step(
                state, frozen, db,
                train_key(args.seed, getattr(args, "rng_impl", "rbg")))
            loss = float(metrics["loss"])
            if not nf_policy.step(loss, float(metrics["grad_norm"])):
                ml.update(loss=loss)
        if nf_policy.total_skipped and is_main_process():
            print(f"warning: {nf_policy.total_skipped} non-finite step(s) "
                  "dropped this epoch (--skip_nonfinite)")
        entry = {"epoch": epoch, "train_loss": ml.meters["loss"].global_avg}
        if (epoch + 1) % args.eval_skip == 0:
            entry.update({f"val_{k}": v for k, v in run_eval().items()})
            if args.save_dir and is_main_process():
                save_params(os.path.join(args.save_dir, f"checkpoint{epoch:04}"),
                            state.trainable, ckpt_meta(args, epoch=epoch),
                            fmt=args.ckpt_format,
                            block=args.ckpt_format != "orbax")
                prune_checkpoints(args.save_dir,
                                  getattr(args, "keep_ckpts", 0))
        log.append(entry)
        if args.save_dir and is_main_process():
            with open(os.path.join(args.save_dir, "log.txt"), "a") as f:
                f.write(json.dumps(entry) + "\n")
    from frozenbilm_tpu.utils.checkpoint import wait_for_pending_saves

    wait_for_pending_saves()
    return log


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser(parents=[get_args_parser()])
    main(parser.parse_args())
