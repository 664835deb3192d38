"""Cross-modal MLM pretraining driver (WebVid video-caption pairs).

Mirrors reference main.py (train_one_epoch :24, evaluate :100, main :156):
adapters + visual projection (+LayerNorms) train with the 80/10/10 MLM
objective on captions prefixed by visual tokens; validation = MLM loss.
Checkpoints every eval_skip epochs, trainable partition only.

TPU-first: MLM corruption runs inside the jitted train step
(ops/masking.mlm_corrupt); batch is sharded over the mesh 'data' axis.

Run: python -m frozenbilm_tpu.tasks.pretrain --combine_datasets webvid \
       --combine_datasets_val webvid ...
"""

from __future__ import annotations

import json
import os
from typing import Dict

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
from frozenbilm_tpu.train.partition import count_params, merge_params
from frozenbilm_tpu.train.trainer import make_mlm_loss_fn, make_trainer_and_state
from frozenbilm_tpu.utils.checkpoint import load_any_checkpoint, save_params
from frozenbilm_tpu.utils.metrics import MetricLogger


def _device_batch(batch_dict, tokenizer, args, mesh=None):
    enc = encode_batch(tokenizer, batch_dict["text"], args.max_tokens,
                       buckets=parse_length_buckets(args))
    video = np.asarray(batch_dict["video"], np.float32)
    video_mask = np.asarray(get_mask(jnp.asarray(batch_dict["video_len"]), video.shape[1]))
    db = {
        "input_ids": enc["input_ids"],
        "attention_mask": enc["attention_mask"],
        "special_tokens_mask": enc["special_tokens_mask"],
        "video": video,
        "video_mask": video_mask,
    }
    if mesh is not None:
        return shard_batch(mesh, db)
    return {k: jnp.asarray(v) for k, v in db.items()}


def train_one_epoch(state, frozen, trainer, tokenizer, data_loader, epoch, args, mesh,
                    profiler=None, guard=None):
    from frozenbilm_tpu.train.optim import NonfiniteLossPolicy

    metric_logger = MetricLogger()
    nf_policy = NonfiniteLossPolicy(getattr(args, "skip_nonfinite", 0))
    rng = train_key(args.seed, getattr(args, "rng_impl", "rbg"))
    # tokenize + device_put run one batch ahead in a background thread, so
    # the H2D transfer overlaps this step's blocking float(loss) fetch
    from frozenbilm_tpu.data.loader import device_prefetch

    it = device_prefetch(
        iter(data_loader), lambda bd: _device_batch(bd, tokenizer, args, mesh))
    for db in metric_logger.log_every(it, args.print_freq,
                                      f"Epoch: [{epoch}]", total=len(data_loader)):
        if profiler is not None:
            n_tok = int(np.prod(np.asarray(db["input_ids"]).shape))
            with profiler.step(tokens=n_tok):
                state, metrics = trainer.train_step(state, frozen, db, rng)
                jax.block_until_ready(metrics["loss"])
        else:
            state, metrics = trainer.train_step(state, frozen, db, rng)
        loss = float(metrics["loss"])
        if not nf_policy.step(loss, float(metrics["grad_norm"])):
            metric_logger.update(loss=loss)
        if guard is not None and guard.preempted:
            # finish cleanly after the in-flight step; caller saves
            break
    if nf_policy.total_skipped and is_main_process():
        print(f"warning: {nf_policy.total_skipped} non-finite step(s) "
              "dropped this epoch (--skip_nonfinite)")
    metric_logger.synchronize_between_processes()
    if is_main_process():
        print("Averaged stats:", metric_logger)
    stats = {k: m.global_avg for k, m in metric_logger.meters.items()}
    if "loss" in metric_logger.meters:
        stats["steps"] = metric_logger.meters["loss"].count
    return state, stats


def evaluate(state, frozen, trainer, tokenizer, data_loader, args, mesh):
    """Validation MLM loss (reference main.py:100-153)."""
    metric_logger = MetricLogger()
    for batch_dict in metric_logger.log_every(data_loader, args.print_freq, "val:"):
        db = _device_batch(batch_dict, tokenizer, args, mesh)
        metrics = trainer.eval_step(state, frozen, db)
        metric_logger.update(loss=float(metrics["loss"]))
    metric_logger.synchronize_between_processes()
    return {k: m.global_avg for k, m in metric_logger.meters.items()}


def main(args):
    from frozenbilm_tpu.utils.platform import setup_runtime

    setup_runtime(args)
    init_distributed()
    if is_main_process() and args.save_dir:
        os.makedirs(args.save_dir, exist_ok=True)

    tokenizer = get_tokenizer(args)
    ds_train = None
    if not args.eval:
        ds_train = build_videotext_dataset("train", args)
    ds_val = build_videotext_dataset(
        "val", args, features=ds_train.features if ds_train else None)
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
    if not args.scratch and os.path.isdir(base_dir):
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
        n_data = (args.mesh_data if args.mesh_data > 0
                  else jax.device_count() // max(1, args.mesh_model))
        # batch sizes are per-host; global batch = batch_size * process_count
        n_proc = jax.process_count()
        divisible = ((args.batch_size * n_proc) % n_data == 0
                     and (args.batch_size_val * n_proc) % n_data == 0
                     and args.batch_size % max(1, n_data // n_proc) == 0
                     and args.batch_size_val % max(1, n_data // n_proc) == 0)
        if divisible:
            mesh = make_mesh(MeshSpec(data=n_data, model=args.mesh_model))
        elif n_proc > 1:
            # unsynced per-host replicas would silently diverge (the
            # reference bug we fixed, SURVEY.md §2.5) — refuse instead
            raise ValueError(
                f"multi-host training requires per-host batch sizes divisible "
                f"by {max(1, n_data // n_proc)} (data axis {n_data} over "
                f"{n_proc} hosts)")
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
    act_constraint = None
    if getattr(args, "sequence_parallel", False):
        if mesh is None or mesh.shape.get("model", 1) < 2:
            raise ValueError("--sequence_parallel needs a mesh with "
                             "model axis >= 2 (--mesh_model)")
        from frozenbilm_tpu.parallel.sp import sequence_constraint

        act_constraint = sequence_constraint(mesh)
    loss_fn = make_mlm_loss_fn(
        bundle.forward, bundle.cfg, bundle.vt,
        mask_token_id=tokenizer.mask_token_id,
        vocab_size=bundle.cfg.vocab_size,
        pad_token_id=tokenizer.pad_token_id or 0,
        mlm_probability=args.mlm_prob,
        remat=args.remat,
        act_constraint=act_constraint,
    )
    trainer, state, frozen = make_trainer_and_state(
        loss_fn, tx, params, bundle.vt, mesh,
        fsdp=getattr(args, "mesh_fsdp", False),
        grad_accum=getattr(args, "grad_accum", 1),
        skip_nonfinite=getattr(args, "skip_nonfinite", 0) > 0)
    if args.resume and args.load and os.path.isdir(args.load) and \
            os.path.exists(os.path.join(args.load, "opt_state.npz")):
        # restore optimizer state + start epoch (reference main.py:241-243)
        import json as _json

        from frozenbilm_tpu.utils.checkpoint import load_opt_state

        opt_state = load_opt_state(args.load, state.opt_state)
        if mesh is not None:
            from frozenbilm_tpu.parallel.mesh import replicate

            opt_state = replicate(mesh, opt_state)
        else:
            opt_state = jax.tree.map(jnp.asarray, opt_state)
        state = state._replace(opt_state=opt_state)
        with open(os.path.join(args.load, "meta.json")) as f:
            args.start_epoch = int(_json.load(f).get("epoch", -1)) + 1
        if is_main_process():
            print(f"resumed optimizer state; start_epoch={args.start_epoch}")
    if is_main_process():
        print("number of trainable params:", count_params(state.trainable))

    if args.eval:
        stats = evaluate(state, frozen, trainer, tokenizer, loader_val, args, mesh)
        if is_main_process():
            print("val:", stats)
            if args.save_dir:
                with open(os.path.join(args.save_dir, "log_stats.json"), "w") as f:
                    json.dump(stats, f)
        return stats

    profiler = None
    if getattr(args, "profile_dir", ""):
        from frozenbilm_tpu.utils.profiling import StepProfiler

        profiler = StepProfiler(logdir=args.profile_dir, start_step=5, num_steps=3)

    from frozenbilm_tpu.train.preemption import PreemptionGuard

    with PreemptionGuard() as guard:
        log = _train_loop(state, frozen, trainer, tokenizer, loader_train,
                          loader_val, args, mesh, profiler, guard)
    return log


def _train_loop(state, frozen, trainer, tokenizer, loader_train, loader_val,
                args, mesh, profiler, guard):
    from frozenbilm_tpu.train.preemption import save_preempt_checkpoint

    log = []
    for epoch in range(args.start_epoch, args.epochs):
        loader_train.set_epoch(epoch)
        state, train_stats = train_one_epoch(state, frozen, trainer, tokenizer,
                                             loader_train, epoch, args, mesh,
                                             profiler=profiler, guard=guard)
        if guard.preempted:
            path = save_preempt_checkpoint(
                args.save_dir, state, epoch=epoch,
                step=int(train_stats.get("steps", 0)), fmt=args.ckpt_format,
                args=args)
            if is_main_process():
                print(f"SIGTERM: saved preemption checkpoint to {path}; "
                      f"resume with --resume --load {path}")
            return log
        if profiler is not None and epoch == args.start_epoch:
            profiler.close()
            if is_main_process():
                print("profile:", profiler.summary())
        log_entry = {"epoch": epoch, **{f"train_{k}": v for k, v in train_stats.items()}}
        if (epoch + 1) % args.eval_skip == 0:
            val_stats = evaluate(state, frozen, trainer, tokenizer, loader_val, args, mesh)
            log_entry.update({f"val_{k}": v for k, v in val_stats.items()})
            if args.save_dir and is_main_process():
                ckpt_dir = os.path.join(args.save_dir, f"checkpoint{epoch:04}")
                from frozenbilm_tpu.utils.checkpoint import (
                    ckpt_meta, prune_checkpoints, save_opt_state)

                # orbax saves issue async: serialization overlaps the next
                # epoch; wait_for_pending_saves() runs before return/preempt
                save_params(ckpt_dir, state.trainable,
                            ckpt_meta(args, epoch=epoch),
                            fmt=args.ckpt_format,
                            block=args.ckpt_format != "orbax")
                save_opt_state(ckpt_dir, state.opt_state)
                prune_checkpoints(args.save_dir,
                                  getattr(args, "keep_ckpts", 0))
        log.append(log_entry)
        if args.save_dir and is_main_process():
            with open(os.path.join(args.save_dir, "log.txt"), "a") as f:
                f.write(json.dumps(log_entry) + "\n")
    from frozenbilm_tpu.utils.checkpoint import wait_for_pending_saves

    wait_for_pending_saves()
    return log


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser(parents=[get_args_parser()])
    main(parser.parse_args())
