"""Open-ended VideoQA driver: zero-shot eval and adapter fine-tuning.

Mirrors reference videoqa.py (train_one_epoch :25, evaluate :116, main :248)
with the same flag surface, metrics and JSON artifacts, rebuilt around jitted
steps on a device mesh:
  - answer scoring at the [MASK] position over the answer-vocab embedding
    module; loss = CE, or soft-label CE for iVQA (÷2 clamp) / VQA (÷3)
    (videoqa.py:68-81)
  - eval: top-1/top-10 acc, per-question-type and with-subtitles breakdowns,
    per-qid predictions dict (videoqa.py:164-243)
  - best-model selection on val acc1, best reloaded before test
    (videoqa.py:425-498)

Run: python -m frozenbilm_tpu.tasks.videoqa --combine_datasets msrvtt \
       --combine_datasets_val msrvtt --eval ...
"""

from __future__ import annotations

import json
import os
import time
from collections import namedtuple
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from frozenbilm_tpu.config import get_args_parser
from frozenbilm_tpu.data.loader import DataLoader
from frozenbilm_tpu.data.tokenization import (
    answers_to_token_ids,
    encode_batch,
    get_tokenizer,
    parse_length_buckets,
    strip_sep_tokens,
)
from frozenbilm_tpu.data.videoqa import build_videoqa_dataset, videoqa_collate
from frozenbilm_tpu.models import ModelBundle, build_model
from frozenbilm_tpu.ops.masking import get_mask
from frozenbilm_tpu.parallel.mesh import (
    fetch_local_rows,
    init_distributed,
    is_main_process,
    loader_shard_kwargs,
)
from frozenbilm_tpu.train.optim import make_optimizer, make_schedule, train_key
from frozenbilm_tpu.train.partition import count_params, merge_params, partition_params
from frozenbilm_tpu.train.trainer import TrainState, make_trainer_and_state
from frozenbilm_tpu.utils.checkpoint import (ckpt_meta, load_any_checkpoint,
                                             load_params, save_params)
from frozenbilm_tpu.utils.metrics import MetricLogger


def mask_logits(logits: jax.Array, input_ids: jax.Array, mask_token_id: int,
                delay: int) -> jax.Array:
    """Answer logits at the (first) [MASK] position of each row.

    Static-shape replacement for the reference's boolean indexing
    `logits[:, delay:delay+T][input_ids == mask_id]` (videoqa.py:164-168),
    which assumes exactly one mask per prompt.
    """
    text_logits = logits[:, delay: delay + input_ids.shape[1]]
    pos = jnp.argmax((input_ids == mask_token_id).astype(jnp.int32), axis=1)
    return jnp.take_along_axis(text_logits, pos[:, None, None], axis=1)[:, 0]


def qa_loss(logits: jax.Array, answer_id: jax.Array, dataset_name: str) -> jax.Array:
    """Classification loss over the answer vocabulary (videoqa.py:68-81)."""
    if dataset_name == "ivqa" or dataset_name == "vqa":
        denom = 2.0 if dataset_name == "ivqa" else 3.0
        a = jnp.clip(answer_id.astype(jnp.float32) / denom, None, 1.0)
        nll = -jax.nn.log_softmax(logits, axis=-1)
        return ((nll * a / jnp.clip(a.sum(1, keepdims=True), 1.0, None)).sum(1)).mean()
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, answer_id[:, None], axis=1).mean()


def make_qa_steps(bundle: ModelBundle, mask_token_id: int, dataset_name: str,
                  topk: int = 10):
    """Jitted (train loss_fn, eval_step) pair for one dataset."""
    cfg, vt = bundle.cfg, bundle.vt
    delay = vt.max_feats if vt.features_dim else 0

    def answer_scores(params, input_ids, attention_mask, video, video_mask,
                      *, deterministic=True, rng=None):
        out = bundle.forward(params, cfg, vt, input_ids, attention_mask,
                             video, video_mask, mlm=False,
                             deterministic=deterministic, rng=rng)
        if bundle.answer_logits is not None:
            # gather the [MASK]-position hidden first; XLA then DCEs the
            # full-position head from forward() (only last_hidden_state used)
            hidden = out.last_hidden_state[:, delay: delay + input_ids.shape[1]]
            pos = jnp.argmax((input_ids == mask_token_id).astype(jnp.int32), axis=1)
            h = jnp.take_along_axis(hidden, pos[:, None, None], axis=1)[:, 0]
            return bundle.answer_logits(params, h)
        return mask_logits(out.logits, input_ids, mask_token_id, delay)

    def loss_fn(params, batch, rng):
        logits = answer_scores(
            params, batch["input_ids"], batch["attention_mask"],
            batch.get("video"), batch.get("video_mask"),
            deterministic=rng is None, rng=rng,
        )
        return qa_loss(logits, batch["answer_id"], dataset_name), {}

    @jax.jit
    def eval_step(params, input_ids, attention_mask, video, video_mask):
        logits = answer_scores(params, input_ids, attention_mask, video, video_mask)
        probs = jax.nn.softmax(logits, axis=-1)
        k = min(topk, probs.shape[-1])
        top_p, top_ids = jax.lax.top_k(probs, k)
        return top_ids, top_p

    return loss_fn, eval_step


def _check_one_mask(input_ids, mask_token_id) -> None:
    """Every prompt must keep exactly one [MASK] after truncation.

    The scoring path locates the mask by argmax, which would silently score
    position 0 if truncation at max_tokens dropped it; the reference's
    boolean indexing (videoqa.py:166) fails loudly instead — so do we.
    """
    if mask_token_id is None:
        return
    counts = (np.asarray(input_ids) == mask_token_id).sum(axis=1)
    if not (counts == 1).all():
        bad = int(np.flatnonzero(counts != 1)[0])
        raise ValueError(
            f"prompt row {bad} has {int(counts[bad])} [MASK] tokens after "
            f"encoding (expected exactly 1); raise --max_tokens or shorten "
            f"the prompt/subtitles")


def _encode(tokenizer, texts, args, *, strip: bool = True):
    """Shared bucketed encode. strip=False on the train path: the reference
    removes [SEP] only in evaluate (videoqa.py:151-155)."""
    batch = encode_batch(tokenizer, texts, args.max_tokens,
                         buckets=parse_length_buckets(args))
    if strip and not args.suffix and not args.use_context:
        batch = strip_sep_tokens(batch, tokenizer.sep_token_id, tokenizer.pad_token_id)
    _check_one_mask(batch["input_ids"], tokenizer.mask_token_id)
    return batch


def _device_batch(batch_dict, encoded):
    video = jnp.asarray(batch_dict["video"])
    video_mask = jnp.asarray(get_mask(jnp.asarray(batch_dict["video_len"]), video.shape[1]))
    return {
        "input_ids": jnp.asarray(encoded["input_ids"]),
        "attention_mask": jnp.asarray(encoded["attention_mask"]),
        "video": video,
        "video_mask": video_mask,
    }


def evaluate(params, bundle, tokenizer, data_loader, dataset_name, args,
             thresholds=(1, 10), split="test", type_map=None, mesh=None):
    """Reference evaluate (videoqa.py:116-246): per-qid result dict + accs.

    With a mesh, eval batches are sharded over the 'data' axis; the last
    batch pads to the axis size and padded rows are dropped host-side (the
    completeness assert below is the reference's gathered-results invariant,
    videoqa.py:216)."""
    _, eval_step = make_qa_steps(bundle, tokenizer.mask_token_id, dataset_name)
    if mesh is not None:
        from frozenbilm_tpu.parallel.mesh import replicate as _replicate

        params = _replicate(mesh, params)
    metric_logger = MetricLogger()
    res: Dict = {}
    soft = dataset_name in ("ivqa", "vqa")

    def _place(batch_dict):
        """Host encode + H2D for one batch; runs in the prefetch thread so
        batch k+1's tokenization/transfer overlaps batch k's device step
        and blocking top-k fetch (same overlap the pretrain loop has)."""
        encoded = _encode(tokenizer, batch_dict["text"], args)
        db = _device_batch(batch_dict, encoded)
        n_real = db["input_ids"].shape[0]
        if mesh is not None:
            from frozenbilm_tpu.parallel.mesh import shard_batch

            n_data = mesh.shape["data"]
            pad = (-n_real) % n_data
            if pad:
                db = {k: jnp.concatenate([v] + [v[-1:]] * pad) for k, v in db.items()}
            db = shard_batch(mesh, db)
        return batch_dict, db, n_real

    from frozenbilm_tpu.data.loader import device_prefetch

    it = device_prefetch(iter(data_loader), _place)
    for batch_dict, db, n_real in metric_logger.log_every(
            it, args.print_freq, f"{split}:", total=len(data_loader)):
        top_ids, _ = eval_step(params, db["input_ids"], db["attention_mask"],
                               db["video"], db["video_mask"])
        top_ids = fetch_local_rows(mesh, top_ids)[:n_real]

        answer_id = batch_dict["answer_id"]
        if soft:
            denom = 2.0 if dataset_name == "ivqa" else 3.0
            gt = np.clip(np.asarray(answer_id, np.float32) / denom, None, 1.0)
        else:
            gt = np.asarray(answer_id)

        agree = {}
        for x in thresholds:
            if not soft:
                agree[x] = top_ids[:, :x] == gt[:, None]
            else:
                hit = np.zeros(len(top_ids))
                for i in range(len(top_ids)):
                    hit[i] = gt[i][top_ids[i, :x]].max() if gt[i].size else 0.0
                agree[x] = hit

        subs = batch_dict.get("sub", [0] * len(batch_dict["qid"]))
        for i, qid in enumerate(batch_dict["qid"]):
            entry = {
                "pred": top_ids[i].tolist(),
                "gt": gt[i].tolist() if soft else int(gt[i]),
                "type": int(batch_dict["type"][i]),
                "sub": bool(subs[i]),
            }
            for x in thresholds:
                entry[f"acc{x}"] = float(np.sum(agree[x][i]))
            res[qid] = entry
        metric_logger.update(acc=float(np.mean(agree[1].astype(np.float32))))

    from frozenbilm_tpu.parallel.mesh import host_gather_results

    results = host_gather_results(res)
    assert len(results) == len(data_loader.dataset)
    out = {f"acc{x}": sum(r[f"acc{x}"] for r in results.values()) / len(results)
           for x in thresholds}
    if type_map is not None and len(type_map) > 1:
        for t, name in type_map.items():
            of_type = [r for r in results.values() if r["type"] == t]
            if of_type:
                out[name] = sum(r["acc1"] for r in of_type) / len(of_type)
    n_sub = sum(1 for r in results.values() if r["sub"])
    if n_sub:
        out["acc_sub"] = sum(r["acc1"] for r in results.values() if r["sub"]) / n_sub
    if is_main_process():
        print(dataset_name)
        for x in thresholds:
            print(f"{split} acc{x}: {out[f'acc{x}']: .2%}")
    return results, out


def train_one_epoch(state: TrainState, frozen, trainer, tokenizer, data_loader,
                    epoch, dataset_name, args, rng, guard=None):
    from frozenbilm_tpu.train.optim import NonfiniteLossPolicy

    metric_logger = MetricLogger()
    nf_policy = NonfiniteLossPolicy(getattr(args, "skip_nonfinite", 0))
    header = f"Epoch: [{epoch}]"

    def _place(batch_dict):
        encoded = _encode(tokenizer, batch_dict["text"], args, strip=False)
        db = _device_batch(batch_dict, encoded)
        db["answer_id"] = jnp.asarray(batch_dict["answer_id"])
        if trainer.mesh is not None:
            from frozenbilm_tpu.parallel.mesh import shard_batch

            db = shard_batch(trainer.mesh, db)
        return db

    from frozenbilm_tpu.data.loader import device_prefetch

    it = device_prefetch(iter(data_loader), _place)
    for db in metric_logger.log_every(it, args.print_freq, header,
                                      total=len(data_loader)):
        state, metrics = trainer.train_step(state, frozen, db, rng)
        loss = float(metrics["loss"])
        if not nf_policy.step(loss, float(metrics["grad_norm"])):
            metric_logger.update(loss=loss)
        if guard is not None and guard.preempted:
            break
    if nf_policy.total_skipped and is_main_process():
        print(f"warning: {nf_policy.total_skipped} non-finite step(s) "
              "dropped this epoch (--skip_nonfinite)")
    metric_logger.synchronize_between_processes()
    if is_main_process():
        print("Averaged stats:", metric_logger)
    return state, {k: m.global_avg for k, m in metric_logger.meters.items()}


def _calibrate_static_scales(params, bundle, tokenizer, item, args):
    """--quantize w8a8_static: run the first val batch(es) EAGERLY through
    the quantized eval step, record per-site activation abs-max
    (ops/quant.calibration), and freeze static scales into the tree —
    killing the per-row dynamic amax/rescale on every subsequent batch.
    Sites never exercised stay dynamic (safe fallback).

    The eager pass runs on the HOST CPU backend when one is available:
    activation statistics are device-independent, and an eager (disable_jit)
    0.9B forward over the remote-TPU tunnel is thousands of individually
    dispatched ops plus a blocking host fetch per linear site — minutes per
    batch, easily longer than the eval it is meant to speed up. One tree
    transfer + a CPU forward is the cheap equivalent.
    """
    from frozenbilm_tpu.ops.quant import apply_act_scales, calibration

    _, eval_step = make_qa_steps(bundle, tokenizer.mask_token_id,
                                 item.dataset_name)
    cal_params, cpu = params, None
    try:
        cpu = jax.local_devices(backend="cpu")[0]
        if params is not None and jax.tree.leaves(params):
            first = jax.tree.leaves(params)[0]
            on_cpu = getattr(first, "devices", lambda: set())() == {cpu}
        else:
            on_cpu = False
        if not on_cpu:
            cal_params = jax.device_put(params, cpu)
    except RuntimeError:  # no cpu backend registered: calibrate in place
        cpu = None
    stats: Dict = {}
    n = max(1, args.quant_calibration_batches)
    import contextlib

    dev_ctx = jax.default_device(cpu) if cpu is not None else contextlib.nullcontext()
    with calibration(stats), jax.disable_jit(), dev_ctx:
        for i, batch_dict in enumerate(item.loader_val):
            if i >= n:
                break
            encoded = _encode(tokenizer, batch_dict["text"], args)
            db = _device_batch(batch_dict, encoded)
            if cpu is not None:
                db = jax.device_put(db, cpu)
            eval_step(cal_params, db["input_ids"], db["attention_mask"],
                      db["video"], db["video_mask"])
    if is_main_process():
        print(f"w8a8_static: calibrated {len(stats)} site groups "
              f"over {n} batch(es)"
              + (" on host cpu" if cpu is not None else ""))
    return apply_act_scales(params, stats)


def main(args):
    if args.quantize != "none" and not args.eval:
        raise ValueError("--quantize is inference-only; combine with --eval")
    from frozenbilm_tpu.utils.platform import setup_runtime

    setup_runtime(args)
    init_distributed()
    if is_main_process() and args.save_dir:
        os.makedirs(args.save_dir, exist_ok=True)
        print(args)

    tokenizer = get_tokenizer(args)
    nt = namedtuple("data", ["dataset_name", "loader_test", "loader_val",
                             "loader_train", "dataset_test"])

    tuples = []
    for dset_name in args.combine_datasets_val:
        split_test = "val" if (args.eval and not args.test) else "test"
        ds_test = build_videoqa_dataset(dset_name, split_test, args, tokenizer.mask_token)
        loader_test = DataLoader(ds_test, args.batch_size_val, collate_fn=videoqa_collate,
                                 **loader_shard_kwargs())
        ds_val = build_videoqa_dataset(dset_name, "val", args, tokenizer.mask_token,
                                       features=ds_test.features)
        loader_val = DataLoader(ds_val, args.batch_size_val, collate_fn=videoqa_collate,
                                **loader_shard_kwargs())
        loader_train = None
        if not args.eval:
            ds_train = build_videoqa_dataset(dset_name, "train", args, tokenizer.mask_token,
                                             features=ds_test.features)
            # drop_last keeps every train batch mesh-divisible
            loader_train = DataLoader(ds_train, args.batch_size, collate_fn=videoqa_collate,
                                      shuffle=True, seed=args.seed,
                                      drop_last=len(ds_train) > args.batch_size,
                                      **loader_shard_kwargs())
        tuples.append(nt(dset_name, loader_test, loader_val, loader_train, ds_test))

    args.n_ans = len(tuples[-1].dataset_test.a2id)
    bundle = build_model(args)
    params = bundle.init_params(jax.random.PRNGKey(args.seed))

    # base LM weights, then (optionally) a FrozenBiLM checkpoint on top
    base_dir = args.tokenizer_path or os.path.join(
        os.environ.get("TRANSFORMERS_CACHE", ""), args.model_name)
    if not args.scratch and os.path.isdir(base_dir):
        from frozenbilm_tpu.utils.checkpoint import load_any_checkpoint as _load

        try:
            params = _load(base_dir, params, bundle.cfg, bundle.family)
        except FileNotFoundError:
            if is_main_process():
                print(f"no base weights under {base_dir}; using random init")
    if args.load:
        if is_main_process():
            print("loading from", args.load)
        params = load_any_checkpoint(args.load, params, bundle.cfg, bundle.family)
    params = jax.tree.map(jnp.asarray, params)
    from frozenbilm_tpu.train.partition import (
        apply_param_dtype, apply_quantization, reject_quantized_for_training)

    params = apply_param_dtype(params, bundle.vt, args.param_dtype)
    reject_quantized_for_training(params, args.eval)
    if args.quantize != "none":
        if not args.eval:
            raise ValueError("--quantize is inference-only; combine with --eval")
        params = apply_quantization(params, bundle.vt, args.quantize,
                                    calibrates=True)

    mesh = None
    if jax.device_count() > 1:
        from frozenbilm_tpu.parallel.mesh import MeshSpec, make_mesh

        n_data = (args.mesh_data if args.mesh_data > 0
                  else jax.device_count() // max(1, args.mesh_model))
        mesh = make_mesh(MeshSpec(data=n_data, model=args.mesh_model))

    tx = None
    log_stats = []
    calibrated = False
    for item in tuples:
        a2id = item.dataset_test.a2id
        answers = [a for a, _ in sorted(a2id.items(), key=lambda kv: kv[1])]
        a2tok = answers_to_token_ids(tokenizer, answers, args.max_atokens)
        params = bundle.set_answer_embeddings(params, a2tok)
        if args.quantize == "w8a8_static" and not calibrated:
            params = _calibrate_static_scales(params, bundle, tokenizer,
                                              item, args)
            calibrated = True

        if not args.eval:
            steps_per_epoch = len(item.loader_train)
            tx = make_optimizer(
                make_schedule(args.lr, steps_per_epoch * args.epochs, args.schedule,
                              args.fraction_warmup_steps),
                beta1=args.beta1, beta2=args.beta2,
                weight_decay=args.weight_decay, clip_max_norm=args.clip_max_norm,
            )
            loss_fn, _ = make_qa_steps(bundle, tokenizer.mask_token_id, item.dataset_name)
            n_proc = jax.process_count()
            train_mesh = mesh if (mesh is not None and
                                  args.batch_size % max(
                                      1, mesh.shape["data"] // n_proc) == 0) else None
            if n_proc > 1 and train_mesh is None:
                raise ValueError(
                    "multi-host training requires a mesh-divisible per-host "
                    f"batch size (got {args.batch_size})")
            trainer, state, frozen = make_trainer_and_state(
                loss_fn, tx, params, bundle.vt, train_mesh,
                fsdp=getattr(args, "mesh_fsdp", False),
                grad_accum=getattr(args, "grad_accum", 1),
                skip_nonfinite=getattr(args, "skip_nonfinite", 0) > 0)
            if args.resume and args.load and os.path.isdir(args.load) and \
                    os.path.exists(os.path.join(args.load, "opt_state.npz")):
                from frozenbilm_tpu.utils.checkpoint import load_opt_state

                opt_state = load_opt_state(args.load, state.opt_state)
                if train_mesh is not None:
                    from frozenbilm_tpu.parallel.mesh import replicate as _rep

                    opt_state = _rep(train_mesh, opt_state)
                else:
                    opt_state = jax.tree.map(jnp.asarray, opt_state)
                state = state._replace(opt_state=opt_state)
                meta_path = os.path.join(args.load, "meta.json")
                if os.path.exists(meta_path):
                    args.start_epoch = int(json.load(open(meta_path)).get("epoch", -1)) + 1
                if is_main_process():
                    print(f"resumed optimizer; start_epoch={args.start_epoch}")
            if is_main_process():
                print("number of params:", count_params(state.trainable))
            rng = train_key(args.seed, getattr(args, "rng_impl", "rbg"))
            best_acc, best_epoch = 0.0, args.start_epoch
            from frozenbilm_tpu.train.preemption import (
                PreemptionGuard,
                save_preempt_checkpoint,
            )

            preempted = False
            # context manager (not manual __enter__): the SIGTERM handler is
            # restored even if an epoch raises (nonfinite abort, eval error)
            with PreemptionGuard() as guard:
                for epoch in range(args.start_epoch, args.epochs):
                    item.loader_train.set_epoch(epoch)
                    state, train_stats = train_one_epoch(
                        state, frozen, trainer, tokenizer, item.loader_train,
                        epoch, item.dataset_name, args, rng, guard=guard)
                    if guard.preempted:
                        path = save_preempt_checkpoint(
                            args.save_dir, state, epoch=epoch, step=-1,
                            fmt=args.ckpt_format, args=args)
                        if is_main_process():
                            print(f"SIGTERM: saved preemption checkpoint to "
                                  f"{path}; resume with --resume --load {path}")
                        preempted = True
                        break
                    if (epoch + 1) % args.eval_skip == 0:
                        cur = merge_params(state.trainable, frozen)
                        _, out = evaluate(cur, bundle, tokenizer,
                                          item.loader_val,
                                          item.dataset_name, args, split="val",
                                          type_map=item.dataset_test.type_map,
                                          mesh=mesh)
                        if args.save_dir and out["acc1"] > best_acc:
                            best_acc, best_epoch = out["acc1"], epoch
                            if is_main_process():
                                save_params(
                                    os.path.join(args.save_dir, "best_model"),
                                    state.trainable,
                                    ckpt_meta(args, epoch=epoch,
                                              acc1=out["acc1"]),
                                    fmt=args.ckpt_format,
                                )
                        log_stats.append({"epoch": epoch, **{f"val_{k}": v for k, v in out.items()}})
                    if args.save_dir and is_main_process():
                        ckpt_dir = os.path.join(args.save_dir, "ckpt")
                        save_params(ckpt_dir, state.trainable,
                                    ckpt_meta(args, epoch=epoch),
                                    fmt=args.ckpt_format,
                                    block=args.ckpt_format != "orbax")
                        from frozenbilm_tpu.utils.checkpoint import save_opt_state

                        save_opt_state(ckpt_dir, state.opt_state)
            if preempted:
                return
            from frozenbilm_tpu.utils.checkpoint import wait_for_pending_saves

            wait_for_pending_saves()  # rolling-ckpt async save must land
            # reload best before final test (videoqa.py:489-498)
            if args.save_dir and os.path.isdir(os.path.join(args.save_dir, "best_model")):
                best, _ = load_params(os.path.join(args.save_dir, "best_model"))
                from frozenbilm_tpu.utils.checkpoint import overlay_into

                params = jax.tree.map(
                    jnp.asarray,
                    overlay_into(merge_params(state.trainable, frozen), best))
            else:
                params = merge_params(state.trainable, frozen)

        results, out = evaluate(params, bundle, tokenizer, item.loader_test,
                                item.dataset_name, args,
                                split="val" if (args.eval and not args.test) else "test",
                                type_map=item.dataset_test.type_map, mesh=mesh)
        if args.save_dir and is_main_process():
            with open(os.path.join(args.save_dir, f"{item.dataset_name}.json"), "w") as f:
                json.dump(results, f)
            with open(os.path.join(args.save_dir, f"{item.dataset_name}summary.json"), "w") as f:
                json.dump(out, f)
        log_stats.append({item.dataset_name: out})

    if args.save_dir and is_main_process():
        with open(os.path.join(args.save_dir, "log_stats.json"), "w") as f:
            json.dump(log_stats, f)
    return log_stats


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser(parents=[get_args_parser()])
    main(parser.parse_args())
