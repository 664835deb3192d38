"""Multiple-choice VideoQA driver (How2QA 4 candidates / TVQA 5).

Mirrors reference mc.py (train :25, evaluate :125, main :234):
  - n_ans=2 answer module built from {Yes, No} tokens (mc.py:252, 280-305)
  - candidate prompt "Question: … Is it '<ai>'? [MASK]"; score =
    softmax(mask logits)[:, 0] = P(Yes) (mc.py:49-72, 150-172)
  - train loss = balanced BCE over positive/negative candidates (mc.py:75-92)
  - prediction = argmax over candidates; hidden test sets (answer_id == -1)
    dump {qid: pred} only (mc.py:173-207)

TPU-first: the reference runs one full forward per candidate (mc x per
batch); we fold the candidate loop into ONE batched forward of shape
(B*mc, L) — video tiled per candidate — so the MXU sees a single large
matmul stream and XLA compiles one program. Batches are batch-major
(B, mc, L) so the leading axis shards over the mesh 'data' axis like every
other driver (multi-device and multi-host).
"""

from __future__ import annotations

import json
import os
from collections import namedtuple
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from frozenbilm_tpu.config import get_args_parser
from frozenbilm_tpu.data.loader import DataLoader
from frozenbilm_tpu.data.mc import build_mc_dataset, mc_collate
from frozenbilm_tpu.data.tokenization import (
    answers_to_token_ids,
    encode_batch,
    get_tokenizer,
    parse_length_buckets,
)
from frozenbilm_tpu.models import ModelBundle, build_model
from frozenbilm_tpu.ops.masking import get_mask
from frozenbilm_tpu.parallel.mesh import (
    MeshSpec,
    fetch_local_rows,
    host_gather_results,
    init_distributed,
    is_main_process,
    loader_shard_kwargs,
    make_mesh,
    replicate,
    shard_batch,
)
from frozenbilm_tpu.tasks.videoqa import mask_logits
from frozenbilm_tpu.train.optim import make_optimizer, make_schedule, train_key
from frozenbilm_tpu.train.partition import merge_params
from frozenbilm_tpu.train.trainer import make_trainer_and_state
from frozenbilm_tpu.utils.checkpoint import load_any_checkpoint, load_params, save_params
from frozenbilm_tpu.utils.metrics import MetricLogger

MC_TYPE_MAPS = {"how2qa": None, "tvqa": None}


def make_mc_steps(bundle: ModelBundle, mask_token_id: int, n_cand: int,
                  act_constraint=None):
    """Jitted candidate-batched steps. Inputs are batch-major:
    input_ids (B, mc, L) flattened to (B*mc, L); video repeated per
    candidate. The leading B axis is the mesh 'data' sharding axis.

    act_constraint: sequence-parallel activation constraint
    (parallel/sp.sequence_constraint) — worthwhile at this driver's L=512
    reference shape (README.md:211), where per-chip activation HBM binds
    before weights do. Encoder (DeBERTa/BERT) forwards only."""
    cfg, vt = bundle.cfg, bundle.vt
    delay = vt.max_feats if vt.features_dim else 0
    fwd_kw = {}
    if act_constraint is not None:
        if bundle.forward.__name__ not in ("deberta_forward", "bert_forward"):
            raise ValueError("--sequence_parallel requires the DeBERTa/BERT "
                             f"family, got {bundle.forward.__name__}")
        fwd_kw["act_constraint"] = act_constraint

    def yes_prob(params, input_ids, attention_mask, video, video_mask,
                 *, deterministic=True, rng=None):
        B, mc, L = input_ids.shape
        flat_ids = input_ids.reshape(B * mc, L)
        flat_am = attention_mask.reshape(B * mc, L)
        video_t = jnp.repeat(video, mc, axis=0)
        vmask_t = jnp.repeat(video_mask, mc, axis=0)
        out = bundle.forward(params, cfg, vt, flat_ids, flat_am, video_t, vmask_t,
                             mlm=False, deterministic=deterministic, rng=rng,
                             **fwd_kw)
        if bundle.answer_logits is not None:
            hidden = out.last_hidden_state[:, delay: delay + L]
            pos = jnp.argmax((flat_ids == mask_token_id).astype(jnp.int32), axis=1)
            h = jnp.take_along_axis(hidden, pos[:, None, None], axis=1)[:, 0]
            logits = bundle.answer_logits(params, h)
        else:
            logits = mask_logits(out.logits, flat_ids, mask_token_id, delay)
        p_yes = jax.nn.softmax(logits, axis=-1)[:, 0]
        return p_yes.reshape(B, mc)

    def loss_fn(params, batch, rng):
        # train under dropout like the reference (mc.py:35 model.train(),
        # adapter dropout args.dropout=0.1): thread the step rng into the
        # forward exactly as tasks/videoqa.py does
        probs = yes_prob(params, batch["input_ids"], batch["attention_mask"],
                         batch["video"], batch["video_mask"],
                         deterministic=rng is None, rng=rng)
        return balanced_bce(probs, batch["answer_id"], n_cand), {}

    eval_step = jax.jit(yes_prob)
    return loss_fn, eval_step


def balanced_bce(probs: jax.Array, gt: jax.Array, n_cand: int) -> jax.Array:
    """Balanced positive/negative BCE over P(Yes) (reference mc.py:75-92)."""
    probs_c = jnp.clip(probs, 1e-7, 1 - 1e-7)
    if n_cand > 1:
        pos = jnp.take_along_axis(probs_c, gt[:, None], axis=1)[:, 0]
        pos_loss = -jnp.log(pos).mean()
        neg_mask = jnp.ones_like(probs_c).at[jnp.arange(len(gt)), gt].set(0.0)
        neg_loss = -(jnp.log(1 - probs_c) * neg_mask).sum() / neg_mask.sum()
        return (pos_loss + neg_loss) / 2
    g = gt.astype(jnp.float32)
    return -(g * jnp.log(probs_c[:, 0]) + (1 - g) * jnp.log(1 - probs_c[:, 0])).mean()


def _encode_candidates(tokenizer, texts, args):
    """texts: candidate-major list (mc) of lists (B) as collated
    (mc_collate transposes like the reference, mc_dataset.py:142-144).
    One tokenizer pass; returns batch-major (B, mc, L) arrays."""
    mc = len(texts)
    B = len(texts[0])
    flat = [t for cand in texts for t in cand]
    enc = encode_batch(tokenizer, flat, args.max_tokens,
                       buckets=parse_length_buckets(args))
    from frozenbilm_tpu.tasks.videoqa import _check_one_mask

    _check_one_mask(enc["input_ids"], tokenizer.mask_token_id)
    L = enc["input_ids"].shape[1]
    return (enc["input_ids"].reshape(mc, B, L).swapaxes(0, 1),
            enc["attention_mask"].reshape(mc, B, L).swapaxes(0, 1))


def _device_batch(batch_dict, tokenizer, args):
    ids, am = _encode_candidates(tokenizer, batch_dict["text"], args)
    video = jnp.asarray(batch_dict["video"])
    video_mask = jnp.asarray(get_mask(jnp.asarray(batch_dict["video_len"]), video.shape[1]))
    return {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.asarray(am),
        "video": video,
        "video_mask": video_mask,
    }


def evaluate(params, bundle, tokenizer, data_loader, dataset_name, args,
             split="test", type_map=None, mesh=None):
    act_constraint = None
    if getattr(args, "sequence_parallel", False):
        if mesh is None or mesh.shape.get("model", 1) < 2:
            raise ValueError("--sequence_parallel needs a mesh with "
                             "model axis >= 2 (--mesh_model)")
        from frozenbilm_tpu.parallel.sp import sequence_constraint

        act_constraint = sequence_constraint(mesh)
    _, eval_step = make_mc_steps(bundle, tokenizer.mask_token_id,
                                 data_loader.dataset.mc,
                                 act_constraint=act_constraint)
    if mesh is not None:
        params = replicate(mesh, params)
    metric_logger = MetricLogger()
    res: Dict = {}
    def _place(batch_dict):
        """Host tokenize (B*mc prompts) + H2D in the prefetch thread, one
        batch ahead of the device step (same overlap as videoqa eval)."""
        db = _device_batch(batch_dict, tokenizer, args)
        n_real = db["input_ids"].shape[0]
        if mesh is not None:
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
        probs = fetch_local_rows(mesh, eval_step(
            params, db["input_ids"], db["attention_mask"],
            db["video"], db["video_mask"]))[:n_real]
        preds = (np.round(probs[:, 0]).astype(int) if probs.shape[1] == 1
                 else probs.argmax(1))
        hidden = int(batch_dict["answer_id"][0]) == -1
        if not hidden:
            gt = np.asarray(batch_dict["answer_id"])
            agree = preds == gt
            for i, qid in enumerate(batch_dict["qid"]):
                res[qid] = {"pred": int(preds[i]), "gt": int(gt[i]),
                            "type": int(batch_dict["type"][i]), "acc": bool(agree[i])}
            metric_logger.update(acc=float(agree.mean()))
        else:
            for i, qid in enumerate(batch_dict["qid"]):
                res[str(qid)] = int(preds[i])

    results = host_gather_results(res)
    assert len(results) == len(data_loader.dataset)
    if results and isinstance(next(iter(results.values())), dict):
        acc = sum(int(r["acc"]) for r in results.values()) / len(results)
        if is_main_process():
            print(dataset_name)
            print(f"{split} acc: {acc: .2%}")
        return results, acc
    return results, 0


def train_one_epoch(state, frozen, trainer, tokenizer, data_loader, epoch, args):
    from frozenbilm_tpu.train.optim import NonfiniteLossPolicy

    metric_logger = MetricLogger()
    nf_policy = NonfiniteLossPolicy(getattr(args, "skip_nonfinite", 0))
    def _place(batch_dict):
        db = _device_batch(batch_dict, tokenizer, args)
        db["answer_id"] = jnp.asarray(np.asarray(batch_dict["answer_id"]))
        if trainer.mesh is not None:
            db = shard_batch(trainer.mesh, db)
        return db

    from frozenbilm_tpu.data.loader import device_prefetch

    it = device_prefetch(iter(data_loader), _place)
    for db in metric_logger.log_every(it, args.print_freq,
                                      f"Epoch: [{epoch}]",
                                      total=len(data_loader)):
        state, metrics = trainer.train_step(
            state, frozen, db,
            train_key(args.seed, getattr(args, "rng_impl", "rbg")))
        loss = float(metrics["loss"])
        if not nf_policy.step(loss, float(metrics["grad_norm"])):
            metric_logger.update(loss=loss)
    if nf_policy.total_skipped and is_main_process():
        print(f"warning: {nf_policy.total_skipped} non-finite step(s) "
              "dropped this epoch (--skip_nonfinite)")
    metric_logger.synchronize_between_processes()
    if is_main_process():
        print("Averaged stats:", metric_logger)
    return state, {k: m.global_avg for k, m in metric_logger.meters.items()}


def main(args):
    if args.quantize != "none" and not args.eval:
        raise ValueError("--quantize is inference-only; combine with --eval")
    from frozenbilm_tpu.utils.platform import setup_runtime

    setup_runtime(args)
    init_distributed()
    if is_main_process() and args.save_dir:
        os.makedirs(args.save_dir, exist_ok=True)

    tokenizer = get_tokenizer(args)
    nt = namedtuple("data", ["dataset_name", "loader_test", "loader_val", "loader_train"])
    tuples = []
    for dset_name in args.combine_datasets_val:
        split_test = "val" if (args.eval and not args.test) else "test"
        ds_test = build_mc_dataset(dset_name, split_test, args, tokenizer.mask_token)
        loader_test = DataLoader(ds_test, args.batch_size_val, collate_fn=mc_collate,
                                 **loader_shard_kwargs())
        ds_val = build_mc_dataset(dset_name, "val", args, tokenizer.mask_token,
                                  features=ds_test.features)
        loader_val = DataLoader(ds_val, args.batch_size_val, collate_fn=mc_collate,
                                **loader_shard_kwargs())
        loader_train = None
        if not args.eval:
            ds_train = build_mc_dataset(dset_name, "train", args, tokenizer.mask_token,
                                        features=ds_test.features)
            loader_train = DataLoader(ds_train, args.batch_size, collate_fn=mc_collate,
                                      shuffle=True, seed=args.seed,
                                      drop_last=len(ds_train) > args.batch_size,
                                      **loader_shard_kwargs())
        tuples.append(nt(dset_name, loader_test, loader_val, loader_train))

    args.n_ans = 2  # {Yes, No} (mc.py:252)
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
        apply_param_dtype, apply_quantization, reject_quantized_for_training)

    params = apply_param_dtype(params, bundle.vt, args.param_dtype)
    reject_quantized_for_training(params, args.eval)
    if args.quantize != "none":
        if not args.eval:
            raise ValueError("--quantize is inference-only; combine with --eval")
        params = apply_quantization(params, bundle.vt, args.quantize)

    # answer embeddings <- {Yes, No} token embeddings (mc.py:280-305)
    a2tok = answers_to_token_ids(tokenizer, ["Yes", "No"], args.max_atokens)
    params = bundle.set_answer_embeddings(params, a2tok)

    mesh = None
    if jax.device_count() > 1:
        n_data = (args.mesh_data if args.mesh_data > 0
                  else jax.device_count() // max(1, args.mesh_model))
        mesh = make_mesh(MeshSpec(data=n_data, model=args.mesh_model))

    log_stats = []
    for item in tuples:
        if not args.eval:
            steps = len(item.loader_train)
            tx = make_optimizer(
                make_schedule(args.lr, steps * args.epochs, args.schedule,
                              args.fraction_warmup_steps),
                beta1=args.beta1, beta2=args.beta2,
                weight_decay=args.weight_decay, clip_max_norm=args.clip_max_norm,
            )
            loss_fn, _ = make_mc_steps(bundle, tokenizer.mask_token_id,
                                       item.loader_train.dataset.mc)
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
            best_acc = 0.0
            for epoch in range(args.start_epoch, args.epochs):
                item.loader_train.set_epoch(epoch)
                state, _ = train_one_epoch(state, frozen, trainer, tokenizer,
                                           item.loader_train, epoch, args)
                if (epoch + 1) % args.eval_skip == 0:
                    cur = merge_params(state.trainable, frozen)
                    _, acc = evaluate(cur, bundle, tokenizer, item.loader_val,
                                      item.dataset_name, args, split="val",
                                      mesh=mesh)
                    log_stats.append({"epoch": epoch, "val_acc": acc})
                    if args.save_dir and acc > best_acc:
                        best_acc = acc
                        if is_main_process():
                            from frozenbilm_tpu.utils.checkpoint import ckpt_meta

                            save_params(os.path.join(args.save_dir, "best_model"),
                                        state.trainable,
                                        ckpt_meta(args, epoch=epoch, acc=acc),
                                        fmt=args.ckpt_format)
            if args.save_dir and os.path.isdir(os.path.join(args.save_dir, "best_model")):
                from frozenbilm_tpu.utils.checkpoint import overlay_into

                best, _ = load_params(os.path.join(args.save_dir, "best_model"))
                params = jax.tree.map(jnp.asarray, overlay_into(
                    merge_params(state.trainable, frozen), best))
            else:
                params = merge_params(state.trainable, frozen)

        results, acc = evaluate(params, bundle, tokenizer, item.loader_test,
                                item.dataset_name, args,
                                split="val" if (args.eval and not args.test) else "test",
                                mesh=mesh)
        if args.save_dir and is_main_process():
            with open(os.path.join(args.save_dir, f"{item.dataset_name}.json"), "w") as f:
                json.dump(results, f)
            with open(os.path.join(args.save_dir, "acc_val.json"), "w") as f:
                json.dump({"acc": acc}, f)
        log_stats.append({item.dataset_name: acc})
    return log_stats


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser(parents=[get_args_parser()])
    main(parser.parse_args())
