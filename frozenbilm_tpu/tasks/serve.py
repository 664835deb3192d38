"""Production QA serving: continuous-batching HTTP service over the jitted
answer scorer.

The reference stops at a single-video demo CLI (demo_videoqa.py:17-170);
this is the deployment-shaped equivalent for TPU serving:

  - the model is built/loaded ONCE (same checkpoint surface as the videoqa
    driver: --load, --param_dtype, --quantize w8a8 for int8 MXU serving);
  - requests (question [+ subtitles] [+ precomputed CLIP features]) land on
    a queue; a batcher thread collects up to --batch_size_val requests
    within a small window and pads to ONE static shape, so XLA compiles a
    single serving program and every batch rides the same executable;
  - answers come from the answer-vocabulary head at the [MASK] position
    (videoqa.py:164-170 semantics), top-k with probabilities.

Endpoints (encoder families — deberta/bert):
  POST /qa      {"question": str, "subtitles": str?, "topk": int?,
                 "video_features": [[f]*features_dim]*n_frames?}
                -> {"answers": [{"answer": str, "prob": float}, ...]}
Endpoints (AR families — gptneo/gptj; KV-cache decode + ops/sampling.py):
  POST /generate {"prompt": str, "temperature": float?,
                  "max_new_tokens": int?, "video_features": ...?}
                 -> {"text": str, "tokens": [int, ...]}
                 Per-request temperature rides the batch as a (B,) array
                 (0 = greedy row); top-k/top-p are server flags (static —
                 they shape the compiled program). --serve_num_beams K > 1
                 switches the compiled program to deterministic beam search
                 (+ --serve_length_penalty); a per-request "num_beams" must
                 then be absent, 1, or K. Load bench: scripts/serve_load.py.
Both:
  GET  /healthz -> {"status": "ok", "model": ..., "batch_size": ...}
  GET  /stats   -> request/batch counts, p50/p95 latency

Run: python -m frozenbilm_tpu.tasks.serve --combine_datasets none \
       --combine_datasets_val none --load ckpt --port 8000 ...
The service type follows --model_name: encoder models serve /qa,
GPT models serve /generate.
"""

from __future__ import annotations

import json
import os
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from frozenbilm_tpu.config import get_args_parser
from frozenbilm_tpu.data.features import subsample_or_pad
from frozenbilm_tpu.tasks.engine import is_transient_backend_error
from frozenbilm_tpu.data.prompts import normalize_question, videoqa_prompt
from frozenbilm_tpu.data.tokenization import (
    answers_to_token_ids,
    encode_batch,
    get_tokenizer,
    strip_sep_tokens,
)
from frozenbilm_tpu.models import build_model
from frozenbilm_tpu.tasks.videoqa import make_qa_steps
from frozenbilm_tpu.utils.checkpoint import load_any_checkpoint


def _ckpt_weights_present(path: str) -> bool:
    """Would load_any_checkpoint find weights under this dir? (Mirrors its
    file probes so callers can branch BEFORE materializing params.)"""
    return os.path.isdir(path) and any(
        os.path.exists(os.path.join(path, n))
        for n in ("params.npz", "params_orbax", "pytorch_model.bin",
                  "model.safetensors"))


def _load_serving_params(args, bundle, tokenizer_needed: bool = False):
    """Shared param plumbing: init -> base weights -> --load -> dtype/quant.

    Init and the --param_dtype cast run fused in ONE jit: eager per-leaf
    init is minutes-slow over a remote-TPU tunnel, and materializing the
    f32 tree before casting OOMs HBM for GPT-J-6B (24 GB f32 vs the v5e's
    16 — inside the jit each leaf's f32 buffer dies at its convert, so
    peak is the bf16 tree + one leaf).

    When quantizing WITHOUT a checkpoint to overlay, the quantize fuses
    into the SAME jit: the bf16 tree then never exists as a persistent
    allocation at all — XLA's scheduler retires each bf16 leaf at its int8
    convert, so the 6B program peaks at 9.4 GB (out 5.66 + one 3.76 GB
    kernel temp, compiled memory_analysis via diag_6b_memanalysis.py)
    instead of 11.3 GB resident + quantize on top. The two-phase
    init-then-quantize sequence left the allocator unable to serve even a
    0.5 GB request afterwards on the axon backend (diag_6b_probe.py) —
    engine warm then died on the first admission. Checkpointed 6B trees
    should be quantized OFFLINE (scripts/convert.py --quantize) for the
    same reason."""
    from frozenbilm_tpu.train.partition import apply_param_dtype

    base_dir = args.tokenizer_path or os.path.join(
        os.environ.get("TRANSFORMERS_CACHE", ""), args.model_name)
    has_ckpt = _ckpt_weights_present(base_dir) or bool(args.load)
    if getattr(args, "quantize", "") in ("w8a8", "w4") and not has_ckpt:
        from frozenbilm_tpu.ops.quant import quantize_tree
        from frozenbilm_tpu.train.partition import trainable_mask

        qmode = "w4" if args.quantize == "w4" else "w8a8"

        def build(k):
            p = apply_param_dtype(
                bundle.init_params(k), bundle.vt, args.param_dtype)
            return quantize_tree(p, trainable_mask(p, bundle.vt),
                                 mode=qmode)

        return jax.jit(build)(jax.random.PRNGKey(args.seed))

    params = jax.jit(lambda k: apply_param_dtype(
        bundle.init_params(k), bundle.vt, args.param_dtype))(
            jax.random.PRNGKey(args.seed))
    if os.path.isdir(base_dir):
        try:
            params = load_any_checkpoint(base_dir, params, bundle.cfg,
                                         bundle.family)
        except FileNotFoundError:
            pass
    if args.load:
        params = load_any_checkpoint(args.load, params, bundle.cfg,
                                     bundle.family)
    return params


def _finalize_params(args, bundle, params):
    from frozenbilm_tpu.ops.quant import is_quantized
    from frozenbilm_tpu.train.partition import apply_param_dtype, apply_quantization

    if is_quantized(params):
        # fused init+quantize path (or a convert.py --quantize checkpoint):
        # already cast + quantized; re-casting would bf16 the f32 scales
        return params
    params = jax.tree.map(jnp.asarray, params)
    params = apply_param_dtype(params, bundle.vt, args.param_dtype)
    return apply_quantization(params, bundle.vt, args.quantize, donate=True)


class QAService:
    """Model + tokenizer + ONE jitted fixed-shape scoring program."""

    endpoint = "/qa"

    def __init__(self, args):
        self.args = args
        self.tokenizer = get_tokenizer(args)
        vocab = json.load(open(args.msrvtt_vocab_path))
        self.id2a = {y: x for x, y in vocab.items()}
        args.n_ans = len(vocab)
        bundle = build_model(args)
        params = _load_serving_params(args, bundle)
        answers = [a for a, _ in sorted(vocab.items(), key=lambda kv: kv[1])]
        a2tok = answers_to_token_ids(self.tokenizer, answers, args.max_atokens)
        params = bundle.set_answer_embeddings(params, a2tok)
        self.params = _finalize_params(args, bundle, params)
        self.bundle = bundle
        self.batch_size = args.batch_size_val
        if getattr(args, "program", ""):
            # pre-exported StableHLO scoring program (scripts/
            # export_program.py): skips model tracing at startup; must have
            # been exported at this batch shape / answer vocab / quantize
            from frozenbilm_tpu.utils.aot import load_program

            self._eval_step = load_program(args.program)
        else:
            _, self._eval_step = make_qa_steps(
                bundle, self.tokenizer.mask_token_id, "serve",
                topk=min(10, len(vocab)))

    def validate(self, payload: Dict) -> None:
        """Reject malformed payloads BEFORE batching, so one bad request
        can't fail the whole batch it rides in."""
        if not isinstance(payload.get("question"), str) or not payload["question"]:
            raise ValueError("missing 'question'")
        feats = payload.get("video_features")
        if feats is not None:
            arr = np.asarray(feats, np.float32)
            if arr.ndim != 2 or arr.shape[1] != self.args.features_dim:
                raise ValueError(
                    f"video_features must be (n_frames, {self.args.features_dim})")

    def _encode(self, questions: List[str], subtitles: List[Optional[str]]):
        texts = []
        for q, sub in zip(questions, subtitles):
            text = videoqa_prompt(normalize_question(q),
                                  self.tokenizer.mask_token,
                                  self.args.prefix, self.args.suffix)
            if sub:
                text = f"{text} Subtitles: {sub}"
            texts.append(text)
        enc = encode_batch(self.tokenizer, texts, self.args.max_tokens)
        if not self.args.suffix and not self.args.use_context:
            enc = strip_sep_tokens(enc, self.tokenizer.sep_token_id,
                                   self.tokenizer.pad_token_id)
        return enc

    def score(self, requests: List[Dict]) -> List[List[Dict]]:
        """Pad the request list to the static batch size, run one step."""
        n = len(requests)
        B = self.batch_size
        reqs = requests + [requests[-1]] * (B - n)
        enc = self._encode([r["question"] for r in reqs],
                           [r.get("subtitles") for r in reqs])
        F, D = self.args.max_feats, self.args.features_dim
        video = np.zeros((B, F, D), np.float32)
        vmask = np.zeros((B, F), np.int32)
        for i, r in enumerate(reqs):
            feats = r.get("video_features")
            if feats:
                arr = np.asarray(feats, np.float32).reshape(-1, D)
                sub, vlen = subsample_or_pad(arr, F)
                video[i], vmask[i, :vlen] = sub, 1
        top_ids, top_p = self._eval_step(
            self.params, jnp.asarray(enc["input_ids"]),
            jnp.asarray(enc["attention_mask"]), jnp.asarray(video),
            jnp.asarray(vmask))
        top_ids, top_p = np.asarray(top_ids), np.asarray(top_p)
        out = []
        for i in range(n):
            k = min(int(requests[i].get("topk", 5)), top_ids.shape[1])
            out.append({"answers": [{"answer": self.id2a[int(top_ids[i, j])],
                                     "prob": float(top_p[i, j])}
                                    for j in range(k)]})
        return out


class MCService:
    """Multiple-choice candidate scoring over HTTP (--serve_mc N): the
    serving face of tasks/mc.py (reference mc.py:49-72 semantics — one
    forward per candidate, prompt "Question: ... Is it '<ai>'? [MASK]",
    score = P("Yes") at the mask from the 2-answer {Yes, No} head).

    POST /mc {"question": str, "candidates": [str, ...],
              "subtitles": str?, "video_features": ...?}
        -> {"scores": [float, ...], "pred": int}

    The candidate count is static (it shapes the compiled (B, mc, L)
    program): requests may send 1..N candidates; short lists are padded by
    repeating the last candidate and the scores sliced back."""

    endpoint = "/mc"

    def __init__(self, args):
        from frozenbilm_tpu.tasks.mc import make_mc_steps

        self.args = args
        self.tokenizer = get_tokenizer(args)
        args.n_ans = 2  # {Yes, No} (reference mc.py:252)
        bundle = build_model(args)
        params = _load_serving_params(args, bundle)
        a2tok = answers_to_token_ids(self.tokenizer, ["Yes", "No"],
                                     args.max_atokens)
        params = bundle.set_answer_embeddings(params, a2tok)
        self.params = _finalize_params(args, bundle, params)
        self.bundle = bundle
        self.batch_size = args.batch_size_val
        self.mc = args.serve_mc
        _, self._eval_step = make_mc_steps(
            bundle, self.tokenizer.mask_token_id, self.mc)

    def validate(self, payload: Dict) -> None:
        if not isinstance(payload.get("question"), str) or not payload["question"]:
            raise ValueError("missing 'question'")
        cands = payload.get("candidates")
        if (not isinstance(cands, list) or not cands
                or not all(isinstance(c, str) and c for c in cands)):
            raise ValueError("'candidates' must be a non-empty list of "
                             "strings")
        if len(cands) > self.mc:
            raise ValueError(f"server scores at most {self.mc} candidates "
                             f"(--serve_mc); got {len(cands)}")
        feats = payload.get("video_features")
        if feats is not None:
            arr = np.asarray(feats, np.float32)
            if arr.ndim != 2 or arr.shape[1] != self.args.features_dim:
                raise ValueError(
                    f"video_features must be (n_frames, {self.args.features_dim})")

    def score(self, requests: List[Dict]) -> List[Dict]:
        from frozenbilm_tpu.data.prompts import mc_prompt
        from frozenbilm_tpu.tasks.mc import _encode_candidates

        n = len(requests)
        B = self.batch_size
        reqs = requests + [requests[-1]] * (B - n)
        # candidate-major text layout, mc_collate convention
        texts = [[None] * B for _ in range(self.mc)]
        for b, r in enumerate(reqs):
            cands = list(r["candidates"])
            cands += [cands[-1]] * (self.mc - len(cands))
            sub = r.get("subtitles") or ""
            for c in range(self.mc):
                texts[c][b] = mc_prompt(
                    normalize_question(r["question"]), cands[c],
                    self.tokenizer.mask_token, self.args.prefix,
                    self.args.suffix, sub, use_context=bool(sub))
        ids, am = _encode_candidates(self.tokenizer, texts, self.args)
        F, D = self.args.max_feats, self.args.features_dim
        video = np.zeros((B, F, D), np.float32)
        vmask = np.zeros((B, F), np.int32)
        for i, r in enumerate(reqs):
            feats = r.get("video_features")
            if feats:
                arr = np.asarray(feats, np.float32).reshape(-1, D)
                sub_v, vlen = subsample_or_pad(arr, F)
                video[i], vmask[i, :vlen] = sub_v, 1
        p_yes = np.asarray(self._eval_step(
            self.params, jnp.asarray(ids), jnp.asarray(am),
            jnp.asarray(video), jnp.asarray(vmask)))  # (B, mc)
        out = []
        for i in range(n):
            k = len(requests[i]["candidates"])
            scores = [float(s) for s in p_yes[i, :k]]
            out.append({"scores": scores,
                        "pred": int(np.argmax(p_yes[i, :k]))})
        return out


class GenService:
    """AR text generation: KV-cache decode (ONE prefill + lax.scan steps)
    with per-request temperature riding the batch as a (B,) array.

    The reference's only generation surface is the vendored HF generate
    inside gptneo.py:850-1726, driven one sample at a time; here requests
    continuously batch into one static-shape decode program (left-padded
    prompts, videoqa_ar.py:178-179 convention, so the prefill's last
    position is real text)."""

    endpoint = "/generate"

    def __init__(self, args):
        self.args = args
        self.tokenizer = get_tokenizer(args)
        bundle = build_model(args)
        params = _load_serving_params(args, bundle)
        self.params = _finalize_params(args, bundle, params)
        self.bundle = bundle
        self.batch_size = args.batch_size_val
        self.max_new = args.serve_max_new_tokens
        self._batch_counter = 0
        eos = self.tokenizer.eos_token_id
        self.eos = eos
        self.num_beams = getattr(args, "serve_num_beams", 1)
        self.n_spec = getattr(args, "serve_speculative", 0)
        if self.n_spec and self.num_beams > 1:
            raise ValueError("--serve_speculative is greedy-only; it cannot "
                             "combine with --serve_num_beams > 1")

        if self.num_beams > 1:
            # beam mode is deterministic (HF is_beam_gen_mode applies no
            # warpers without do_sample, reference gptneo.py:1294-1333);
            # per-request temperature is rejected by validate(). The jitted
            # callable takes ONLY the args the program uses: passing unused
            # (temps, rng) tripped jax's dropped-argument fastpath when a
            # greedy program with the same treedef lived in the same
            # process ("Execution supplied 26 buffers but compiled program
            # expected 29"), seen greedy-server-then-beam-server in tests.
            def beam_only(params, ids, am, video, vm):
                return bundle.beam(
                    params, bundle.cfg, bundle.vt, video=video, video_mask=vm,
                    input_ids=ids, attention_mask=am,
                    max_new_tokens=self.max_new, num_beams=self.num_beams,
                    eos_token_id=eos if eos is not None else 0,
                    pad_token_id=eos if eos is not None else 0,
                    length_penalty=args.serve_length_penalty,
                    kv_int8=bool(getattr(args, "serve_kv_int8", 0)))

            _jb = jax.jit(beam_only)

            def gen(params, ids, am, video, vm, temps, rng):
                return _jb(params, ids, am, video, vm)

            self._gen = gen
        elif self.n_spec:
            # prompt-lookup speculative greedy (ops/speculative.py): exact
            # greedy tokens, fewer weight-read steps. Deterministic like
            # beam mode — per-request temperature is rejected by validate()
            # — so the jitted callable takes only what the program uses
            # (same dropped-argument fastpath hazard as the beam branch).
            def spec_only(params, ids, am, video, vm):
                return bundle.speculative(
                    params, bundle.cfg, bundle.vt, video=video, video_mask=vm,
                    input_ids=ids, attention_mask=am,
                    max_new_tokens=self.max_new, n_draft=self.n_spec,
                    eos_token_id=eos,
                    pad_token_id=eos if eos is not None else 0,
                    kv_int8=bool(getattr(args, "serve_kv_int8", 0)))

            _js = jax.jit(spec_only)

            def gen(params, ids, am, video, vm, temps, rng):
                return _js(params, ids, am, video, vm)

            self._gen = gen
        else:
            def gen(params, ids, am, video, vm, temps, rng):
                return bundle.greedy(
                    params, bundle.cfg, bundle.vt, video=video, video_mask=vm,
                    input_ids=ids, attention_mask=am,
                    max_new_tokens=self.max_new, eos_token_id=eos,
                    pad_token_id=eos if eos is not None else 0,
                    temperature=temps, top_k=args.serve_top_k,
                    top_p=args.serve_top_p, rng=rng,
                    kv_int8=bool(getattr(args, "serve_kv_int8", 0)))

            self._gen = jax.jit(gen)

    def validate(self, payload: Dict) -> None:
        if not isinstance(payload.get("prompt"), str) or not payload["prompt"]:
            raise ValueError("missing 'prompt'")
        t = payload.get("temperature", 0.0)
        if not isinstance(t, (int, float)) or t < 0:
            raise ValueError("'temperature' must be a number >= 0")
        mnt = payload.get("max_new_tokens", 0)
        if not isinstance(mnt, int) or isinstance(mnt, bool) or mnt < 0:
            # reject before batching: a malformed value reaching score()
            # would fail every co-batched request
            raise ValueError("'max_new_tokens' must be an integer >= 0")
        nb = payload.get("num_beams", self.num_beams)
        if not isinstance(nb, int) or isinstance(nb, bool) or nb < 1:
            raise ValueError("'num_beams' must be an integer >= 1")
        if nb not in (1, self.num_beams):
            # num_beams shapes the compiled program: it is a server flag
            # (--serve_num_beams), not a per-request knob
            raise ValueError(
                f"server decodes with num_beams={self.num_beams}; "
                "per-request num_beams must match it (or be 1)")
        if getattr(self, "n_spec", 0) and t:
            raise ValueError(
                "server decodes speculatively (greedy-exact); per-request "
                "'temperature' is not applicable (omit it or send 0)")
        if self.num_beams > 1 and t:
            # beam decode is deterministic (no warpers without do_sample,
            # reference gptneo.py:1294-1333) — reject rather than silently
            # ignore a sampling knob, same contract as num_beams above
            raise ValueError(
                "server decodes with beam search; per-request "
                "'temperature' is not applicable (omit it or send 0)")
        if payload.get("stream") and not getattr(self, "supports_stream",
                                                 False):
            # the window batcher decodes the whole batch to completion —
            # only the in-flight engine emits tokens incrementally
            raise ValueError("'stream' requires --serve_inflight")
        feats = payload.get("video_features")
        if feats is not None:
            arr = np.asarray(feats, np.float32)
            if arr.ndim != 2 or arr.shape[1] != self.args.features_dim:
                raise ValueError(
                    f"video_features must be (n_frames, {self.args.features_dim})")

    def score(self, requests: List[Dict]) -> List[Dict]:
        n = len(requests)
        B = self.batch_size
        reqs = requests + [requests[-1]] * (B - n)
        # fixed T = max_tokens (buckets with one entry): ONE compiled decode
        # program for the service's lifetime — no mid-traffic compiles, and
        # it sidesteps a jax-0.9 dispatch fault where RETRACING the beam
        # program after a greedy program existed in the same process dies
        # with "Execution supplied 24 buffers but compiled program expected
        # 29" (greedy-then-beam servers, seen in tests/test_serve.py)
        enc = encode_batch(self.tokenizer, [r["prompt"] for r in reqs],
                           self.args.max_tokens, left_pad=True,
                           buckets=(self.args.max_tokens,))
        F, D = self.args.max_feats, self.args.features_dim
        video = np.zeros((B, F, D), np.float32)
        vmask = np.zeros((B, F), np.int32)
        for i, r in enumerate(reqs):
            feats = r.get("video_features")
            if feats:
                arr = np.asarray(feats, np.float32).reshape(-1, D)
                sub, vlen = subsample_or_pad(arr, F)
                video[i], vmask[i, :vlen] = sub, 1
        temps = np.asarray([float(r.get("temperature", 0.0)) for r in reqs],
                           np.float32)
        self._batch_counter += 1
        rng = jax.random.fold_in(jax.random.PRNGKey(self.args.seed),
                                 self._batch_counter)
        T = enc["input_ids"].shape[1]
        seq = np.asarray(self._gen(
            self.params, jnp.asarray(enc["input_ids"]),
            jnp.asarray(enc["attention_mask"]), jnp.asarray(video),
            jnp.asarray(vmask), jnp.asarray(temps), rng))
        out = []
        for i in range(n):
            want = min(int(requests[i].get("max_new_tokens", self.max_new)),
                       self.max_new)
            toks = seq[i, T:T + want].tolist()
            if self.eos is not None and self.eos in toks:
                toks = toks[:toks.index(self.eos)]
            out.append({"text": self.tokenizer.decode(toks),
                        "tokens": toks})
        return out


class InflightGenService:
    """AR generation over the in-flight continuous batching engine
    (tasks/engine.py): requests enter a pooled-KV slot engine the moment a
    slot frees up, instead of waiting for a whole window-batch to decode to
    completion. Greedy rows stay token-exact vs GenService's whole-batch
    decoder; per-request max_new_tokens ends a row's decode early (the
    window batcher always pays the compiled max).

    Enabled with --serve_inflight N (N = slots); incompatible with
    --serve_num_beams > 1 and --serve_speculative (those reshape the
    compiled program per batch, which is exactly what the slot engine
    avoids)."""

    endpoint = "/generate"
    validate = GenService.validate  # same request contract

    def __init__(self, args):
        from frozenbilm_tpu.models import family_of
        from frozenbilm_tpu.tasks.engine import InflightEngine

        self.args = args
        self.tokenizer = get_tokenizer(args)
        bundle = build_model(args)
        params = _load_serving_params(args, bundle)
        self.params = _finalize_params(args, bundle, params)
        self.bundle = bundle
        self.max_new = args.serve_max_new_tokens
        self.batch_size = args.serve_inflight  # /healthz reports slots
        self.num_beams = 1  # validate() contract: no beam program
        # --serve_speculative composes: per-slot prompt-lookup drafts +
        # one multi-token verify step per engine iteration (greedy-exact,
        # so validate() rejects per-request temperature like GenService's
        # whole-batch speculative mode)
        self.n_spec = getattr(args, "serve_speculative", 0)
        self.eos = self.tokenizer.eos_token_id
        delay = args.max_feats if args.features_dim else 0
        buckets, b = [], 16
        while b < args.max_tokens:
            buckets.append(b)
            b *= 2
        buckets.append(args.max_tokens)
        self._engine_kwargs = dict(
            slots=args.serve_inflight,
            max_len=delay + args.max_tokens + self.max_new,
            chunk=args.serve_inflight_chunk, prompt_buckets=buckets,
            eos_token_id=self.eos,
            pad_token_id=self.eos if self.eos is not None else 0,
            top_k=args.serve_top_k, top_p=args.serve_top_p,
            kv_int8=bool(getattr(args, "serve_kv_int8", 0)),
            rng_seed=args.seed, max_new_cap=self.max_new,
            pipeline=bool(getattr(args, "serve_inflight_pipeline", 1)),
            admit_batch=int(getattr(args, "serve_admit_batch", 4)),
            adaptive_chunk=bool(getattr(args, "serve_adaptive_chunk", 1)))
        self._family = family_of(args.model_name)
        self._engine_lock = threading.Lock()
        self._stop = threading.Event()
        self._threads: list = []
        self.spec_disabled_at = None  # acceptance that triggered auto-off
        self.engine = self._start_engine(self.n_spec)
        # speculation is a bet on workload acceptance; when the realized
        # rate stays below the verify-step cost, serving auto-swaps to a
        # plain engine ONCE after a warmup window (VERDICT r3 next #5)
        if self.n_spec and getattr(args, "serve_spec_auto_off_steps", 0):
            t = threading.Thread(target=self._spec_monitor, daemon=True)
            t.start()
            self._threads.append((None, t, None))

    def _start_engine(self, spec_draft: int):
        from frozenbilm_tpu.tasks.engine import InflightEngine

        engine = InflightEngine(
            self.params, self.bundle.cfg, self.bundle.vt, self._family,
            spec_draft=spec_draft, **self._engine_kwargs)
        # compile EVERY admission bucket (+ video variants) and the step
        # program before the serving thread exists — a first-use compile
        # inside the loop would stall all in-flight slots
        engine.warm(with_video=bool(self.args.features_dim))
        # every engine gets its own stoppable thread (the auto-off swap
        # stops the spec engine's thread without shutting the service down)
        stop = threading.Event()
        thread = threading.Thread(target=self._engine_loop,
                                  args=(engine, stop), daemon=True)
        thread.start()
        self._threads.append((engine, thread, stop))
        return engine

    def _engine_loop(self, engine, stop: "threading.Event"):
        import time

        while not (stop.is_set() or self._stop.is_set()):
            try:
                worked = engine.step_once()
            except Exception as e:  # noqa: BLE001 — keep serving
                engine._fail_inflight(e)
                worked = False
            if not worked and not engine._active.any():
                time.sleep(0.002)

    def _spec_monitor(self):
        """Decide ONCE, after the warmup window, whether speculation pays
        on this workload; if not, swap in a plain engine. New requests
        route to the new engine immediately; the old one drains then
        stops. The decision threshold is emitted-tokens-per-verify-step
        (engine.realized_acceptance) vs --serve_spec_min_accept."""
        import time

        window = int(self.args.serve_spec_auto_off_steps)
        floor = float(getattr(self.args, "serve_spec_min_accept", 1.3))
        while not self._stop.is_set():
            time.sleep(0.1)
            acc, steps = self.engine.realized_acceptance()
            if steps < window:
                continue
            if acc is not None and acc < floor:
                old_rec = self._threads[-1] if self._threads else None
                old = self.engine
                new_engine = self._start_engine(0)
                with self._engine_lock:
                    self.engine = new_engine
                    self.spec_disabled_at = round(acc, 3)
                # drain the spec engine, then stop its thread
                deadline = time.monotonic() + 30
                while ((old._active.any() or not old._waiting.empty())
                       and time.monotonic() < deadline):
                    time.sleep(0.05)
                for eng, th, ev in self._threads:
                    if eng is old and ev is not None:
                        ev.set()
                        th.join(timeout=10)
                if old._active.any() or not old._waiting.empty():
                    old._fail_inflight(RuntimeError(
                        "speculation auto-off swap timed out"))
                old.close()
            return  # one decision per serving process (keep or drop)

    def close(self, drain_s: float = 10.0):
        import time

        # graceful drain: let in-flight rows finish (the engine thread is
        # still stepping) before stopping it; whatever remains after the
        # deadline gets an error instead of a stranded ticket
        deadline = time.monotonic() + drain_s
        with self._engine_lock:
            eng = self.engine
        while ((eng._active.any() or not eng._waiting.empty())
               and time.monotonic() < deadline):
            time.sleep(0.05)
        self._stop.set()
        for rec_eng, th, _ in self._threads:
            th.join(timeout=10)
        if eng._active.any() or not eng._waiting.empty():
            eng._fail_inflight(RuntimeError("server shutting down"))
        eng.close()

    supports_stream = True

    def _submit_to_engine(self, payload: Dict, want: int, stream: bool):
        enc = encode_batch(self.tokenizer, [payload["prompt"]],
                           self.args.max_tokens, left_pad=True)
        row = enc["input_ids"][0][enc["attention_mask"][0] == 1]
        video = vmask = None
        feats = payload.get("video_features")
        if feats:
            F, D = self.args.max_feats, self.args.features_dim
            arr = np.asarray(feats, np.float32).reshape(-1, D)
            video, vlen = subsample_or_pad(arr, F)
            vmask = np.zeros(F, np.int32)
            vmask[:vlen] = 1
        return self.engine.submit(
            row, video=video, video_mask=vmask, max_new_tokens=want,
            temperature=float(payload.get("temperature", 0.0)),
            stream=stream)

    def _trim(self, toks):
        if self.eos is not None and self.eos in toks:
            toks = toks[:toks.index(self.eos)]
        return toks

    def submit_payload(self, payload: Dict) -> Dict:
        want = min(int(payload.get("max_new_tokens", self.max_new)),
                   self.max_new)
        if want < 1:
            return {"text": "", "tokens": []}
        ticket = self._submit_to_engine(payload, want, stream=False)
        try:
            # bounded wait: if the engine thread ever dies or a ticket is
            # stranded, the client gets a 500 instead of a hung connection
            res = ticket.get(timeout=self.args.serve_timeout_s)
        except queue.Empty:
            raise RuntimeError(
                f"generation timed out after {self.args.serve_timeout_s}s")
        if "error" in res:
            raise ValueError(res["error"])
        toks = self._trim(res["tokens"])
        return {"text": self.tokenizer.decode(toks), "tokens": toks}

    def stream_payload(self, payload: Dict, write) -> None:
        """Incremental generation: call write(obj) once per engine delta
        ({"delta_text", "delta_tokens"}) and once with the final
        {"done": True, "text", "tokens"}. Text deltas are computed as
        suffixes of the FULL decode so multi-byte/multi-token glyphs never
        split mid-character."""
        import time

        want = min(int(payload.get("max_new_tokens", self.max_new)),
                   self.max_new)
        if want < 1:
            write({"done": True, "text": "", "tokens": []})
            return
        ticket = self._submit_to_engine(payload, want, stream=True)
        deadline = time.monotonic() + self.args.serve_timeout_s
        sent: List[int] = []
        prev_text = ""
        while True:
            try:
                res = ticket.get(timeout=max(0.0,
                                             deadline - time.monotonic()))
            except queue.Empty:
                raise RuntimeError(
                    f"generation timed out after "
                    f"{self.args.serve_timeout_s}s")
            if "error" in res:
                raise ValueError(res["error"])
            if "delta" in res:
                sent.extend(res["delta"])
                text = self.tokenizer.decode(self._trim(list(sent)))
                write({"delta_text": text[len(prev_text):],
                       "delta_tokens": res["delta"]})
                prev_text = text
                continue
            toks = self._trim(res["tokens"])
            write({"done": True, "text": self.tokenizer.decode(toks),
                   "tokens": toks})
            return


class _InflightBatcher:
    """_Batcher-shaped front for InflightGenService: requests go straight to
    the engine (admission IS the batching); this object only keeps the
    latency/stats surface the handler expects."""

    def __init__(self, service: InflightGenService):
        self.service = service
        self._lock = threading.Lock()
        self._latencies: List[float] = []
        self.n_requests = 0

    def submit(self, payload: Dict) -> Dict:
        import time

        t0 = time.perf_counter()
        result = self.service.submit_payload(payload)
        self._record(time.perf_counter() - t0)
        return result

    def submit_stream(self, payload: Dict, write) -> None:
        import time

        t0 = time.perf_counter()
        self.service.stream_payload(payload, write)
        self._record(time.perf_counter() - t0)

    def _record(self, dt: float) -> None:
        with self._lock:
            self.n_requests += 1
            self._latencies.append(dt)
            if len(self._latencies) > 1000:
                del self._latencies[:-1000]

    def stats(self) -> Dict:
        eng = self.service.engine
        with self._lock:
            lat = sorted(self._latencies)
            n = len(lat)
            out = {
                "requests": self.n_requests,
                "latency_ms_p50": round(lat[n // 2] * 1e3, 2) if n else None,
                "latency_ms_p95": round(lat[int(n * 0.95)] * 1e3, 2) if n else None,
            }
        with eng._lock:
            steps = eng.stats["steps"]
            out.update({
                "engine_steps": steps,
                "engine_admissions": eng.stats["admissions"],
                "engine_avg_occupancy": round(
                    eng.stats["occupancy_sum"] / steps, 3) if steps else None,
                "engine_failures": eng.stats.get("failures", 0),
                "engine_resubmissions": eng.stats.get("resubmissions", 0),
                "engine_dispatches": eng.stats.get("dispatches", 0),
            })
            if eng.spec and eng.stats["occupancy_sum"]:
                # realized speculation win: tokens emitted per verify step
                # per occupied slot (1.0 = plain greedy pace). Admission
                # first-tokens are excluded — they come from prefills, not
                # verify steps
                spec_tokens = max(
                    0, eng.stats["tokens"] - eng.stats["admissions"])
                out["engine_tokens_per_step"] = round(
                    spec_tokens / eng.stats["occupancy_sum"], 3)
            if eng.spec and eng.stats["spec_row_steps"]:
                out["spec_realized_acceptance"] = round(
                    eng.stats["spec_emitted"]
                    / eng.stats["spec_row_steps"], 3)
        if getattr(self.service, "spec_disabled_at", None) is not None:
            # the auto-off monitor swapped to a plain engine: the measured
            # acceptance that failed --serve_spec_min_accept
            out["spec_auto_disabled_at_acceptance"] = (
                self.service.spec_disabled_at)
        return out


# a jitted score call is a pure function of (params, batch), so
# re-dispatching it on a transient tunnel fault is safe
_is_transient_backend_error = is_transient_backend_error


class _Batcher:
    """Collects requests for up to `window_ms`, scores them in one batch."""

    def __init__(self, service: QAService, window_ms: float = 5.0):
        self.service = service
        self.window_s = window_ms / 1000.0
        self.q: "queue.Queue" = queue.Queue()
        self._lock = threading.Lock()
        self._latencies: List[float] = []  # seconds, capped window
        self.n_requests = 0
        self.n_batches = 0
        self.n_retries = 0  # transient-backend retries (stats surface)
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def submit(self, payload: Dict) -> Dict:
        import time

        t0 = time.perf_counter()
        done = threading.Event()
        slot = {"done": done}
        self.q.put((payload, slot))
        done.wait()
        with self._lock:
            self.n_requests += 1
            self._latencies.append(time.perf_counter() - t0)
            if len(self._latencies) > 1000:
                del self._latencies[:-1000]
        if "error" in slot:
            raise RuntimeError(slot["error"])
        return slot["result"]

    def stats(self) -> Dict:
        with self._lock:
            lat = sorted(self._latencies)
            n = len(lat)
            return {
                "requests": self.n_requests,
                "batches": self.n_batches,
                "backend_retries": self.n_retries,
                "latency_ms_p50": round(lat[n // 2] * 1e3, 2) if n else None,
                "latency_ms_p95": round(lat[int(n * 0.95)] * 1e3, 2) if n else None,
            }

    def _run(self):
        while True:
            first = self.q.get()
            batch = [first]
            deadline = self.window_s
            while len(batch) < self.service.batch_size:
                try:
                    batch.append(self.q.get(timeout=deadline))
                except queue.Empty:
                    break
            payloads = [p for p, _ in batch]
            with self._lock:
                self.n_batches += 1
            try:
                # one failed jit dispatch would 500 the WHOLE batch (up to
                # batch_size clients) — retry transient backend faults before
                # giving up (serve_load_r4's 2-12 errors/leg were exactly one
                # or two failed batches of ~10)
                for attempt in range(3):
                    try:
                        results = self.service.score(payloads)
                        break
                    except Exception as e:
                        if attempt == 2 or not _is_transient_backend_error(e):
                            raise
                        with self._lock:
                            self.n_retries += 1
                        # short first backoff: this sleep runs in the single
                        # batcher thread, so every queued window waits behind
                        # it — transient tunnel faults usually clear
                        # immediately, and the longer waits are for the rare
                        # second retry (ADVICE r4)
                        time.sleep((0.05, 0.25)[attempt])
                for (_, slot), res in zip(batch, results):
                    slot["result"] = res
            except Exception as e:  # propagate per-request, keep serving
                for _, slot in batch:
                    slot["error"] = repr(e)
            for _, slot in batch:
                slot["done"].set()


def make_handler(batcher: _Batcher, service):
    class Handler(BaseHTTPRequestHandler):
        # chunked transfer (streaming /generate) requires HTTP/1.1; every
        # non-streaming reply carries Content-Length, so keep-alive is safe
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):  # quiet
            pass

        def _reply(self, code: int, obj: Dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                info = {"status": "ok",
                        "model": service.args.model_name,
                        "batch_size": service.batch_size,
                        "endpoint": service.endpoint}
                if hasattr(service, "id2a"):
                    info["n_ans"] = len(service.id2a)
                self._reply(200, info)
            elif self.path == "/stats":
                self._reply(200, batcher.stats())
            else:
                self._reply(404, {"error": "not found"})

        def do_POST(self):
            if self.path != service.endpoint:
                return self._reply(404, {"error": "not found"})
            try:
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length) or b"{}")
            except Exception as e:
                return self._reply(400, {"error": f"bad JSON: {e!r}"})
            try:
                service.validate(payload)
            except ValueError as e:
                return self._reply(400, {"error": str(e)})
            if payload.get("stream"):
                return self._reply_stream(payload)
            try:
                self._reply(200, batcher.submit(payload))
            except Exception as e:
                self._reply(500, {"error": repr(e)})

        def _reply_stream(self, payload: Dict):
            """Chunked NDJSON: one JSON line per token delta, then the
            final {"done": true, ...} line. Errors after the 200 header
            arrive as an {"error": ...} line (the status is already on
            the wire)."""
            self.send_response(200)
            self.send_header("Content-Type", "application/x-ndjson")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()

            def write(obj: Dict):
                data = (json.dumps(obj) + "\n").encode()
                self.wfile.write(b"%x\r\n" % len(data) + data + b"\r\n")
                self.wfile.flush()

            try:
                batcher.submit_stream(payload, write)
            except Exception as e:  # noqa: BLE001 — report on-stream
                try:
                    write({"error": repr(e)})
                except OSError:
                    pass  # client hung up mid-stream
            try:
                self.wfile.write(b"0\r\n\r\n")
            except OSError:
                pass

    return Handler


class _Server(ThreadingHTTPServer):
    # stdlib default listen backlog is 5: a 32-client stampede of fresh
    # connections overflows it and the kernel RSTs the overflow — the 2-12
    # "errors" per serve_load /qa leg were exactly these
    # ConnectionResetError(104)s (serve_load error_samples, round 4), not
    # server faults. 128 covers any sane client fan-in.
    request_queue_size = 128


def build_server(args) -> ThreadingHTTPServer:
    from frozenbilm_tpu.models import family_of

    if family_of(args.model_name) in ("gptneo", "gptj"):
        if getattr(args, "program", ""):
            raise ValueError(
                "--program exports cover the encoder /qa scoring program "
                "only; GPT generate serving always traces at startup")
        if getattr(args, "serve_inflight", 0):
            if args.serve_num_beams > 1:
                raise ValueError(
                    "--serve_inflight is greedy/sampled-only; it cannot "
                    "combine with --serve_num_beams > 1 "
                    "(--serve_speculative composes fine)")
            service = InflightGenService(args)  # warms all buckets itself
            batcher = _InflightBatcher(service)

            class _InflightServer(_Server):
                def shutdown(self):
                    super().shutdown()
                    # stop the engine thread and drop its pooled device
                    # state — otherwise every server built in a process
                    # leaks a polling thread plus an S x Lmax KV pool
                    service.close()

            srv = _InflightServer((args.serve_host, args.port),
                                  make_handler(batcher, service))
            srv.service = service  # tests/monitors reach the engine here
            return srv
        service = GenService(args)
        # warm the compile before accepting traffic
        service.score([{"prompt": "what is happening?", "max_new_tokens": 1}])
    elif getattr(args, "serve_mc", 0):
        service = MCService(args)
        service.score([{"question": "what is happening?",
                        "candidates": ["nothing"]}])
    else:
        service = QAService(args)
        service.score([{"question": "what is happening?", "topk": 1}])
    batcher = _Batcher(service, window_ms=args.serve_window_ms)
    server = _Server((args.serve_host, args.port),
                     make_handler(batcher, service))
    return server


def get_serve_parser():
    import argparse

    parser = argparse.ArgumentParser(parents=[get_args_parser()])
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--serve_host", default="0.0.0.0")
    parser.add_argument("--serve_window_ms", type=float, default=5.0,
                        help="batching window: wait this long to fill a batch")
    parser.add_argument("--program", default="",
                        help="serve a pre-exported StableHLO QA scoring "
                             "program (scripts/export_program.py) instead of "
                             "tracing the model at startup")
    parser.add_argument("--serve_max_new_tokens", type=int, default=32,
                        help="AR serving: decode length of the compiled "
                             "program (per-request max_new_tokens truncates)")
    parser.add_argument("--serve_num_beams", type=int, default=1,
                        help="beam width for /generate; >1 switches the "
                             "compiled decode program to beam search "
                             "(deterministic; temperature is ignored)")
    parser.add_argument("--serve_length_penalty", type=float, default=1.0,
                        help="beam-search length penalty exponent")
    parser.add_argument("--serve_top_k", type=int, default=0,
                        help="AR serving: top-k sampling filter (0 = off)")
    parser.add_argument("--serve_top_p", type=float, default=1.0,
                        help="AR serving: nucleus sampling mass (1 = off)")
    parser.add_argument("--serve_speculative", type=int, default=0,
                        help="prompt-lookup speculative greedy decoding "
                             "with this many draft tokens per verify step "
                             "(0 = off; greedy-exact output, fewer "
                             "weight-read steps — ops/speculative.py)")
    parser.add_argument("--serve_inflight", type=int, default=0,
                        help="serve /generate with the in-flight continuous "
                             "batching engine using this many KV slots "
                             "(0 = window batching): requests join a "
                             "running decode at chunk boundaries instead "
                             "of waiting for the whole batch "
                             "(tasks/engine.py)")
    parser.add_argument("--serve_inflight_chunk", type=int, default=4,
                        help="in-flight engine: decode tokens per compiled "
                             "chunk between admission/retirement points")
    parser.add_argument("--serve_inflight_pipeline", type=int, default=1,
                        help="in-flight engine: overlap the host's token "
                             "fetch/retire bookkeeping for chunk k-1 with "
                             "the device executing chunk k (hides the "
                             "host<->device round trip; 0 = synchronous)")
    parser.add_argument("--serve_admit_batch", type=int, default=4,
                        help="in-flight engine: admit up to this many "
                             "same-bucket requests per compiled batched "
                             "prefill (collapses per-request admission "
                             "dispatches under bursty arrivals; 0 = "
                             "one-at-a-time)")
    parser.add_argument("--serve_adaptive_chunk", type=int, default=1,
                        help="in-flight engine: dispatch a double-length "
                             "decode chunk whenever the queue is empty and "
                             "every live row has the budget for it (halves "
                             "steady-state dispatches; 0 = fixed chunk)")
    parser.add_argument("--serve_spec_auto_off_steps", type=int, default=512,
                        help="in-flight + speculative: after this many "
                             "per-row verify steps, auto-swap to a plain "
                             "engine if realized acceptance (emitted "
                             "tokens/verify step) is below "
                             "--serve_spec_min_accept (0 = never)")
    parser.add_argument("--serve_spec_min_accept", type=float, default=1.3,
                        help="acceptance floor for the speculative bet: a "
                             "verify step costs ~1.1x a plain step on v5e "
                             "(bench.py verify_step_cost_ratio), so below "
                             "~1.3 emitted/step speculation loses")
    parser.add_argument("--serve_mc", type=int, default=0,
                        help="serve multiple-choice scoring at /mc for "
                             "encoder models: compiled for this many "
                             "candidates per question (0 = serve /qa)")
    parser.add_argument("--serve_timeout_s", type=float, default=600.0,
                        help="in-flight serving: bound each request's wait "
                             "on the engine (a dead engine yields a 500, "
                             "not a hung connection)")
    parser.add_argument("--serve_kv_int8", type=int, default=0,
                        help="store the decode KV cache in int8 with "
                             "per-vector scales (ops/quant.kv_quantize) — "
                             "halves the KV bytes/step of the "
                             "bandwidth-bound decode; composes with "
                             "--quantize w4")
    return parser


def main(args):
    from frozenbilm_tpu.utils.platform import setup_runtime

    setup_runtime(args)
    server = build_server(args)
    host, port = server.server_address[:2]
    print(f"serving on http://{host}:{port} (batch {args.batch_size_val}, "
          f"window {args.serve_window_ms}ms)")
    server.serve_forever()


if __name__ == "__main__":
    main(get_serve_parser().parse_args())
