"""In-flight (continuous) batching engine for the GPT decode path.

The reference stops at whole-batch generation (its vendored generate,
gptneo.py:850-1726, decodes one fixed batch to completion); tasks/serve.py's
window batcher inherited that shape: requests that arrive while a batch is
decoding wait for the WHOLE batch to finish. This module removes that
head-of-line blocking with a vLLM-style slot engine, restructured for
TPU/XLA static shapes:

  - a pooled KV cache of S slots x Lmax positions lives on device between
    calls — (n_layers, S, nh, Lmax, hd), or int8 {"q","s"} pools;
  - ONE compiled single-token step advances all S slots together via the
    per-row-position decoder (models/gptneo._decode_many with K=1 — rows
    sit at different depths, so cache writes are per-row scatters); steps
    run in chunks of C inside one lax.scan to amortize dispatch over the
    remote-TPU link;
  - admission = one compiled prefill-and-insert program per (prompt-bucket,
    has-video): forward the new prompt once, dynamic_update_slice its
    prefix KV into the free slot, reset that slot's key-mask row, select
    the first token.  No other slot is touched, so admission composes with
    rows mid-generation;
  - retirement is host-side bookkeeping: a row that emits eos (or exhausts
    its max_new_tokens budget) frees its slot at the next chunk boundary;
    the stale cache cells are left in place — the next admission overwrites
    the prefix range and the key-mask row masks everything else.

Greedy rows are token-EXACT vs gptneo/gptj_greedy_cached on the same
left-padded prompt (tests/test_inflight.py); sampled rows ride per-row
temperatures (ops/sampling.select_token) with an engine-step rng stream.

Shapes are all static: S (slots), Lmax (pool length), C (chunk), and the
prompt buckets each compile once; everything else (slot index, per-row
depth t, positions) is dynamic data.
"""

from __future__ import annotations

import queue
import threading
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _bucket_for(n: int, buckets) -> Optional[int]:
    for b in buckets:
        if n <= b:
            return b
    return None


def is_transient_backend_error(e: Exception) -> bool:
    """Transient remote-TPU (axon tunnel) faults worth retrying.

    The tunnel occasionally throws FAILED_PRECONDITION mid-run and the
    compile proxy can 500 transiently (CLAUDE.md); greedy decode is a pure
    function of (params, prompt), so re-running a request from scratch is
    safe. Real input errors (shape/validation) never match these
    substrings.

    Capacity failures are NOT transient: a remote_compile 500 can be an HBM
    capacity wall (docs/measurements/train_knee_r4.json), and retrying it
    only delays the terminal error — any memory-exhaustion signature
    disqualifies the fault even when a transient marker is also present."""
    msg = repr(e)
    lowered = msg.lower()
    if ("RESOURCE_EXHAUSTED" in msg or "out of memory" in lowered
            or "exceeds the amount of memory" in lowered
            or "hbm" in lowered):
        return False
    return ("FAILED_PRECONDITION" in msg
            or "remote_compile" in msg
            or "DEADLINE_EXCEEDED" in msg)


class InflightEngine:
    """Slot-based continuous batching over a pooled KV cache.

    Host-side protocol: `submit()` enqueues a request and returns a
    one-shot queue; `step_once()` admits waiting requests into free slots,
    runs one C-token decode chunk for every active slot, and retires
    finished rows (putting `{"tokens": [...]}` on their queues). A serving
    loop calls `step_once()` forever; tests call `drain()`.
    """

    def __init__(self, params, cfg, vt, family: str, *, slots: int = 8,
                 max_len: int = 512, chunk: int = 4,
                 prompt_buckets=(16, 32, 64, 128),
                 eos_token_id: Optional[int] = None, pad_token_id: int = 0,
                 top_k: int = 0, top_p: float = 1.0, kv_int8: bool = False,
                 rng_seed: int = 0, state_sharding: Optional[Dict] = None,
                 spec_draft: int = 0, max_new_cap: int = 64,
                 pipeline: bool = True, admit_batch: int = 4,
                 adaptive_chunk: bool = True):
        if family not in ("gptneo", "gptj"):
            raise ValueError(f"in-flight engine supports GPT families, got {family}")
        self.params = params
        self.cfg, self.vt = cfg, vt
        self.family = family
        self.S, self.Lmax, self.C = int(slots), int(max_len), int(chunk)
        self.buckets = tuple(sorted(int(b) for b in prompt_buckets))
        self.eos = eos_token_id
        self.pad = int(pad_token_id)
        self.top_k, self.top_p = int(top_k), float(top_p)
        self.kv_int8 = bool(kv_int8)
        # speculative mode: each chunk iteration is ONE prompt-lookup verify
        # step emitting 1..spec_draft+1 tokens per live row (greedy-exact;
        # see gptneo_speculative_cached for the whole-batch ancestor).
        # Rejected draft tails are overwritten in place, so the pool gets
        # spec_draft+1 slack positions per row.
        self.spec = int(spec_draft)
        self.Gmax = int(max_new_cap)
        if self.spec:
            self.Lmax += self.spec + 1
        if pipeline:
            # async-fetch lag: a non-spec row retired by budget exhaustion
            # decodes one discarded extra chunk before the host sees it —
            # give the pool C slack so that junk cannot overflow. (Spec
            # rows self-freeze on-device at n >= budget, so the junk chunk
            # writes nothing there.)
            self.Lmax += self.C
        self._rng = jax.random.key(rng_seed)
        self._step_ctr = 0

        if family == "gptneo":
            self._is_local = jnp.asarray(
                [t == "local" for t in cfg.attention_types])
            self._sincos = None
        else:
            from frozenbilm_tpu.models.gptj import _rotary_sincos

            rd = cfg.rotary_dim or cfg.head_dim
            sin_np, cos_np = _rotary_sincos(self.Lmax, rd)
            self._sincos = (jnp.asarray(sin_np), jnp.asarray(cos_np))

        # multi-chip serving: a {"k": ..., "v": ..., "mask": ..., ...} dict
        # of jax.sharding.Sharding pins the pooled state's layout over the
        # mesh (slots over 'data', KV heads over 'model' alongside
        # TP-sharded params). Applied at init (device_put) AND as a
        # with_sharding_constraint on every program's returned state, so
        # donated buffers keep one stable sharding across calls.
        # batched admission: groups of `admit_batch` same-(bucket, video)
        # requests prefill in ONE compiled program (one device dispatch +
        # a batched prefill forward, vs one per request). Under a retire
        # burst — e.g. closed-loop clients resubmitting together — this
        # collapses the per-request admission serialization that kept the
        # uniform-load engine at ~73% of window batching (serve_load_r4).
        # Disabled in spec mode (drafting state is per-row anyway).
        self._admit_batch = 0 if self.spec else max(0, int(admit_batch))
        # descending group sizes tried by the admission loop (each size is
        # one compiled program per (bucket, video); remainders go single)
        self._admit_sizes = tuple(
            a for a in (self._admit_batch, self._admit_batch // 2)
            if a >= 2 and a <= self.S)
        # adaptive chunk: when nothing is waiting and every live row has
        # >= 2C budget left, dispatch a double-length chunk — half the
        # host<->device round trips in the steady state, zero admission-
        # latency cost (the long chunk only runs when no one is waiting).
        self._adaptive = bool(adaptive_chunk) and not self.spec
        self._state_shard = state_sharding
        self.state = self._init_state()
        if state_sharding is not None:
            self.state = jax.tree.map(
                jax.device_put, self.state, self._shard_tree(self.state))
        self._admit_cache: Dict = {}
        self._step_fn = self._make_step(self.C)
        self._step_fn2 = self._make_step(2 * self.C) if self._adaptive else None

        # host bookkeeping
        self._waiting: "queue.Queue" = queue.Queue()
        self._slots: List[Optional[Dict]] = [None] * self.S
        self._active = np.zeros(self.S, dtype=bool)
        self._nprev = np.zeros(self.S, dtype=np.int64)  # spec: tokens read
        # async-fetch pipelining: dispatch chunk k BEFORE fetching chunk
        # k-1's tokens, hiding the host<->device round trip behind device
        # execution (on a remote-TPU tunnel that round trip dominates the
        # step loop — serve_load_r4 measured the chunk=4 engine at 1/3 of
        # window batching). _pending holds (device toks, active snapshot);
        # _cooling marks slots retired while a dispatch that still included
        # them is in flight — admission skips them for exactly one call.
        self._pipeline = bool(pipeline)
        self._pending = None
        self._cooling = np.zeros(self.S, dtype=bool)
        # tokens dispatched per slot since admission (first token included):
        # the adaptive-chunk budget check reads this, so a double chunk is
        # only dispatched when NO live row can exhaust its budget inside it
        # (junk slack stays C, same as the fixed-chunk pipeline)
        self._disp = np.zeros(self.S, dtype=np.int64)
        self._admitted_first: List = []  # (slot, device first-token) pairs
        self._active_dev = None  # device copy of _active, refreshed on change
        self._active_host = None
        self._lock = threading.Lock()
        self.stats = {"requests": 0, "steps": 0, "tokens": 0,
                      "occupancy_sum": 0, "admissions": 0, "failures": 0,
                      "resubmissions": 0,
                      # device dispatches: decode-chunk programs + admission
                      # programs — the host-loop cost the batched-admission
                      # and adaptive-chunk optimizations exist to shrink
                      "dispatches": 0,
                      # spec mode: emitted tokens / per-row verify steps —
                      # the realized acceptance the speculative bet depends
                      # on (serve.py's auto-off monitor reads these)
                      "spec_emitted": 0, "spec_row_steps": 0}

    # -- device state -----------------------------------------------------

    def _shard_tree(self, state):
        """Expand the per-field sharding dict to state's full leaf
        structure (the int8 pools nest {"q","s"} under k/v)."""
        return {
            f: jax.tree.map(lambda _: self._state_shard[f], state[f])
            for f in state
        }

    def _constrain(self, state):
        if self._state_shard is None:
            return state
        return jax.tree.map(jax.lax.with_sharding_constraint, state,
                            self._shard_tree(state))

    def _cache_dtype(self):
        # activation dtype = embedding-table dtype; the first tree leaf
        # could be an int8/int4 kernel under --quantize, which must not
        # leak into the K/V pool dtype
        if isinstance(self.params, dict) and "wte" in self.params:
            return self.params["wte"].dtype
        return jax.tree_util.tree_leaves(self.params)[0].dtype

    def _init_state(self):
        cfg, S, L = self.cfg, self.S, self.Lmax
        nh, hd = cfg.num_heads, cfg.head_dim
        nl = cfg.num_layers
        dt = self._cache_dtype()
        if self.kv_int8:
            def pool():
                return {"q": jnp.zeros((nl, S, nh, L, hd), jnp.int8),
                        "s": jnp.zeros((nl, S, nh, L), jnp.float32)}
            k, v = pool(), pool()
        else:
            k = jnp.zeros((nl, S, nh, L, hd), dt)
            v = jnp.zeros((nl, S, nh, L, hd), dt)
        state = {
            "k": k, "v": v,
            "mask": jnp.zeros((S, L), jnp.float32),
            "cur": jnp.zeros((S,), jnp.int32),
            "t": jnp.zeros((S,), jnp.int32),
            "pos": jnp.zeros((S,), jnp.int32),
            "unfinished": jnp.zeros((S,), bool),
            "temps": jnp.zeros((S,), jnp.float32),
        }
        if self.spec:
            Bmax = self.buckets[-1]
            state.update({
                # drafting history: [prompt (right-aligned in Bmax) ||
                # generated (Gmax)], validity from pam / n
                "pids": jnp.zeros((S, Bmax), jnp.int32),
                "pam": jnp.zeros((S, Bmax), jnp.int32),
                "out": jnp.zeros((S, self.Gmax), jnp.int32),
                "n": jnp.zeros((S,), jnp.int32),
                "l2": jnp.zeros((S,), jnp.int32),  # bigram: (l2, cur)
                "budget": jnp.zeros((S,), jnp.int32),
            })
        return state

    # -- compiled programs -------------------------------------------------

    def _prefill(self, params, ids, am, video, vmask):
        """Family-dispatched prefix forward (same prefill the whole-batch
        decoders use: gptneo.py _forward_with_genpos / gptj_forward with
        return_kv). params is threaded (never closed over) so jit traces it
        as an argument, not a baked-in constant."""
        if self.family == "gptneo":
            from frozenbilm_tpu.models.gptneo import _forward_with_genpos

            return _forward_with_genpos(params, self.cfg, self.vt, ids,
                                        am, video, vmask, return_kv=True)
        from frozenbilm_tpu.models.gptj import gptj_forward

        return gptj_forward(params, self.cfg, self.vt, ids, am, video,
                            vmask, return_kv=True)

    def _make_admit(self, has_video: bool):
        """One jitted admission program per (bucket, has_video) — the bucket
        is baked in by the (1, Tb) ids shape. Donates the pooled state."""
        from frozenbilm_tpu.ops.sampling import select_token

        eos, pad = self.eos, self.pad
        Lmax = self.Lmax

        def spec_admit(params, state, slot, ids, am, video, vmask, budget):
            """Speculative admission: greedy first token + drafting state
            (right-aligned prompt history, trailing bigram, out buffer)."""
            zero = jnp.zeros((1,), jnp.float32)
            new, first = admit(params, state, slot, ids, am, video, vmask,
                               zero, None)
            Bmax = self.buckets[-1]
            Tb = ids.shape[1]
            prow = jnp.pad(ids.astype(jnp.int32), [(0, 0), (Bmax - Tb, 0)])
            mrow = jnp.pad(am.astype(jnp.int32), [(0, 0), (Bmax - Tb, 0)])
            # submit() left-pads into the bucket, so the last real prompt
            # token sits at the final position
            l2_0 = ids[0, -1]
            out_row = jnp.full((1, self.Gmax), pad, jnp.int32)
            out_row = out_row.at[0, 0].set(first.astype(jnp.int32))
            new.update({
                "pids": jax.lax.dynamic_update_slice(
                    new["pids"], prow, (slot, 0)),
                "pam": jax.lax.dynamic_update_slice(
                    new["pam"], mrow, (slot, 0)),
                "out": jax.lax.dynamic_update_slice(
                    new["out"], out_row, (slot, 0)),
                "n": new["n"].at[slot].set(jnp.int32(1)),
                "l2": new["l2"].at[slot].set(l2_0.astype(jnp.int32)),
                "budget": new["budget"].at[slot].set(
                    budget.astype(jnp.int32)),
            })
            return self._constrain(new), first

        def admit(params, state, slot, ids, am, video, vmask, temp, rng):
            out = self._prefill(params, ids, am, video, vmask)
            kv_k, kv_v = out.kv  # (nl, 1, nh, T0, hd)
            if has_video:
                full_am = jnp.concatenate(
                    [vmask.astype(am.dtype), am], axis=1)
            else:
                full_am = am
            first = select_token(out.logits[:, -1, :], rng,
                                 temperature=temp, top_k=self.top_k,
                                 top_p=self.top_p)  # (1,)
            if self.kv_int8:
                from frozenbilm_tpu.ops.quant import kv_quantize

                kq, vq = kv_quantize(kv_k), kv_quantize(kv_v)
                k = {"q": jax.lax.dynamic_update_slice(
                         state["k"]["q"], kq["q"], (0, slot, 0, 0, 0)),
                     "s": jax.lax.dynamic_update_slice(
                         state["k"]["s"], kq["s"], (0, slot, 0, 0))}
                v = {"q": jax.lax.dynamic_update_slice(
                         state["v"]["q"], vq["q"], (0, slot, 0, 0, 0)),
                     "s": jax.lax.dynamic_update_slice(
                         state["v"]["s"], vq["s"], (0, slot, 0, 0))}
            else:
                dt = state["k"].dtype
                k = jax.lax.dynamic_update_slice(
                    state["k"], kv_k.astype(dt), (0, slot, 0, 0, 0))
                v = jax.lax.dynamic_update_slice(
                    state["v"], kv_v.astype(dt), (0, slot, 0, 0, 0))
            T0 = kv_k.shape[3]
            row = jnp.pad(full_am.astype(jnp.float32),
                          [(0, 0), (0, Lmax - T0)])
            mask = jax.lax.dynamic_update_slice(state["mask"], row, (slot, 0))
            unf0 = (first[0] != eos) if eos is not None else jnp.asarray(True)
            new = dict(state)  # spec-mode fields pass through untouched here
            new.update({
                "k": k, "v": v, "mask": mask,
                "cur": state["cur"].at[slot].set(first[0].astype(jnp.int32)),
                "t": state["t"].at[slot].set(jnp.int32(T0)),
                "pos": state["pos"].at[slot].set(
                    jnp.sum(full_am).astype(jnp.int32)),
                "unfinished": state["unfinished"].at[slot].set(unf0),
                "temps": state["temps"].at[slot].set(temp[0]),
            })
            return self._constrain(new), first[0]

        if self.spec:
            return jax.jit(spec_admit, donate_argnums=(1,))
        return jax.jit(admit, donate_argnums=(1,))

    def _make_admit_many(self, has_video: bool, A: int):
        """One jitted program admitting A same-bucket requests: a single
        BATCHED prefill forward (amortizing both the device dispatch and the
        prefix compute over A prompts) followed by A per-slot inserts. The
        whole-batch ancestor is the window batcher's batched generate; here
        the batch is only the admission — decode stays per-slot."""
        from frozenbilm_tpu.ops.sampling import select_token

        eos, pad, Lmax = self.eos, self.pad, self.Lmax

        def admit_many(params, state, slots, ids, am, video, vmask, temps, rng):
            out = self._prefill(params, ids, am, video, vmask)
            kv_k, kv_v = out.kv  # (nl, A, nh, T0, hd)
            if has_video:
                full_am = jnp.concatenate([vmask.astype(am.dtype), am], axis=1)
            else:
                full_am = am
            firsts = select_token(out.logits[:, -1, :], rng, temperature=temps,
                                  top_k=self.top_k, top_p=self.top_p)  # (A,)
            T0 = kv_k.shape[3]
            rows = jnp.pad(full_am.astype(jnp.float32),
                           [(0, 0), (0, Lmax - T0)])
            poss = jnp.sum(full_am, axis=1).astype(jnp.int32)
            k, v = state["k"], state["v"]
            mask, cur, t = state["mask"], state["cur"], state["t"]
            pos, unf, tempsS = state["pos"], state["unfinished"], state["temps"]
            if self.kv_int8:
                from frozenbilm_tpu.ops.quant import kv_quantize

                kq, vq = kv_quantize(kv_k), kv_quantize(kv_v)
            for a in range(A):
                slot = slots[a]
                if self.kv_int8:
                    k = {"q": jax.lax.dynamic_update_slice(
                             k["q"], kq["q"][:, a:a + 1], (0, slot, 0, 0, 0)),
                         "s": jax.lax.dynamic_update_slice(
                             k["s"], kq["s"][:, a:a + 1], (0, slot, 0, 0))}
                    v = {"q": jax.lax.dynamic_update_slice(
                             v["q"], vq["q"][:, a:a + 1], (0, slot, 0, 0, 0)),
                         "s": jax.lax.dynamic_update_slice(
                             v["s"], vq["s"][:, a:a + 1], (0, slot, 0, 0))}
                else:
                    dt = k.dtype
                    k = jax.lax.dynamic_update_slice(
                        k, kv_k[:, a:a + 1].astype(dt), (0, slot, 0, 0, 0))
                    v = jax.lax.dynamic_update_slice(
                        v, kv_v[:, a:a + 1].astype(dt), (0, slot, 0, 0, 0))
                mask = jax.lax.dynamic_update_slice(
                    mask, rows[a:a + 1], (slot, 0))
                cur = cur.at[slot].set(firsts[a].astype(jnp.int32))
                t = t.at[slot].set(jnp.int32(T0))
                pos = pos.at[slot].set(poss[a])
                unf0 = (firsts[a] != eos) if eos is not None \
                    else jnp.asarray(True)
                unf = unf.at[slot].set(unf0)
                tempsS = tempsS.at[slot].set(temps[a])
            new = dict(state)
            new.update({"k": k, "v": v, "mask": mask, "cur": cur, "t": t,
                        "pos": pos, "unfinished": unf, "temps": tempsS})
            return self._constrain(new), firsts

        return jax.jit(admit_many, donate_argnums=(1,))

    def _make_step(self, C: int):
        """The compiled engine heartbeat: C single-token steps over all S
        slots in one lax.scan. Rows where `unfinished & active` is False are
        frozen (t/pos/mask untouched, pad emitted) so free and finished
        slots neither corrupt the pool nor change live rows' numerics."""
        from frozenbilm_tpu.ops.sampling import select_token

        cfg = self.cfg
        eos, pad, Lmax = self.eos, self.pad, self.Lmax

        if self.family == "gptneo":
            from frozenbilm_tpu.models.gptneo import _decode_many as _dm

            def decodeK(params, k, v, mask, u, t, pos):
                return _dm(params, cfg, k, v, mask, u, t,
                           pos, self._is_local)
        else:
            from frozenbilm_tpu.models.gptj import _decode_many as _dm

            def decodeK(params, k, v, mask, u, t, pos):
                return _dm(params, cfg, k, v, mask, u, t,
                           self._sincos[0], self._sincos[1])

        def decode1(params, k, v, mask, cur, t, pos):
            return decodeK(params, k, v, mask, cur[:, None], t, pos)

        def spec_step(params, state, active, rng, base):
            """One chunk of prompt-lookup verify steps (the in-flight twin
            of gptneo_speculative_cached's while-body): each iteration
            drafts K-1 tokens per live row from its own [prompt||generated]
            history, runs ONE K-token _decode_many at per-row depths, and
            keeps the argmax-matching prefix + 1 bonus. cur doubles as the
            trailing token l1; t keeps the invariant t = L0 + n - 1 (the
            cache slot cur was written at)."""
            from frozenbilm_tpu.ops.speculative import (accept_greedy,
                                                        lookup_draft,
                                                        mask_after_eos)

            K = self.spec + 1
            pids, pam, budget = state["pids"], state["pam"], state["budget"]
            gen_idx = jnp.arange(self.Gmax)[None, :]
            jj = jnp.arange(Lmax)[None, :]
            kk = jnp.arange(K)[None, :]
            srange = jnp.arange(self.S)

            def one(carry, i):
                k, v, mask, cur, t, pos, unf, n, out, l2 = carry
                live = unf & active & (n < budget)
                hist = jnp.concatenate([pids, out], axis=1)
                hvalid = jnp.concatenate(
                    [pam.astype(bool), gen_idx < n[:, None]], axis=1)
                drafts = lookup_draft(hist, hvalid, l2, cur, K - 1)
                u = jnp.concatenate([cur[:, None], drafts], axis=1)
                win = ((jj >= t[:, None]) & (jj < (t + K)[:, None])
                       & live[:, None])
                step_mask = jnp.maximum(mask, win.astype(mask.dtype))
                k, v, logits = decodeK(params, k, v, step_mask, u, t, pos)
                preds = jnp.argmax(logits.astype(jnp.float32),
                                   axis=-1).astype(jnp.int32)
                emitted, n_emit = accept_greedy(preds, drafts)
                n_emit = jnp.where(live, n_emit, 0)
                if eos is not None:
                    emitted, n_emit, unf = mask_after_eos(
                        emitted, n_emit, unf, eos, pad)
                d = jnp.minimum(n + n_emit, budget) - n  # per-row budget
                cols = jnp.where(kk < d[:, None], n[:, None] + kk, self.Gmax)
                out = out.at[srange[:, None], cols].set(emitted, mode="drop")
                mask = jnp.maximum(
                    mask, ((jj >= t[:, None]) & (jj < (t + d)[:, None])
                           ).astype(mask.dtype))
                e_last = jnp.take_along_axis(
                    emitted, jnp.maximum(n_emit - 1, 0)[:, None], axis=1)[:, 0]
                e_prev = jnp.take_along_axis(
                    emitted, jnp.maximum(n_emit - 2, 0)[:, None], axis=1)[:, 0]
                new_cur = jnp.where(n_emit >= 1, e_last, cur)
                new_l2 = jnp.where(n_emit >= 2, e_prev,
                                   jnp.where(n_emit == 1, cur, l2))
                return (k, v, mask, new_cur, t + d, pos + d, unf, n + d,
                        out, new_l2), None

            carry = (state["k"], state["v"], state["mask"], state["cur"],
                     state["t"], state["pos"], state["unfinished"],
                     state["n"], state["out"], state["l2"])
            carry, _ = jax.lax.scan(one, carry, jnp.arange(C))
            k, v, mask, cur, t, pos, unf, n, out, l2 = carry
            new = dict(state)
            new.update({"k": k, "v": v, "mask": mask, "cur": cur, "t": t,
                        "pos": pos, "unfinished": unf, "n": n, "out": out,
                        "l2": l2})
            return self._constrain(new), (out, n)

        def step(params, state, active, rng, base):
            # the per-iteration fold runs INSIDE the program (base is a
            # traced scalar): folding on the host was one extra tiny
            # dispatch per engine iteration over the tunnel
            rng = jax.random.fold_in(rng, 2 ** 20 + base)
            temps = state["temps"]

            def one(carry, i):
                k, v, mask, cur, t, pos, unfinished = carry
                live = unfinished & active
                mask = jnp.where(
                    live[:, None] & (jnp.arange(Lmax)[None, :] == t[:, None]),
                    1.0, mask)
                k, v, logits = decode1(params, k, v, mask, cur, t, pos)
                r = jax.random.fold_in(rng, base + i)
                nxt = select_token(logits[:, 0, :], r, temperature=temps,
                                   top_k=self.top_k, top_p=self.top_p)
                nxt = jnp.where(live, nxt, jnp.int32(pad)).astype(jnp.int32)
                if eos is not None:
                    unfinished = unfinished & (nxt != eos)
                t = jnp.where(live, t + 1, t)
                pos = jnp.where(live, pos + 1, pos)
                return (k, v, mask, nxt, t, pos, unfinished), nxt

            carry = (state["k"], state["v"], state["mask"], state["cur"],
                     state["t"], state["pos"], state["unfinished"])
            carry, toks = jax.lax.scan(one, carry, jnp.arange(C))
            k, v, mask, cur, t, pos, unfinished = carry
            new = {"k": k, "v": v, "mask": mask, "cur": cur, "t": t,
                   "pos": pos, "unfinished": unfinished, "temps": temps}
            return self._constrain(new), toks.T  # (S, C)

        if self.spec:
            return jax.jit(spec_step, donate_argnums=(1,))
        return jax.jit(step, donate_argnums=(1,))

    # -- host protocol ------------------------------------------------------

    def submit(self, ids: np.ndarray, *, video: Optional[np.ndarray] = None,
               video_mask: Optional[np.ndarray] = None,
               max_new_tokens: int = 16,
               temperature: float = 0.0,
               stream: bool = False) -> "queue.Queue":
        """Enqueue one request. ids is the UNPADDED (T,) int prompt; it is
        left-padded to the smallest bucket here (left so the prefill's
        last-position logits sit on the final real token, matching the
        whole-batch decoders). Returns a queue delivering the final
        {"tokens": [...generated, eos included...]} or {"error": ...};
        with stream=True, incremental {"delta": [...]} messages precede
        the final one."""
        ticket: "queue.Queue" = queue.Queue(maxsize=0 if stream else 1)
        ids = np.asarray(ids, np.int32).reshape(-1)
        b = _bucket_for(len(ids), self.buckets)
        delay = self.vt.max_feats if (video is not None
                                      and self.vt.features_dim) else 0
        if b is None:
            ticket.put({"error": f"prompt length {len(ids)} exceeds the "
                                 f"largest bucket {self.buckets[-1]}"})
            return ticket
        slack = (self.spec + 1) if self.spec else 0
        if b + delay + int(max_new_tokens) + slack > self.Lmax:
            ticket.put({"error": f"bucket {b} + video {delay} + "
                                 f"max_new_tokens {max_new_tokens} exceeds "
                                 f"the {self.Lmax}-position cache"})
            return ticket
        if self.spec and int(max_new_tokens) > self.Gmax:
            ticket.put({"error": f"max_new_tokens {max_new_tokens} exceeds "
                                 f"the speculative output buffer "
                                 f"({self.Gmax})"})
            return ticket
        if self.spec and float(temperature) > 0.0:
            ticket.put({"error": "speculative decoding is greedy-exact; "
                                 "temperature > 0 is not applicable"})
            return ticket
        if int(max_new_tokens) < 1:
            ticket.put({"error": "max_new_tokens must be >= 1"})
            return ticket
        padded = np.full(b, self.pad, np.int32)
        am = np.zeros(b, np.int32)
        padded[b - len(ids):] = ids
        am[b - len(ids):] = 1
        self._waiting.put({
            "ids": padded, "am": am, "video": video, "vmask": video_mask,
            "max_new": int(max_new_tokens),
            "temperature": float(temperature), "ticket": ticket,
            "out": [], "stream": bool(stream),
        })
        with self._lock:
            self.stats["requests"] += 1
        return ticket

    def _admit_one(self, req) -> bool:
        free = [i for i in range(self.S)
                if not self._active[i] and not self._cooling[i]]
        if not free:
            return False
        slot = free[0]
        b = len(req["ids"])
        has_video = req["video"] is not None
        key = (b, has_video)
        if key not in self._admit_cache:
            self._admit_cache[key] = self._make_admit(has_video)
        ids = jnp.asarray(req["ids"][None, :])
        am = jnp.asarray(req["am"][None, :])
        if has_video:
            video = jnp.asarray(np.asarray(req["video"], np.float32)[None])
            if req.get("vmask") is not None:
                vmask = jnp.asarray(
                    np.asarray(req["vmask"], np.int32)[None])
            else:
                vmask = jnp.ones((1, video.shape[1]), jnp.int32)
        else:
            video = vmask = None
        try:
            if self.spec:
                self.state, first = self._admit_cache[key](
                    self.params, self.state, np.int32(slot), ids, am, video,
                    vmask, np.int32(req["max_new"]))
                self._nprev[slot] = 1
            else:
                temp = jnp.asarray([req["temperature"]], jnp.float32)
                rng = jax.random.fold_in(self._rng, self._step_ctr)
                self._step_ctr += 1
                self.state, first = self._admit_cache[key](
                    self.params, self.state, np.int32(slot), ids, am, video,
                    vmask, temp, rng)
            if not self._pipeline:
                first = int(first)
        except Exception as e:  # noqa: BLE001
            # the req is already off _waiting and not yet in _slots —
            # _fail_inflight (via run_forever) would never see its ticket.
            # Transient faults requeue the request (same bounded policy as
            # step-fault resubmission: a just-resubmitted request must not
            # terminally fail on its first re-admission); anything else
            # errors the ticket. Either way re-raise so the caller's
            # containment resets the pool (the donated state may be
            # half-consumed).
            if (is_transient_backend_error(e)
                    and req.get("requeues", 0) < 2
                    and not (req["stream"] and req["out"])):
                req["requeues"] = req.get("requeues", 0) + 1
                req["out"] = []
                self._waiting.put(req)
                with self._lock:
                    self.stats["resubmissions"] += 1
            else:
                req["ticket"].put({"error": f"admission failed: {e!r}"})
            raise
        self._slots[slot] = req
        self._active[slot] = True
        self._disp[slot] = 1
        with self._lock:
            self.stats["admissions"] += 1
            self.stats["dispatches"] += 1
        if self._pipeline:
            # defer the first-token fetch to the processing phase: int()
            # here would block on every queued device op (one tunnel round
            # trip PER ADMISSION — 309 admissions in a 20 s serve_load leg)
            self._admitted_first.append((slot, first))
        else:
            self._emit(slot, [first])
        return True

    def _admit_group(self, reqs, slots):
        """Admit len(reqs) same-(bucket, video) requests in ONE compiled
        batched-prefill program. Error containment matches _admit_one:
        transient faults requeue (bounded), others error the tickets; the
        exception propagates so the caller's containment resets the
        half-donated pool."""
        A = len(reqs)
        b = len(reqs[0]["ids"])
        has_video = reqs[0]["video"] is not None
        key = (b, has_video, A)
        if key not in self._admit_cache:
            self._admit_cache[key] = self._make_admit_many(has_video, A)
        ids = jnp.asarray(np.stack([r["ids"] for r in reqs]))
        am = jnp.asarray(np.stack([r["am"] for r in reqs]))
        if has_video:
            video = jnp.asarray(np.stack(
                [np.asarray(r["video"], np.float32) for r in reqs]))
            vmask = jnp.asarray(np.stack(
                [np.asarray(r["vmask"], np.int32) if r.get("vmask") is not None
                 else np.ones(video.shape[1], np.int32) for r in reqs]))
        else:
            video = vmask = None
        temps = jnp.asarray([r["temperature"] for r in reqs], jnp.float32)
        rng = jax.random.fold_in(self._rng, self._step_ctr)
        self._step_ctr += 1
        try:
            self.state, firsts = self._admit_cache[key](
                self.params, self.state, np.asarray(slots, np.int32), ids,
                am, video, vmask, temps, rng)
        except Exception as e:  # noqa: BLE001
            transient = is_transient_backend_error(e)
            for r in reqs:
                if (transient and r.get("requeues", 0) < 2
                        and not (r["stream"] and r["out"])):
                    r["requeues"] = r.get("requeues", 0) + 1
                    r["out"] = []
                    self._waiting.put(r)
                    with self._lock:
                        self.stats["resubmissions"] += 1
                else:
                    r["ticket"].put({"error": f"admission failed: {e!r}"})
            raise
        for i, (r, slot) in enumerate(zip(reqs, slots)):
            self._slots[slot] = r
            self._active[slot] = True
            self._disp[slot] = 1
            if self._pipeline:
                self._admitted_first.append((slot, firsts[i]))
            else:
                self._emit(slot, [int(firsts[i])])
        with self._lock:
            self.stats["admissions"] += A
            self.stats["dispatches"] += 1

    def realized_acceptance(self):
        """(acceptance, row_steps): emitted tokens per per-row verify step
        in spec mode, cumulative. Speculation pays iff this exceeds the
        verify-step cost ratio (a K-token verify step vs a 1-token plain
        step — ~1.1x on v5e, bench.py speculative leg); serve.py's auto-off
        monitor swaps to a plain engine when it durably does not."""
        with self._lock:
            steps = self.stats["spec_row_steps"]
            if not self.spec or steps == 0:
                return None, steps
            return self.stats["spec_emitted"] / steps, steps

    def _emit(self, slot: int, toks: List[int]):
        """Append generated tokens to a slot's output; finish on eos or
        budget exhaustion (eos kept, like the whole-batch decoders).

        Streaming requests (submit(stream=True)) additionally get a
        {"delta": [...]} message per engine iteration that produced
        tokens, then the usual final {"tokens": [...]} once done."""
        req = self._slots[slot]
        if req is None:
            return
        delta = []
        done = False
        for tok in toks:
            req["out"].append(int(tok))
            delta.append(int(tok))
            with self._lock:
                self.stats["tokens"] += 1
            done = (self.eos is not None and tok == self.eos) or \
                len(req["out"]) >= req["max_new"]
            if done:
                break
        if req.get("stream") and delta:
            req["ticket"].put({"delta": delta})
        if done:
            req["ticket"].put({"tokens": req["out"]})
            self._slots[slot] = None
            self._active[slot] = False

    def _process_toks(self, toks, active_snap: np.ndarray):
        """Fetch one dispatched chunk's tokens and emit them to the slots
        that were active AT DISPATCH TIME. Slots retired since (pipelined
        lag) hold None and are skipped — their chunk is discarded junk."""
        if self.spec:
            out, n = np.asarray(toks[0]), np.asarray(toks[1])
            emitted_now = row_steps_now = 0
            for slot in range(self.S):
                if active_snap[slot] and self._slots[slot] is not None:
                    new = out[slot, self._nprev[slot]:n[slot]]
                    self._nprev[slot] = n[slot]
                    emitted_now += len(new)
                    row_steps_now += self.C
                    self._emit(slot, new.tolist())
            with self._lock:
                self.stats["spec_emitted"] += emitted_now
                self.stats["spec_row_steps"] += row_steps_now
        else:
            toks = np.asarray(toks)  # (S, C)
            for slot in range(self.S):
                if active_snap[slot] and self._slots[slot] is not None:
                    self._emit(slot, toks[slot].tolist())

    def _admit_waiting(self) -> bool:
        """Admit queued requests into free slots, same-(bucket, video)
        groups of _admit_sizes first (one batched-prefill dispatch each),
        singles for the remainder. Grouping may reorder requests across
        buckets within one iteration — acceptable: per-bucket FIFO order is
        preserved, and every pulled request is admitted or requeued this
        call. On a device fault the not-yet-admitted pulls are requeued
        before the exception propagates to the containment path."""
        if self._waiting.empty():
            return False
        free = [i for i in range(self.S)
                if not self._active[i] and not self._cooling[i]]
        pulled: List[Dict] = []
        while len(pulled) < len(free) and not self._waiting.empty():
            try:
                pulled.append(self._waiting.get_nowait())
            except queue.Empty:
                break
        if not pulled:
            return False
        admitted = False
        groups: Dict = {}
        for r in pulled:
            groups.setdefault(
                (len(r["ids"]), r["video"] is not None), []).append(r)
        singles: List[Dict] = []
        try:
            for reqs in groups.values():
                for A in self._admit_sizes:
                    while len(reqs) >= A and len(free) >= A:
                        batch = [reqs.pop(0) for _ in range(A)]
                        slots = [free.pop(0) for _ in range(A)]
                        self._admit_group(batch, slots)
                        admitted = True
                singles.extend(reqs)
                reqs.clear()
            while singles:
                r = singles.pop(0)
                if not self._admit_one(r):  # every free slot is cooling
                    self._waiting.put(r)
                    break
                admitted = True
            for r in singles:
                self._waiting.put(r)
        except Exception:
            # _admit_group/_admit_one already requeued or errored their own
            # requests; everything still pulled goes back on the queue
            for reqs in groups.values():
                for r in reqs:
                    self._waiting.put(r)
            for r in singles:
                self._waiting.put(r)
            raise
        return admitted

    def step_once(self) -> bool:
        """One engine iteration: admit -> dispatch chunk k -> process chunk
        k-1. Returns True if any work happened.

        With pipeline=True (default) the token fetch of a dispatched chunk
        is DEFERRED one iteration: the device executes chunk k while the
        host retires chunk k-1's rows, hiding the host<->device round trip
        (which dominates the loop on a remote-TPU tunnel). Costs: emission
        lags one chunk, and a retired slot cools for one iteration before
        readmission (its in-flight chunk must be discarded first) — the
        pool has >= Lmax - bucket - max_new_cap slack, so the extra junk
        chunk cannot overflow a row's KV region."""
        if self.state is None:  # deferred rebuild after a failed reset
            if self._waiting.empty():
                return False
            self._rebuild_state()
        admitted = self._admit_waiting()
        dispatched = False
        if self._active.any():
            active_snap = self._active.copy()
            # transfer the slot mask only when it changed (it only moves on
            # admission/retirement — another per-iteration round trip saved)
            if (self._active_dev is None
                    or not np.array_equal(active_snap, self._active_host)):
                self._active_dev = jnp.asarray(active_snap)
                self._active_host = active_snap
            # adaptive chunk: with an empty queue and every live row holding
            # >= 2C of budget, run the double-length program — half the
            # per-chunk dispatches in the steady state, no admission-latency
            # cost (a waiting request always forces the short chunk), and no
            # extra junk slack (no row can exhaust its budget inside 2C)
            use2 = (
                self._step_fn2 is not None
                and self._waiting.empty()
                and all(self._slots[s] is not None
                        and self._slots[s]["max_new"] - self._disp[s]
                        >= 2 * self.C
                        for s in range(self.S) if active_snap[s]))
            fn = self._step_fn2 if use2 else self._step_fn
            c_now = 2 * self.C if use2 else self.C
            self.state, toks = fn(self.params, self.state,
                                  self._active_dev, self._rng,
                                  np.int32(self._step_ctr))
            self._step_ctr += c_now
            self._disp[active_snap] += c_now
            with self._lock:
                self.stats["steps"] += c_now
                self.stats["dispatches"] += 1
                self.stats["occupancy_sum"] += int(active_snap.sum()) * c_now
            dispatched = True
            if not self._pipeline:
                self._process_toks(toks, active_snap)
                return True
        # ---- pipelined processing phase (previous chunk + admissions) ----
        pre_active = self._active.copy()
        processed = False
        if self._admitted_first:
            firsts = jax.device_get([f for _, f in self._admitted_first])
            for (slot, _), first in zip(self._admitted_first, firsts):
                self._emit(slot, [int(first)])
            self._admitted_first = []
            processed = True
        if self._pending is not None:
            prev_toks, prev_snap = self._pending
            self._pending = None
            self._process_toks(prev_toks, prev_snap)
            processed = True
        if dispatched:
            self._pending = (toks, active_snap)
            # slots retired during THIS processing phase were still active
            # in the chunk just dispatched: cool them until that chunk's
            # junk has been processed (next call), or reuse would append
            # the old row's tokens to a new request
            self._cooling = pre_active & ~self._active
        else:
            self._cooling[:] = False
        return admitted or dispatched or processed

    def drain(self):
        """Run until no queued or in-flight work remains (tests/CLI)."""
        while not self._waiting.empty() or self._active.any():
            self.step_once()

    def warm(self, with_video: bool = False):
        """Compile every admission program (singles per prompt bucket, x2
        with video, plus each batched-admission size) and both step programs
        BEFORE taking traffic: a first-use compile inside the serving loop
        would stall every in-flight slot for the full compile (minutes over
        a remote-TPU link)."""
        F, D = self.vt.max_feats, self.vt.features_dim
        for b in self.buckets:
            ids = np.full(b, self.pad, np.int32)
            self.submit(ids, max_new_tokens=1)
            if with_video and D:
                self.submit(ids, video=np.zeros((F, D), np.float32),
                            max_new_tokens=1)
        self.drain()
        # batched admission: A same-bucket requests waiting over A free
        # slots route through _admit_group, compiling the (b, video, A)
        # program. drain() between variants so groups don't merge.
        for A in self._admit_sizes:
            for b in self.buckets:
                variants = [None]
                if with_video and D:
                    variants.append(np.zeros((F, D), np.float32))
                for video in variants:
                    for _ in range(A):
                        self.submit(np.full(b, self.pad, np.int32),
                                    video=video, max_new_tokens=1)
                    self.drain()
        if self._step_fn2 is not None:
            # one request with enough budget that the first chunk dispatch
            # meets the double-chunk condition (queue empty, budget >= 2C)
            need = 2 * self.C + 2
            if self.buckets[0] + need <= self.Lmax:
                self.submit(np.full(self.buckets[0], self.pad, np.int32),
                            max_new_tokens=need)
                self.drain()

    def close(self):
        """Drop the pooled device state (serving shutdown). The owner is
        responsible for stopping its run_forever thread first."""
        self.state = None
        self._admit_cache.clear()

    def _fail_inflight(self, exc: Exception):
        """Failure containment: a raising device step (transient backend
        error, OOM) must not strand in-flight requests on tickets nobody
        will ever fill. Slots are freed and the device state is rebuilt so
        the NEXT request starts from a clean pool (the params are untouched
        — only decode state is lost).

        Transient backend faults (is_transient_backend_error) additionally
        RESUBMIT the affected requests instead of erroring them: decode
        restarts from the retained prompt on the rebuilt pool — greedy rows
        are deterministic so clients see identical tokens, sampled rows get
        a fresh (still valid) sample. Streams that already emitted deltas
        cannot be replayed and still get the error, as does any request
        already resubmitted twice (a persistent fault must not blackhole
        clients past serve_timeout_s)."""
        transient = is_transient_backend_error(exc)
        with self._lock:
            # count BEFORE filling tickets: a waiter that wakes on its
            # ticket must already see the failure in stats
            self.stats["failures"] += 1
        # pipelined leftovers reference the poisoned state: drop them
        self._pending = None
        self._admitted_first = []
        self._cooling[:] = False
        for slot in range(self.S):
            req = self._slots[slot]
            if req is not None:
                recoverable = (transient
                               and req.get("requeues", 0) < 2
                               and not (req["stream"] and req["out"]))
                if recoverable:
                    req["requeues"] = req.get("requeues", 0) + 1
                    # discard the partial output AND its token count, so
                    # tokens/throughput stats reflect DELIVERED tokens only
                    # (a replayed request would otherwise double-count its
                    # prefix). admissions/occupancy keep counting replays —
                    # that device work really happened. Spec-mode
                    # spec_emitted keeps the discarded prefix too: realized
                    # acceptance is a per-verify-step device-side ratio.
                    with self._lock:
                        self.stats["tokens"] -= len(req["out"])
                        self.stats["resubmissions"] += 1
                    req["out"] = []
                    self._waiting.put(req)
                else:
                    req["ticket"].put(
                        {"error": f"engine step failed: {exc!r}"})
                self._slots[slot] = None
            self._active[slot] = False
        if not transient:
            # a non-transient fault (poisoned program, real bug) would just
            # recur — fail queued work too rather than loop on it
            while not self._waiting.empty():
                try:
                    self._waiting.get_nowait()["ticket"].put(
                        {"error": f"engine step failed: {exc!r}"})
                except queue.Empty:
                    break
        self._nprev[:] = 0
        self._disp[:] = 0
        try:
            self._rebuild_state()
        except Exception:  # noqa: BLE001 — backend still down
            # defer: step_once retries the rebuild before admitting, so a
            # multi-hour backend outage doesn't kill the engine thread
            self.state = None

    def _rebuild_state(self):
        self.state = self._init_state()
        if self._state_shard is not None:
            self.state = jax.tree.map(
                jax.device_put, self.state, self._shard_tree(self.state))

    def run_forever(self, stop_event: threading.Event, idle_sleep: float = 0.002):
        """Serving-loop thread target. Survives device-step failures by
        erroring out the affected requests and resetting the pool."""
        import time

        while not stop_event.is_set():
            try:
                worked = self.step_once()
            except Exception as e:  # noqa: BLE001 — keep serving
                self._fail_inflight(e)
                worked = False
            if not worked and not self._active.any():
                time.sleep(idle_sleep)
