"""In-flight continuous batching engine (tasks/engine.py): greedy rows must
be token-EXACT vs the whole-batch KV-cache decoders on the same left-padded
prompt, across staggered admissions, mixed prompt buckets, slot reuse, eos
early-exit, video prefixes, and the int8 KV pool. TPU-native extension (the
reference's vendored generate, gptneo.py:850-1726, only decodes one fixed
batch to completion)."""

import queue

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frozenbilm_tpu.config import GPTJConfig, GPTNeoConfig, VideoTextConfig
from frozenbilm_tpu.tasks.engine import InflightEngine, _bucket_for


def _toy_neo():
    cfg = GPTNeoConfig(vocab_size=64, hidden_size=64, num_layers=2,
                       num_heads=4, window_size=6,
                       max_position_embeddings=128)
    vt = VideoTextConfig(features_dim=16, max_feats=4, ds_factor_attn=0,
                         ds_factor_ff=0)
    from frozenbilm_tpu.models.gptneo import init_gptneo_params

    params = init_gptneo_params(jax.random.PRNGKey(0), cfg, vt)
    return cfg, vt, params


def _toy_j():
    cfg = GPTJConfig(vocab_size=64, hidden_size=64, num_layers=2,
                     num_heads=4, rotary_dim=8, max_position_embeddings=128)
    vt = VideoTextConfig(features_dim=16, max_feats=4, ds_factor_attn=0,
                         ds_factor_ff=0)
    from frozenbilm_tpu.models.gptj import init_gptj_params

    params = init_gptj_params(jax.random.PRNGKey(0), cfg, vt)
    return cfg, vt, params


def _reference_tokens(family, cfg, vt, params, ids, buckets, max_new, eos,
                      video=None, kv_int8=False):
    """Whole-batch greedy decode of ONE request at the engine's bucketed
    padding; returns the generated region trimmed exactly as the engine
    reports it (stop at eos inclusive, else max_new tokens)."""
    if family == "gptneo":
        from frozenbilm_tpu.models.gptneo import gptneo_greedy_cached as dec
    else:
        from frozenbilm_tpu.models.gptj import gptj_greedy_cached as dec
    b = _bucket_for(len(ids), buckets)
    padded = np.zeros(b, np.int32)
    am = np.zeros(b, np.int32)
    padded[b - len(ids):] = ids
    am[b - len(ids):] = 1
    if video is not None:
        v = jnp.asarray(np.asarray(video, np.float32)[None])
        vm = jnp.ones((1, v.shape[1]), jnp.int32)
    else:
        v = vm = None
    out = np.asarray(dec(params, cfg, vt, video=v, video_mask=vm,
                         input_ids=jnp.asarray(padded[None]),
                         attention_mask=jnp.asarray(am[None]),
                         max_new_tokens=max_new, eos_token_id=eos,
                         kv_int8=kv_int8))
    gen = out[0, b:].tolist()
    if eos is not None and eos in gen:
        gen = gen[:gen.index(eos) + 1]
    return gen


def _get(ticket):
    return ticket.get(timeout=5)


def test_engine_matches_whole_batch_greedy_staggered():
    """5 requests, 3 slots, staggered arrival: requests admitted mid-flight
    into freed slots must decode exactly as a fresh whole-batch run."""
    cfg, vt, params = _toy_neo()
    rng = np.random.default_rng(0)
    eng = InflightEngine(params, cfg, vt, "gptneo", slots=3, max_len=64,
                         chunk=2, prompt_buckets=(8, 16), eos_token_id=None)
    reqs = []
    for i in range(5):
        t = int(rng.integers(4, 14))
        ids = rng.integers(3, 64, size=t).astype(np.int32)
        reqs.append((ids, 5 + i))  # varied budgets -> varied finish times
    tickets = []
    # two up front, then admit the rest after the engine is mid-decode
    for ids, mn in reqs[:2]:
        tickets.append(eng.submit(ids, max_new_tokens=mn))
    eng.step_once()
    eng.step_once()
    for ids, mn in reqs[2:]:
        tickets.append(eng.submit(ids, max_new_tokens=mn))
    eng.drain()
    for (ids, mn), ticket in zip(reqs, tickets):
        want = _reference_tokens("gptneo", cfg, vt, params, ids, eng.buckets,
                                 mn, None)
        got = _get(ticket)["tokens"]
        assert got == want, (ids.tolist(), mn)
    assert eng.stats["admissions"] == 5
    # 5 requests through 3 slots forces at least one slot reuse
    assert eng.stats["requests"] == 5


def test_engine_eos_and_video_rows():
    """eos early-exit rows free their slot and report up to eos inclusive;
    video-prefix rows ride the same pool as text-only rows."""
    from frozenbilm_tpu.models.gptneo import gptneo_greedy_cached

    cfg, vt, params = _toy_neo()
    rng = np.random.default_rng(1)
    ids = rng.integers(3, 64, size=6).astype(np.int32)
    video = rng.normal(size=(4, 16)).astype(np.float32)
    # pick an eos greedy actually emits mid-stream on the video row
    b = 8
    padded = np.zeros(b, np.int32)
    am = np.zeros(b, np.int32)
    padded[b - 6:] = ids
    am[b - 6:] = 1
    free = np.asarray(gptneo_greedy_cached(
        params, cfg, vt, video=jnp.asarray(video[None]),
        video_mask=jnp.ones((1, 4), jnp.int32),
        input_ids=jnp.asarray(padded[None]),
        attention_mask=jnp.asarray(am[None]), max_new_tokens=10,
        eos_token_id=None))
    eos = int(free[0, b + 3])

    eng = InflightEngine(params, cfg, vt, "gptneo", slots=2, max_len=64,
                         chunk=3, prompt_buckets=(8, 16), eos_token_id=eos)
    t_video = eng.submit(ids, video=video, max_new_tokens=10)
    ids2 = rng.integers(3, 64, size=10).astype(np.int32)
    t_text = eng.submit(ids2, max_new_tokens=8)
    eng.drain()
    want_v = _reference_tokens("gptneo", cfg, vt, params, ids, eng.buckets,
                               10, eos, video=video)
    want_t = _reference_tokens("gptneo", cfg, vt, params, ids2, eng.buckets,
                               8, eos)
    got_v = _get(t_video)["tokens"]
    got_t = _get(t_text)["tokens"]
    assert got_v == want_v
    assert got_t == want_t
    assert got_v[-1] == eos and len(got_v) <= 10  # early exit happened


def test_engine_gptj_and_kv_int8():
    """GPT-J family + int8 KV pool: per-row rotary positions and the
    quantized prefix insert must stay token-exact vs the whole-batch
    kv_int8 decoder."""
    cfg, vt, params = _toy_j()
    rng = np.random.default_rng(2)
    eng = InflightEngine(params, cfg, vt, "gptj", slots=2, max_len=64,
                         chunk=2, prompt_buckets=(8, 12), eos_token_id=None,
                         kv_int8=True)
    reqs = [(rng.integers(3, 64, size=int(n)).astype(np.int32), mn)
            for n, mn in ((5, 6), (11, 7), (7, 5))]
    tickets = [eng.submit(ids, max_new_tokens=mn) for ids, mn in reqs]
    eng.drain()
    for (ids, mn), ticket in zip(reqs, tickets):
        want = _reference_tokens("gptj", cfg, vt, params, ids, eng.buckets,
                                 mn, None, kv_int8=True)
        assert _get(ticket)["tokens"] == want


def test_engine_tp_sharded_matches_unsharded():
    """The pooled state sharded slots-over-'data' x heads-over-'model'
    next to TP-sharded GPT-J params must emit the SAME tokens as the
    plain single-device engine (the dryrun leg only checks it runs)."""
    import jax.numpy  # noqa: F401
    from jax.sharding import NamedSharding, PartitionSpec as P

    from frozenbilm_tpu.parallel.mesh import MeshSpec, make_mesh
    from frozenbilm_tpu.parallel.tp import gpt_param_specs, shard_params

    cfg, vt, params = _toy_j()
    rng = np.random.default_rng(8)
    reqs = [(rng.integers(3, 64, size=int(n)).astype(np.int32), mn)
            for n, mn in ((5, 6), (11, 5), (7, 4))]

    def run(params, state_sharding, slots):
        eng = InflightEngine(params, cfg, vt, "gptj", slots=slots,
                             max_len=64, chunk=2, prompt_buckets=(8, 12),
                             eos_token_id=None,
                             state_sharding=state_sharding)
        tickets = [eng.submit(ids, max_new_tokens=mn) for ids, mn in reqs]
        eng.drain()
        return [_get(t)["tokens"] for t in tickets]

    plain = run(params, None, 2)

    mesh = make_mesh(MeshSpec(data=2, model=2), devices=jax.devices()[:4])
    sharded_params = shard_params(mesh, params, gpt_param_specs(params))
    sharding = {
        "k": NamedSharding(mesh, P(None, "data", "model")),
        "v": NamedSharding(mesh, P(None, "data", "model")),
        "mask": NamedSharding(mesh, P("data")),
        "cur": NamedSharding(mesh, P("data")),
        "t": NamedSharding(mesh, P("data")),
        "pos": NamedSharding(mesh, P("data")),
        "unfinished": NamedSharding(mesh, P("data")),
        "temps": NamedSharding(mesh, P("data")),
    }
    tp = run(sharded_params, sharding, 2)
    assert tp == plain


def test_engine_composes_with_w4_quantized_params():
    """--quantize w4 + --serve_inflight: the engine on a weight-quantized
    tree must match the whole-batch greedy decoder on the SAME tree (both
    route through models/common.linear's kernel_q dispatch)."""
    from frozenbilm_tpu.ops.quant import quantize_tree

    cfg, vt, params = _toy_neo()
    qp = jax.jit(lambda p: quantize_tree(p, mode="w4"))(params)
    rng = np.random.default_rng(9)
    eng = InflightEngine(qp, cfg, vt, "gptneo", slots=2, max_len=64,
                         chunk=2, prompt_buckets=(8,), eos_token_id=None)
    assert eng.state["k"].dtype != jnp.int8  # pool stays activation-dtype
    ids = rng.integers(3, 64, size=6).astype(np.int32)
    t = eng.submit(ids, max_new_tokens=6)
    eng.drain()
    want = _reference_tokens("gptneo", cfg, vt, qp, ids, eng.buckets,
                             6, None)
    assert _get(t)["tokens"] == want


def test_engine_rejects_oversized_requests():
    cfg, vt, params = _toy_neo()
    eng = InflightEngine(params, cfg, vt, "gptneo", slots=2, max_len=32,
                         chunk=2, prompt_buckets=(8, 16))
    r = _get(eng.submit(np.arange(3, 25, dtype=np.int32)))  # 22 > 16
    assert "error" in r
    r = _get(eng.submit(np.arange(3, 9, dtype=np.int32), max_new_tokens=40))
    assert "error" in r  # 8 + 40 > 32
    eng.drain()  # nothing admitted; must return immediately


def test_engine_speculative_matches_greedy_staggered():
    """spec_draft > 0: per-slot prompt-lookup verify steps stay token-EXACT
    vs the whole-batch GREEDY decoder across staggered admission, slot
    reuse, repetitive prompts (real acceptance), mixed budgets, and eos."""
    from frozenbilm_tpu.models.gptneo import gptneo_greedy_cached

    cfg, vt, params = _toy_neo()
    rng = np.random.default_rng(5)
    eng = InflightEngine(params, cfg, vt, "gptneo", slots=2, max_len=64,
                         chunk=2, prompt_buckets=(8, 16), eos_token_id=None,
                         spec_draft=3, max_new_cap=16)
    reqs = [(np.tile([7, 8, 9, 10], 3).astype(np.int32), 12),  # repetitive
            (rng.integers(3, 64, size=6).astype(np.int32), 9),
            (rng.integers(3, 64, size=13).astype(np.int32), 7),
            (np.tile([5, 6], 4).astype(np.int32), 10)]
    tickets = [eng.submit(ids, max_new_tokens=mn) for ids, mn in reqs[:2]]
    eng.step_once()
    tickets += [eng.submit(ids, max_new_tokens=mn) for ids, mn in reqs[2:]]
    eng.drain()
    for (ids, mn), ticket in zip(reqs, tickets):
        want = _reference_tokens("gptneo", cfg, vt, params, ids, eng.buckets,
                                 mn, None)
        got = _get(ticket)["tokens"]
        assert got == want, (ids.tolist(), mn)
    # speculation actually paid: fewer verify steps than tokens
    assert eng.stats["tokens"] > eng.stats["steps"] - 2 * eng.C

    # eos trajectory: pick an eos greedy emits mid-stream
    ids = rng.integers(3, 64, size=6).astype(np.int32)
    b = 8
    padded = np.zeros(b, np.int32)
    am = np.zeros(b, np.int32)
    padded[b - 6:] = ids
    am[b - 6:] = 1
    free = np.asarray(gptneo_greedy_cached(
        params, cfg, vt, video=None, video_mask=None,
        input_ids=jnp.asarray(padded[None]),
        attention_mask=jnp.asarray(am[None]), max_new_tokens=10,
        eos_token_id=None))
    eos = int(free[0, b + 4])
    eng2 = InflightEngine(params, cfg, vt, "gptneo", slots=2, max_len=64,
                          chunk=2, prompt_buckets=(8,), eos_token_id=eos,
                          spec_draft=3, max_new_cap=16)
    t = eng2.submit(ids, max_new_tokens=10)
    eng2.drain()
    want = _reference_tokens("gptneo", cfg, vt, params, ids, eng2.buckets,
                             10, eos)
    got = _get(t)["tokens"]
    assert got == want and got[-1] == eos

    # temperature is rejected up front in speculative mode
    r = _get(eng2.submit(ids, max_new_tokens=4, temperature=0.7))
    assert "error" in r and "temperature" in r["error"]


def test_engine_speculative_gptj_kv_int8():
    """GPT-J + int8 KV pool + speculation: still exact vs whole-batch
    greedy kv_int8."""
    cfg, vt, params = _toy_j()
    rng = np.random.default_rng(6)
    eng = InflightEngine(params, cfg, vt, "gptj", slots=2, max_len=64,
                         chunk=2, prompt_buckets=(8, 12), eos_token_id=None,
                         kv_int8=True, spec_draft=4, max_new_cap=12)
    reqs = [(np.tile([7, 8, 9], 4).astype(np.int32), 10),
            (rng.integers(3, 64, size=7).astype(np.int32), 8)]
    tickets = [eng.submit(ids, max_new_tokens=mn) for ids, mn in reqs]
    eng.drain()
    for (ids, mn), ticket in zip(reqs, tickets):
        want = _reference_tokens("gptj", cfg, vt, params, ids, eng.buckets,
                                 mn, None, kv_int8=True)
        assert _get(ticket)["tokens"] == want


def test_engine_randomized_schedule_stress():
    """Seeded fuzz of the scheduler: random prompt lengths, budgets, and
    arrival points interleaved with engine iterations — every ticket must
    resolve, and every greedy row must match the whole-batch decoder."""
    cfg, vt, params = _toy_neo()
    rng = np.random.default_rng(11)
    eng = InflightEngine(params, cfg, vt, "gptneo", slots=3, max_len=64,
                         chunk=3, prompt_buckets=(8, 16), eos_token_id=None)
    pending = []
    for i in range(8):
        ids = rng.integers(3, 64, size=int(rng.integers(3, 15))).astype(
            np.int32)
        mn = int(rng.integers(1, 9))
        pending.append((ids, mn, eng.submit(ids, max_new_tokens=mn)))
        # random amount of engine progress between arrivals
        for _ in range(int(rng.integers(0, 3))):
            eng.step_once()
    eng.drain()
    for ids, mn, ticket in pending:
        want = _reference_tokens("gptneo", cfg, vt, params, ids,
                                 eng.buckets, mn, None)
        got = _get(ticket)["tokens"]
        assert got == want, (ids.tolist(), mn)
    assert eng.stats["requests"] == 8 and eng.stats["admissions"] == 8


def test_engine_step_failure_frees_inflight_requests():
    """A raising device step must not strand in-flight tickets: every live
    request gets the error, the pool is rebuilt, and the NEXT request
    decodes correctly on the fresh state."""
    import threading

    cfg, vt, params = _toy_neo()
    rng = np.random.default_rng(7)
    ids = rng.integers(3, 64, size=6).astype(np.int32)
    eng = InflightEngine(params, cfg, vt, "gptneo", slots=2, max_len=64,
                         chunk=2, prompt_buckets=(8,), eos_token_id=None)
    t1 = eng.submit(ids, max_new_tokens=8)
    eng.step_once()  # admit + first chunk on the healthy step
    orig = eng._step_fn

    def boom(*a, **k):
        raise RuntimeError("synthetic device failure")

    eng._step_fn = boom
    stop = threading.Event()
    th = threading.Thread(target=eng.run_forever, args=(stop,), daemon=True)
    th.start()
    r1 = _get(t1)
    assert "error" in r1 and "synthetic device failure" in r1["error"]
    assert eng.stats["failures"] == 1
    eng._step_fn = orig  # "backend recovered"
    ids2 = rng.integers(3, 64, size=7).astype(np.int32)
    t2 = eng.submit(ids2, max_new_tokens=5)
    r2 = t2.get(timeout=60)
    stop.set()
    th.join(timeout=5)
    want = _reference_tokens("gptneo", cfg, vt, params, ids2, eng.buckets,
                             5, None)
    assert r2["tokens"] == want  # clean pool after the reset


def test_engine_sampled_rows_ride_with_greedy():
    """Temperature rows sample (per-row temps on one compiled program) while
    greedy rows in the same pool stay exact."""
    cfg, vt, params = _toy_neo()
    rng = np.random.default_rng(3)
    ids_g = rng.integers(3, 64, size=7).astype(np.int32)
    ids_s = rng.integers(3, 64, size=7).astype(np.int32)
    eng = InflightEngine(params, cfg, vt, "gptneo", slots=2, max_len=64,
                         chunk=2, prompt_buckets=(8,), eos_token_id=None,
                         rng_seed=7)
    tg = eng.submit(ids_g, max_new_tokens=6, temperature=0.0)
    ts = eng.submit(ids_s, max_new_tokens=6, temperature=1.3)
    eng.drain()
    want = _reference_tokens("gptneo", cfg, vt, params, ids_g, eng.buckets,
                             6, None)
    assert _get(tg)["tokens"] == want
    got_s = _get(ts)["tokens"]
    assert len(got_s) == 6 and all(0 <= t < 64 for t in got_s)


def test_engine_pipeline_matches_sync_and_reference():
    """pipeline=True (default: dispatch chunk k before fetching chunk k-1,
    hiding the host<->device round trip) must emit EXACTLY the tokens of
    the synchronous engine AND the whole-batch decoder — including a
    max_new=1 request retired straight from its admission token, and slot
    reuse through the one-iteration cooling window (2 slots, 7 requests)."""
    cfg, vt, params = _toy_neo()
    rng = np.random.default_rng(11)
    reqs = []
    for i in range(7):
        t = int(rng.integers(4, 14))
        ids = rng.integers(3, 64, size=t).astype(np.int32)
        reqs.append((ids, 1 if i == 2 else 3 + i))
    outs = {}
    for pipe in (False, True):
        eng = InflightEngine(params, cfg, vt, "gptneo", slots=2, max_len=64,
                             chunk=2, prompt_buckets=(8, 16),
                             eos_token_id=None, pipeline=pipe)
        tickets = [eng.submit(ids, max_new_tokens=mn) for ids, mn in reqs[:3]]
        eng.step_once()
        eng.step_once()
        tickets += [eng.submit(ids, max_new_tokens=mn) for ids, mn in reqs[3:]]
        eng.drain()
        outs[pipe] = [_get(t)["tokens"] for t in tickets]
        assert eng.stats["requests"] == 7
    assert outs[True] == outs[False]
    for (ids, mn), got in zip(reqs, outs[True]):
        want = _reference_tokens("gptneo", cfg, vt, params, ids,
                                 (8, 16), mn, None)
        assert got == want, (ids.tolist(), mn)


def test_engine_transient_failure_resubmits_requests():
    """A TRANSIENT backend fault (tunnel FAILED_PRECONDITION) resubmits the
    in-flight requests instead of erroring them: greedy decode is a pure
    function of (params, prompt), so the client gets the exact tokens it
    would have gotten without the fault. Queued requests stay queued."""
    import threading

    cfg, vt, params = _toy_neo()
    rng = np.random.default_rng(11)
    ids = rng.integers(3, 64, size=6).astype(np.int32)
    eng = InflightEngine(params, cfg, vt, "gptneo", slots=2, max_len=64,
                         chunk=2, prompt_buckets=(8,), eos_token_id=None)
    t1 = eng.submit(ids, max_new_tokens=8)
    eng.step_once()  # admit + first chunk on the healthy step
    orig = eng._step_fn
    fired = [0]

    def boom_once(*a, **k):
        if not fired[0]:
            fired[0] = 1
            raise RuntimeError(
                "INTERNAL: ... FAILED_PRECONDITION: claim lost")
        return orig(*a, **k)

    eng._step_fn = boom_once
    stop = threading.Event()
    th = threading.Thread(target=eng.run_forever, args=(stop,), daemon=True)
    th.start()
    r1 = t1.get(timeout=120)
    stop.set()
    th.join(timeout=5)
    want = _reference_tokens("gptneo", cfg, vt, params, ids, eng.buckets,
                             8, None)
    assert r1.get("tokens") == want, r1
    assert eng.stats["failures"] == 1
    assert eng.stats["resubmissions"] == 1

    # a PERSISTENT transient-looking fault must not blackhole the client:
    # after 2 resubmissions the request errors out
    eng2 = InflightEngine(params, cfg, vt, "gptneo", slots=2, max_len=64,
                          chunk=2, prompt_buckets=(8,), eos_token_id=None)
    t2 = eng2.submit(ids, max_new_tokens=4)
    eng2.step_once()

    def boom_always(*a, **k):
        raise RuntimeError("FAILED_PRECONDITION: down for good")

    eng2._step_fn = boom_always
    stop2 = threading.Event()
    th2 = threading.Thread(target=eng2.run_forever, args=(stop2,),
                           daemon=True)
    th2.start()
    r2 = t2.get(timeout=120)
    stop2.set()
    th2.join(timeout=5)
    assert "error" in r2
    assert eng2.stats["resubmissions"] == 2


def test_engine_batched_admission_exact():
    """Groups of same-bucket requests admit through ONE batched-prefill
    program (cache key (bucket, video, A)) and stay token-exact vs the
    whole-batch decoder; mixed buckets split into groups + singles."""
    cfg, vt, params = _toy_neo()
    rng = np.random.default_rng(5)
    eng = InflightEngine(params, cfg, vt, "gptneo", slots=8, max_len=64,
                         chunk=2, prompt_buckets=(8, 12), eos_token_id=None,
                         admit_batch=4, adaptive_chunk=False)
    prompts = [rng.integers(1, 64, size=n).astype(np.int32)
               for n in (5, 6, 7, 8, 4, 6, 11, 10)]  # 6x bucket-8, 2x 12
    tickets = [eng.submit(p, max_new_tokens=5) for p in prompts]
    eng.drain()
    keys = set(eng._admit_cache)
    assert (8, False, 4) in keys, keys  # the bucket-8 four-group compiled
    assert eng.stats["admissions"] == 8
    # batched-admit collapses dispatches: 8 singles would be 8; the group
    # path does 4-group + 2 singles (bucket 8) + 2 singles (bucket 12) = 5
    for p, t in zip(prompts, tickets):
        want = _reference_tokens("gptneo", cfg, vt, params, p, (8, 12),
                                 5, None)
        got = _get(t)["tokens"]
        assert got == want, (got, want)


def test_engine_adaptive_chunk_exact_and_fewer_dispatches():
    """With an empty queue and budget >= 2C everywhere, the engine runs the
    double-length step program: fewer dispatches, identical tokens."""
    cfg, vt, params = _toy_neo()
    rng = np.random.default_rng(6)
    prompts = [rng.integers(1, 64, size=6).astype(np.int32)
               for _ in range(2)]
    results = {}
    for adaptive in (False, True):
        eng = InflightEngine(params, cfg, vt, "gptneo", slots=2, max_len=64,
                             chunk=2, prompt_buckets=(8,),
                             eos_token_id=None, admit_batch=0,
                             adaptive_chunk=adaptive)
        tickets = [eng.submit(p, max_new_tokens=13) for p in prompts]
        eng.drain()
        toks = [_get(t)["tokens"] for t in tickets]
        results[adaptive] = (toks, eng.stats["dispatches"])
    assert results[True][0] == results[False][0]
    assert results[True][1] < results[False][1], results
