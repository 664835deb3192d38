"""Serving entry point (tasks/serve.py): continuous-batching HTTP QA
service — health, single + concurrent requests (one padded batch), request
validation, and the quantized serving configuration."""

import json
import os
import threading
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def serve_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve_env")
    model_dir = root / "bert-tiny"
    model_dir.mkdir()
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "question", "answer", "what", "is", "this", "doing",
             "cat", "dog", "bird", "park", "?", ".", "yes", "no", "it", "'"]
    (model_dir / "vocab.txt").write_text("\n".join(vocab))
    json.dump({
        "vocab_size": len(vocab), "hidden_size": 32, "num_hidden_layers": 2,
        "num_attention_heads": 4, "intermediate_size": 64,
        "max_position_embeddings": 64, "type_vocab_size": 2, "pad_token_id": 0,
    }, open(model_dir / "config.json", "w"))
    ans_vocab = root / "vocab.json"
    json.dump({"cat": 0, "dog": 1, "bird": 2, "park": 3}, open(ans_vocab, "w"))
    return model_dir, ans_vocab


def _server(serve_env, extra=()):
    from frozenbilm_tpu.tasks.serve import build_server, get_serve_parser

    model_dir, ans_vocab = serve_env
    args = get_serve_parser().parse_args([
        "--combine_datasets", "none", "--combine_datasets_val", "none",
        "--model_name", "bert-base-uncased",
        "--tokenizer_path", str(model_dir),
        "--msrvtt_vocab_path", str(ans_vocab),
        "--features_dim", "16", "--max_feats", "4", "--max_tokens", "24",
        "--batch_size_val", "4", "--serve_host", "127.0.0.1", "--port", "0",
        *extra,
    ])
    server = build_server(args)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server, f"http://127.0.0.1:{server.server_address[1]}"


def _post(url, payload):
    req = urllib.request.Request(
        f"{url}/qa", json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_serve_end_to_end(serve_env):
    server, url = _server(serve_env)
    try:
        with urllib.request.urlopen(f"{url}/healthz", timeout=10) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["n_ans"] == 4

        rng = np.random.default_rng(0)
        feats = rng.normal(size=(7, 16)).astype(np.float32).tolist()
        status, out = _post(url, {"question": "what is this doing",
                                  "video_features": feats, "topk": 3})
        assert status == 200
        answers = out["answers"]
        assert len(answers) == 3
        assert {a["answer"] for a in answers} <= {"cat", "dog", "bird", "park"}
        probs = [a["prob"] for a in answers]
        assert probs == sorted(probs, reverse=True)
        assert all(0.0 <= p <= 1.0 for p in probs)

        # concurrent requests ride one padded batch through the batcher
        results = [None] * 6
        def call(i):
            results[i] = _post(url, {"question": f"what is this {i}",
                                     "subtitles": "dog park" if i % 2 else None,
                                     "topk": 2})
        threads = [threading.Thread(target=call, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for status, out in results:
            assert status == 200 and len(out["answers"]) == 2

        status, out = _post(url, {"topk": 1})
        assert status == 400 and "question" in out["error"]
        status, out = _post(url, {"question": "x", "video_features": "garbage"})
        assert status == 400  # rejected pre-batching; never poisons a batch
        status, _ = _post(url, {"question": "x",
                                "video_features": [[0.0] * 3]})
        assert status == 400  # wrong feature dim
        status, out = _post(url, {"question": "still alive"})
        assert status == 200

        with urllib.request.urlopen(f"{url}/stats", timeout=10) as r:
            stats = json.loads(r.read())
        assert stats["requests"] >= 8 and stats["batches"] >= 1
        assert stats["batches"] < stats["requests"]  # batching actually batched
        assert stats["latency_ms_p50"] > 0
    finally:
        server.shutdown()


@pytest.fixture(scope="module")
def gen_env(tmp_path_factory):
    from transformers.models.gpt2.tokenization_gpt2 import bytes_to_unicode

    root = tmp_path_factory.mktemp("gen_env")
    model_dir = root / "gpt-neo-tiny"
    model_dir.mkdir()
    symbols = list(bytes_to_unicode().values())
    vocab = {s: i for i, s in enumerate(symbols)}
    vocab["<|endoftext|>"] = len(vocab)
    json.dump(vocab, open(model_dir / "vocab.json", "w"))
    (model_dir / "merges.txt").write_text("#version: 0.2\n")
    json.dump({
        "vocab_size": len(vocab), "hidden_size": 32, "num_layers": 2,
        "num_heads": 4, "window_size": 8, "max_position_embeddings": 128,
        "attention_dropout": 0.0, "resid_dropout": 0.0, "embed_dropout": 0.0,
    }, open(model_dir / "config.json", "w"))
    return model_dir


def test_serve_generate(gen_env):
    from frozenbilm_tpu.tasks.serve import build_server, get_serve_parser

    args = get_serve_parser().parse_args([
        "--combine_datasets", "none", "--combine_datasets_val", "none",
        "--model_name", "gpt-neo-1p3b",
        "--tokenizer_path", str(gen_env),
        "--features_dim", "16", "--max_feats", "4", "--max_tokens", "16",
        "--batch_size_val", "2", "--serve_host", "127.0.0.1", "--port", "0",
        "--serve_max_new_tokens", "6",
    ])
    server = build_server(args)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        with urllib.request.urlopen(f"{url}/healthz", timeout=10) as r:
            health = json.loads(r.read())
        assert health["endpoint"] == "/generate"

        def post(payload):
            req = urllib.request.Request(
                f"{url}/generate", json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            try:
                with urllib.request.urlopen(req, timeout=30) as r:
                    return r.status, json.loads(r.read())
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read())

        # greedy (temperature omitted) is deterministic across calls
        s1, o1 = post({"prompt": "a dog"})
        s2, o2 = post({"prompt": "a dog"})
        assert s1 == s2 == 200
        assert o1["tokens"] == o2["tokens"]
        assert len(o1["tokens"]) <= 6 and isinstance(o1["text"], str)

        # per-request truncation
        s3, o3 = post({"prompt": "a dog", "max_new_tokens": 2})
        assert s3 == 200 and len(o3["tokens"]) <= 2
        assert o3["tokens"] == o1["tokens"][:len(o3["tokens"])]

        # sampled rows accepted; video features too
        rng = np.random.default_rng(0)
        feats = rng.normal(size=(5, 16)).astype(np.float32).tolist()
        s4, o4 = post({"prompt": "a cat", "temperature": 1.2,
                       "video_features": feats})
        assert s4 == 200 and len(o4["tokens"]) <= 6

        # validation: missing prompt / bad temperature rejected pre-batch
        s5, o5 = post({"temperature": 1.0})
        assert s5 == 400 and "prompt" in o5["error"]
        s6, o6 = post({"prompt": "x", "temperature": -1})
        assert s6 == 400
        # /qa is not served in generate mode
        req = urllib.request.Request(
            f"{url}/qa", json.dumps({"question": "x"}).encode(),
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=10) as r:
                code = r.status
        except urllib.error.HTTPError as e:
            code = e.code
        assert code == 404
    finally:
        server.shutdown()


def test_serve_generate_beam(gen_env):
    """--serve_num_beams switches /generate to beam decode: deterministic,
    and per-request num_beams conflicting with the server program is a 400."""
    from frozenbilm_tpu.tasks.serve import build_server, get_serve_parser

    args = get_serve_parser().parse_args([
        "--combine_datasets", "none", "--combine_datasets_val", "none",
        "--model_name", "gpt-neo-1p3b",
        "--tokenizer_path", str(gen_env),
        "--features_dim", "16", "--max_feats", "4", "--max_tokens", "16",
        "--batch_size_val", "2", "--serve_host", "127.0.0.1", "--port", "0",
        "--serve_max_new_tokens", "5", "--serve_num_beams", "3",
    ])
    server = build_server(args)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        def post(payload):
            req = urllib.request.Request(
                f"{url}/generate", json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            try:
                with urllib.request.urlopen(req, timeout=60) as r:
                    return r.status, json.loads(r.read())
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read())

        s1, o1 = post({"prompt": "a dog", "num_beams": 3})
        s2, o2 = post({"prompt": "a dog"})  # rides the same beam program
        assert s1 == s2 == 200
        assert o1["tokens"] == o2["tokens"]  # beam decode is deterministic
        assert len(o1["tokens"]) <= 5
        s3, o3 = post({"prompt": "x", "num_beams": 2})
        assert s3 == 400 and "num_beams" in o3["error"]
    finally:
        server.shutdown()


def test_serve_generate_speculative(gen_env):
    """--serve_speculative: greedy-EXACT tokens (compare against a plain
    greedy server on the same prompt), temperature rejected pre-batch."""
    from frozenbilm_tpu.tasks.serve import build_server, get_serve_parser

    base = [
        "--combine_datasets", "none", "--combine_datasets_val", "none",
        "--model_name", "gpt-neo-1p3b",
        "--tokenizer_path", str(gen_env),
        "--features_dim", "16", "--max_feats", "4", "--max_tokens", "16",
        "--batch_size_val", "2", "--serve_host", "127.0.0.1", "--port", "0",
        "--serve_max_new_tokens", "6",
    ]

    def run_one(extra, payloads):
        args = get_serve_parser().parse_args(base + extra)
        server = build_server(args)
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        url = f"http://127.0.0.1:{server.server_address[1]}"
        outs = []
        try:
            for p in payloads:
                req = urllib.request.Request(
                    f"{url}/generate", json.dumps(p).encode(),
                    headers={"Content-Type": "application/json"})
                try:
                    with urllib.request.urlopen(req, timeout=60) as r:
                        outs.append((r.status, json.loads(r.read())))
                except urllib.error.HTTPError as e:
                    outs.append((e.code, json.loads(e.read())))
        finally:
            server.shutdown()
        return outs

    payloads = [{"prompt": "a dog sits"}, {"prompt": "x", "temperature": 1.0}]
    spec = run_one(["--serve_speculative", "4"], payloads)
    greedy = run_one([], payloads[:1])
    assert spec[0][0] == 200 and greedy[0][0] == 200
    assert spec[0][1]["tokens"] == greedy[0][1]["tokens"]  # greedy-exact
    assert spec[1][0] == 400 and "temperature" in spec[1][1]["error"]


def test_serve_generate_inflight(gen_env):
    """--serve_inflight: the continuous-batching engine serves /generate
    with greedy tokens EXACTLY matching the window-batching server, honors
    per-request max_new_tokens natively (early slot retirement), takes
    concurrent mixed traffic, and rejects beam/speculative combos."""
    import concurrent.futures

    from frozenbilm_tpu.tasks.serve import build_server, get_serve_parser

    base = [
        "--combine_datasets", "none", "--combine_datasets_val", "none",
        "--model_name", "gpt-neo-1p3b",
        "--tokenizer_path", str(gen_env),
        "--features_dim", "16", "--max_feats", "4", "--max_tokens", "16",
        "--batch_size_val", "2", "--serve_host", "127.0.0.1", "--port", "0",
        "--serve_max_new_tokens", "6",
    ]

    def start(extra):
        args = get_serve_parser().parse_args(base + extra)
        server = build_server(args)
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        return server, f"http://127.0.0.1:{server.server_address[1]}"

    def post(url, payload, timeout=60):
        req = urllib.request.Request(
            f"{url}/generate", json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=timeout) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(5, 16)).astype(np.float32).tolist()
    prompts = [{"prompt": "a dog sits"},
               {"prompt": "the cat"},
               {"prompt": "a dog sits", "max_new_tokens": 2},
               {"prompt": "water", "video_features": feats}]

    win_server, win_url = start([])
    try:
        want = [post(win_url, p) for p in prompts]
    finally:
        win_server.shutdown()

    inf_server, inf_url = start(["--serve_inflight", "2",
                                 "--serve_inflight_chunk", "2"])
    try:
        # concurrent mixed traffic through 2 slots (forces slot reuse and
        # mid-flight admission)
        with concurrent.futures.ThreadPoolExecutor(4) as pool:
            got = list(pool.map(lambda p: post(inf_url, p), prompts))
        for (ws, wo), (gs, go), p in zip(want, got, prompts):
            assert ws == gs == 200
            assert go["tokens"] == wo["tokens"], p
        # sampled request rides the same engine
        s, o = post(inf_url, {"prompt": "a dog", "temperature": 1.2})
        assert s == 200 and len(o["tokens"]) <= 6
        # stats expose engine occupancy
        with urllib.request.urlopen(f"{inf_url}/stats", timeout=10) as r:
            stats = json.loads(r.read())
        assert stats["engine_admissions"] >= 5
        assert stats["engine_avg_occupancy"] is not None
    finally:
        inf_server.shutdown()

    # speculative composes with the engine: per-slot prompt-lookup drafts,
    # still greedy-exact vs the window server; temperature rejected
    spec_server, spec_url = start(["--serve_inflight", "2",
                                   "--serve_inflight_chunk", "2",
                                   "--serve_speculative", "3"])
    try:
        for (ws, wo), p in zip(want[:3], prompts[:3]):
            gs, go = post(spec_url, p)
            assert gs == 200 and go["tokens"] == wo["tokens"], p
        s, o = post(spec_url, {"prompt": "a dog", "temperature": 1.2})
        assert s == 400 and "temperature" in o["error"]
    finally:
        spec_server.shutdown()

    # streaming: chunked NDJSON deltas whose concatenation equals the
    # non-streaming result; rejected without --serve_inflight
    str_server, str_url = start(["--serve_inflight", "2",
                                 "--serve_inflight_chunk", "2"])
    try:
        req = urllib.request.Request(
            f"{str_url}/generate",
            json.dumps({"prompt": "a dog sits", "stream": True}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            assert r.headers.get("Content-Type") == "application/x-ndjson"
            lines = [json.loads(ln) for ln in r.read().splitlines() if ln]
        assert lines[-1].get("done") is True
        deltas = [ln for ln in lines[:-1] if "delta_tokens" in ln]
        assert len(deltas) >= 2  # 5 tokens / chunk 2 -> >= 3 emissions
        joined = [t for d in deltas for t in d["delta_tokens"]]
        # deltas include eos if emitted; the final line is trimmed
        assert joined[:len(lines[-1]["tokens"])] == lines[-1]["tokens"]
        assert "".join(d["delta_text"] for d in deltas) == \
            lines[-1]["text"]
        assert lines[-1]["tokens"] == want[0][1]["tokens"]  # greedy-exact
    finally:
        str_server.shutdown()

    # beam + inflight is rejected at build time
    import pytest as _pytest

    args = get_serve_parser().parse_args(
        base + ["--serve_inflight", "2", "--serve_num_beams", "3"])
    with _pytest.raises(ValueError, match="serve_inflight"):
        build_server(args)

    # stream without the engine is a 400
    win2, win2_url = start([])
    try:
        s, o = post(win2_url, {"prompt": "a dog", "stream": True})
        assert s == 400 and "serve_inflight" in o["error"]
    finally:
        win2.shutdown()


def test_serve_mc(serve_env):
    """--serve_mc: multiple-choice candidate scoring at /mc (reference
    mc.py semantics: P('Yes') at the mask per candidate), short candidate
    lists padded internally, validation rejects empty/oversized lists."""
    server, url = _server(serve_env, extra=["--serve_mc", "4"])
    try:
        def post(payload):
            req = urllib.request.Request(
                f"{url}/mc", json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            try:
                with urllib.request.urlopen(req, timeout=30) as r:
                    return r.status, json.loads(r.read())
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read())

        with urllib.request.urlopen(f"{url}/healthz", timeout=10) as r:
            assert json.loads(r.read())["endpoint"] == "/mc"
        rng = np.random.default_rng(0)
        feats = rng.normal(size=(5, 16)).astype(np.float32).tolist()
        s, o = post({"question": "what is this", "video_features": feats,
                     "candidates": ["cat", "dog", "bird"]})
        assert s == 200 and len(o["scores"]) == 3
        assert all(0.0 <= p <= 1.0 for p in o["scores"])
        assert o["pred"] == int(np.argmax(o["scores"]))
        # deterministic across calls; padding (3 < mc=4) doesn't leak
        s2, o2 = post({"question": "what is this", "video_features": feats,
                       "candidates": ["cat", "dog", "bird"]})
        assert s2 == 200 and o2["scores"] == o["scores"]
        # full list and subtitles path
        s3, o3 = post({"question": "what is the dog doing",
                       "subtitles": "the dog is in the park",
                       "candidates": ["cat", "dog", "bird", "park"]})
        assert s3 == 200 and len(o3["scores"]) == 4
        # validation
        s4, o4 = post({"question": "x", "candidates": []})
        assert s4 == 400 and "candidates" in o4["error"]
        s5, o5 = post({"question": "x",
                       "candidates": ["a", "b", "c", "d", "e"]})
        assert s5 == 400 and "at most 4" in o5["error"]
        s6, _ = post({"candidates": ["a"]})
        assert s6 == 400
    finally:
        server.shutdown()


def test_serve_quantized(serve_env):
    server, url = _server(serve_env, extra=["--quantize", "w8a8"])
    try:
        status, out = _post(url, {"question": "what is this", "topk": 4})
        assert status == 200 and len(out["answers"]) == 4
    finally:
        server.shutdown()


def test_serve_spec_auto_off(gen_env):
    """Speculation auto-off (VERDICT r3 next #5): when realized acceptance
    stays below --serve_spec_min_accept after the warmup window, the
    in-flight service swaps to a plain (spec_draft=0) engine ONCE; new
    requests keep serving greedy-exact tokens and /stats records the
    acceptance that triggered the swap."""
    import time as _time

    from frozenbilm_tpu.tasks.serve import build_server, get_serve_parser

    base = [
        "--combine_datasets", "none", "--combine_datasets_val", "none",
        "--model_name", "gpt-neo-1p3b",
        "--tokenizer_path", str(gen_env),
        "--features_dim", "16", "--max_feats", "4", "--max_tokens", "16",
        "--batch_size_val", "2", "--serve_host", "127.0.0.1", "--port", "0",
        "--serve_max_new_tokens", "6",
    ]

    def post(url, payload, timeout=60):
        req = urllib.request.Request(
            f"{url}/generate", json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, json.loads(r.read())

    def start(extra):
        args = get_serve_parser().parse_args(base + extra)
        server = build_server(args)
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        return server, f"http://127.0.0.1:{server.server_address[1]}"

    win_server, win_url = start([])
    try:
        want = post(win_url, {"prompt": "a dog sits"})
    finally:
        win_server.shutdown()

    # an impossible acceptance floor guarantees the swap fires as soon as
    # the (tiny) warmup window fills
    server, url = start(["--serve_inflight", "2",
                         "--serve_inflight_chunk", "2",
                         "--serve_speculative", "3",
                         "--serve_spec_auto_off_steps", "4",
                         "--serve_spec_min_accept", "100.0"])
    try:
        svc = server.service
        assert svc.engine.spec == 3
        s, o = post(url, {"prompt": "a dog sits"})
        assert s == 200 and o["tokens"] == want[1]["tokens"]
        deadline = _time.monotonic() + 120
        while svc.spec_disabled_at is None and _time.monotonic() < deadline:
            post(url, {"prompt": "a dog sits"})
            _time.sleep(0.05)
        assert svc.spec_disabled_at is not None, "auto-off never fired"
        assert svc.engine.spec == 0  # plain engine swapped in
        # the swapped-in engine still serves exact greedy tokens
        s, o = post(url, {"prompt": "a dog sits"})
        assert s == 200 and o["tokens"] == want[1]["tokens"]
        with urllib.request.urlopen(f"{url}/stats", timeout=10) as r:
            stats = json.loads(r.read())
        assert "spec_auto_disabled_at_acceptance" in stats
    finally:
        server.shutdown()


def test_batcher_transient_retry():
    """One transient tunnel fault must not 500 a whole batch.

    serve_load_r4's /qa legs showed 2-12 errors per run — exactly one or two
    failed batches of ~10: a single FAILED_PRECONDITION from the remote-TPU
    tunnel failed every request in the window batch. Scoring is a pure
    function of (params, batch), so _Batcher retries transient faults."""
    from frozenbilm_tpu.tasks.serve import _Batcher, _is_transient_backend_error

    class FlakyService:
        batch_size = 4

        def __init__(self, fail_times, msg):
            self.fails_left = fail_times
            self.msg = msg
            self.calls = 0

        def score(self, payloads):
            self.calls += 1
            if self.fails_left:
                self.fails_left -= 1
                raise RuntimeError(self.msg)
            return [{"answer": "ok"} for _ in payloads]

    svc = FlakyService(1, "INTERNAL: ... FAILED_PRECONDITION: claim lost")
    b = _Batcher(svc, window_ms=1.0)
    out = b.submit({"question": "q"})
    assert out == {"answer": "ok"}
    assert svc.calls == 2
    assert b.stats()["backend_retries"] == 1

    # non-transient errors still propagate immediately (no retry)
    svc2 = FlakyService(1, "ValueError: bad shape (8, 7)")
    b2 = _Batcher(svc2, window_ms=1.0)
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        b2.submit({"question": "q"})
    assert svc2.calls == 1
    assert b2.stats()["backend_retries"] == 0

    # a persistent transient fault gives up after 3 attempts
    svc3 = FlakyService(99, "FAILED_PRECONDITION: down for good")
    b3 = _Batcher(svc3, window_ms=1.0)
    with _pytest.raises(RuntimeError):
        b3.submit({"question": "q"})
    assert svc3.calls == 3
    assert _is_transient_backend_error(RuntimeError("DEADLINE_EXCEEDED"))
