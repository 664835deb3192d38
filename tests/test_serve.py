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
             "cat", "dog", "bird", "park", "?", "."]
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


def test_serve_quantized(serve_env):
    server, url = _server(serve_env, extra=["--quantize", "w8a8"])
    try:
        status, out = _post(url, {"question": "what is this", "topk": 4})
        assert status == 200 and len(out["answers"]) == 4
    finally:
        server.shutdown()
