"""AOT program export (utils/aot.py + scripts/export_program.py): the
serving QA scoring program round-trips through jax.export serialization
with identical outputs, and tasks/serve.py can serve from the artifact."""

import json
import threading
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("aot_env")
    model_dir = root / "bert-tiny"
    model_dir.mkdir()
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "question", "answer", "what", "is", "this",
             "cat", "dog", "bird", "park", "?", "."]
    (model_dir / "vocab.txt").write_text("\n".join(vocab))
    json.dump({
        "vocab_size": len(vocab), "hidden_size": 32, "num_hidden_layers": 2,
        "num_attention_heads": 4, "intermediate_size": 64,
        "max_position_embeddings": 64, "type_vocab_size": 2, "pad_token_id": 0,
    }, open(model_dir / "config.json", "w"))
    ans_vocab = root / "vocab.json"
    json.dump({"cat": 0, "dog": 1, "bird": 2, "park": 3}, open(ans_vocab, "w"))
    return root, model_dir, ans_vocab


def _args(model_dir, ans_vocab, extra=()):
    from frozenbilm_tpu.tasks.serve import get_serve_parser

    return get_serve_parser().parse_args([
        "--combine_datasets", "none", "--combine_datasets_val", "none",
        "--model_name", "bert-base-uncased",
        "--tokenizer_path", str(model_dir),
        "--msrvtt_vocab_path", str(ans_vocab),
        "--features_dim", "16", "--max_feats", "4", "--max_tokens", "24",
        "--batch_size_val", "4", "--serve_host", "127.0.0.1", "--port", "0",
        *extra,
    ])


def test_export_roundtrip_parity(env, tmp_path):
    """Deserialized program == the live jitted program, bit for bit."""
    import jax
    import jax.numpy as jnp

    from frozenbilm_tpu.data.tokenization import answers_to_token_ids
    from frozenbilm_tpu.data.tokenization import get_tokenizer
    from frozenbilm_tpu.models import build_model
    from frozenbilm_tpu.tasks.videoqa import make_qa_steps
    from frozenbilm_tpu.utils.aot import load_program, save_program

    _, model_dir, ans_vocab = env
    args = _args(model_dir, ans_vocab)
    tokenizer = get_tokenizer(args)
    vocab = json.load(open(ans_vocab))
    args.n_ans = len(vocab)
    bundle = build_model(args)
    params = bundle.init_params(jax.random.PRNGKey(0))
    answers = [a for a, _ in sorted(vocab.items(), key=lambda kv: kv[1])]
    params = bundle.set_answer_embeddings(
        params, answers_to_token_ids(tokenizer, answers, args.max_atokens))
    _, eval_step = make_qa_steps(bundle, tokenizer.mask_token_id, "t", topk=4)

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(5, 15, size=(4, 24)), jnp.int32)
    ids = ids.at[:, 3].set(4)  # [MASK]
    am = jnp.ones((4, 24), jnp.int32)
    video = jnp.asarray(rng.normal(size=(4, 4, 16)), jnp.float32)
    vm = jnp.ones((4, 4), jnp.int32)

    path = str(tmp_path / "qa.stablehlo")
    save_program(path, eval_step, params, ids, am, video, vm)
    reloaded = load_program(path)

    live_ids, live_p = eval_step(params, ids, am, video, vm)
    got_ids, got_p = reloaded(params, ids, am, video, vm)
    np.testing.assert_array_equal(np.asarray(live_ids), np.asarray(got_ids))
    np.testing.assert_allclose(np.asarray(live_p), np.asarray(got_p),
                               rtol=1e-6)


def test_export_cli_and_serve_from_artifact(env, tmp_path):
    """scripts/export_program.py writes artifact + meta; the HTTP server
    answers /qa from it (--program)."""
    from frozenbilm_tpu.tasks.serve import build_server
    from scripts.export_program import main as export_main

    root, model_dir, ans_vocab = env
    out = str(tmp_path / "qa.stablehlo")
    export_main([
        "--combine_datasets", "none", "--combine_datasets_val", "none",
        "--model_name", "bert-base-uncased",
        "--tokenizer_path", str(model_dir),
        "--msrvtt_vocab_path", str(ans_vocab),
        "--features_dim", "16", "--max_feats", "4", "--max_tokens", "24",
        "--batch_size_val", "4", "--out", out,
    ])
    meta = json.load(open(out + ".json"))
    assert meta["n_ans"] == 4 and meta["batch_size"] == 4

    args = _args(model_dir, ans_vocab, extra=["--program", out])
    server = build_server(args)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        req = urllib.request.Request(
            f"{url}/qa",
            json.dumps({"question": "what is this"}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            out_json = json.loads(r.read())
        answers = out_json["answers"]
        assert len(answers) >= 1
        assert set(a["answer"] for a in answers) <= {"cat", "dog", "bird", "park"}
    finally:
        server.shutdown()
