"""Serve-under-load bench (VERDICT r2 next #7): drive tasks/serve.py with
concurrent HTTP clients on the real chip and record p50/p95 latency and
req/s per (endpoint, precision, batching window).

Configurations:
  - /qa      deberta-v2-xlarge 0.9B, bf16 and w8a8, windows {2, 10, 25} ms
  - /generate gpt-neo-1.3B KV-cache greedy: bf16, w8a8, w4+int8-KV, and
    prompt-lookup speculative, window 10 ms; in-flight engine +- speculation

Tokenizers are toy vocabs (real SPM/BPE assets are network-blocked, see
ACCURACY.md); model dims, batch shapes, request payloads (10x768 video
features) and the full HTTP->validate->batch->jit path are the production
ones, so latency/throughput is representative.

Every leg runs in its OWN subprocess: the round-4 single-process run OOM'd
HBM at the 8th model build (shut-down servers' params stay referenced by
compiled programs) and lost the in-flight legs. The orchestrator merges
each leg's record into the output file AS IT LANDS, so a later leg's crash
cannot lose earlier data.

Run: python scripts/serve_load.py            (orchestrates all legs)
     python scripts/serve_load.py <leg>      (one leg, used internally)
Writes /tmp/serve_load_r3.json.
"""

import json
import os
import subprocess
import sys
import tempfile
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMALL = os.environ.get("FROZENBILM_LOAD_SMALL", "") == "1"
QA_CLIENTS = 4 if SMALL else 32
GEN_CLIENTS = 2 if SMALL else 8
DURATION_S = 3.0 if SMALL else 20.0
QA_WINDOWS = (2.0,) if SMALL else (2.0, 10.0, 25.0)
OUT = os.environ.get("FROZENBILM_LOAD_OUT", "/tmp/serve_load_r5.json")


def _mk_qa_env(root):
    """Toy wordpiece tokenizer + REAL deberta-v2-xlarge dims + answer vocab."""
    model_dir = os.path.join(root, "deberta-v2-xlarge")
    os.makedirs(model_dir, exist_ok=True)
    from tokenizers import Tokenizer, models, pre_tokenizers, processors

    words = ["question", "answer", "what", "is", "this", "doing", "a", "the",
             "cat", "dog", "bird", "park", "run", "sleep", "red", "blue",
             "man", "woman", "car", "ball", "in", "?", "."]
    # fast-tokenizer json (the path get_tokenizer takes for deberta when no
    # sentencepiece model exists; same fixture shape as test_data.py)
    wl = {"[PAD]": 0, "[CLS]": 1, "[SEP]": 2, "[UNK]": 3, "[MASK]": 4,
          **{w: i + 5 for i, w in enumerate(words)}}
    tok = Tokenizer(models.WordLevel(vocab=wl, unk_token="[UNK]"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.post_processor = processors.TemplateProcessing(
        single="[CLS] $A [SEP]", pair="[CLS] $A [SEP] $B [SEP]",
        special_tokens=[("[CLS]", 1), ("[SEP]", 2)])
    tok.save(os.path.join(model_dir, "tokenizer.json"))
    json.dump({"pad_token": "[PAD]", "cls_token": "[CLS]",
               "sep_token": "[SEP]", "unk_token": "[UNK]",
               "mask_token": "[MASK]"},
              open(os.path.join(model_dir, "special_tokens_map.json"), "w"))
    vocab = wl
    # real xlarge dims; toy vocab only shrinks the embedding table
    dims = (dict(hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
                 intermediate_size=128, position_buckets=16) if SMALL else
            dict(hidden_size=1536, num_hidden_layers=24,
                 num_attention_heads=24, intermediate_size=6144,
                 position_buckets=256))
    json.dump({
        "vocab_size": len(vocab), "max_position_embeddings": 512,
        "relative_attention": True, "pos_att_type": "p2c|c2p",
        "norm_rel_ebd": "layer_norm", "max_relative_positions": -1,
        "type_vocab_size": 0, "pad_token_id": 0, **dims,
    }, open(os.path.join(model_dir, "config.json"), "w"))
    ans_vocab = os.path.join(root, "ans_vocab.json")
    answers = [f"{a} {b}" for a in words[:20] for b in words[:20]][:1000]
    json.dump({a: i for i, a in enumerate(answers)}, open(ans_vocab, "w"))
    return model_dir, ans_vocab


def _mk_gen_env(root):
    from transformers.models.gpt2.tokenization_gpt2 import bytes_to_unicode

    model_dir = os.path.join(root, "gpt-neo-1p3b")
    os.makedirs(model_dir, exist_ok=True)
    symbols = list(bytes_to_unicode().values())
    vocab = {s: i for i, s in enumerate(symbols)}
    vocab["<|endoftext|>"] = len(vocab)
    json.dump(vocab, open(os.path.join(model_dir, "vocab.json"), "w"))
    with open(os.path.join(model_dir, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    # real gpt-neo-1.3B dims, toy byte-level vocab
    dims = (dict(hidden_size=64, num_layers=2, num_heads=4, window_size=8)
            if SMALL else
            dict(hidden_size=2048, num_layers=24, num_heads=16,
                 window_size=256))
    json.dump({
        "vocab_size": len(vocab), "max_position_embeddings": 2048,
        "attention_dropout": 0.0, "resid_dropout": 0.0, "embed_dropout": 0.0,
        **dims,
    }, open(os.path.join(model_dir, "config.json"), "w"))
    return model_dir


def _mk_gptj_env(root):
    """Toy byte-level vocab + REAL gpt-j-6B dims (the one-chip-6B serving
    story: 12 GB bf16 weights + engine KV pool fit a single v5e)."""
    from transformers.models.gpt2.tokenization_gpt2 import bytes_to_unicode

    model_dir = os.path.join(root, "gpt-j-6b")
    os.makedirs(model_dir, exist_ok=True)
    symbols = list(bytes_to_unicode().values())
    vocab = {s: i for i, s in enumerate(symbols)}
    vocab["<|endoftext|>"] = len(vocab)
    json.dump(vocab, open(os.path.join(model_dir, "vocab.json"), "w"))
    with open(os.path.join(model_dir, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    dims = (dict(n_embd=64, n_layer=2, n_head=4, rotary_dim=16) if SMALL
            else dict(n_embd=4096, n_layer=28, n_head=16, rotary_dim=64))
    json.dump({
        "vocab_size": len(vocab), "n_positions": 2048,
        "attn_pdrop": 0.0, "resid_pdrop": 0.0, "embd_pdrop": 0.0,
        **dims,
    }, open(os.path.join(model_dir, "config.json"), "w"))
    return model_dir


def _serve(args_list):
    from frozenbilm_tpu.tasks.serve import build_server, get_serve_parser

    args = get_serve_parser().parse_args(args_list)
    server = build_server(args)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server, f"http://127.0.0.1:{server.server_address[1]}"


def _post(url, path, payload, timeout=120):
    req = urllib.request.Request(
        f"{url}{path}", json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


def _load(url, path, payload_fn, n_clients, duration_s):
    """Closed-loop clients; returns locally-measured p50/p95 + req/s."""
    lat = []
    lock = threading.Lock()
    stop = time.perf_counter() + duration_s
    errors = [0]
    error_samples = []  # first few exception bodies — diagnosable artifact

    def client(i):
        while time.perf_counter() < stop:
            t0 = time.perf_counter()
            try:
                _post(url, path, payload_fn(i))
            except Exception as e:
                msg = repr(e)
                body = getattr(e, "read", None)
                if body is not None:
                    try:
                        msg += " body=" + e.read()[:200].decode()
                    except Exception:
                        pass
                with lock:  # same lock as lat: keep counters consistent
                    errors[0] += 1
                    if len(error_samples) < 3:
                        error_samples.append(msg[:300])
                continue
            with lock:
                lat.append(time.perf_counter() - t0)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(n_clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    lat.sort()
    n = len(lat)
    rec = {
        "clients": n_clients, "duration_s": round(wall, 1), "requests": n,
        "errors": errors[0],
        "req_per_sec": round(n / wall, 2),
        "p50_ms": round(lat[n // 2] * 1e3, 1) if n else None,
        "p95_ms": round(lat[int(n * 0.95)] * 1e3, 1) if n else None,
    }
    if error_samples:
        rec["error_samples"] = error_samples
    return rec


def _legs():
    """leg name -> (endpoint, server extra args)."""
    legs = {}
    for variant, extra in (("bf16", []), ("int8", ["--quantize", "w8a8"])):
        for window in QA_WINDOWS:
            legs[f"qa_{variant}_w{int(window)}ms"] = (
                "qa", extra + ["--serve_window_ms", str(window)])
    # decode is bandwidth-bound, so int8 weights are where W8A8 pays
    # (bench.py decode leg) — measure the precision ladder plus both
    # batching modes
    gen_variants = [("bf16", [])]
    if not SMALL:
        gen_variants += [
            ("int8", ["--quantize", "w8a8"]),
            # minimum-bytes decode: int4 weights + int8 KV cache
            ("w4kv8", ["--quantize", "w4", "--serve_kv_int8", "1"]),
            # prompt-lookup speculative greedy (token-exact; acceptance on
            # these synthetic prompts is the pessimistic regime)
            ("spec", ["--serve_speculative", "7"]),
        ]
    # in-flight continuous batching (tasks/engine.py): requests join a
    # running decode at chunk boundaries instead of waiting for the window
    # batch to finish — the latency story under mixed arrival times
    gen_variants.append(("inflight", ["--serve_inflight",
                                      "2" if SMALL else "8",
                                      "--serve_inflight_chunk", "4"]))
    if not SMALL:
        # chunk A/B: on the axon tunnel every step_once pays a host<->device
        # round trip, so larger chunks amortize it (at the cost of admission
        # latency); a local-host TPU would not pay this tax
        gen_variants.append(("inflight_c8", ["--serve_inflight", "8",
                                             "--serve_inflight_chunk", "8"]))
        gen_variants.append(("inflight_c16", ["--serve_inflight", "8",
                                              "--serve_inflight_chunk", "16"]))
        # round-5 attribution control: batched admission + adaptive chunk
        # OFF (the round-4 engine shape) at the same c8 config — the delta
        # vs inflight_c8 is exactly the two new optimizations
        gen_variants.append(("inflight_noopt",
                             ["--serve_inflight", "8",
                              "--serve_inflight_chunk", "8",
                              "--serve_admit_batch", "0",
                              "--serve_adaptive_chunk", "0"]))
    if not SMALL:
        # continuous batching + per-slot prompt-lookup speculation
        # (greedy-exact). Auto-off stays live: if realized acceptance on
        # this workload is below the verify-step cost, the server swaps to
        # a plain engine mid-leg and /stats records the acceptance.
        gen_variants.append(("inflight_spec",
                             ["--serve_inflight", "8",
                              "--serve_inflight_chunk", "2",
                              "--serve_speculative", "5"]))
        # the prompt-lookup SWEET-SPOT probe (VERDICT r4 next #5): highly
        # repetitive prompts + longer generations, the extractive/subtitle
        # regime the technique targets. Auto-off disabled so the leg
        # measures realized acceptance over its whole duration.
        gen_variants.append(("inflight_spec_rep",
                             ["--serve_inflight", "8",
                              "--serve_inflight_chunk", "2",
                              "--serve_speculative", "5",
                              "--serve_spec_auto_off_steps", "0",
                              "--serve_max_new_tokens", "48"]))
        # greedy control at the same 48-token budget
        gen_variants.append(("inflight_rep_greedy",
                             ["--serve_inflight", "8",
                              "--serve_inflight_chunk", "8",
                              "--serve_max_new_tokens", "48"]))
    for variant, extra in gen_variants:
        legs[f"generate_{variant}_w10ms"] = ("generate", extra)
    # the one-chip-6B serving story (VERDICT r3 next #7): GPT-J-6B engine
    # legs — 12 GB bf16 weights + pooled KV on a single v5e; int8 halves
    # the weight stream of every bandwidth-bound decode step
    legs["generate6b_bf16_w10ms"] = ("generate6b", [])
    legs["generate6b_inflight_w10ms"] = (
        "generate6b", ["--serve_inflight", "2" if SMALL else "4",
                       "--serve_inflight_chunk", "4"])
    if not SMALL:
        # 2 slots: the 4-slot int8 engine OOM'd warm even with donated
        # quantization; whole-batch 6B int8 decode is covered by bench.
        # admit_batch off: a second (batched) 6B prefill program is compile/
        # HBM pressure this leg cannot afford (it failed rc=1 in round 4)
        legs["generate6b_int8_inflight_w10ms"] = (
            "generate6b", ["--quantize", "w8a8", "--serve_inflight", "2",
                           "--serve_inflight_chunk", "8",
                           "--serve_admit_batch", "0"])
    return legs


def run_leg(name):
    """One (server, load) measurement in this process; returns the record."""
    if SMALL:  # CPU smoke of the harness itself
        from frozenbilm_tpu.utils.platform import force_cpu

        force_cpu(1)
    import numpy as np

    endpoint, extra = _legs()[name]
    root = tempfile.mkdtemp(prefix="serve_load_")
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(10, 768)).astype(np.float32).tolist()
    questions = ["what is the man doing", "what is this", "is the cat red",
                 "what is the woman doing in the park"]

    if endpoint == "qa":
        qa_dir, ans_vocab = _mk_qa_env(root)
        base = [
            "--combine_datasets", "none", "--combine_datasets_val", "none",
            "--model_name", "deberta-v2-xlarge", "--tokenizer_path", qa_dir,
            "--msrvtt_vocab_path", ans_vocab,
            "--max_feats", "10", "--features_dim", "768",
            "--max_tokens", "64", "--batch_size_val", "16",
            "--serve_host", "127.0.0.1", "--port", "0",
            "--param_dtype", "bfloat16",
        ]

        def payload(i):
            p = {"question": questions[i % len(questions)], "topk": 5}
            if i % 2 == 0:
                p["video_features"] = feats
            return p

        path, n_clients = "/qa", QA_CLIENTS
    else:
        if endpoint == "generate6b":
            gen_dir = _mk_gptj_env(root)
            model_name, bsv = "gpt-j-6b", "4"
        else:
            gen_dir = _mk_gen_env(root)
            model_name, bsv = "gpt-neo-1p3b", "8"
        base = [
            "--combine_datasets", "none", "--combine_datasets_val", "none",
            "--model_name", model_name, "--tokenizer_path", gen_dir,
            "--max_feats", "10", "--features_dim", "768",
            "--max_tokens", "32", "--batch_size_val", bsv,
            "--serve_host", "127.0.0.1", "--port", "0",
            "--param_dtype", "bfloat16", "--serve_max_new_tokens", "16",
            "--serve_window_ms", "10",
        ]

        if "_rep" in name:
            # repetitive subtitle-like prompts: the prompt-lookup regime
            # (generated continuations can match prompt/history n-grams)
            rep_prompts = [
                "the cat sat on the mat the cat sat on the mat the cat sat",
                "what is the man doing what is the man doing what is the "
                "man doing what is the man",
                "red blue red blue red blue red blue red blue red blue",
            ]

            def payload(i):
                return {"prompt": rep_prompts[i % len(rep_prompts)],
                        "max_new_tokens": 48}
        else:
            def payload(i):
                p = {"prompt": questions[i % len(questions)],
                     "max_new_tokens": 16}
                if i % 2 == 0:
                    p["video_features"] = feats
                return p

        path, n_clients = "/generate", GEN_CLIENTS

    server, url = _serve(base + extra)
    try:
        _post(url, path, payload(0))  # warm the HTTP path before measuring
        r = _load(url, path, payload, n_clients, DURATION_S)
        stats = json.loads(urllib.request.urlopen(
            f"{url}/stats", timeout=30).read())
        if endpoint == "qa":
            r["server_batches"] = stats["batches"]
            r["avg_batch"] = round(
                stats["requests"] / max(1, stats["batches"]), 1)
            if stats.get("backend_retries"):
                r["backend_retries"] = stats["backend_retries"]
        else:
            # engine variants: occupancy + realized speculation win
            for key in ("engine_avg_occupancy", "engine_tokens_per_step",
                        "engine_admissions", "engine_failures",
                        "engine_dispatches", "engine_resubmissions",
                        "spec_realized_acceptance",
                        "spec_auto_disabled_at_acceptance"):
                if key in stats:
                    r[key] = stats[key]
        print(f"# {name}: {r}", flush=True)
        return r
    finally:
        server.shutdown()


def _merge(name, rec):
    """Append one leg's record to OUT (read-modify-write; crash-safe)."""
    try:
        results = json.load(open(OUT))
    except Exception:
        results = {}
    results[name] = rec
    import jax

    # provenance stamp: a small-mode CPU smoke must never be mistaken for
    # an on-chip measurement when reading this file later
    results["_meta"] = {"device_kind": jax.devices()[0].device_kind,
                        "small": SMALL, "duration_s": DURATION_S}
    tmp = OUT + ".tmp"
    with open(tmp, "w") as f:
        json.dump(results, f, indent=1)
    os.replace(tmp, OUT)


def main():
    if len(sys.argv) > 1:  # child: one leg, fresh HBM
        name = sys.argv[1]
        _merge(name, run_leg(name))
        return

    for name in _legs():
        done = {}
        try:
            done = json.load(open(OUT))
        except Exception:
            pass
        if name in done and "error" not in done[name]:
            print(f"# {name}: already recorded, skipping", flush=True)
            continue
        err_tail = ""
        for attempt in range(2):
            try:
                # capture stderr so a failed leg leaves a diagnosable record
                # (round 4's generate6b_int8 leg died as an opaque "rc=1")
                p = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), name],
                    cwd=os.path.dirname(
                        os.path.dirname(os.path.abspath(__file__))),
                    stderr=subprocess.PIPE,
                    timeout=3600)  # 6B legs compile several programs
                rc = p.returncode
                if p.stderr:
                    err_tail = p.stderr[-1500:].decode(errors="replace")
            except subprocess.TimeoutExpired:
                rc = "timeout"
            if rc == 0:
                break
            print(f"# {name}: child rc={rc} (attempt {attempt})\n{err_tail}",
                  flush=True)
            time.sleep(60)  # axon claim release lag
        else:
            _merge(name, {"error": f"child failed rc={rc}",
                          "stderr_tail": err_tail})
        time.sleep(5 if SMALL else 60)  # claim release between chip procs
    print(f"# wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
