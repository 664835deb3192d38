"""Converter CLI + optimizer-state checkpoint/resume tests."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest


def test_convert_features_cli(tmp_path):
    import torch

    feats = {f"v{i}": torch.randn(5, 8) for i in range(3)}
    pth = tmp_path / "clipvitl14.pth"
    torch.save(feats, pth)
    from scripts.convert import convert_features

    class A:
        pass

    a = A(); a.pth = str(pth); a.out = str(tmp_path / "packed")
    a.features_dim = 8; a.dtype = "float16"
    convert_features(a)
    from frozenbilm_tpu.data.features import PackedFeatureStore

    store = PackedFeatureStore(str(tmp_path / "packed"))
    np.testing.assert_allclose(store.get("v1"), feats["v1"].numpy(), atol=1e-2)


def test_convert_checkpoint_cli(tmp_path):
    """Reference-format .pth (partial, adapters only) -> native params dir."""
    import torch

    # a fake released downstream ckpt: only updated params, wrapped in {model:}
    sd = {
        "model": {
            "deberta.embeddings.linear_video.weight": torch.randn(64, 768),
            "deberta.embeddings.linear_video.bias": torch.randn(64),
        }
    }
    pth = tmp_path / "downstream.pth"
    torch.save(sd, pth)
    from scripts.convert import convert_checkpoint

    class A:
        pass

    a = A(); a.pth = str(pth); a.model_name = "deberta-v2-xlarge"
    a.out = str(tmp_path / "native"); a.n_ans = 0; a.ds_factor = 8
    a.features_dim = 768; a.quantize = "none"; a.fmt = "npz"
    # shrink: overlay requires shape match on linear_video (hidden 1536) -> expect failure
    with pytest.raises(ValueError):
        convert_checkpoint(a)
    # correct hidden size
    sd["model"]["deberta.embeddings.linear_video.weight"] = torch.randn(1536, 768)
    sd["model"]["deberta.embeddings.linear_video.bias"] = torch.randn(1536)
    torch.save(sd, pth)
    convert_checkpoint(a)
    from frozenbilm_tpu.utils.checkpoint import load_params

    params, meta = load_params(str(tmp_path / "native"))
    assert params["embeddings"]["linear_video"]["kernel"].shape == (768, 1536)
    assert meta["model_name"] == "deberta-v2-xlarge"


def test_opt_state_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    import optax

    params = {"a": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros(4)}}
    tx = optax.chain(optax.clip_by_global_norm(0.1), optax.adam(1e-3))
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    _, opt_state = tx.update(grads, opt_state, params)

    from frozenbilm_tpu.utils.checkpoint import load_opt_state, save_opt_state

    save_opt_state(str(tmp_path), opt_state)
    restored = load_opt_state(str(tmp_path), tx.init(params))
    for a, b in zip(jax.tree.leaves(opt_state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pretrain_resume(tmp_path):
    """Train 1 epoch, resume from its checkpoint: optimizer state and
    start_epoch restore (reference --resume, main.py:241-243)."""
    import pandas as pd

    from frozenbilm_tpu.config import get_args_parser
    from frozenbilm_tpu.tasks.pretrain import main

    model_dir = tmp_path / "bert-tiny"
    model_dir.mkdir()
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "a", "cat", "dog"]
    (model_dir / "vocab.txt").write_text("\n".join(vocab))
    json.dump({
        "vocab_size": len(vocab), "hidden_size": 32, "num_hidden_layers": 2,
        "num_attention_heads": 4, "intermediate_size": 64,
        "max_position_embeddings": 32, "type_vocab_size": 2, "pad_token_id": 0,
    }, open(model_dir / "config.json", "w"))
    webvid = tmp_path / "WebVid"
    webvid.mkdir()
    for split in ("train", "val"):
        pd.DataFrame({"video_id": ["v0"] * 8, "text": ["a cat"] * 8}).to_csv(
            webvid / f"{split}_captions.csv", index=False)
    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    np.save(feat_dir / "v0.mp4.npy", np.random.default_rng(0).normal(size=(4, 8)).astype(np.float32))

    save = tmp_path / "run"
    base = [
        "--combine_datasets", "webvid", "--combine_datasets_val", "webvid",
        "--model_name", "bert-base-uncased", "--tokenizer_path", str(model_dir),
        "--webvid_train_csv_path", str(webvid / "train_captions.csv"),
        "--webvid_val_csv_path", str(webvid / "val_captions.csv"),
        "--webvid_features_path", str(feat_dir),
        "--features_dim", "8", "--max_feats", "4", "--max_tokens", "12",
        "--batch_size", "8", "--batch_size_val", "8", "--print_freq", "1",
        "--lr", "1e-3", "--save_dir", str(save),
    ]
    main(get_args_parser().parse_args(base + ["--epochs", "1"]))
    ckpt = save / "checkpoint0000"
    assert (ckpt / "opt_state.npz").exists()

    log = main(get_args_parser().parse_args(
        base + ["--epochs", "2", "--load", str(ckpt), "--resume"]))
    # resumed run trains only epoch 1
    assert [e["epoch"] for e in log] == [1]


def test_orbax_checkpoint_roundtrip(tmp_path):
    """--ckpt_format orbax: None-pruned partition tree roundtrips through
    the orbax backend; load_params auto-detects the format."""
    import jax.numpy as jnp

    from frozenbilm_tpu.utils.checkpoint import load_params, save_params

    tree = {
        "embeddings": {"linear_video": {"kernel": jnp.ones((4, 8), jnp.bfloat16),
                                        "bias": jnp.zeros((8,))},
                       "word_embeddings": None},  # frozen leaf, pruned
        "encoder": {"layers": {"adapter": {"down": jnp.arange(6.0).reshape(2, 3)}}},
    }
    save_params(str(tmp_path / "ck"), tree, {"epoch": 3}, fmt="orbax")
    back, meta = load_params(str(tmp_path / "ck"))
    assert meta["epoch"] == 3
    assert back["embeddings"]["linear_video"]["kernel"].dtype == jnp.bfloat16
    assert "word_embeddings" not in back["embeddings"]
    np.testing.assert_array_equal(
        np.asarray(back["encoder"]["layers"]["adapter"]["down"]),
        np.arange(6.0).reshape(2, 3))
    # overwrite semantics match npz (second save replaces)
    save_params(str(tmp_path / "ck"), tree, {"epoch": 4}, fmt="orbax")
    _, meta2 = load_params(str(tmp_path / "ck"))
    assert meta2["epoch"] == 4


def test_orbax_async_checkpoint_roundtrip(tmp_path):
    """save_params(block=False) issues the orbax save asynchronously;
    load_params drains pending saves first, so an immediate read-back sees
    the durable checkpoint. Consecutive async saves to the same target
    serialize (the second waits for the first before rmtree)."""
    import jax.numpy as jnp

    from frozenbilm_tpu.utils.checkpoint import (load_params, save_params,
                                                 wait_for_pending_saves)

    tree = {"adapter": {"down": jnp.arange(8.0).reshape(2, 4)},
            "frozen": None}
    save_params(str(tmp_path / "ck"), tree, {"epoch": 0}, fmt="orbax",
                block=False)
    # immediate overwrite while the first save may still be in flight
    tree2 = {"adapter": {"down": jnp.arange(8.0).reshape(2, 4) + 1.0},
             "frozen": None}
    save_params(str(tmp_path / "ck"), tree2, {"epoch": 1}, fmt="orbax",
                block=False)
    back, meta = load_params(str(tmp_path / "ck"))
    assert meta["epoch"] == 1
    np.testing.assert_array_equal(np.asarray(back["adapter"]["down"]),
                                  np.arange(8.0).reshape(2, 4) + 1.0)
    wait_for_pending_saves()  # idempotent after drain


def test_quantized_checkpoint_export_and_load(tmp_path):
    """scripts/convert.py --quantize: int8 kernels on disk; overlay_into
    replaces the template's full-precision node wholesale; training drivers
    reject the quantized tree."""
    import jax
    import jax.numpy as jnp
    import pytest

    from frozenbilm_tpu.config import DebertaV2Config, VideoTextConfig
    from frozenbilm_tpu.models.deberta import init_deberta_params
    from frozenbilm_tpu.ops.quant import is_quantized
    from frozenbilm_tpu.train.partition import (
        apply_quantization,
        reject_quantized_for_training,
    )
    from frozenbilm_tpu.utils.checkpoint import load_params, overlay_into, save_params

    cfg = DebertaV2Config(vocab_size=120, hidden_size=128, num_hidden_layers=2,
                          num_attention_heads=4, intermediate_size=256,
                          max_position_embeddings=64, position_buckets=8)
    vt = VideoTextConfig(features_dim=16, max_feats=4, ds_factor_attn=4,
                         ds_factor_ff=4, n_ans=0)
    params = init_deberta_params(jax.random.PRNGKey(0), cfg, vt)
    qparams = apply_quantization(params, vt, "w8a8")
    save_params(str(tmp_path / "q"), qparams, {"quantize": "w8a8"})
    loaded, meta = load_params(str(tmp_path / "q"))
    assert meta["quantize"] == "w8a8"
    assert loaded["encoder"]["layers"]["attention"]["self"]["qkv_proj"][
        "kernel_q"].dtype == np.int8

    template = init_deberta_params(jax.random.PRNGKey(1), cfg, vt)
    merged = overlay_into(template, loaded)
    q_node = merged["encoder"]["layers"]["attention"]["self"]["qkv_proj"]
    assert "kernel_q" in q_node and "kernel" not in q_node  # replaced wholesale
    assert is_quantized(merged)

    reject_quantized_for_training(merged, eval_mode=True)  # fine for eval
    with pytest.raises(ValueError, match="eval-only"):
        reject_quantized_for_training(merged, eval_mode=False)


def test_inspect_ckpt_cli(tmp_path, capsys):
    """scripts/inspect_ckpt.py summarizes any load_params checkpoint."""
    import jax.numpy as jnp

    from frozenbilm_tpu.utils.checkpoint import save_params
    from scripts.inspect_ckpt import main as inspect_main

    class A:
        model_name = "bert-base-uncased"
        lr = 1e-3

        def __init__(self):
            self.__dict__.update(model_name="bert-base-uncased", lr=1e-3)

    tree = {"adapter": {"down": jnp.ones((4, 8), jnp.bfloat16)},
            "frozen": None}
    from frozenbilm_tpu.utils.checkpoint import ckpt_meta

    save_params(str(tmp_path), tree, ckpt_meta(A(), epoch=5))
    # bf16 must round-trip through npz with its dtype (not void '|V2')
    from frozenbilm_tpu.utils.checkpoint import load_params

    back, _ = load_params(str(tmp_path))
    assert back["adapter"]["down"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(back["adapter"]["down"], np.float32),
                                  np.ones((4, 8), np.float32))
    inspect_main([str(tmp_path), "--leaves"])
    out = capsys.readouterr().out
    assert "1 leaves" in out and "bfloat16" in out
    assert '"epoch": 5' in out and "bert-base-uncased" in out
    assert "adapter/down" in out


@pytest.fixture
def _restore_compile_cache_config():
    """--compile_cache sets PROCESS-GLOBAL jax config (setup_runtime); left
    enabled it makes every later test's compiles write cache entries into
    this test's tmp_path — a full-suite run segfaulted inside
    compilation_cache.put_executable_and_time during test_trainer
    (pytest_r5: cache write active in an unrelated CPU pjit). Restore."""
    import jax

    old = (jax.config.jax_compilation_cache_dir,
           jax.config.jax_persistent_cache_min_compile_time_secs,
           jax.config.jax_persistent_cache_min_entry_size_bytes)
    yield
    jax.config.update("jax_compilation_cache_dir", old[0])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", old[1])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", old[2])


def test_pretrain_production_flag_combo(tmp_path, _restore_compile_cache_config):
    """All round-2 production knobs together through the CLI: async orbax
    checkpoints + retention + grad accumulation + non-finite skipping +
    compile cache. Guards against flag-interaction regressions."""
    import pandas as pd

    from frozenbilm_tpu.config import get_args_parser
    from frozenbilm_tpu.tasks.pretrain import main

    model_dir = tmp_path / "bert-tiny"
    model_dir.mkdir()
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "a", "cat", "dog"]
    (model_dir / "vocab.txt").write_text("\n".join(vocab))
    json.dump({
        "vocab_size": len(vocab), "hidden_size": 32, "num_hidden_layers": 2,
        "num_attention_heads": 4, "intermediate_size": 64,
        "max_position_embeddings": 32, "type_vocab_size": 2, "pad_token_id": 0,
    }, open(model_dir / "config.json", "w"))
    webvid = tmp_path / "WebVid"
    webvid.mkdir()
    for split in ("train", "val"):
        pd.DataFrame({"video_id": ["v0"] * 16, "text": ["a cat"] * 16}).to_csv(
            webvid / f"{split}_captions.csv", index=False)
    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    np.save(feat_dir / "v0.mp4.npy",
            np.random.default_rng(0).normal(size=(4, 8)).astype(np.float32))

    save = tmp_path / "run"
    # batch 16: grad_accum 2 x 8-device mesh needs microbatches that still
    # fill the data axis (the guard under test refuses 8)
    log = main(get_args_parser().parse_args([
        "--combine_datasets", "webvid", "--combine_datasets_val", "webvid",
        "--model_name", "bert-base-uncased", "--tokenizer_path", str(model_dir),
        "--webvid_train_csv_path", str(webvid / "train_captions.csv"),
        "--webvid_val_csv_path", str(webvid / "val_captions.csv"),
        "--webvid_features_path", str(feat_dir),
        "--features_dim", "8", "--max_feats", "4", "--max_tokens", "12",
        "--batch_size", "16", "--batch_size_val", "8", "--print_freq", "1",
        "--lr", "1e-3", "--save_dir", str(save), "--epochs", "3",
        "--eval_skip", "1", "--ckpt_format", "orbax", "--keep_ckpts", "1",
        "--grad_accum", "2", "--skip_nonfinite", "2",
        "--compile_cache", str(tmp_path / "xla_cache"),
    ]))
    assert len(log) == 3 and all(np.isfinite(e["train_loss"]) for e in log)
    # retention kept only the newest epoch checkpoint, in orbax format
    kept = sorted(e for e in os.listdir(save) if e.startswith("checkpoint"))
    assert kept == ["checkpoint0002"]
    assert (save / "checkpoint0002" / "params_orbax").is_dir()
    assert os.listdir(tmp_path / "xla_cache")  # compile cache populated
