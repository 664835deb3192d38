"""Graceful-preemption checkpointing (train/preemption.py): a SIGTERM
mid-epoch finishes the in-flight step, saves checkpoint_preempt, and the
run resumes from it."""

import json
import os
import signal
import time

import numpy as np
import pandas as pd
import pytest


def test_guard_catches_sigterm_and_restores_handler():
    from frozenbilm_tpu.train.preemption import PreemptionGuard

    prev = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard() as g:
        assert not g.preempted
        os.kill(os.getpid(), signal.SIGTERM)
        for _ in range(100):
            if g.preempted:
                break
            time.sleep(0.01)
        assert g.preempted
    assert signal.getsignal(signal.SIGTERM) is prev


@pytest.fixture()
def pt_env(tmp_path):
    rng = np.random.default_rng(0)
    model_dir = tmp_path / "bert-tiny"
    model_dir.mkdir()
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "a", "the", "cat", "dog", "runs", "sleeps", "."]
    (model_dir / "vocab.txt").write_text("\n".join(vocab))
    json.dump({
        "vocab_size": len(vocab), "hidden_size": 32, "num_hidden_layers": 2,
        "num_attention_heads": 4, "intermediate_size": 64,
        "max_position_embeddings": 96, "type_vocab_size": 2, "pad_token_id": 0,
    }, open(model_dir / "config.json", "w"))
    webvid = tmp_path / "WebVid"
    webvid.mkdir()
    for split in ("train", "val"):
        pd.DataFrame({
            "video_id": [f"v{i % 3}" for i in range(16)],
            "text": ["a cat runs"] * 8 + ["the dog sleeps"] * 8,
        }).to_csv(webvid / f"{split}_captions.csv", index=False)
    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    for i in range(3):
        np.save(feat_dir / f"v{i}.mp4.npy",
                rng.normal(size=(7, 16)).astype(np.float32))
    return model_dir, webvid, feat_dir


def _pt_args(model_dir, webvid, feat_dir, save, extra=()):
    from frozenbilm_tpu.config import get_args_parser

    return get_args_parser().parse_args([
        "--model_name", "bert-base-uncased",
        "--tokenizer_path", str(model_dir),
        "--features_dim", "16", "--max_feats", "5", "--max_tokens", "32",
        "--batch_size", "8", "--batch_size_val", "8", "--print_freq", "1",
        "--combine_datasets", "webvid", "--combine_datasets_val", "webvid",
        "--webvid_train_csv_path", str(webvid / "train_captions.csv"),
        "--webvid_val_csv_path", str(webvid / "val_captions.csv"),
        "--webvid_features_path", str(feat_dir),
        "--epochs", "1", "--lr", "1e-3", "--save_dir", str(save),
        *extra,
    ])


def test_pretrain_preempt_saves_and_resumes(pt_env, tmp_path, monkeypatch):
    import frozenbilm_tpu.train.preemption as pre
    from frozenbilm_tpu.tasks.pretrain import main

    model_dir, webvid, feat_dir = pt_env
    save = tmp_path / "out"

    real_guard = pre.PreemptionGuard

    class FireOnSecondPoll(real_guard):
        """Delivers a REAL SIGTERM from inside the step loop (the handler
        is installed by then), exercising actual signal delivery."""

        def __init__(self, signals=(signal.SIGTERM,)):
            super().__init__(signals)
            self.polls = 0

        @property
        def preempted(self):
            self.polls += 1
            if self.polls == 2 and not self._flag.is_set():
                os.kill(os.getpid(), signal.SIGTERM)
                for _ in range(100):
                    if self._flag.is_set():
                        break
                    time.sleep(0.01)
            return self._flag.is_set()

    monkeypatch.setattr(pre, "PreemptionGuard", FireOnSecondPoll)
    log = main(_pt_args(model_dir, webvid, feat_dir, save))
    assert log == []  # preempted before the first epoch completed

    ckpt = save / "checkpoint_preempt"
    assert os.path.isdir(ckpt)
    meta = json.load(open(ckpt / "meta.json"))
    assert meta["preempted_epoch"] == 0 and meta["preempted_step"] == 2
    assert meta["epoch"] == -1  # resume convention: re-run epoch 0
    assert os.path.exists(ckpt / "opt_state.npz")

    # resume: re-runs epoch 0 from the saved trainable/opt state
    monkeypatch.setattr(pre, "PreemptionGuard", real_guard)
    log = main(_pt_args(model_dir, webvid, feat_dir, tmp_path / "out2",
                        extra=["--resume", "--load", str(ckpt)]))
    assert len(log) == 1 and np.isfinite(log[0]["train_loss"])
