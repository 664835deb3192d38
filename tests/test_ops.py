"""Unit tests for core ops against reference semantics (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frozenbilm_tpu.ops.masking import (
    cross_entropy_ignore_index,
    get_mask,
    masked_softmax,
    mlm_corrupt,
)
from frozenbilm_tpu.ops.rel_pos import build_relative_position, make_log_bucket_position


def test_get_mask_matches_reference():
    import torch

    from tests.reference_loader import load_reference_misc

    misc = load_reference_misc()
    lengths = np.array([0, 1, 3, 5])
    ref = misc.get_mask(torch.tensor(lengths), 5).numpy()
    ours = np.asarray(get_mask(jnp.asarray(lengths), 5))
    np.testing.assert_array_equal(ref, ours)


def test_masked_softmax_matches_torch_xsoftmax_semantics():
    import torch

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 6, 6)).astype(np.float32)
    mask = (rng.random((2, 1, 6, 6)) > 0.3).astype(np.int32)
    mask[0, :, 2, :] = 0  # fully-masked row

    tx = torch.tensor(x)
    rmask = ~torch.tensor(mask).bool().expand_as(tx)
    ref = torch.softmax(tx.masked_fill(rmask, float("-inf")), -1)
    ref = ref.masked_fill(rmask, 0).numpy()
    ref = np.nan_to_num(ref)  # torch leaves NaN rows; ref zeroes masked entries

    ours = np.asarray(masked_softmax(jnp.asarray(x), jnp.asarray(mask)))
    np.testing.assert_allclose(ref, ours, atol=1e-6)
    assert not np.isnan(ours).any()


def test_masked_softmax_grad_finite():
    x = jnp.ones((2, 4, 4))
    mask = jnp.array([[1, 1, 0, 0], [0, 0, 0, 0]])[:, None, :] * jnp.ones((2, 4, 4), jnp.int32)
    g = jax.grad(lambda s: masked_softmax(s, mask).sum())(x)
    assert jnp.isfinite(g).all()


def test_log_bucket_positions_match_reference():
    from tests.reference_loader import load_reference_deberta

    ref_mod = load_reference_deberta()
    for (q, k, bucket, maxp) in [(16, 16, 8, 64), (266, 266, 256, 512), (5, 9, 4, 32)]:
        ref = ref_mod.build_relative_position(q, k, bucket, maxp).numpy()[0]
        ours = build_relative_position(q, k, bucket, maxp)
        np.testing.assert_array_equal(ref, ours)


def test_log_bucket_symmetry():
    rel = np.arange(-500, 501)
    buck = make_log_bucket_position(rel, 256, 512)
    np.testing.assert_array_equal(buck, -buck[::-1])  # sign-symmetric
    assert buck.max() <= 256 and buck.min() >= -256


def test_mlm_corrupt_statistics():
    rng = jax.random.PRNGKey(0)
    B, T, V = 64, 128, 1000
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, T), 5, V)
    special = jnp.zeros((B, T), jnp.int32).at[:, 0].set(1)
    corrupted, labels = mlm_corrupt(
        rng, ids, special, mask_token_id=4, vocab_size=V, pad_token_id=0,
        mlm_probability=0.15,
    )
    sel = labels != -100
    frac_selected = sel.mean()
    assert 0.13 < frac_selected < 0.17
    # selected positions: ~80% [MASK], ~10% random, ~10% unchanged
    masked = (corrupted == 4) & sel
    unchanged = (corrupted == ids) & sel
    assert 0.75 < masked.sum() / sel.sum() < 0.85
    assert 0.06 < unchanged.sum() / sel.sum() < 0.14
    # special positions are never selected
    assert not sel[:, 0].any()
    # non-selected positions untouched
    assert bool(jnp.all(jnp.where(~sel, corrupted == ids, True)))


def test_cross_entropy_ignore_index_matches_torch():
    import torch

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(4, 7, 11)).astype(np.float32)
    labels = rng.integers(0, 11, size=(4, 7))
    labels[0, :3] = -100
    labels[2] = -100

    ref = torch.nn.CrossEntropyLoss()(
        torch.tensor(logits).view(-1, 11), torch.tensor(labels).view(-1)
    ).item()
    ours = float(cross_entropy_ignore_index(jnp.asarray(logits), jnp.asarray(labels)))
    assert abs(ref - ours) < 1e-6


def test_mask_fill_value_flushes_to_zero():
    # exp(_MASK_FILL - max) must be exactly 0.0 in f32 so masked positions
    # carry exactly zero probability, like the reference's -inf fill.
    out = masked_softmax(jnp.array([[5.0, -2.0, 3.0]]), jnp.array([[1, 0, 1]]))
    assert float(out[0, 1]) == 0.0
    np.testing.assert_allclose(float(out[0].sum()), 1.0, rtol=1e-6)


class _FakeTok:
    """Minimal tokenizer stub for encode-path bucket tests."""
    pad_token_id = 0
    mask_token_id = 4
    sep_token_id = 3

    def __call__(self, texts, add_special_tokens=True, max_length=None,
                 padding=False, truncation=True, return_special_tokens_mask=True):
        if isinstance(texts, str):
            texts = [texts]
        ids, sp = [], []
        for t in texts:
            row = [4 if w == "[MASK]" else 5 + (len(w) % 20) for w in t.split()]
            row = row[:max_length]
            ids.append(row)
            sp.append([1 if x == 4 else 0 for x in row])
        return {"input_ids": ids, "special_tokens_mask": sp}


def _bucket_args(**over):
    import argparse

    ns = argparse.Namespace(length_buckets="8,16", max_tokens=32, suffix="",
                            use_context=True)
    for k, v in over.items():
        setattr(ns, k, v)
    return ns


def test_length_buckets_wired_into_every_driver_encode_path():
    """--length_buckets must shape batches in ALL drivers, not only videoqa
    eval (VERDICT r1 weak #2): each driver's encode helper pads to the
    smallest bucket that fits instead of max_tokens."""
    from frozenbilm_tpu.tasks.mc import _encode_candidates
    from frozenbilm_tpu.tasks.videoqa import _encode
    from frozenbilm_tpu.tasks.videoqa_ar import _encode_ar

    tok = _FakeTok()
    args = _bucket_args()
    short = ["hello [MASK] there", "a [MASK] b c"]

    # videoqa eval AND train (strip=False) paths
    assert _encode(tok, short, args)["input_ids"].shape[1] == 8
    assert _encode(tok, short, args, strip=False)["input_ids"].shape[1] == 8
    long = ["w " * 12 + "[MASK]", "x [MASK]"]
    assert _encode(tok, long, args)["input_ids"].shape[1] == 16

    # mc candidate-major encode -> batch-major bucketed
    ids, am = _encode_candidates(tok, [short, short], args)
    assert ids.shape == (2, 2, 8) and am.shape == (2, 2, 8)

    # AR left-padded encode
    enc = _encode_ar(tok, ["one two three"], args)
    assert enc["input_ids"].shape[1] == 8
    assert enc["input_ids"][0, 0] == 0 and enc["input_ids"][0, -1] != 0  # left pad

    # pretrain/pretrain_ar share encode_batch with parse_length_buckets
    from frozenbilm_tpu.data.tokenization import encode_batch, parse_length_buckets

    out = encode_batch(tok, short, args.max_tokens,
                       buckets=parse_length_buckets(args))
    assert out["input_ids"].shape[1] == 8
    assert parse_length_buckets(_bucket_args(length_buckets="")) is None


def test_skew_select_rect_property():
    """T[i, j] == A[i, (C-1)-i+j] for square, ragged, and single-row chunks
    (the rectangular Toeplitz skew behind the chunked c2p/p2c selection)."""
    import numpy as np

    from frozenbilm_tpu.ops.rel_pos import skew_select, skew_select_rect

    rng = np.random.default_rng(0)
    for C, L in [(1, 7), (3, 7), (7, 7), (16, 33)]:
        A = jnp.asarray(rng.normal(size=(2, C, L + C - 1)))
        T = np.asarray(skew_select_rect(A, L))
        assert T.shape == (2, C, L)
        for i in range(C):
            for j in range(L):
                assert abs(T[1, i, j] - float(A[1, i, (C - 1) - i + j])) < 1e-12
    # square case stays the classic skew
    A = jnp.asarray(rng.normal(size=(5, 9)))
    np.testing.assert_array_equal(
        np.asarray(skew_select(A)), np.asarray(skew_select_rect(A, 5)))


def test_masked_softmax_custom_vjp_matches_autodiff():
    """masked_softmax carries a custom VJP (p*(g - sum(p*g)), the reference
    XSoftmax backward) because XLA's fused autodiff transpose of the
    where/exp formulation produced non-finite grads on real TPU
    (grad_nan_probe2_r4). The custom backward must equal autodiff of a
    plain where/softmax/zero reference on every mask pattern, fully-masked
    rows included, in f32 and bf16."""
    from frozenbilm_tpu.ops.masking import masked_softmax

    def ref(scores, mask, axis=-1):
        valid = mask.astype(bool)
        filled = jnp.where(valid, scores.astype(jnp.float32), -1e30)
        p = jax.nn.softmax(filled, axis=axis)
        return (p * valid).astype(scores.dtype)

    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.normal(size=(2, 3, 5, 5)) * 4, jnp.float32)
    mask = np.ones((2, 1, 5, 5), np.int32)
    mask[0, 0, :, 3:] = 0   # padded keys
    mask[1, 0, 2, :] = 0    # fully-masked row
    mask = jnp.asarray(mask)
    cot = jnp.asarray(rng.normal(size=(2, 3, 5, 5)), jnp.float32)

    out, vjp = jax.vjp(lambda s: masked_softmax(s, mask), scores)
    out_r, vjp_r = jax.vjp(lambda s: ref(s, mask), scores)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r), atol=1e-6)
    np.testing.assert_allclose(np.asarray(vjp(cot)[0]),
                               np.asarray(vjp_r(cot)[0]), atol=1e-5)

    # bf16 scores: same path the 0.9B training step runs
    sb = scores.astype(jnp.bfloat16)
    out_b, vjp_b = jax.vjp(lambda s: masked_softmax(s, mask), sb)
    g_b = vjp_b(cot.astype(jnp.bfloat16))[0]
    assert g_b.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(g_b, np.float32), np.asarray(vjp_r(cot)[0]),
        atol=3e-2, rtol=3e-2)
    assert bool(jnp.all(jnp.isfinite(g_b.astype(jnp.float32))))

    # grad wrt a FLOAT mask input must exist (zeros) rather than crash
    gm = jax.grad(lambda m: masked_softmax(scores, m).sum())(
        mask.astype(jnp.float32))
    assert not np.asarray(gm).any()
