"""W8A8 int8 quantization (ops/quant.py): numeric fidelity of the int8
linear, tree-transform scoping (frozen-only, exclusions, stacked scan
layers), end-to-end DeBERTa logit fidelity vs the f32 path, and driver
wiring (--quantize is eval-only). TPU-native extension — the reference has
no quantized path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frozenbilm_tpu.config import DebertaV2Config, VideoTextConfig
from frozenbilm_tpu.models.common import linear
from frozenbilm_tpu.ops.quant import (
    is_quantized,
    linear_w8a8,
    quantize_linear_params,
    quantize_tree,
    quantize_tree_lowmem,
)


def test_linear_w8a8_matches_f32_linear():
    rng = np.random.default_rng(0)
    p = {"kernel": jnp.asarray(rng.normal(size=(256, 512)), jnp.float32) * 0.05,
         "bias": jnp.asarray(rng.normal(size=(512,)), jnp.float32)}
    x = jnp.asarray(rng.normal(size=(8, 256)), jnp.float32)
    ref = linear(p, x)
    out = linear_w8a8(quantize_linear_params(p), x)
    # per-channel weight + per-row activation int8: ~1e-2 relative error
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


def test_linear_dispatches_on_quantized_params():
    rng = np.random.default_rng(1)
    p = {"kernel": jnp.asarray(rng.normal(size=(128, 64)), jnp.float32)}
    q = quantize_linear_params(p)
    assert q["kernel_q"].dtype == jnp.int8
    x = jnp.asarray(rng.normal(size=(4, 128)), jnp.float32)
    np.testing.assert_allclose(np.asarray(linear(q, x)),
                               np.asarray(linear_w8a8(q, x)))


def test_stacked_scan_kernels_get_per_layer_scales():
    rng = np.random.default_rng(2)
    # layer 1's kernel is 100x larger; a shared scale would crush layer 0
    w = rng.normal(size=(2, 96, 64)).astype(np.float32)
    w[1] *= 100.0
    q = quantize_linear_params({"kernel": jnp.asarray(w)})
    assert q["kernel_q"].shape == (2, 96, 64)
    assert q["scale"].shape == (2, 64)
    deq = np.asarray(q["kernel_q"], np.float32) * np.asarray(q["scale"])[:, None, :]
    rel = np.linalg.norm(deq - w) / np.linalg.norm(w)
    assert rel < 0.01, rel


def _toy_deberta(hidden=128, n_ans=11):
    from frozenbilm_tpu.models import deberta as m

    cfg = DebertaV2Config(
        vocab_size=120, hidden_size=hidden, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=2 * hidden,
        max_position_embeddings=64, position_buckets=8,
        max_relative_positions=-1, relative_attention=True,
        pos_att_type=("p2c", "c2p"), norm_rel_ebd="layer_norm",
        type_vocab_size=0, pad_token_id=0, layer_norm_eps=1e-7,
    )
    vt = VideoTextConfig(features_dim=16, max_feats=4, ds_factor_attn=4,
                         ds_factor_ff=4, n_ans=n_ans)
    params = m.init_deberta_params(jax.random.PRNGKey(0), cfg, vt)
    rng = np.random.default_rng(3)
    a2tok = rng.integers(5, cfg.vocab_size, size=(n_ans, 5))
    a2tok[:, 3:] = 0
    params = m.set_answer_embeddings(params, a2tok, pad_token_id=cfg.pad_token_id)
    ids = jnp.asarray(rng.integers(5, cfg.vocab_size, size=(2, 12)))
    am = jnp.ones((2, 12), jnp.int32)
    video = jnp.asarray(rng.normal(size=(2, 4, 16)), jnp.float32)
    vm = jnp.ones((2, 4), jnp.int32)
    return m, cfg, vt, params, (ids, am, video, vm)


@pytest.mark.parametrize("mode", ["w8a8", "w4"])
def test_quantize_tree_lowmem_bit_identical(mode):
    """The bounded-peak per-kernel path (6B serving OOM fix) must produce
    the exact arrays of the one-jit quantize_tree: same skip predicate
    (trainable mask, min_features), same stacked-layer scales, same bits."""
    from frozenbilm_tpu.train.partition import trainable_mask

    m, cfg, vt, params, _ = _toy_deberta()
    mask = trainable_mask(params, vt)
    # copy the source tree: lowmem donates its kernels
    src = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
    ref = jax.jit(lambda p: quantize_tree(p, mask, min_features=64,
                                          mode=mode))(params)
    low = quantize_tree_lowmem(src, mask, min_features=64, mode=mode)
    assert jax.tree.structure(ref) == jax.tree.structure(low)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(low)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_quantize_tree_scopes_to_frozen_linears():
    from frozenbilm_tpu.train.partition import trainable_mask

    m, cfg, vt, params, _ = _toy_deberta()
    mask = trainable_mask(params, vt)
    q = quantize_tree(params, mask, min_features=64)
    assert is_quantized(q) and not is_quantized(params)
    layers = q["encoder"]["layers"]
    self_p = layers["attention"]["self"]
    assert self_p["qkv_proj"]["kernel_q"].dtype == jnp.int8
    assert self_p["qkv_proj"]["scale"].shape == (cfg.num_hidden_layers, 3 * cfg.hidden_size)
    # trainable leaves keep full precision
    adapter = layers["attention"]["output"]["adapter"]
    assert not is_quantized(adapter)
    assert "kernel" in q["embeddings"]["linear_video"]
    # answer module untouched (no 'kernel' dicts)
    assert not is_quantized(q.get("answers", {}))


def test_quantized_deberta_forward_tracks_f32():
    m, cfg, vt, params, (ids, am, video, vm) = _toy_deberta()
    from frozenbilm_tpu.train.partition import apply_quantization

    qparams = apply_quantization(params, vt, "w8a8")

    def answer_logits(p):
        out = m.deberta_forward(p, cfg, vt, ids, am, video, vm, mlm=False)
        h = out.last_hidden_state[:, vt.max_feats + 3]
        return m.deberta_answer_logits(p, cfg, h)

    ref = np.asarray(answer_logits(params))
    got = np.asarray(answer_logits(qparams))
    corr = np.corrcoef(ref.ravel(), got.ravel())[0, 1]
    assert corr > 0.999, corr
    np.testing.assert_array_equal(ref.argmax(-1), got.argmax(-1))


def test_quantized_clip_vision_tracks_f32():
    """Extraction-path quantization: the tower quantizes, the directly-read
    patch_embed / proj kernels stay intact, outputs track f32."""
    from frozenbilm_tpu.config import CLIPVisionConfig
    from frozenbilm_tpu.models.clip import clip_encode_image, init_clip_vision_params

    cfg = CLIPVisionConfig(image_size=28, patch_size=7, hidden_size=128,
                           num_layers=2, num_heads=4, projection_dim=32)
    params = init_clip_vision_params(jax.random.PRNGKey(0), cfg)
    q = quantize_tree(params)
    assert is_quantized(q)
    assert "kernel" in q["patch_embed"] and "kernel" in q["proj"]
    rng = np.random.default_rng(4)
    pixels = jnp.asarray(rng.normal(size=(2, 28, 28, 3)), jnp.float32)
    ref = np.asarray(clip_encode_image(params, cfg, pixels))
    got = np.asarray(clip_encode_image(q, cfg, pixels))
    corr = np.corrcoef(ref.ravel(), got.ravel())[0, 1]
    assert corr > 0.999, corr


def test_quantized_gptj_under_tp_matches_single_device():
    """W8A8 + tensor parallelism: column-parallel kernel_q/scale shard over
    'model', row-parallel activation abs-max becomes a GSPMD max all-reduce
    — logits must match the single-device quantized forward."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from frozenbilm_tpu.config import GPTJConfig
    from frozenbilm_tpu.models.gptj import gptj_forward, init_gptj_params
    from frozenbilm_tpu.parallel.mesh import MeshSpec, make_mesh
    from frozenbilm_tpu.parallel.tp import gpt_param_specs, shard_params

    vt = VideoTextConfig(features_dim=16, max_feats=4, ds_factor_attn=0,
                         ds_factor_ff=0)
    cfg = GPTJConfig(vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
                     rotary_dim=4, max_position_embeddings=64)
    params = init_gptj_params(jax.random.PRNGKey(0), cfg, vt)
    qparams = quantize_tree(params, min_features=8)  # force at toy scale
    assert is_quantized(qparams)
    rng = np.random.default_rng(5)
    ids = jnp.asarray(rng.integers(1, 128, size=(4, 8)))
    am = jnp.ones((4, 8), jnp.int32)
    video = jnp.asarray(rng.normal(size=(4, 4, 16)), jnp.float32)
    vm = jnp.ones((4, 4), jnp.int32)
    ref = np.asarray(gptj_forward(qparams, cfg, vt, ids, am, video, vm).logits)

    mesh = make_mesh(MeshSpec(data=2, model=4))
    sharded = shard_params(mesh, qparams, gpt_param_specs(qparams))
    data_sh = NamedSharding(mesh, P("data"))
    args = [jax.device_put(x, data_sh) for x in (ids, am, video, vm)]
    got = np.asarray(gptj_forward(sharded, cfg, vt, *args).logits)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_quantized_kv_cache_decode_runs():
    """gptneo_greedy_cached (prefill + lax.scan decode) with W8A8 params:
    the cache-carrying decode path must compile and emit valid tokens."""
    from frozenbilm_tpu.config import GPTNeoConfig
    from frozenbilm_tpu.models.gptneo import gptneo_greedy_cached, init_gptneo_params

    cfg = GPTNeoConfig(vocab_size=256, hidden_size=64, num_layers=2,
                       num_heads=4, window_size=6, max_position_embeddings=64)
    vt = VideoTextConfig(features_dim=16, max_feats=4, ds_factor_attn=0,
                         ds_factor_ff=0)
    params = quantize_tree(init_gptneo_params(jax.random.PRNGKey(0), cfg, vt),
                           min_features=8)
    assert is_quantized(params)
    rng = np.random.default_rng(6)
    ids = jnp.asarray(rng.integers(3, 256, size=(2, 8)))
    am = jnp.ones((2, 8), jnp.int32)
    video = jnp.asarray(rng.normal(size=(2, 4, 16)), jnp.float32)
    vm = jnp.ones((2, 4), jnp.int32)
    out = np.asarray(gptneo_greedy_cached(
        params, cfg, vt, video=video, video_mask=vm, input_ids=ids,
        attention_mask=am, max_new_tokens=4, eos_token_id=2))
    assert out.shape == (2, 12)
    assert ((0 <= out) & (out < 256)).all()


def test_static_act_scales_calibrate_and_track_f32():
    """w8a8_static: eager calibration records per-site amax (fingerprint
    keys survive lax.scan slicing), apply_act_scales writes per-layer
    scalars for stacked kernels, and the static-scale forward tracks f32
    as closely as the dynamic path."""
    from frozenbilm_tpu.ops.quant import apply_act_scales, calibration
    from frozenbilm_tpu.train.partition import apply_quantization

    m, cfg, vt, params, (ids, am, video, vm) = _toy_deberta()
    # calibrates=True: this test IS the calibration pass (the driver-side
    # guard rejects w8a8_static without one, commit 9916c6b)
    q = apply_quantization(params, vt, "w8a8_static", calibrates=True)

    def answer_logits(p):
        out = m.deberta_forward(p, cfg, vt, ids, am, video, vm, mlm=False)
        h = out.last_hidden_state[:, vt.max_feats + 3]
        return m.deberta_answer_logits(p, cfg, h)

    stats = {}
    with calibration(stats), jax.disable_jit():
        answer_logits(q)
    assert stats, "no activation sites recorded"
    qs = apply_act_scales(q, stats)
    qkv = qs["encoder"]["layers"]["attention"]["self"]["qkv_proj"]
    assert qkv["act_scale"].shape == (cfg.num_hidden_layers,)
    # distinct layers see distinct activations -> per-layer scales differ
    assert float(jnp.ptp(qkv["act_scale"])) > 0.0

    ref = np.asarray(answer_logits(params))
    stat = np.asarray(jax.jit(answer_logits)(qs))
    corr = np.corrcoef(ref.ravel(), stat.ravel())[0, 1]
    assert corr > 0.999, corr
    np.testing.assert_array_equal(ref.argmax(-1), stat.argmax(-1))


def test_static_scale_single_linear_matches_dynamic():
    from frozenbilm_tpu.ops.quant import apply_act_scales, calibration

    rng = np.random.default_rng(7)
    p = {"kernel": jnp.asarray(rng.normal(size=(256, 128)), jnp.float32) * 0.05,
         "bias": jnp.asarray(rng.normal(size=(128,)), jnp.float32)}
    x = jnp.asarray(rng.normal(size=(8, 256)), jnp.float32)
    q = quantize_linear_params(p)
    stats = {}
    with calibration(stats):
        dyn = linear_w8a8(q, x)
    qs = apply_act_scales({"lin": q}, stats)["lin"]
    assert qs["act_scale"].shape == ()
    stat = jax.jit(lambda pp, xx: linear_w8a8(pp, xx))(qs, x)
    ref = linear(p, x)
    rel = float(jnp.linalg.norm(stat - ref) / jnp.linalg.norm(ref))
    assert rel < 0.03, rel
    # uncalibrated sites stay dynamic (no act_scale leaf)
    assert "act_scale" not in apply_act_scales({"lin": q}, {})["lin"]
    np.testing.assert_allclose(np.asarray(dyn), np.asarray(linear_w8a8(q, x)))


def test_apply_quantization_none_is_identity():
    from frozenbilm_tpu.train.partition import apply_quantization

    m, cfg, vt, params, _ = _toy_deberta()
    assert apply_quantization(params, vt, "none") is params
    with pytest.raises(ValueError):
        apply_quantization(params, vt, "int4")


def test_driver_rejects_quantize_without_eval(tmp_path):
    from frozenbilm_tpu.config import get_args_parser
    from frozenbilm_tpu.tasks import videoqa as task

    args = get_args_parser().parse_args(
        ["--combine_datasets", "msvd", "--combine_datasets_val", "msvd",
         "--quantize", "w8a8", "--save_dir", str(tmp_path)])
    with pytest.raises(ValueError, match="inference-only"):
        task.main(args)


# ---------------------------------------------------------------------------
# Weight-only int4 (w4)
# ---------------------------------------------------------------------------


def test_linear_w4_matches_explicit_grouped_dequant():
    """The dot-then-scale formulation is EXACTLY grouped dequantization."""
    from frozenbilm_tpu.ops.quant import linear_w4, quantize_linear_params_w4

    rng = np.random.default_rng(10)
    p = {"kernel": jnp.asarray(rng.normal(size=(256, 96)), jnp.float32) * 0.05,
         "bias": jnp.asarray(rng.normal(size=(96,)), jnp.float32)}
    q = quantize_linear_params_w4(p)
    # int8 at rest: jit-output S4 is unusable at program boundaries on the
    # TPU backend; decode entries thaw to real int4 in-program (ops/quant)
    assert q["kernel_q4"].dtype == jnp.int8
    assert q["scale"].shape == (2, 96)  # K=256, group=128 -> G=2
    x = jnp.asarray(rng.normal(size=(8, 256)), jnp.float32)
    got = np.asarray(linear_w4(q, x))
    wq = np.asarray(q["kernel_q4"], np.float32).reshape(2, 128, 96)
    deq = (wq * np.asarray(q["scale"])[:, None, :]).reshape(256, 96)
    ref = np.asarray(x, np.float32) @ deq + np.asarray(p["bias"])
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_linear_w4_per_channel_fallback():
    """K not divisible by the group -> per-channel scales, same dispatch."""
    from frozenbilm_tpu.ops.quant import linear_w4, quantize_linear_params_w4

    rng = np.random.default_rng(11)
    p = {"kernel": jnp.asarray(rng.normal(size=(96, 64)), jnp.float32)}
    q = quantize_linear_params_w4(p)
    assert q["scale"].shape == (64,)
    x = jnp.asarray(rng.normal(size=(4, 96)), jnp.float32)
    deq = np.asarray(q["kernel_q4"], np.float32) * np.asarray(q["scale"])
    ref = np.asarray(x, np.float32) @ deq
    np.testing.assert_allclose(np.asarray(linear_w4(q, x)), ref,
                               rtol=1e-5, atol=1e-5)
    # and common.linear dispatches on kernel_q4
    np.testing.assert_allclose(np.asarray(linear(q, x)),
                               np.asarray(linear_w4(q, x)))


def test_w4_fidelity_vs_f32():
    """Weight-only int4 keeps outputs well-correlated with f32 (no
    activation quantization; grouped scales)."""
    from frozenbilm_tpu.ops.quant import linear_w4, quantize_linear_params_w4

    rng = np.random.default_rng(12)
    p = {"kernel": jnp.asarray(rng.normal(size=(512, 256)), jnp.float32) * 0.03}
    x = jnp.asarray(rng.normal(size=(16, 512)), jnp.float32)
    ref = np.asarray(linear(p, x))
    got = np.asarray(linear_w4(quantize_linear_params_w4(p), x))
    corr = np.corrcoef(ref.ravel(), got.ravel())[0, 1]
    assert corr > 0.99, corr


def test_quantize_tree_w4_scopes_and_stacks():
    from frozenbilm_tpu.train.partition import trainable_mask

    m, cfg, vt, params, _ = _toy_deberta()
    mask = trainable_mask(params, vt)
    q = quantize_tree(params, mask, min_features=64, mode="w4")
    assert is_quantized(q) and not is_quantized(params)
    self_p = q["encoder"]["layers"]["attention"]["self"]
    assert self_p["qkv_proj"]["kernel_q4"].dtype == jnp.int8
    # toy hidden=128 -> K=128 == group -> per-channel stacked scales
    assert self_p["qkv_proj"]["scale"].shape == (
        cfg.num_hidden_layers, 3 * cfg.hidden_size)
    assert not is_quantized(q["encoder"]["layers"]["attention"]["output"]["adapter"])
    assert "kernel" in q["embeddings"]["linear_video"]


def test_w4_deberta_forward_tracks_f32():
    m, cfg, vt, params, (ids, am, video, vm) = _toy_deberta()
    from frozenbilm_tpu.train.partition import apply_quantization

    qparams = apply_quantization(params, vt, "w4")

    def answer_logits(p):
        out = m.deberta_forward(p, cfg, vt, ids, am, video, vm, mlm=False)
        h = out.last_hidden_state[:, vt.max_feats + 3]
        return m.deberta_answer_logits(p, cfg, h)

    ref = np.asarray(answer_logits(params))
    got = np.asarray(answer_logits(qparams))
    corr = np.corrcoef(ref.ravel(), got.ravel())[0, 1]
    # int4 RTN carries ~2% noise through 2 layers of iid-gaussian toy
    # weights (the worst case for round-to-nearest; real weight matrices
    # have the outlier structure group scales exist for). Accuracy on real
    # checkpoints must be validated before production use — see ops/quant.py
    assert corr > 0.98, corr


def test_w4_kv_cache_decode_runs():
    """gptneo_greedy_cached with weight-only int4 params: the
    cache-carrying decode path must compile and emit valid tokens (this is
    the path w4 exists for — quarter weight bytes per decode step)."""
    from frozenbilm_tpu.config import GPTNeoConfig
    from frozenbilm_tpu.models.gptneo import gptneo_greedy_cached, init_gptneo_params

    cfg = GPTNeoConfig(vocab_size=256, hidden_size=64, num_layers=2,
                       num_heads=4, window_size=6, max_position_embeddings=64)
    vt = VideoTextConfig(features_dim=16, max_feats=4, ds_factor_attn=0,
                         ds_factor_ff=0)
    params = quantize_tree(init_gptneo_params(jax.random.PRNGKey(0), cfg, vt),
                           min_features=8, mode="w4")
    assert is_quantized(params)
    rng = np.random.default_rng(13)
    ids = jnp.asarray(rng.integers(3, 256, size=(2, 8)))
    am = jnp.ones((2, 8), jnp.int32)
    video = jnp.asarray(rng.normal(size=(2, 4, 16)), jnp.float32)
    vm = jnp.ones((2, 4), jnp.int32)
    out = np.asarray(gptneo_greedy_cached(
        params, cfg, vt, video=video, video_mask=vm, input_ids=ids,
        attention_mask=am, max_new_tokens=4, eos_token_id=2))
    assert out.shape == (2, 12)
    assert ((0 <= out) & (out < 256)).all()


def test_w4_gptj_under_tp_matches_single_device():
    """w4 + tensor parallelism: kernel_q4 shards like kernel; GROUPED
    scales (2D) shard with the kernel layout (column: out dim; row: G dim
    alongside K) — logits must match the single-device w4 forward."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from frozenbilm_tpu.config import GPTJConfig
    from frozenbilm_tpu.models.gptj import gptj_forward, init_gptj_params
    from frozenbilm_tpu.parallel.mesh import MeshSpec, make_mesh
    from frozenbilm_tpu.parallel.tp import gpt_param_specs, shard_params
    from frozenbilm_tpu.ops.quant import quantize_linear_params_w4

    vt = VideoTextConfig(features_dim=16, max_feats=4, ds_factor_attn=0,
                         ds_factor_ff=0)
    # hidden 512 so K=512 makes G=4 groups (divisible by model=4 shards)
    cfg = GPTJConfig(vocab_size=128, hidden_size=512, num_layers=1, num_heads=4,
                     rotary_dim=4, max_position_embeddings=64)
    params = init_gptj_params(jax.random.PRNGKey(0), cfg, vt)
    qparams = quantize_tree(params, min_features=8, mode="w4")
    assert is_quantized(qparams)
    # the fc_in kernel really is grouped (K=512 > 128)
    assert qparams["layers"]["mlp"]["fc_in"]["scale"].ndim == 3
    rng = np.random.default_rng(14)
    ids = jnp.asarray(rng.integers(1, 128, size=(4, 8)))
    am = jnp.ones((4, 8), jnp.int32)
    video = jnp.asarray(rng.normal(size=(4, 4, 16)), jnp.float32)
    vm = jnp.ones((4, 4), jnp.int32)
    ref = np.asarray(gptj_forward(qparams, cfg, vt, ids, am, video, vm).logits)

    mesh = make_mesh(MeshSpec(data=2, model=4))
    sharded = shard_params(mesh, qparams, gpt_param_specs(qparams))
    data_sh = NamedSharding(mesh, P("data"))
    args = [jax.device_put(x, data_sh) for x in (ids, am, video, vm)]
    got = np.asarray(gptj_forward(sharded, cfg, vt, *args).logits)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Int8 KV cache
# ---------------------------------------------------------------------------


def test_kv_quantize_roundtrip_error():
    from frozenbilm_tpu.ops.quant import kv_quantize

    rng = np.random.default_rng(20)
    kv = jnp.asarray(rng.normal(size=(2, 3, 4, 8, 16)), jnp.float32)
    c = kv_quantize(kv)
    assert c["q"].dtype == jnp.int8 and c["s"].shape == (2, 3, 4, 8)
    deq = np.asarray(c["q"], np.float32) * np.asarray(c["s"])[..., None]
    rel = np.linalg.norm(deq - np.asarray(kv)) / np.linalg.norm(np.asarray(kv))
    assert rel < 0.005, rel  # per-vector int8: ~0.2% RMS
    # zero (padding) vectors quantize to zeros, not NaN
    z = kv_quantize(jnp.zeros((1, 1, 1, 2, 4)))
    assert np.asarray(z["q"]).max() == 0 and np.isfinite(np.asarray(z["s"])).all()


def test_kv_write_matches_full_quantize():
    from frozenbilm_tpu.ops.quant import kv_quantize, kv_write

    rng = np.random.default_rng(21)
    full = jnp.asarray(rng.normal(size=(2, 4, 6, 16)), jnp.float32)  # B,nh,L,hd
    # quantize first 5 positions, then write position 5 incrementally
    c = kv_quantize(full.at[:, :, 5].set(0.0))
    c = kv_write(c, full[:, :, 5], 5)
    want = kv_quantize(full)
    np.testing.assert_array_equal(np.asarray(c["q"]), np.asarray(want["q"]))
    # scales equal except the padding floor at the pre-write position
    np.testing.assert_allclose(np.asarray(c["s"]), np.asarray(want["s"]),
                               rtol=1e-6)


def _toy_gptneo():
    from frozenbilm_tpu.config import GPTNeoConfig

    cfg = GPTNeoConfig(vocab_size=256, hidden_size=64, num_layers=2,
                       num_heads=4, window_size=6, max_position_embeddings=64)
    vt = VideoTextConfig(features_dim=16, max_feats=4, ds_factor_attn=0,
                         ds_factor_ff=0)
    rng = np.random.default_rng(22)
    ids = jnp.asarray(rng.integers(3, 256, size=(2, 8)))
    am = jnp.ones((2, 8), jnp.int32)
    video = jnp.asarray(rng.normal(size=(2, 4, 16)), jnp.float32)
    vm = jnp.ones((2, 4), jnp.int32)
    return cfg, vt, (ids, am, video, vm)


def test_kv_int8_greedy_tracks_bf16_cache():
    """gptneo_greedy_cached(kv_int8=True): same shapes, valid tokens, and
    high token agreement with the full-precision cache (per-vector int8 KV
    is ~0.2% RMS error)."""
    from frozenbilm_tpu.models.gptneo import gptneo_greedy_cached, init_gptneo_params

    cfg, vt, (ids, am, video, vm) = _toy_gptneo()
    params = init_gptneo_params(jax.random.PRNGKey(0), cfg, vt)
    kw = dict(video=video, video_mask=vm, input_ids=ids, attention_mask=am,
              max_new_tokens=6, eos_token_id=2)
    ref = np.asarray(gptneo_greedy_cached(params, cfg, vt, **kw))
    got = np.asarray(gptneo_greedy_cached(params, cfg, vt, kv_int8=True, **kw))
    assert got.shape == ref.shape
    assert ((0 <= got) & (got < 256)).all()
    agree = (ref == got).mean()
    assert agree > 0.9, agree


def test_kv_int8_beam_and_gptj_run():
    """Beam decode reorders int8 cache dicts tree-wide; GPT-J greedy
    threads kv_int8 through its rotary decode step."""
    from frozenbilm_tpu.config import GPTJConfig
    from frozenbilm_tpu.models.gptj import gptj_greedy_cached, init_gptj_params
    from frozenbilm_tpu.models.gptneo import gptneo_beam_cached, init_gptneo_params

    cfg, vt, (ids, am, video, vm) = _toy_gptneo()
    params = init_gptneo_params(jax.random.PRNGKey(0), cfg, vt)
    out = np.asarray(gptneo_beam_cached(
        params, cfg, vt, video=video, video_mask=vm, input_ids=ids,
        attention_mask=am, max_new_tokens=4, num_beams=3, eos_token_id=2,
        kv_int8=True))
    assert out.shape == (2, 12) and ((0 <= out) & (out < 256)).all()

    jcfg = GPTJConfig(vocab_size=256, hidden_size=64, num_layers=2,
                      num_heads=4, rotary_dim=8, max_position_embeddings=64)
    jparams = init_gptj_params(jax.random.PRNGKey(1), jcfg, vt)
    kw = dict(video=video, video_mask=vm, input_ids=ids, attention_mask=am,
              max_new_tokens=4, eos_token_id=2)
    ref = np.asarray(gptj_greedy_cached(jparams, jcfg, vt, **kw))
    got = np.asarray(gptj_greedy_cached(jparams, jcfg, vt, kv_int8=True, **kw))
    assert got.shape == ref.shape and (ref == got).mean() > 0.9


def test_thaw_w4_in_program_and_idempotent():
    """int8-at-rest w4 trees: thaw_w4 converts kernel_q4 leaves to real
    int4 (inside a trace), is a no-op on everything else and on already-
    thawed trees, and linear_w4 computes identically from either form."""
    from frozenbilm_tpu.ops.quant import (linear_w4, quantize_linear_params_w4,
                                          thaw_w4)

    rng = np.random.default_rng(21)
    p = {"kernel": jnp.asarray(rng.normal(size=(256, 96)), jnp.float32) * 0.05,
         "bias": jnp.asarray(rng.normal(size=(96,)), jnp.float32)}
    q = {"proj": quantize_linear_params_w4(p),
         "ln": {"scale": jnp.ones((96,))}}
    assert q["proj"]["kernel_q4"].dtype == jnp.int8

    t = thaw_w4(q)
    assert t["proj"]["kernel_q4"].dtype == jnp.int4
    assert t["proj"]["scale"] is q["proj"]["scale"]
    assert t["ln"]["scale"] is q["ln"]["scale"]
    t2 = thaw_w4(t)  # idempotent: int4 leaves pass through untouched
    assert t2["proj"]["kernel_q4"] is t["proj"]["kernel_q4"]

    x = jnp.asarray(rng.normal(size=(4, 256)), jnp.float32)
    frozen = np.asarray(linear_w4(q["proj"], x))      # use-site fallback
    thawed = np.asarray(jax.jit(lambda qq, xx: linear_w4(
        thaw_w4(qq)["proj"], xx))(q, x))              # in-program thaw
    np.testing.assert_allclose(frozen, thawed, rtol=1e-6, atol=1e-6)


def test_clip_int8_feature_cosine():
    """Extraction-fidelity criterion (VERDICT r4 next #7): per-frame cosine
    between int8 and full-precision CLIP features must exceed 0.999 —
    features are consumed as bf16 prefix embeddings downstream, so cosine
    is the metric that matters for answer ranking. Covers dynamic W8A8 and
    the calibrated static-scale variant."""
    from frozenbilm_tpu.config import CLIPVisionConfig
    from frozenbilm_tpu.models.clip import clip_encode_image, init_clip_vision_params
    from frozenbilm_tpu.ops.quant import calibrate_act_scales

    cfg = CLIPVisionConfig(image_size=56, patch_size=14, hidden_size=256,
                           num_layers=4, num_heads=8, projection_dim=64)
    params = init_clip_vision_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(7)
    pixels = jnp.asarray(rng.normal(size=(8, 56, 56, 3)), jnp.float32)
    ref = np.asarray(clip_encode_image(params, cfg, pixels), np.float32)

    q = quantize_tree(params)
    qs = calibrate_act_scales(
        lambda p, px: clip_encode_image(p, cfg, px), q, [pixels])
    for name, qp in (("dynamic", q), ("static", qs)):
        got = np.asarray(clip_encode_image(qp, cfg, pixels), np.float32)
        num = np.sum(ref * got, axis=-1)
        den = np.linalg.norm(ref, axis=-1) * np.linalg.norm(got, axis=-1)
        cos = num / np.maximum(den, 1e-30)
        assert cos.min() > 0.999, (name, cos.min())
