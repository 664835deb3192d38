"""Tensor-parallel GPT tests on the virtual 8-device mesh: TP forward ==
single-device forward; TP+DP combined mesh runs the score path."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from frozenbilm_tpu.config import GPTJConfig, GPTNeoConfig, VideoTextConfig
from frozenbilm_tpu.models.gptj import gptj_forward, gptj_score, init_gptj_params
from frozenbilm_tpu.models.gptneo import gptneo_forward, init_gptneo_params
from frozenbilm_tpu.parallel.mesh import MeshSpec, make_mesh
from frozenbilm_tpu.parallel.tp import gpt_param_specs, shard_params, validate_divisibility

VT = VideoTextConfig(features_dim=16, max_feats=4, ds_factor_attn=0, ds_factor_ff=0)
CFG = GPTJConfig(vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
                 rotary_dim=4, max_position_embeddings=64)


def _inputs(B=4):
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 128, size=(B, 8)))
    am = jnp.ones((B, 8), jnp.int32)
    video = jnp.asarray(rng.normal(size=(B, 4, 16)), jnp.float32)
    vm = jnp.ones((B, 4), jnp.int32)
    return ids, am, video, vm


def test_gptj_tp_forward_matches_single_device():
    params = init_gptj_params(jax.random.PRNGKey(0), CFG, VT)
    ids, am, video, vm = _inputs()
    ref = np.asarray(gptj_forward(params, CFG, VT, ids, am, video, vm).logits)

    mesh = make_mesh(MeshSpec(data=2, model=4))
    specs = gpt_param_specs(params)
    validate_divisibility(params, specs, 4)
    sharded = shard_params(mesh, params, specs)
    data_sh = NamedSharding(mesh, P("data"))
    args = [jax.device_put(x, data_sh) for x in (ids, am, video, vm)]

    @jax.jit
    def fwd(p, ids, am, video, vm):
        return gptj_forward(p, CFG, VT, ids, am, video, vm).logits

    out = np.asarray(fwd(sharded, *args))
    np.testing.assert_allclose(ref, out, atol=2e-4, rtol=1e-3)


def test_gptj_tp_score_runs():
    params = init_gptj_params(jax.random.PRNGKey(0), CFG, VT)
    mesh = make_mesh(MeshSpec(data=1, model=8))
    specs = gpt_param_specs(params)
    sharded = shard_params(mesh, params, specs)
    ids, am, video, vm = _inputs()
    targets = jnp.asarray(np.random.default_rng(1).integers(1, 128, size=(4, 3)))

    @jax.jit
    def score(p, video, vm, ids, am, tgt):
        return gptj_score(p, CFG, VT, video=video, video_mask=vm,
                          input_ids=ids, attention_mask=am, target_ids=tgt)

    probs = np.asarray(score(sharded, video, vm, ids, am, targets))
    ref = np.asarray(gptj_score(params, CFG, VT, video=video, video_mask=vm,
                                input_ids=ids, attention_mask=am, target_ids=targets))
    np.testing.assert_allclose(ref, probs, atol=1e-5, rtol=1e-4)
    assert probs.shape == (4, 3)
    assert (probs > 0).all() and (probs <= 1).all()


def test_gptneo_tp_forward_matches_single_device():
    cfg = GPTNeoConfig(vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
                       window_size=4, max_position_embeddings=64)
    params = init_gptneo_params(jax.random.PRNGKey(0), cfg, VT)
    ids, am, video, vm = _inputs()
    ref = np.asarray(gptneo_forward(params, cfg, VT, ids, am, video, vm).logits)

    mesh = make_mesh(MeshSpec(data=2, model=4))
    sharded = shard_params(mesh, params, gpt_param_specs(params))

    @jax.jit
    def fwd(p, ids, am, video, vm):
        return gptneo_forward(p, cfg, VT, ids, am, video, vm).logits

    out = np.asarray(fwd(sharded, ids, am, video, vm))
    np.testing.assert_allclose(ref, out, atol=2e-4, rtol=1e-3)


def test_gptneo_greedy_cached_under_tp_matches_single_device():
    """The KV-cache decoder runs under tensor-parallel shardings (cache
    heads follow the sharded projections) and emits the same tokens as the
    unsharded path."""
    from frozenbilm_tpu.models.gptneo import gptneo_greedy_cached

    neo_cfg = GPTNeoConfig(vocab_size=128, hidden_size=32, num_layers=2,
                           num_heads=4, window_size=5,
                           max_position_embeddings=64)
    params = init_gptneo_params(jax.random.PRNGKey(0), neo_cfg, VT)
    ids, am, video, vm = _inputs()
    ref = np.asarray(gptneo_greedy_cached(
        params, neo_cfg, VT, video=video, video_mask=vm, input_ids=ids,
        attention_mask=am, max_new_tokens=5))

    mesh = make_mesh(MeshSpec(data=2, model=4))
    specs = gpt_param_specs(params)
    sharded = shard_params(mesh, params, specs)
    data_sh = NamedSharding(mesh, P("data"))
    args = [jax.device_put(x, data_sh) for x in (video, vm, ids, am)]

    @jax.jit
    def gen(p, video, vm, ids, am):
        return gptneo_greedy_cached(p, neo_cfg, VT, video=video, video_mask=vm,
                                    input_ids=ids, attention_mask=am,
                                    max_new_tokens=5)

    out = np.asarray(gen(sharded, *args))
    np.testing.assert_array_equal(ref, out)


def test_order_devices_hybrid():
    """Multi-slice layout: devices sort slice-major (stable within a slice)
    so (data, model) reshapes keep TP groups inside one slice; single-slice
    lists are unchanged."""
    import jax

    from frozenbilm_tpu.parallel.mesh import MeshSpec, make_mesh, order_devices_hybrid

    devs = jax.devices()[:8]
    # CPU devices have no slice_index -> identity ordering
    assert order_devices_hybrid(devs) == list(devs)

    # synthetic 2-slice assignment, interleaved like a worst-case enumeration
    slice_of = {d: i % 2 for i, d in enumerate(devs)}
    ordered = order_devices_hybrid(devs, slice_index_of=lambda d: slice_of[d])
    assert [slice_of[d] for d in ordered] == [0] * 4 + [1] * 4
    # stable: within a slice, original order preserved
    assert ordered[:4] == [d for d in devs if slice_of[d] == 0]

    # a (4, 2) mesh over the ordered list keeps each model pair intra-slice
    mesh = make_mesh(MeshSpec(data=4, model=2), devices=ordered)
    grid = mesh.devices
    for row in grid:
        assert slice_of[row[0]] == slice_of[row[1]]
