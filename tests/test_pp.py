"""Pipeline parallelism (parallel/pp.py): GPipe schedule over 'pipe'.

Pins (1) the generic pipeline_apply against a plain lax.scan on an
arbitrary state pytree, (2) gptneo_forward_pp logit/loss equality with the
single-device forward — layer chunking, injection/collection timing, and
the travelling padding mask all have to be right for this to hold.
"""

import jax
import jax.numpy as jnp
import numpy as np

from frozenbilm_tpu.config import GPTNeoConfig, VideoTextConfig
from frozenbilm_tpu.models.gptneo import (
    gptneo_forward,
    gptneo_forward_pp,
    init_gptneo_params,
)
from frozenbilm_tpu.parallel.pp import (
    make_pipe_mesh,
    microbatch,
    pipeline_apply,
    unmicrobatch,
)


def test_pipeline_apply_matches_scan():
    n_layers, S, M, mb, D = 8, 4, 3, 2, 16
    rng = np.random.default_rng(0)
    layers = {
        "w": jnp.asarray(rng.normal(size=(n_layers, D, D)) * 0.2, jnp.float32),
        "b": jnp.asarray(rng.normal(size=(n_layers, D)), jnp.float32),
    }
    x = jnp.asarray(rng.normal(size=(M, mb, D)), jnp.float32)
    scale = jnp.asarray(rng.normal(size=(M, mb, 1)), jnp.float32)

    def layer_fn(lp, state):
        h, s = state
        return (jnp.tanh(h @ lp["w"] + lp["b"]) * s, s)

    # oracle: plain scan over all layers per microbatch
    def all_layers(h, s):
        def step(c, lp):
            return layer_fn(lp, c), None
        return jax.lax.scan(step, (h, s), layers)[0][0]

    want = jax.vmap(all_layers)(x, scale)

    mesh = make_pipe_mesh(S, devices=jax.devices()[:S])
    got, scale_out = pipeline_apply(layer_fn, layers, (x, scale), mesh)
    np.testing.assert_allclose(np.asarray(want), np.asarray(got),
                               rtol=1e-5, atol=1e-5)
    # constants travel untouched
    np.testing.assert_array_equal(np.asarray(scale_out), np.asarray(scale))


def test_gptneo_pp_matches_forward():
    cfg = GPTNeoConfig(vocab_size=128, hidden_size=32, num_layers=4,
                       num_heads=2, window_size=4, max_position_embeddings=64)
    vt = VideoTextConfig(features_dim=16, max_feats=3, ds_factor_attn=0,
                         ds_factor_ff=0)
    params = init_gptneo_params(jax.random.PRNGKey(0), cfg, vt)
    rng = np.random.default_rng(0)
    B, T, F = 6, 8, 3
    ids = jnp.asarray(rng.integers(3, cfg.vocab_size, size=(B, T)))
    am = jnp.asarray((rng.random((B, T)) > 0.2).astype(np.int32))
    am = am.at[:, 0].set(1)
    video = jnp.asarray(rng.normal(size=(B, F, 16)), jnp.float32)
    vm = jnp.ones((B, F), jnp.int32)
    labels = jnp.asarray(rng.integers(3, cfg.vocab_size, size=(B, T)))

    ref = gptneo_forward(params, cfg, vt, ids, am, video, vm, labels=labels)
    mesh = make_pipe_mesh(4, devices=jax.devices()[:4])
    got = jax.jit(lambda p, i, a, v, m, l: gptneo_forward_pp(
        p, cfg, vt, i, a, v, m, labels=l, mesh=mesh, n_micro=3))(
        params, ids, am, video, vm, labels)

    np.testing.assert_allclose(np.asarray(ref.logits), np.asarray(got.logits),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(float(ref.loss), float(got.loss),
                               rtol=1e-5, atol=1e-5)


def test_microbatch_roundtrip_and_divisibility():
    x = {"a": jnp.arange(24).reshape(6, 4)}
    mb = microbatch(x, 3)
    assert mb["a"].shape == (3, 2, 4)
    np.testing.assert_array_equal(np.asarray(unmicrobatch(mb)["a"]),
                                  np.asarray(x["a"]))
    try:
        microbatch(x, 5)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
