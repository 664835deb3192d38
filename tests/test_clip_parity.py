"""Parity: our JAX CLIP towers vs HF CLIPModel (quick_gelu, the OpenAI
configuration the reference relies on via the `clip` package)."""

import jax
import numpy as np
import pytest

from frozenbilm_tpu.config import CLIPTextConfig, CLIPVisionConfig
from frozenbilm_tpu.models.clip import (
    clip_encode_image,
    clip_encode_text,
    clip_params_from_hf,
)
from frozenbilm_tpu.utils.hf_import import torch_state_dict_to_numpy

VCFG = CLIPVisionConfig(image_size=28, patch_size=7, hidden_size=32,
                        num_layers=3, num_heads=4, projection_dim=24)
TCFG = CLIPTextConfig(vocab_size=99, context_length=16, hidden_size=32,
                      num_layers=2, num_heads=4, projection_dim=24)


@pytest.fixture(scope="module")
def pair():
    import torch
    from transformers import CLIPConfig, CLIPModel, CLIPTextConfig as HFT, CLIPVisionConfig as HFV

    hf_cfg = CLIPConfig(
        projection_dim=24,
        # eos_token_id = highest id so HF's eos pooling coincides with
        # OpenAI CLIP's argmax pooling (real vocab: EOT == 49407 == max id)
        text_config=HFT(vocab_size=99, hidden_size=32, intermediate_size=128,
                        num_hidden_layers=2, num_attention_heads=4,
                        max_position_embeddings=16, hidden_act="quick_gelu",
                        eos_token_id=98).to_dict(),
        vision_config=HFV(hidden_size=32, intermediate_size=128,
                          num_hidden_layers=3, num_attention_heads=4,
                          image_size=28, patch_size=7,
                          hidden_act="quick_gelu").to_dict(),
    )
    torch.manual_seed(0)
    ref = CLIPModel(hf_cfg)
    ref.eval()
    sd = torch_state_dict_to_numpy(ref.state_dict())
    vision, text = clip_params_from_hf(sd, VCFG, TCFG)
    return ref, jax.tree.map(np.asarray, vision), jax.tree.map(np.asarray, text)


def test_vision_parity(pair):
    import torch

    ref, vision, _ = pair
    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(2, 28, 28, 3)).astype(np.float32)
    with torch.no_grad():
        ref_feat = ref.get_image_features(
            pixel_values=torch.tensor(pixels.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(clip_encode_image(vision, VCFG, pixels))
    np.testing.assert_allclose(ref_feat, ours, atol=2e-5, rtol=1e-4)


def test_text_parity(pair):
    import torch

    ref, _, text = pair
    rng = np.random.default_rng(1)
    # EOT convention: highest token id last (argmax pooling)
    ids = rng.integers(1, 90, size=(3, 16))
    ids[:, 10] = 98  # EOT
    ids[:, 11:] = 0
    with torch.no_grad():
        ref_feat = ref.get_text_features(input_ids=torch.tensor(ids)).numpy()
    ours = np.asarray(clip_encode_text(text, TCFG, ids))
    np.testing.assert_allclose(ref_feat, ours, atol=2e-5, rtol=1e-4)


def test_openai_state_dict_roundtrip():
    """OpenAI-format packed-qkv state dict converts to identical params."""
    import torch

    from frozenbilm_tpu.models.clip import clip_params_from_openai

    rng = np.random.default_rng(0)
    w = 32
    sd = {}
    sd["visual.conv1.weight"] = rng.normal(size=(w, 3, 7, 7)).astype(np.float32)
    sd["visual.class_embedding"] = rng.normal(size=(w,)).astype(np.float32)
    sd["visual.positional_embedding"] = rng.normal(size=(17, w)).astype(np.float32)
    sd["visual.proj"] = rng.normal(size=(w, 24)).astype(np.float32)
    for name in ("visual.ln_pre", "visual.ln_post", "ln_final"):
        sd[name + ".weight"] = np.ones(w, np.float32)
        sd[name + ".bias"] = np.zeros(w, np.float32)
    for tower, n in (("visual.transformer.resblocks", 3), ("transformer.resblocks", 2)):
        for i in range(n):
            b = f"{tower}.{i}."
            sd[b + "attn.in_proj_weight"] = rng.normal(size=(3 * w, w)).astype(np.float32)
            sd[b + "attn.in_proj_bias"] = rng.normal(size=(3 * w,)).astype(np.float32)
            sd[b + "attn.out_proj.weight"] = rng.normal(size=(w, w)).astype(np.float32)
            sd[b + "attn.out_proj.bias"] = rng.normal(size=(w,)).astype(np.float32)
            for lnn in ("ln_1", "ln_2"):
                sd[b + lnn + ".weight"] = np.ones(w, np.float32)
                sd[b + lnn + ".bias"] = np.zeros(w, np.float32)
            sd[b + "mlp.c_fc.weight"] = rng.normal(size=(4 * w, w)).astype(np.float32)
            sd[b + "mlp.c_fc.bias"] = rng.normal(size=(4 * w,)).astype(np.float32)
            sd[b + "mlp.c_proj.weight"] = rng.normal(size=(w, 4 * w)).astype(np.float32)
            sd[b + "mlp.c_proj.bias"] = rng.normal(size=(w,)).astype(np.float32)
    sd["token_embedding.weight"] = rng.normal(size=(99, w)).astype(np.float32)
    sd["positional_embedding"] = rng.normal(size=(16, w)).astype(np.float32)
    sd["text_projection"] = rng.normal(size=(w, 24)).astype(np.float32)

    vcfg = CLIPVisionConfig(image_size=28, patch_size=7, hidden_size=w,
                            num_layers=3, num_heads=4, projection_dim=24)
    vision, text = clip_params_from_openai(sd, vcfg, TCFG)
    # shapes line up with the HF-format importer's contract
    assert vision["patch_embed"]["kernel"].shape == (7, 7, 3, w)
    assert vision["layers"]["attn"]["q_proj"]["kernel"].shape == (3, w, w)
    assert text["proj"]["kernel"].shape == (w, 24)
    # q/k/v split: q of layer 0 equals the first third of in_proj
    q0 = vision["layers"]["attn"]["q_proj"]["kernel"][0]
    np.testing.assert_array_equal(
        q0, sd["visual.transformer.resblocks.0.attn.in_proj_weight"][:w].T)
    # and the converted towers actually run
    pixels = rng.normal(size=(1, 28, 28, 3)).astype(np.float32)
    feat = clip_encode_image(jax.tree.map(np.asarray, vision), vcfg, pixels)
    assert feat.shape == (1, 24) and np.isfinite(np.asarray(feat)).all()
