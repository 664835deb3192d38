"""load_any_checkpoint: HF pretrained dirs (bin + safetensors), released-style
.pth, and native dirs must all produce identical parameter trees."""

import os

import jax
import numpy as np
import pytest

from frozenbilm_tpu.config import DebertaV2Config, VideoTextConfig
from frozenbilm_tpu.models.deberta import init_deberta_params
from frozenbilm_tpu.utils.checkpoint import load_any_checkpoint, save_params
from frozenbilm_tpu.utils.hf_import import (
    deberta_overlay_from_torch,
    torch_state_dict_to_numpy,
)

CFG = DebertaV2Config(vocab_size=99, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=4, intermediate_size=64,
                      max_position_embeddings=64, position_buckets=8)
VT = VideoTextConfig(features_dim=16, max_feats=4, ds_factor_attn=4,
                     ds_factor_ff=4, n_ans=0)


@pytest.fixture(scope="module")
def torch_ref():
    import torch
    from transformers import DebertaV2Config as HF

    from tests.reference_loader import load_reference_deberta

    ref_mod = load_reference_deberta()
    hf_cfg = HF(vocab_size=99, hidden_size=32, num_hidden_layers=2,
                num_attention_heads=4, intermediate_size=64,
                max_position_embeddings=64, relative_attention=True,
                position_buckets=8, norm_rel_ebd="layer_norm",
                share_att_key=True, pos_att_type="p2c|c2p",
                position_biased_input=False, conv_kernel_size=3,
                conv_act="gelu", type_vocab_size=0, pad_token_id=0,
                layer_norm_eps=1e-7)
    torch.manual_seed(0)
    return ref_mod.DebertaV2ForMaskedLM(
        hf_cfg, max_feats=4, features_dim=16, freeze_lm=True, freeze_mlm=True,
        ds_factor_attn=4, ds_factor_ff=4, ft_ln=True, dropout=0.1, n_ans=0,
        freeze_last=True)


def _trees_equal(a, b):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_all_checkpoint_formats_agree(torch_ref, tmp_path):
    import torch

    template = init_deberta_params(jax.random.PRNGKey(0), CFG, VT)
    sd = torch_state_dict_to_numpy(torch_ref.state_dict())
    direct = deberta_overlay_from_torch(template, sd, CFG)

    # released-style .pth ({'model': sd})
    pth = tmp_path / "ckpt.pth"
    torch.save({"model": torch_ref.state_dict(), "epoch": 3}, pth)
    from_pth = load_any_checkpoint(str(pth), template, CFG, "deberta")
    _trees_equal(direct, from_pth)

    # HF pretrained dir with pytorch_model.bin
    hf_dir = tmp_path / "hf_bin"
    hf_dir.mkdir()
    torch.save(torch_ref.state_dict(), hf_dir / "pytorch_model.bin")
    from_bin = load_any_checkpoint(str(hf_dir), template, CFG, "deberta")
    _trees_equal(direct, from_bin)

    # HF pretrained dir with model.safetensors
    from safetensors.torch import save_file

    st_dir = tmp_path / "hf_st"
    st_dir.mkdir()
    # clone to break tied-weight aliasing (decoder.weight == word embeddings)
    save_file({k: v.clone().contiguous() for k, v in torch_ref.state_dict().items()},
              str(st_dir / "model.safetensors"))
    from_st = load_any_checkpoint(str(st_dir), template, CFG, "deberta")
    _trees_equal(direct, from_st)

    # native dir round-trip
    native = tmp_path / "native"
    save_params(str(native), direct, {"epoch": 3})
    from_native = load_any_checkpoint(str(native), template, CFG, "deberta")
    _trees_equal(direct, from_native)


def test_pth_ddp_prefix_stripped_only_at_start(tmp_path):
    """'module.' is a DDP wrapper prefix, not a substring to erase: a key
    containing '.module.' mid-path must survive the .pth import intact."""
    import torch

    from frozenbilm_tpu.utils.hf_import import load_pth_state_dict

    sd = {
        "module.linear_video.weight": torch.zeros(2, 2),
        "encoder.module.weird.weight": torch.ones(3),
    }
    torch.save({"model": sd}, tmp_path / "ckpt.pth")
    out = load_pth_state_dict(str(tmp_path / "ckpt.pth"))
    assert set(out) == {"linear_video.weight", "encoder.module.weird.weight"}
