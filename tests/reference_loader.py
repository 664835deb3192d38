"""Test-only loader for the upstream reference implementation (read-only at
/root/reference) to generate golden parity fixtures.

The reference targets transformers 4.17 / older numpy; tiny shims make it
importable under the modern stack without modifying it:
  - np.int alias (removed in numpy 1.24; used by deberta.py:588)
  - stub 'model' package so model/__init__.py (which imports stale
    transformers symbols for bert) never executes
  - @dataclass applied to its custom ModelOutput subclass
"""

import dataclasses
import importlib
import importlib.machinery
import sys
import types

import numpy as np

REFERENCE_PATH = "/root/reference"


def _stub_package(name: str, path: str) -> None:
    """Register a package stub so the reference's __init__ never executes.

    A real ModuleSpec is required: libraries probe importlib.util.find_spec
    on common names (e.g. transformers checks for HF 'datasets')."""
    if name in sys.modules and getattr(sys.modules[name], "__frozenbilm_stub__", False):
        return
    pkg = types.ModuleType(name)
    pkg.__path__ = [path]
    spec = importlib.machinery.ModuleSpec(name, None, is_package=True)
    spec.submodule_search_locations = [path]
    pkg.__spec__ = spec
    pkg.__frozenbilm_stub__ = True
    sys.modules[name] = pkg


def _ensure_pkg():
    if not hasattr(np, "int"):
        np.int = int  # noqa: NPY001
    _stub_package("model", f"{REFERENCE_PATH}/model")


def load_reference_deberta():
    _ensure_pkg()
    mod = importlib.import_module("model.deberta")
    if not dataclasses.is_dataclass(mod.BaseModelOutput):
        mod.BaseModelOutput = dataclasses.dataclass(mod.BaseModelOutput)
    return mod


def load_reference_bert():
    _ensure_pkg()
    import transformers.modeling_utils as mu
    import transformers.pytorch_utils as pu

    # transformers moved these helpers out of modeling_utils after 4.17.
    for name in ("apply_chunking_to_forward", "find_pruneable_heads_and_indices", "prune_linear_layer"):
        if not hasattr(mu, name) and hasattr(pu, name):
            setattr(mu, name, getattr(pu, name))
    if not hasattr(mu, "apply_chunking_to_forward"):
        def apply_chunking_to_forward(forward_fn, chunk_size, chunk_dim, *input_tensors):
            return forward_fn(*input_tensors)

        mu.apply_chunking_to_forward = apply_chunking_to_forward
    return importlib.import_module("model.bert")


def load_reference_datasets():
    """Import the reference dataset package (torch-based) for fixtures."""
    _ensure_pkg()
    _stub_package("datasets", f"{REFERENCE_PATH}/datasets")
    vqa = importlib.import_module("datasets.videoqa_dataset")
    mc = importlib.import_module("datasets.mc_dataset")
    vt = importlib.import_module("datasets.videotext_dataset")
    return vqa, mc, vt


def _patch_kwargs_update(model_cls):
    """PreTrainedModel lost GenerationMixin in transformers>=4.50; provide the
    4.17-era kwargs update that the reference's score() loop relies on
    (sets 'past' from the KV cache, extends the attention mask by one)."""
    if hasattr(model_cls, "_update_model_kwargs_for_generation"):
        return

    def _update(self, outputs, model_kwargs, is_encoder_decoder=False, **_):
        import torch

        model_kwargs["past"] = getattr(outputs, "past_key_values", None)
        am = model_kwargs.get("attention_mask")
        if am is not None:
            model_kwargs["attention_mask"] = torch.cat(
                [am, am.new_ones((am.shape[0], 1))], dim=-1)
        return model_kwargs

    model_cls._update_model_kwargs_for_generation = _update


def load_reference_gptj():
    _ensure_pkg()
    mod = importlib.import_module("model.gptj")
    _patch_kwargs_update(mod.GPTJForCausalLM)
    return mod


def load_reference_gptneo():
    """gptneo.py imports pre-4.18 transformers module paths; alias them."""
    _ensure_pkg()
    import transformers
    from transformers.generation import beam_search as bs
    from transformers.generation import utils as gu

    if "transformers.generation_utils" not in sys.modules:
        shim = types.ModuleType("transformers.generation_utils")
        for name in ("GreedySearchOutput", "SampleOutput", "BeamSearchOutput",
                     "BeamSampleOutput"):
            setattr(shim, name, getattr(gu, name))
        for name in ("GreedySearchEncoderDecoderOutput", "GreedySearchDecoderOnlyOutput"):
            setattr(shim, name, getattr(gu, name, object))
        shim.validate_stopping_criteria = getattr(
            gu, "validate_stopping_criteria", lambda c, *_: c)
        sys.modules["transformers.generation_utils"] = shim
    if "transformers.generation_beam_search" not in sys.modules:
        shim2 = types.ModuleType("transformers.generation_beam_search")
        for name in ("BeamScorer", "BeamSearchScorer", "ConstrainedBeamSearchScorer"):
            setattr(shim2, name, getattr(bs, name))
        sys.modules["transformers.generation_beam_search"] = shim2
    if not hasattr(transformers, "Constraint"):
        from transformers.generation import beam_constraints

        transformers.Constraint = beam_constraints.Constraint
    mod = importlib.import_module("model.gptneo")
    _patch_kwargs_update(mod.GPTNeoForCausalLM)
    return mod


def load_reference_misc():
    _ensure_pkg()
    _stub_package("util", f"{REFERENCE_PATH}/util")
    return importlib.import_module("util.misc")
