"""Driver loss functions vs the reference torch formulas on shared inputs."""

import jax
import jax.numpy as jnp
import numpy as np


def test_qa_ce_loss_matches_reference():
    import torch
    import torch.nn.functional as F

    from frozenbilm_tpu.tasks.videoqa import qa_loss

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(6, 11)).astype(np.float32)
    gt = rng.integers(0, 11, size=(6,))
    ref = F.cross_entropy(torch.tensor(logits), torch.tensor(gt)).item()
    ours = float(qa_loss(jnp.asarray(logits), jnp.asarray(gt), "msrvtt"))
    assert abs(ref - ours) < 1e-6


def test_qa_soft_loss_matches_reference():
    """iVQA/VQA soft-label loss (videoqa.py:68-81)."""
    import torch
    import torch.nn.functional as F

    from frozenbilm_tpu.tasks.videoqa import qa_loss

    rng = np.random.default_rng(1)
    logits = rng.normal(size=(5, 9)).astype(np.float32)
    counts = rng.integers(0, 4, size=(5, 9)).astype(np.float32)

    for name, denom in [("ivqa", 2.0), ("vqa", 3.0)]:
        t_logits = torch.tensor(logits)
        a = (torch.tensor(counts) / denom).clamp(max=1)
        nll = -F.log_softmax(t_logits, 1)
        ref = (nll * a / a.sum(1, keepdim=True).clamp(min=1)).sum(dim=1).mean().item()
        ours = float(qa_loss(jnp.asarray(logits), jnp.asarray(counts), name))
        assert abs(ref - ours) < 1e-6, name


def test_mc_balanced_bce_matches_reference():
    """Balanced BCE over P(Yes) probabilities (mc.py:75-92)."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(2)
    B, mc = 4, 4
    probs = rng.uniform(0.05, 0.95, size=(B, mc)).astype(np.float32)
    gt = rng.integers(0, mc, size=(B,))

    # reference formula
    t = torch.tensor(probs)
    tg = torch.tensor(gt)
    pos_logits = t[torch.arange(B), tg]
    neg_mask = torch.ones_like(t)
    neg_mask.scatter_(1, tg.unsqueeze(-1), 0)
    neg_logits = t[neg_mask.bool()].view(B, mc - 1).reshape(-1)
    ref = ((F.binary_cross_entropy(pos_logits, torch.ones(B)) +
            F.binary_cross_entropy(neg_logits, torch.zeros(B * (mc - 1)))) / 2).item()

    from frozenbilm_tpu.tasks.mc import balanced_bce

    ours = float(balanced_bce(jnp.asarray(probs), jnp.asarray(gt), mc))
    assert abs(ref - ours) < 1e-6

    # single-candidate binary case (mc.py:90-92)
    probs1 = rng.uniform(0.05, 0.95, size=(B, 1)).astype(np.float32)
    gt1 = rng.integers(0, 2, size=(B,))
    import torch.nn.functional as F
    import torch

    ref1 = F.binary_cross_entropy(torch.tensor(probs1[:, 0]),
                                  torch.tensor(gt1, dtype=torch.float32)).item()
    ours1 = float(balanced_bce(jnp.asarray(probs1), jnp.asarray(gt1), 1))
    assert abs(ref1 - ours1) < 1e-6
