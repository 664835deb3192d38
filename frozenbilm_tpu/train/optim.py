"""Optimizer + LR schedule.

Reference: Adam over requires_grad params only (main.py:182-188), betas
0.9/0.95, weight_decay 0 (args.py:246-262), grad clip max-norm 0.1
(main.py:82, args.py:273-275), schedule constant or linear-warmup/linear-decay
with fraction_warmup_steps (util/misc.py:59-78).
"""

from __future__ import annotations

import optax


def make_schedule(
    base_lr: float,
    num_training_steps: int,
    schedule: str = "",
    fraction_warmup_steps: float = 0.1,
):
    """LR schedule matching reference util/misc.py:59-78.

    Ordering parity: the reference calls adjust_learning_rate AFTER
    optimizer.step (main.py:84-88), so update k runs at gamma(k-1) and the
    very first update runs at the full base lr. optax evaluates the schedule
    at the update's own count, so we shift by one: gamma(-1) := 1.
    """
    if schedule == "linear_with_warmup":
        warmup = round(fraction_warmup_steps * num_training_steps)

        def fn(step):
            import jax.numpy as jnp

            step = jnp.asarray(step, jnp.float32) - 1.0  # post-step adjust parity
            w = jnp.maximum(1, warmup)
            gamma_warm = step / w
            denom = jnp.maximum(1, num_training_steps - warmup)
            gamma_decay = jnp.maximum(0.0, (num_training_steps - step) / denom)
            gamma = jnp.where(step < warmup, gamma_warm, gamma_decay)
            return base_lr * jnp.where(step < 0, 1.0, gamma)

        return fn
    return lambda step: base_lr


def make_optimizer(
    lr_schedule,
    *,
    beta1: float = 0.9,
    beta2: float = 0.95,
    weight_decay: float = 0.0,
    clip_max_norm: float = 0.1,
) -> optax.GradientTransformation:
    tx = []
    if clip_max_norm:
        tx.append(optax.clip_by_global_norm(clip_max_norm))
    if weight_decay:
        tx.append(optax.adamw(lr_schedule, b1=beta1, b2=beta2, weight_decay=weight_decay))
    else:
        tx.append(optax.adam(lr_schedule, b1=beta1, b2=beta2))
    return optax.chain(*tx)
