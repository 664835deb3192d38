"""Optimizer + LR schedule.

Reference: Adam over requires_grad params only (main.py:182-188), betas
0.9/0.95, weight_decay 0 (args.py:246-262), grad clip max-norm 0.1
(main.py:82, args.py:273-275), schedule constant or linear-warmup/linear-decay
with fraction_warmup_steps (util/misc.py:59-78).
"""

from __future__ import annotations

import optax


def train_key(seed: int, impl: str = "threefry"):
    """PRNG key for the train-step randomness stream (--rng_impl).

    'threefry' (default) is jax's counter-based PRNG: identical streams on
    every backend, but the random BITS for the big per-step masks — dropout
    over (B, H, L, L) attention probs x 24 layers, the 80/10/10 MLM
    corruption draws — are pure VPU work. 'rbg' keeps threefry split/fold_in
    semantics and generates the bits on the TPU hardware RNG instead;
    'unsafe_rbg' additionally replaces split/fold_in with RBG (fastest,
    weaker stream-independence guarantees). Dropout/corruption only need
    statistical quality, not reproducibility across impls, so 'rbg' is safe
    for training throughput; checkpoints/metrics never store keys.
    """
    import jax

    if impl == "threefry":
        return jax.random.PRNGKey(seed)
    if impl not in ("rbg", "unsafe_rbg"):
        raise ValueError(f"unknown --rng_impl {impl!r}; "
                         "choose threefry/rbg/unsafe_rbg")
    # typed key: a raw uint32 array would lose the impl tag and get
    # re-wrapped as threefry by the first fold_in/split downstream
    return jax.random.key(seed, impl=impl)


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


class NonfiniteLossPolicy:
    """Host-side half of --skip_nonfinite (pairs with the Trainer's in-jit
    where-selection, which drops the update and preserves the optimizer
    state on any non-finite loss/grad — see Trainer(skip_nonfinite=True)).

    max_skips=0 reproduces the reference: any non-finite loss aborts
    training (main.py:75-78, sys.exit). max_skips=N tolerates up to N
    CONSECUTIVE non-finite steps — the step is logged as skipped and
    excluded from metrics — then aborts. The streak is per-epoch (each
    train loop builds a fresh policy); since the in-jit guard never applies
    a bad update, a streak straddling an epoch boundary only delays the
    abort, it cannot corrupt params."""

    def __init__(self, max_skips: int = 0):
        self.max_skips = max_skips
        self.streak = 0
        self.total_skipped = 0

    def step(self, loss: float, grad_norm: float = 0.0) -> bool:
        """Returns True when this step was non-finite and should be skipped
        from metric logging; raises when the policy is exhausted. grad_norm
        catches backward-only overflow (finite loss, non-finite grads)."""
        import numpy as np

        if np.isfinite(loss) and np.isfinite(grad_norm):
            self.streak = 0
            return False
        if not self.max_skips:
            raise RuntimeError(
                f"Loss is {loss} (grad norm {grad_norm}), stopping training")
        self.streak += 1
        self.total_skipped += 1
        if self.streak > self.max_skips:
            raise RuntimeError(
                f"{self.streak} consecutive non-finite steps "
                f"(--skip_nonfinite {self.max_skips}), stopping training")
        print(f"warning: non-finite step (loss {loss}, grad norm {grad_norm});"
              f" update dropped ({self.streak}/{self.max_skips} consecutive)")
        return True
