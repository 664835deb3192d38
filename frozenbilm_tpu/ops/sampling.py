"""Token-selection ops for incremental decoding: greedy, temperature,
top-k, and nucleus (top-p) sampling.

The reference exposes generation only through the vendored HF generate
(gptneo.py:850-1726), whose LogitsProcessor stack includes temperature,
top-k, and top-p warpers; the demo/eval paths use greedy. These are the
TPU-native equivalents: pure functions over a (B, V) logits batch with
static shapes (sort + threshold instead of boolean indexing), usable inside
lax.scan decode loops.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-1e10)


def apply_top_k(logits: jax.Array, k: int) -> jax.Array:
    """Keep the k highest logits per row, mask the rest to -inf.

    HF TopKLogitsWarper semantics: threshold at the k-th largest value;
    ties at the threshold all survive (categorical renormalizes anyway).
    """
    if k <= 0 or k >= logits.shape[-1]:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def apply_top_p(logits: jax.Array, p: float) -> jax.Array:
    """Nucleus filtering (HF TopPLogitsWarper): keep the smallest set of
    tokens whose cumulative probability reaches p; always keep the top-1.

    Static-shape formulation: sort descending, exclusive cumsum of probs,
    drop tokens whose preceding mass already reached p — then mask the
    ORIGINAL logits below the per-row cutoff value (no scatter needed).
    """
    if p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1) - probs  # exclusive: mass BEFORE token i
    keep = cum < p  # top-1 always kept (exclusive mass 0 < p)
    # cutoff = smallest kept logit per row
    cutoff = jnp.min(jnp.where(keep, sorted_logits, jnp.inf), axis=-1, keepdims=True)
    return jnp.where(logits < cutoff, NEG_INF, logits)


def select_token(
    logits: jax.Array,
    rng: Optional[jax.Array] = None,
    *,
    temperature=0.0,
    top_k: int = 0,
    top_p: float = 1.0,
) -> jax.Array:
    """(B, V) logits -> (B,) int32 token ids.

    temperature == 0 (or no rng) -> greedy argmax; otherwise scale by
    1/temperature, apply top-k then top-p (HF warper order), and sample
    categorically.

    temperature may also be a per-row (B,) array (serving: requests with
    different temperatures ride one batch); rows with temperature 0 take
    the greedy token. top_k/top_p stay static (they shape the program).
    """
    logits = logits.astype(jnp.float32)
    greedy = jnp.argmax(logits, axis=-1)
    if rng is None or (isinstance(temperature, (int, float)) and temperature <= 0.0):
        return greedy
    t = jnp.asarray(temperature, jnp.float32)
    per_row = t.ndim == 1
    scale = jnp.maximum(t, 1e-6)
    logits = logits / (scale[:, None] if per_row else scale)
    logits = apply_top_k(logits, top_k)
    logits = apply_top_p(logits, top_p)
    sampled = jax.random.categorical(rng, logits, axis=-1)
    if per_row:
        return jnp.where(t > 0.0, sampled, greedy)
    return sampled
