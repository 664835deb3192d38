"""Jitted training/eval engine over a device mesh.

TPU-native replacement for the reference's per-driver train loops
(main.py:24-98, videoqa.py:25-115, mc.py:25-124):
  - one jit-compiled train_step; MLM corruption happens *inside* the step
  - frozen backbone is a separate donated-constant tree; optimizer state
    exists only for the trainable partition (adapters + visual projection
    + LayerNorms + answer module)
  - data parallelism: batch sharded over the mesh 'data' axis, params
    replicated; XLA inserts the gradient all-reduce. This is true synchronous
    DP — the reference never syncs grads (SURVEY.md §2.5), which we treat as
    a bug and fix.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from frozenbilm_tpu.parallel.mesh import DATA_AXIS
from frozenbilm_tpu.train.partition import merge_params, partition_params


class TrainState(NamedTuple):
    step: jax.Array
    trainable: Dict
    opt_state: Any


# loss_fn(params, batch, rng) -> (loss, metrics_dict)
LossFn = Callable[[Dict, Dict, Optional[jax.Array]], Tuple[jax.Array, Dict]]


def create_train_state(
    params, vt, tx, mesh: Optional[Mesh] = None, fsdp: bool = False,
) -> Tuple[TrainState, Dict]:
    """Partition params and init optimizer state.

    With a mesh, the state and frozen trees are replicated over it; under
    multi-host this is required (host-local arrays cannot feed a jit whose
    in_shardings span non-addressable devices) and assumes every host built
    identical params (same seed / same checkpoint).

    fsdp=True instead stores every large leaf (params, adam mu/nu) sharded
    over the mesh 'data' axis (parallel/fsdp.py); pass the matching
    shardings to Trainer via fsdp_state_shardings."""
    trainable, frozen = partition_params(params, vt)
    opt_state = tx.init(trainable)
    state = TrainState(jnp.zeros((), jnp.int32), trainable, opt_state)
    if mesh is not None and fsdp:
        sh_state, sh_frozen = fsdp_state_shardings(mesh, state, frozen)
        state = jax.tree.map(jax.device_put, state, sh_state)
        frozen = jax.tree.map(jax.device_put, frozen, sh_frozen)
    elif mesh is not None:
        from frozenbilm_tpu.parallel.mesh import replicate

        state = TrainState(*replicate(mesh, tuple(state)))
        frozen = replicate(mesh, frozen)
    return state, frozen


def fsdp_state_shardings(mesh: Mesh, state: TrainState, frozen,
                         min_size: int = 2 ** 13):
    """(TrainState shardings, frozen shardings) for FSDP storage: every
    large leaf sharded over 'data', small leaves replicated. Deterministic
    in the tree shapes, so callers may recompute it anywhere."""
    from frozenbilm_tpu.parallel.fsdp import fsdp_specs, shardings

    axis = mesh.shape[DATA_AXIS]
    sh_state = TrainState(
        shardings(mesh, P()),
        shardings(mesh, fsdp_specs(state.trainable, axis, min_size=min_size)),
        shardings(mesh, fsdp_specs(state.opt_state, axis, min_size=min_size)),
    )
    return sh_state, shardings(mesh, fsdp_specs(frozen, axis, min_size=min_size))


def make_trainer_and_state(loss_fn, tx, params, vt, mesh: Optional[Mesh],
                           fsdp: bool = False, grad_accum: int = 1,
                           skip_nonfinite: bool = False):
    """The shared driver plumbing: partition + place state, build the
    Trainer with matching shardings. fsdp=True stores params/opt-state
    sharded over 'data' (parallel/fsdp.py) — the layout for models whose
    replicated weights would not fit per-chip HBM."""
    state, frozen = create_train_state(params, vt, tx, mesh=mesh, fsdp=fsdp)
    st_sh = fz_sh = None
    if mesh is not None and fsdp:
        st_sh, fz_sh = fsdp_state_shardings(mesh, state, frozen)
    trainer = Trainer(loss_fn, tx, mesh=mesh,
                      state_shardings=st_sh, frozen_shardings=fz_sh,
                      grad_accum=grad_accum, skip_nonfinite=skip_nonfinite)
    return trainer, state, frozen


class Trainer:
    """Wraps jitted train/eval steps with mesh shardings.

    The same Trainer works single-chip (1-device mesh) and multi-chip; the
    batch's leading dim must be divisible by the data-axis size.
    """

    def __init__(
        self,
        loss_fn: LossFn,
        tx: optax.GradientTransformation,
        mesh: Optional[Mesh] = None,
        state_shardings=None,
        frozen_shardings=None,
        grad_accum: int = 1,
        skip_nonfinite: bool = False,
    ):
        """state_shardings/frozen_shardings (pytrees of NamedSharding
        matching TrainState / the frozen tree, e.g. from
        fsdp_state_shardings) override the default replicated layout —
        params live sharded over 'data' and XLA all-gathers per scan step
        (FSDP). Defaults replicate, which is right when the trainable
        partition is small (the FrozenBiLM regime).

        grad_accum=N splits each train batch into N sequential microbatches
        inside the jitted step (lax.scan), averaging gradients before the
        single optimizer update — the large-effective-batch option when
        activations for the full batch would not fit HBM. Peak activation
        memory drops ~N-fold; the optimizer update count is unchanged. The
        batch's leading dim must be divisible by N (and by N x data-axis
        under a mesh). The microbatch split is leading-dim-major, so each
        device's shard splits locally — no cross-device resharding.

        skip_nonfinite=True makes a step with non-finite loss or grads a
        no-op via jnp.where selection: params and optimizer state keep
        their previous values, so a bad step can never poison training.
        Implemented in-step (not as an optax wrapper) so the opt_state
        pytree is IDENTICAL with the flag on or off — checkpoints resume
        across a --skip_nonfinite change. Hosts observe bad steps through
        the metrics' non-finite loss/grad_norm (NonfiniteLossPolicy).
        """
        if grad_accum < 1:
            raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")
        self.grad_accum = grad_accum
        self.skip_nonfinite = skip_nonfinite
        self.loss_fn = loss_fn
        self.tx = tx
        self.mesh = mesh
        self.state_shardings = state_shardings
        self.frozen_shardings = frozen_shardings
        rep = NamedSharding(mesh, P()) if mesh else None
        data = NamedSharding(mesh, P(DATA_AXIS)) if mesh else None
        st = state_shardings if state_shardings is not None else rep
        fz = frozen_shardings if frozen_shardings is not None else rep
        jit_kw = {}
        if mesh is not None:
            jit_kw = dict(
                in_shardings=(st, fz, data, rep),
                out_shardings=(st, rep),
                donate_argnums=(0,),
            )
        self._train_step = jax.jit(self._train_step_impl, **jit_kw)
        eval_kw = {}
        if mesh is not None:
            eval_kw = dict(in_shardings=(st, fz, data), out_shardings=rep)
        self._eval_step = jax.jit(self._eval_step_impl, **eval_kw)

    def _train_step_impl(self, state: TrainState, frozen, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)

        def compute(trainable, mb, r):
            params = merge_params(trainable, frozen)
            loss, metrics = self.loss_fn(params, mb, r)
            return loss, metrics

        grad_fn = jax.value_and_grad(compute, has_aux=True)
        if self.grad_accum == 1:
            (loss, metrics), grads = grad_fn(state.trainable, batch, step_rng)
        else:
            (loss, metrics), grads = self._accumulate(
                grad_fn, state.trainable, batch, step_rng)
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        if self.skip_nonfinite:
            # drop the whole update on a bad step: zero the grads (so the
            # inner tx can't produce NaN) and keep the old opt_state via
            # where-selection. The opt_state pytree is identical either
            # way, so checkpoints stay resume-compatible across the flag.
            ok = jnp.isfinite(loss) & jnp.isfinite(metrics["grad_norm"])
            safe = jax.tree.map(lambda g: jnp.where(ok, g, 0), grads)
            updates, opt_new = self.tx.update(safe, state.opt_state,
                                              state.trainable)
            opt_state = jax.tree.map(lambda n, o: jnp.where(ok, n, o),
                                     opt_new, state.opt_state)
            updates = jax.tree.map(lambda u: jnp.where(ok, u, 0), updates)
        else:
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        new_state = TrainState(state.step + 1, trainable, opt_state)
        return new_state, metrics

    def _accumulate(self, grad_fn, trainable, batch, step_rng):
        """Mean loss/metrics/grads over grad_accum sequential microbatches
        via lax.scan (one compiled body, peak activations ~1/N). Microbatch
        i gets fold_in(step_rng, i) so MLM corruption / dropout stay i.i.d.
        across microbatches. Row m*N+i goes to microbatch i: with the batch
        contiguously sharded over 'data', every microbatch stays evenly
        spread across devices (no resharding collectives).

        Semantics: if the loss_fn reports a "loss_weight" metric (its
        normalization denominator, e.g. the MLM masked-token count), the
        accumulated loss/grads are the WEIGHTED mean — sum_i(w_i * g_i) /
        sum_i(w_i) — which equals the exact full-batch gradient of a
        sum/count loss, because d/dθ [Σ_i s_i / Σ_i n_i] = Σ_i n_i g_i / Σ_i
        n_i where g_i = d(s_i/n_i)/dθ. Without "loss_weight" this is a mean
        of per-microbatch means, exact for per-row losses (videoqa
        soft-label CE) and approximate for count-normalized ones. Other
        metrics are always plain means; "loss_weight" itself is reported as
        the full-batch sum."""
        accum = self.grad_accum

        n_data = self.mesh.shape[DATA_AXIS] if self.mesh is not None else 1
        b = jax.tree.leaves(batch)[0].shape[0]
        if b % accum:
            raise ValueError(
                f"batch dim {b} not divisible by grad_accum={accum}")
        if (b // accum) % n_data:
            # a microbatch that doesn't fill the data axis would force
            # GSPMD resharding + idle devices — refuse loudly
            raise ValueError(
                f"microbatch {b}//{accum}={b // accum} not divisible by "
                f"data axis {n_data}; grad_accum requires batch % "
                f"(grad_accum * data_axis) == 0")

        def split(x):
            x = x.reshape(b // accum, accum, *x.shape[1:]).swapaxes(0, 1)
            if self.mesh is not None:
                x = jax.lax.with_sharding_constraint(
                    x, NamedSharding(self.mesh, P(None, DATA_AXIS)))
            return x

        micro = jax.tree.map(split, batch)
        # carry structure (incl. the loss_fn's aux metrics dict) at zero,
        # discovered without compute
        shapes = jax.eval_shape(grad_fn, trainable,
                                jax.tree.map(lambda x: x[0], micro), step_rng)
        zeros = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
        (_, metric_shapes), _ = shapes
        weighted = (isinstance(metric_shapes, dict)
                    and "loss_weight" in metric_shapes)

        def body(carry, xs):
            (l_acc, m_acc), g_acc = carry
            mb, i = xs
            (loss, metrics), grads = grad_fn(
                trainable, mb, jax.random.fold_in(step_rng, i))
            if weighted:
                w = metrics["loss_weight"].astype(loss.dtype)
                loss = loss * w
                grads = jax.tree.map(lambda g: g * w.astype(g.dtype), grads)
            carry = ((l_acc + loss, jax.tree.map(jnp.add, m_acc, metrics)),
                     jax.tree.map(jnp.add, g_acc, grads))
            return carry, None

        acc, _ = jax.lax.scan(body, zeros, (micro, jnp.arange(accum)))
        if not weighted:
            return jax.tree.map(lambda x: x / accum, acc)
        (loss, metrics), grads = acc
        # max(1) guards the all-microbatches-empty case (each empty
        # microbatch contributed weight 0, so the numerators are 0 too)
        total = jnp.maximum(metrics["loss_weight"], 1).astype(loss.dtype)
        loss = loss / total
        grads = jax.tree.map(lambda g: g / total.astype(g.dtype), grads)
        metrics = {k: (v if k == "loss_weight" else v / accum)
                   for k, v in metrics.items()}
        return (loss, metrics), grads

    def _eval_step_impl(self, state: TrainState, frozen, batch):
        params = merge_params(state.trainable, frozen)
        loss, metrics = self.loss_fn(params, batch, None)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return metrics

    def train_step(self, state, frozen, batch, rng):
        return self._train_step(state, frozen, batch, rng)

    def eval_step(self, state, frozen, batch):
        return self._eval_step(state, frozen, batch)


def make_mlm_loss_fn(
    forward_fn,
    cfg,
    vt,
    *,
    mask_token_id: int,
    vocab_size: int,
    pad_token_id: int = 0,
    mlm_probability: float = 0.15,
    remat: bool = False,
    gather_loss_positions: Optional[int] = None,
    act_constraint=None,
) -> LossFn:
    """Cross-modal MLM objective: corrupt inside the step, forward, CE loss.

    Reference: main.py:46-66 + util/misc.py:14-56, but the 80/10/10
    corruption runs on-device under jit with threaded PRNG keys.

    act_constraint: sequence-parallel activation constraint
    (parallel/sp.sequence_constraint), threaded into encoder forwards —
    shards training activations' token axis over the model mesh axis.

    gather_loss_positions: size of the masked-position gather before the
    MLM head (TPU-BERT max_predictions_per_seq trick; see deberta_forward).
    None (default) sizes it automatically from the batch shape with a
    >5-sigma margin over the binomial masked count, so the loss is exactly
    the full-head loss (overflow probability < 1e-9 per step). 0 disables
    (full (B, L, vocab) logits, the reference's shape). Only DeBERTa's
    forward accepts the kwarg; other forwards get it only when explicit.
    """
    from frozenbilm_tpu.ops.masking import IGNORE_INDEX, mlm_corrupt

    def loss_fn(params, batch, rng):
        deterministic = rng is None
        if deterministic:
            corrupt_rng = jax.random.PRNGKey(0)
            fwd_rng = None
        else:
            corrupt_rng, fwd_rng = jax.random.split(rng)
        input_ids, labels = mlm_corrupt(
            corrupt_rng,
            batch["input_ids"],
            batch["special_tokens_mask"],
            mask_token_id=mask_token_id,
            vocab_size=vocab_size,
            pad_token_id=pad_token_id,
            mlm_probability=mlm_probability,
        )
        kw = {}
        if forward_fn.__name__ in ("deberta_forward", "bert_forward"):
            if act_constraint is not None:
                kw["act_constraint"] = act_constraint
            K = gather_loss_positions
            if K is None:
                # per-row capacity: mean + 6 sigma of Binom(T, p) + slack,
                # rounded up to 8 sublanes (see deberta_forward docstring)
                t = input_ids.shape[1]
                mean = t * mlm_probability
                K = int(mean + 6.0 * (mean * (1 - mlm_probability)) ** 0.5) + 8
                K = min((K + 7) // 8 * 8, t)
            if K and K < input_ids.shape[1]:
                kw["gather_loss_positions"] = K
        out = forward_fn(
            params, cfg, vt,
            input_ids, batch["attention_mask"],
            batch.get("video"), batch.get("video_mask"),
            labels=labels, mlm=True,
            deterministic=deterministic, rng=fwd_rng, remat=remat, **kw,
        )
        # the CE denominator (masked-token count): lets Trainer._accumulate
        # weight microbatch grads so grad_accum matches the full-batch
        # gradient exactly despite the count-normalized loss
        weight = jnp.sum(labels != IGNORE_INDEX).astype(jnp.float32)
        return out.loss, {"loss_weight": weight}

    return loss_fn
