"""DeBERTa-v2 masked LM with visual prefix tokens and bottleneck adapters —
the FrozenBiLM flagship backbone, rebuilt TPU-first.

Behavioral spec (reference antoyang/FrozenBiLM, model/deberta.py):
  - video projection prepended to word embeddings        (deberta.py:989-1016)
  - attention mask extended by video_mask concat          (deberta.py:1220-1225)
  - disentangled attention with c2p/p2c log buckets       (deberta.py:655-947)
  - adapters after attention-output and FF-output dense   (deberta.py:250-259, 324-333)
  - first-layer Conv1d branch                             (deberta.py:378-419, 549-550)
  - Enhanced Mask Decoder: rerun last layer twice with
    absolute-position-augmented queries                   (deberta.py:1382-1412)
  - MLM head on word embeddings / answer-vocab scoring    (deberta.py:1473-1479, 1544-1558)
  - answer embeddings = mean of non-pad token embeddings  (deberta.py:1358-1380)

TPU-first design decisions (not translations):
  - pure functions over dict pytrees; layers are *stacked* along a leading
    axis and executed with lax.scan (fast compiles, natural pjit sharding)
  - relative-position bucket tables are numpy constants folded at trace time
  - masked softmax is a fused functional op (XSoftmax is a torch-autograd
    memory hack the XLA compiler makes redundant)
  - frozen/trainable split is a parameter partition (see train/partition),
    not requires_grad mutation
"""

from __future__ import annotations

import math
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

from frozenbilm_tpu.config import DebertaV2Config, VideoTextConfig
from frozenbilm_tpu.models.adapter import adapter_forward, init_adapter_params
from frozenbilm_tpu.models.common import (
    ACT2FN,
    RngStream,
    dropout,
    embedding_init,
    layer_norm,
    layer_norm_init,
    linear,
    linear_init,
    merge_heads,
    split_heads,
)
from frozenbilm_tpu.ops.attention import (
    fused_dattn_enabled,
    fused_disentangled_attention,
    fused_disentangled_attention_isel,
)
from frozenbilm_tpu.ops.masking import cross_entropy_ignore_index, masked_softmax
from frozenbilm_tpu.ops.rel_pos import (
    build_c2p_p2c_indices,
    onehot_gather_tables,
    skew_reorder_indices,
    skew_select,
    skew_select_rect,
    used_bucket_range,
)

# How the c2p/p2c relative-position terms select the (L, L) bias from the
# (L, band) projections (reference torch.gather, deberta.py:870-918):
#   "skew"   — reorder the rel-embedding rows per diagonal, contract, then a
#              pad+reshape+slice (Toeplitz skew). No selection FLOPs at all.
#   "onehot" — contract against a constant one-hot (L, L, band) table
#              (2*B*H*L*L*band extra FLOPs/layer, the round-1 winner vs
#              TPU gathers).
#   "gather" — take_along_axis (layout-copy heavy on TPU; kept as oracle).
# "auto" resolves per the on-chip A/B below; FROZENBILM_REL_SELECT overrides.
REL_SELECT_DEFAULT = "auto"


class DebertaOutput(NamedTuple):
    logits: jax.Array  # (B, L, vocab) in mlm mode, (B, L, n_ans) in answer mode
    loss: Optional[jax.Array]
    last_hidden_state: jax.Array  # final EMD hidden state (B, L, H)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _init_layer(key, cfg: DebertaV2Config, vt: VideoTextConfig):
    keys = iter(jax.random.split(key, 16))
    std = cfg.initializer_range
    h, inter = cfg.hidden_size, cfg.intermediate_size
    # q/k/v stored FUSED as one (h, 3h) projection: the reference keeps three
    # separate nn.Linear (deberta.py:717-730), but on the MXU three square
    # (M,h,h) matmuls run at ~45 TF/s where one fat (M,h,3h) hits ~105 TF/s
    # (docs/measurements/int8_micro_r3.json) — XLA does not horizontally fuse
    # sibling dots. Importers concatenate the reference's q/k/v columns.
    attn_self = {
        "qkv_proj": linear_init(next(keys), h, 3 * h, std),
    }
    if cfg.relative_attention and not cfg.share_att_key:
        if "c2p" in cfg.pos_att_type or "p2p" in cfg.pos_att_type:
            attn_self["pos_key_proj"] = linear_init(next(keys), h, h, std)
        if "p2c" in cfg.pos_att_type or "p2p" in cfg.pos_att_type:
            attn_self["pos_query_proj"] = linear_init(next(keys), h, h, std)
    attn_output = {
        "dense": linear_init(next(keys), h, h, std),
        "LayerNorm": layer_norm_init(h),
    }
    if vt.ds_factor_attn:
        attn_output["adapter"] = init_adapter_params(next(keys), h, vt.ds_factor_attn)
    ff_output = {
        "dense": linear_init(next(keys), inter, h, std),
        "LayerNorm": layer_norm_init(h),
    }
    if vt.ds_factor_ff:
        ff_output["adapter"] = init_adapter_params(next(keys), h, vt.ds_factor_ff)
    return {
        "attention": {"self": attn_self, "output": attn_output},
        "intermediate": {"dense": linear_init(next(keys), h, inter, std)},
        "output": ff_output,
    }


def init_deberta_params(key, cfg: DebertaV2Config, vt: VideoTextConfig):
    """Build the full parameter tree. Encoder layers are stacked on axis 0."""
    keys = iter(jax.random.split(key, 16))
    std = cfg.initializer_range
    emb_size = cfg.effective_embedding_size
    h = cfg.hidden_size

    embeddings = {
        "word_embeddings": embedding_init(
            next(keys), cfg.vocab_size, emb_size, std, pad_idx=cfg.pad_token_id
        ),
        # Created even when position_biased_input=False: the EMD decoder
        # consumes absolute position embeddings (deberta.py:966-969).
        "position_embeddings": embedding_init(
            next(keys), cfg.max_position_embeddings, emb_size, std
        ),
        "LayerNorm": layer_norm_init(h),
    }
    if cfg.type_vocab_size > 0:
        embeddings["token_type_embeddings"] = embedding_init(
            next(keys), cfg.type_vocab_size, emb_size, std
        )
    if emb_size != h:
        embeddings["embed_proj"] = linear_init(next(keys), emb_size, h, std, bias=False)
    if vt.features_dim:
        embeddings["linear_video"] = linear_init(next(keys), vt.features_dim, h, std)

    layer_keys = jax.random.split(next(keys), cfg.num_hidden_layers)
    layers = jax.vmap(lambda k: _init_layer(k, cfg, vt))(layer_keys)

    encoder = {"layers": layers}
    if cfg.relative_attention:
        span = cfg.pos_ebd_size
        encoder["rel_embeddings"] = embedding_init(next(keys), span * 2, h, std)
        if "layer_norm" in cfg.norm_rel_ebd:
            encoder["LayerNorm"] = layer_norm_init(h)
    if cfg.conv_kernel_size > 0:
        ck = next(keys)
        encoder["conv"] = {
            "conv": {
                # stored (width, in, out) for lax.conv 'WIO'
                "kernel": jax.random.normal(ck, (cfg.conv_kernel_size, h, h)) * std,
                "bias": jnp.zeros((h,)),
            },
            "LayerNorm": layer_norm_init(h),
        }

    lm_head = {
        "dense": linear_init(next(keys), h, h, std),
        "LayerNorm": layer_norm_init(h),
        "bias": jnp.zeros((cfg.vocab_size,)),
    }

    params = {"embeddings": embeddings, "encoder": encoder, "lm_head": lm_head}
    if vt.n_ans:
        params["answers"] = {
            "embeddings": embedding_init(next(keys), vt.n_ans, emb_size, std),
            # Stays zero unless checkpoint-loaded: the reference's
            # set_answer_embeddings writes a dead python attribute, so the
            # effective bias is zeros / ckpt values (deberta.py:1347, 1375).
            "bias": jnp.zeros((vt.n_ans,)),
        }
    return params


# ---------------------------------------------------------------------------
# Answer-vocabulary embedding module
# ---------------------------------------------------------------------------


def compute_answer_embeddings(word_embeddings: jax.Array, a2tok, pad_token_id: int = 0):
    """Answer embedding = mean of its non-pad token embeddings (deberta.py:1358-1373).

    a2tok: (n_ans, max_atokens) int token ids, padded with pad_token_id.
    """
    a2tok = jnp.asarray(a2tok)
    valid = (a2tok != pad_token_id).astype(jnp.float32)  # (n_ans, T)
    vecs = word_embeddings[a2tok]  # (n_ans, T, E)
    summed = jnp.sum(vecs * valid[:, :, None], axis=1)
    count = jnp.clip(jnp.sum(valid, axis=1, keepdims=True), 1, None)
    return summed / count


def set_answer_embeddings(params, a2tok, pad_token_id: int = 0):
    """Functional analogue of model.set_answer_embeddings (deberta.py:1358-1380).

    Returns a new parameter tree with the answer module resized/refreshed.
    The answer bias is reset to zeros to match the reference's effective
    behavior (its bias update is a dead attribute assignment; values stay
    at init/ckpt state — see deberta.py:1375 quirk note in SURVEY.md §7.3).
    """
    emb = compute_answer_embeddings(params["embeddings"]["word_embeddings"], a2tok, pad_token_id)
    n_ans = emb.shape[0]
    old = params.get("answers")
    if old is not None and old["bias"].shape[0] == n_ans:
        bias = old["bias"]
    else:
        bias = jnp.zeros((n_ans,), dtype=emb.dtype)
    new = dict(params)
    new["answers"] = {"embeddings": emb, "bias": bias}
    return new


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _slice_proj(p, lo: int, hi: int):
    """Column slice [lo, hi) of the fused qkv linear (bf16, W8A8, or w4 dict).

    Static slices fuse into the consuming dot; quant scales (per-out-channel
    1D or grouped (G, out)) and biases slice with their columns — the out
    dim is last in every scale layout."""
    out = {}
    if "kernel_q" in p:
        out["kernel_q"] = p["kernel_q"][..., lo:hi]
        out["scale"] = p["scale"][..., lo:hi]
    elif "kernel_q4" in p:
        out["kernel_q4"] = p["kernel_q4"][..., lo:hi]
        out["scale"] = p["scale"][..., lo:hi]
    else:
        out["kernel"] = p["kernel"][..., lo:hi]
    if "bias" in p:
        out["bias"] = p["bias"][..., lo:hi]
    return out


def _disentangled_attention(
    p_self,
    cfg: DebertaV2Config,
    hidden_kv: jax.Array,
    query_states: jax.Array,
    mask_outer: jax.Array,  # (B, Lq, Lk) 1=attend
    rel_emb: Optional[jax.Array],  # (2*span, H) already LayerNormed
    rel_idx,  # (c2p_idx, p2c_idx) numpy (L, L) int32 or None
    *,
    deterministic: bool,
    rngs: RngStream,
    mask_1d: Optional[jax.Array] = None,  # (B, L) rank-1 factor of mask_outer
):
    """Content + c2p + p2c attention (deberta.py:717-947)."""
    nh = cfg.num_attention_heads
    h = cfg.hidden_size
    if query_states is hidden_kv:
        # self-attention layers: one fat (M, h, 3h) matmul on the MXU
        qkv = checkpoint_name(linear(p_self["qkv_proj"], hidden_kv), "qkv")
        qc, kc, vc = jnp.split(qkv, 3, axis=-1)
    else:
        # EMD decoder iterations query with H_i + pos (deberta.py:1013-1042):
        # q from query_states via the q column slice, k/v fused from hidden_kv
        qc = checkpoint_name(
            linear(_slice_proj(p_self["qkv_proj"], 0, h), query_states), "qkv")
        kv = checkpoint_name(
            linear(_slice_proj(p_self["qkv_proj"], h, 3 * h), hidden_kv), "qkv")
        kc, vc = jnp.split(kv, 2, axis=-1)
    q = split_heads(qc, nh)  # (B,H,Lq,d)
    k = split_heads(kc, nh)  # (B,H,Lk,d)
    v = split_heads(vc, nh)

    scale_factor = 1 + len(cfg.pos_att_type)
    scale = math.sqrt(q.shape[-1] * scale_factor)
    # The (L, L)-shaped score pipeline runs in the ACTIVATION dtype: matmuls
    # still accumulate f32 on the MXU (preferred_element_type), but outputs
    # round to q.dtype immediately (the convert fuses into the dot epilogue).
    # In bf16 this halves HBM traffic AND peak footprint of every (B,H,L,L)
    # and (B,H,L,band) temp — at L=512 the f32 pipeline needed ~12 GB of
    # attention temps and spilled (docs/measurements/mc_profile_r4.json);
    # softmax still reduces in f32 internally (ops/masking.masked_softmax).
    # Parity tests run f32 activations, where all of this is a no-op.
    adt = q.dtype
    # Fused-kernel path (ops/attention.fused_disentangled_attention): at
    # L >= 256 on TPU the whole (L, L) score tile of one (b, h) fits VMEM, so
    # QK^T + both bias adds + the p2c transpose + masked softmax + AV run in
    # one Pallas kernel — no (B, H, L, L) scores/probs/transposed-bias tensor
    # ever reaches HBM (~6 GB/layer of streamed traffic at the MC shape,
    # docs/measurements/mc_hlo_attrib_r4.json). Selection stays outside
    # (in-kernel Toeplitz selection is Mosaic-hostile, CLAUDE.md). Forward
    # only: training keeps the XLA path with masked_softmax's custom VJP.
    use_fused = (
        mask_1d is not None
        and deterministic
        and cfg.relative_attention
        and rel_emb is not None
        and "c2p" in cfg.pos_att_type
        and "p2c" in cfg.pos_att_type
        and q.shape[2] == k.shape[2]
        and fused_dattn_enabled(q.shape[2])
    )
    if use_fused:
        scores = None
    else:
        scores = (
            jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32)
            / scale
        ).astype(adt)

    c2p = None
    p2c_raw = None
    p2c_is_ji = False
    if cfg.relative_attention and rel_emb is not None:
        rel_emb = dropout(
            rngs.next(), rel_emb, cfg.hidden_dropout_prob, deterministic
        )  # pos_dropout (deberta.py:779) — applied ONCE, before any reorder
        mode = rel_idx["mode"]
        # only the used bucket band of the table is projected (ops/rel_pos.py:
        # used_bucket_range) — selection below never indexes outside it.
        # skew mode projects diagonal-reordered copies instead, making the
        # (L, L) selection a pure pad+reshape+slice.
        if mode == "skew":
            rel_for_key = rel_emb[jnp.asarray(rel_idx["g_c2p"])]
            rel_for_query = rel_emb[jnp.asarray(rel_idx["g_p2c"])]
        else:
            rel_for_key = rel_for_query = rel_emb
        if cfg.share_att_key:
            pos_key = split_heads(
                linear(_slice_proj(p_self["qkv_proj"], h, 2 * h), rel_for_key[None]),
                nh)[0]
            pos_query = split_heads(
                linear(_slice_proj(p_self["qkv_proj"], 0, h), rel_for_query[None]),
                nh)[0]
        else:
            pos_key = (
                split_heads(linear(p_self["pos_key_proj"], rel_for_key[None]), nh)[0]
                if "pos_key_proj" in p_self
                else None
            )
            pos_query = (
                split_heads(linear(p_self["pos_query_proj"], rel_for_query[None]), nh)[0]
                if "pos_query_proj" in p_self
                else None
            )
        if pos_key is not None:
            pos_key = checkpoint_name(pos_key, "pos_proj")
        if pos_query is not None:
            pos_query = checkpoint_name(pos_query, "pos_proj")
        if (use_fused and rel_idx.get("isel")
                and pos_key is not None and pos_query is not None):
            # In-kernel Toeplitz selection (ops/attention
            # .fused_disentangled_attention_isel): the kernel consumes the
            # diagonal-reordered per-head projections whole and builds each
            # (BI, L) bias tile with a strided lane-rotation — neither the
            # (B, H, L, L) biases nor any skew relayout copy ever reaches
            # HBM (the measured top cost of the MC L=512 shape,
            # docs/MC_ROOFLINE.md).
            ctx = fused_disentangled_attention_isel(
                q, k, v, pos_key, pos_query, mask_1d, scale)
            return merge_heads(ctx)
        onehot = rel_idx["onehot"]
        chunk = rel_idx.get("chunk") if mode == "skew" else None

        def _skew_chunked(x, pos, C):
            # Toeplitz selection, C query rows at a time: chunk [i0, i0+Cc)
            # only needs reordered-table rows [L-Cc-i0, 2L-1-i0) (static
            # slices — offsets are trace-time ints), bounding the temp to
            # (B, H, C, L+Cc-1) and cutting FLOPs+copies ~(L+C)/2L vs the
            # full skew. See ops/rel_pos.skew_select_rect.
            L = x.shape[2]
            parts = []
            for i0 in range(0, L, C):
                Cc = min(C, L - i0)
                w = pos[:, L - Cc - i0 : 2 * L - 1 - i0, :]  # (H, L+Cc-1, d)
                a = jnp.einsum(
                    "bhid,hkd->bhik", x[:, :, i0 : i0 + Cc], w,
                    preferred_element_type=jnp.float32,
                ).astype(adt)
                parts.append(skew_select_rect(a, L))
            return jnp.concatenate(parts, axis=2) if len(parts) > 1 else parts[0]

        if "c2p" in cfg.pos_att_type:
            if chunk:
                c2p = _skew_chunked(q, pos_key, chunk)
            else:
                # (B,H,Lq,band|2L-1) then Toeplitz selection on the bucket axis
                c2p_full = jnp.einsum(
                    "bhid,hkd->bhik", q, pos_key, preferred_element_type=jnp.float32
                ).astype(adt)
                if mode == "skew":
                    c2p = skew_select(c2p_full)
                elif onehot is not None:
                    # one-hot contraction instead of gather: TPU gathers force
                    # layout-transpose copies of the whole (B,H,L,band) operand
                    c2p = jnp.einsum(
                        "bhik,ijk->bhij", c2p_full,
                        jnp.asarray(onehot[0], c2p_full.dtype),
                        preferred_element_type=jnp.float32,
                    ).astype(adt)
                else:
                    c2p = jnp.take_along_axis(
                        c2p_full, jnp.asarray(rel_idx["c2p"])[None, None], axis=-1
                    )
            if not use_fused:
                scores = scores + c2p / scale
        if "p2c" in cfg.pos_att_type:
            if chunk:
                # same chunking over the KEY axis j; skew yields S[j, i]
                p2c_raw = _skew_chunked(k, pos_query, chunk)
                p2c_is_ji = True
            else:
                p2c_full = jnp.einsum(
                    "bhjd,hkd->bhjk", k, pos_query, preferred_element_type=jnp.float32
                ).astype(adt)
                if mode == "skew":
                    # skew yields S[j, i]; the bias wants [i, j]
                    p2c_raw = skew_select(p2c_full)
                    p2c_is_ji = True
                elif onehot is not None:
                    # p2c table is indexed [j, i, k'] so it lands as [i, j]
                    p2c_raw = jnp.einsum(
                        "bhjk,jik->bhij", p2c_full,
                        jnp.asarray(onehot[1], p2c_full.dtype),
                        preferred_element_type=jnp.float32,
                    ).astype(adt)
                else:
                    p2c_raw = jnp.take_along_axis(
                        p2c_full, jnp.asarray(rel_idx["p2c"])[None, None], axis=-1
                    )
                    p2c_is_ji = True
            if not use_fused:
                p2c_t = (
                    jnp.swapaxes(p2c_raw, -1, -2) if p2c_is_ji else p2c_raw
                )
                scores = scores + p2c_t / scale

    if use_fused:
        ctx = fused_disentangled_attention(
            q, k, v, c2p, p2c_raw, mask_1d, scale, p2c_is_ji=p2c_is_ji,
        )
        return merge_heads(ctx)

    probs = checkpoint_name(
        masked_softmax(scores, mask_outer[:, None, :, :]), "attn_probs")
    probs = dropout(rngs.next(), probs, cfg.attention_probs_dropout_prob, deterministic)
    ctx = jnp.einsum(
        "bhij,bhjd->bhid", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(v.dtype)
    return merge_heads(ctx)


def _self_output(p_out, cfg, vt, hidden, input_tensor, *, deterministic, rngs, ds_factor):
    """dense -> adapter -> dropout -> LayerNorm(x + input) (deberta.py:254-260)."""
    hidden = checkpoint_name(linear(p_out["dense"], hidden), "out_dense")
    if ds_factor and "adapter" in p_out:
        hidden = adapter_forward(
            p_out["adapter"],
            hidden,
            dropout_rate=vt.adapter_dropout,
            deterministic=deterministic,
            rng=rngs.next(),
        )
    hidden = dropout(rngs.next(), hidden, cfg.hidden_dropout_prob, deterministic)
    return layer_norm(p_out["LayerNorm"], hidden + input_tensor, cfg.layer_norm_eps)


def _layer_forward(
    lp,
    cfg: DebertaV2Config,
    vt: VideoTextConfig,
    hidden_kv: jax.Array,
    mask_outer: jax.Array,
    rel_emb,
    rel_idx,
    *,
    query_states: Optional[jax.Array] = None,
    deterministic: bool,
    rngs: RngStream,
    mask_1d: Optional[jax.Array] = None,
):
    """One transformer block (deberta.py:338-375)."""
    q_in = hidden_kv if query_states is None else query_states
    attn_ctx = _disentangled_attention(
        lp["attention"]["self"], cfg, hidden_kv, q_in, mask_outer, rel_emb, rel_idx,
        deterministic=deterministic, rngs=rngs, mask_1d=mask_1d,
    )
    attention_output = _self_output(
        lp["attention"]["output"], cfg, vt, attn_ctx, q_in,
        deterministic=deterministic, rngs=rngs, ds_factor=vt.ds_factor_attn,
    )
    inter = ACT2FN[cfg.hidden_act](
        checkpoint_name(linear(lp["intermediate"]["dense"], attention_output),
                        "ffn_pre"))
    return _self_output(
        lp["output"], cfg, vt, inter, attention_output,
        deterministic=deterministic, rngs=rngs, ds_factor=vt.ds_factor_ff,
    )


def _conv_layer(p_conv, cfg, input_embeddings, residual_states, input_mask, *, deterministic, rngs):
    """First-layer convolution branch (deberta.py:395-419)."""
    out = jax.lax.conv_general_dilated(
        input_embeddings,
        p_conv["conv"]["kernel"].astype(input_embeddings.dtype),
        window_strides=(1,),
        padding=[((cfg.conv_kernel_size - 1) // 2,) * 2],
        dimension_numbers=("NWC", "WIO", "NWC"),
    ) + p_conv["conv"]["bias"]
    out = out * input_mask[:, :, None].astype(out.dtype)
    out = ACT2FN[cfg.conv_act](dropout(rngs.next(), out, cfg.hidden_dropout_prob, deterministic))
    output = layer_norm(p_conv["LayerNorm"], residual_states + out, cfg.layer_norm_eps)
    return output * input_mask[:, :, None].astype(output.dtype)


def _get_rel_embedding(enc_params, cfg):
    if not cfg.relative_attention:
        return None
    rel = enc_params["rel_embeddings"]
    if "layer_norm" in cfg.norm_rel_ebd:
        rel = layer_norm(enc_params["LayerNorm"], rel, cfg.layer_norm_eps)
    return rel


# Selective activation checkpointing (remat="names"): the fwd scan of the
# 0.9B train step saves 7.4 GB of stacked residuals (9x f32 hidden-size
# stacks from LayerNorm internals, 3x bf16 (B, L, 6144) FFN stacks,
# duplicated pre/post-dropout attention probs, pred dropout-mask stacks —
# scripts/train_residuals.py, round-5 attribution /tmp/train_hlo_attrib.json).
# Saving ONLY the named tensors below (~1.9 GB) and recomputing the cheap
# elementwise rest (LayerNorm, gelu, softmax-from-saved-probs epilogues,
# dropout masks from their replayed PRNG, Toeplitz selection) cuts the
# residual HBM traffic ~4x with zero extra big-matmul FLOPs: every frozen
# dense needs no weight grad (dL/dW exists only for adapters/linear_video/
# LNs), so its backward needs only the kernel, and every recompute input
# below is itself saved.
REMAT_SAVE_NAMES = (
    "qkv",         # fused qkv projection (B, L, 3h) — q/k/v without recompute
    "pos_proj",    # rel-pos key/query projections (H, band, d)
    "attn_probs",  # PRE-dropout softmax output — its custom-VJP residual
    "out_dense",   # attention-output and FFN-output dense results (B, L, h)
    "adapter_mid", # bottleneck down-proj (B, L, h/8) — up-proj weight grads
    "adapter_up",  # bottleneck up-proj (B, L, h) — downstream recompute root
    "ffn_pre",     # pre-gelu intermediate (B, L, 4h)
)


def _remat_policy(remat):
    """jax.checkpoint policy for remat=True (save every dot) or "names"."""
    if remat == "names":
        return jax.checkpoint_policies.save_only_these_names(*REMAT_SAVE_NAMES)
    # legacy full remat: matmul outputs with no batch dims stay saved
    return jax.checkpoint_policies.dots_with_no_batch_dims_saveable


def _encoder_forward(
    enc_params, cfg, vt, hidden, attention_mask, *, deterministic, rng,
    remat=False, act_constraint=None,
):
    """Run all layers; returns (final_hidden, input_to_last_layer).

    Layer 0 (and its conv branch) runs unrolled; layers 1..N-1 run under
    lax.scan over stacked params for fast compiles.

    act_constraint: optional callable applied to every layer's (B, L, H)
    output (and the encoder input) — the sequence-parallel hook:
    parallel/sp.py passes a with_sharding_constraint pinning activations
    to P(data, model) so layernorm/FFN/head memory and FLOPs shard over
    the sequence axis while XLA all-gathers K/V only inside attention.
    """
    input_mask = attention_mask
    mask_outer = (attention_mask[:, :, None] * attention_mask[:, None, :]).astype(jnp.int32)
    rel_emb = _get_rel_embedding(enc_params, cfg)
    L = hidden.shape[1]
    c2p_idx, p2c_idx = build_c2p_p2c_indices(
        L, cfg.pos_ebd_size, cfg.position_buckets, cfg.effective_max_relative_positions
    )
    lo, hi = used_bucket_range(
        L, cfg.pos_ebd_size, cfg.position_buckets, cfg.effective_max_relative_positions
    )
    if rel_emb is not None:
        rel_emb = rel_emb[lo:hi]  # only the touched bucket band (HBM saver)
    band = hi - lo
    mode = os.environ.get("FROZENBILM_REL_SELECT", "") or REL_SELECT_DEFAULT
    if mode == "auto":
        # data-driven from the on-chip A/B (scripts/rel_select_ab.py, v5e,
        # xlarge, round 3): L=74 onehot 851 qa/s > gather 606 > skew 494;
        # L=128 gather 269 > skew 202 (onehot table gate tripped); L=266
        # skew 48.2 > gather 21.9 (2.2x). Onehot while its (L, L, band)
        # constant fits; gather until skew's reordered-projection overhead
        # amortizes (~L=192); skew beyond (query/key-chunked at L >= 256 —
        # see the chunk selection below).
        if L * L * band <= 4_000_000:
            mode = "onehot"
        elif L < 192:
            mode = "gather"
        else:
            mode = "skew"
    if mode not in ("onehot", "skew", "gather"):
        raise ValueError(f"unknown FROZENBILM_REL_SELECT mode {mode!r}; "
                         "choose auto/onehot/skew/gather")
    onehot = None
    if mode == "onehot":
        if L * L * band <= 4_000_000:
            onehot = onehot_gather_tables(
                L, cfg.pos_ebd_size, cfg.position_buckets,
                cfg.effective_max_relative_positions,
            )
        else:  # footprint gate tripped: fall back to the gather oracle
            mode = "gather"
    g_c2p = g_p2c = None
    chunk = None
    if mode == "skew":
        g_c2p, g_p2c = skew_reorder_indices(
            L, cfg.pos_ebd_size, cfg.position_buckets,
            cfg.effective_max_relative_positions,
        )
        g_c2p, g_p2c = g_c2p - lo, g_p2c - lo
        # Query/key-chunked skew: bounds the selection temp to
        # (B, H, C, L+C-1) and cuts its FLOPs+copies ~(L+C)/2L (the full
        # skew's (B, H, L, 2L-1) temp is what cratered the L=512 MC shape
        # to 14 TF/s and OOM'd remat — docs/measurements/mc_profile_r4.json).
        # Chunk size from on-chip sweeps; MUST stay a multiple of 8 — the
        # skew relayout copies are sublane-aligned only then (C12/C20/C28
        # all crater to ~38 rows/s at L=512 while C8/C16/C24 run 53-56,
        # fused_chunk_resweep_r4.json). With the fused dattn kernel the
        # selection is the dominant remaining cost and the smallest aligned
        # window wins: C8 56.3 rows/s > C16 54.3 > C24 53.2 at L=512 (and
        # C8 137 rows/s at L=256). On the XLA score pipeline (training /
        # non-fused) C=24 stays optimal (mc_chunk_ab_r4.json: C24 41.0 >
        # C16 40.0 > C32 38.5 > C128 32.8 > full 16.9). FROZENBILM_SKEW_CHUNK
        # =0 forces the unchunked skew; any other int forces that chunk.
        env_chunk = os.environ.get("FROZENBILM_SKEW_CHUNK", "")
        if env_chunk:
            chunk = int(env_chunk) or None
        elif L >= 256:
            chunk = 8 if (deterministic and fused_dattn_enabled(L)) else 24
    # in-kernel selection: strictly dominates chunked-skew + bias-consuming
    # kernel when the whole geometry tiles cleanly (L % 128; the strided
    # lane-rotation needs lane-aligned windows). Eval-only like the other
    # fused path. FROZENBILM_FUSED_ISEL=0 falls back to chunked skew.
    isel = (
        mode == "skew"
        and deterministic
        and L % 128 == 0
        and fused_dattn_enabled(L)
        and "c2p" in cfg.pos_att_type
        and "p2c" in cfg.pos_att_type
        and os.environ.get("FROZENBILM_FUSED_ISEL", "") != "0"
    )
    rel_idx = {
        "mode": mode,
        "c2p": c2p_idx - lo,
        "p2c": p2c_idx - lo,
        "onehot": onehot,
        "g_c2p": g_c2p,
        "g_p2c": g_p2c,
        "chunk": None if isel else chunk,
        "isel": isel,
    }

    layers = enc_params["layers"]
    n_layers = cfg.num_hidden_layers
    has_conv = cfg.conv_kernel_size > 0 and "conv" in enc_params
    rngs0 = RngStream(rng)
    conv_key = rngs0.next() if has_conv else None

    # scan over ALL layers: slicing off layer 0 for the conv branch would
    # physically copy 23/24 of the stacked weights every call (multi-ms HLO
    # slices on the real chip), and lax.cond inside the scan compiles
    # pathologically. The conv branch is cheap (~27us), so it runs
    # unconditionally and a where() keeps it only at layer 0.
    def step(carry, xs):
        lp, idx = xs
        h, _prev, key = carry
        if key is not None:
            key, sub = jax.random.split(key)
        else:
            sub = None
        out = _layer_forward(
            lp, cfg, vt, h, mask_outer, rel_emb, rel_idx,
            deterministic=deterministic, rngs=RngStream(sub),
            mask_1d=input_mask,
        )
        if has_conv:
            conv_out = _conv_layer(
                enc_params["conv"], cfg, hidden, out, input_mask,
                deterministic=deterministic, rngs=RngStream(conv_key),
            )
            out = jnp.where(idx == 0, conv_out, out)
        if act_constraint is not None:
            out = act_constraint(out)
        # thread the PREVIOUS hidden through the carry instead of stacking
        # every layer input as ys: only layer_inputs[-1] (the input to the
        # last layer, consumed by the EMD rerun) was ever read, and the ys
        # stack cost a (n_layers, B, L, H) write each step plus — in
        # training — a full stacked cotangent with a dynamic-update-slice
        # at index -1 on the backward pass (round-5 train attribution:
        # the top single fusion read f32 slices of exactly this stack).
        return (out, h, key), None

    if remat:
        step = jax.checkpoint(step, policy=_remat_policy(remat))
    scan_key = rngs0.next()
    if act_constraint is not None:
        hidden = act_constraint(hidden)
    (final, hidden_minus2, _), _ = jax.lax.scan(
        step, (hidden, hidden, scan_key), (layers, jnp.arange(n_layers)))
    # hidden_minus2 == input to the last layer (encoder_layers[-2]); for a
    # single-layer encoder the init value `hidden` passes through unchanged
    return final, hidden_minus2, mask_outer, rel_emb, rel_idx


def _emd_context_layer(
    enc_params, cfg, vt, hidden_minus2, pos_embeddings, mask_outer, rel_emb, rel_idx,
    *, deterministic, rng, act_constraint=None, mask_1d=None,
):
    """Enhanced Mask Decoder: rerun the last layer twice, queries carry
    absolute position information (deberta.py:1382-1412)."""
    last_layer = jax.tree.map(lambda x: x[-1], enc_params["layers"])
    query_states = pos_embeddings[None].astype(hidden_minus2.dtype) + hidden_minus2
    rngs = RngStream(rng)
    for _ in range(2):
        if act_constraint is not None:
            query_states = act_constraint(query_states)
        query_states = _layer_forward(
            last_layer, cfg, vt, hidden_minus2, mask_outer, rel_emb, rel_idx,
            query_states=query_states, deterministic=deterministic, rngs=rngs,
            mask_1d=mask_1d,
        )
    return query_states


def _lm_head(p_head, cfg, hidden, embedding_weight, bias):
    """dense -> act -> LayerNorm -> embedding matmul + bias (deberta.py:1544-1558)."""
    h = linear(p_head["dense"], hidden)
    h = ACT2FN[cfg.hidden_act](h)
    h = layer_norm(p_head["LayerNorm"], h, cfg.layer_norm_eps)
    logits = jnp.dot(
        h, embedding_weight.T.astype(h.dtype), preferred_element_type=jnp.float32
    )
    return logits + bias.astype(logits.dtype)


def deberta_answer_logits(params, cfg: DebertaV2Config, hidden: jax.Array) -> jax.Array:
    """Downstream answer-vocab head on arbitrary hidden states (.., H).

    Lets eval steps gather the [MASK]-position hidden BEFORE the head, so
    the (B, L, n_ans) full-position logits (and the per-position head
    transform) never get computed — XLA dead-code-eliminates them from
    forward() when only last_hidden_state is consumed.
    """
    answers = params["answers"]
    return _lm_head(params["lm_head"], cfg, hidden, answers["embeddings"], answers["bias"])


def deberta_forward(
    params,
    cfg: DebertaV2Config,
    vt: VideoTextConfig,
    input_ids: jax.Array,  # (B, T)
    attention_mask: Optional[jax.Array] = None,  # (B, T) 1=real token
    video: Optional[jax.Array] = None,  # (B, F, features_dim)
    video_mask: Optional[jax.Array] = None,  # (B, F)
    labels: Optional[jax.Array] = None,  # (B, T), -100 = ignore
    *,
    mlm: bool = False,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    remat: bool = False,
    gather_loss_positions: int = 0,
    act_constraint=None,
) -> DebertaOutput:
    """Full forward pass (deberta.py:1414-1501).

    In answer mode (params has 'answers' and mlm=False) logits are scored
    against the answer-vocabulary embedding module; otherwise against the
    word-embedding table (full-vocab MLM).

    act_constraint: optional callable applied to (B, L, H) activations at
    every layer boundary — sequence parallelism when it pins the L axis to
    a mesh axis (parallel/sp.py). Pure identity semantics: outputs are
    bitwise what the unconstrained forward computes.
    """
    B, T = input_ids.shape
    if attention_mask is None:
        attention_mask = jnp.ones((B, T), dtype=jnp.int32)

    emb_p = params["embeddings"]
    use_video = vt.features_dim and video is not None
    if use_video:
        if video_mask is None:
            video_mask = jnp.ones(video.shape[:2], dtype=jnp.int32)
        attention_mask = jnp.concatenate(
            [video_mask.astype(attention_mask.dtype), attention_mask], axis=1
        )

    rngs = RngStream(rng)

    # --- embeddings (deberta.py:997-1058) ---
    words = emb_p["word_embeddings"][input_ids]
    if use_video:
        video_emb = linear(emb_p["linear_video"], video.astype(words.dtype))
        x = jnp.concatenate([video_emb, words], axis=1)
    else:
        x = words
    L = x.shape[1]
    pos_embeddings = emb_p["position_embeddings"][:L]
    if cfg.position_biased_input:
        x = x + pos_embeddings[None]
    if cfg.type_vocab_size > 0:
        x = x + emb_p["token_type_embeddings"][0][None, None, :]
    if cfg.effective_embedding_size != cfg.hidden_size:
        x = linear(emb_p["embed_proj"], x)
    x = layer_norm(emb_p["LayerNorm"], x, cfg.layer_norm_eps)
    x = x * attention_mask[:, :, None].astype(x.dtype)
    x = dropout(rngs.next(), x, cfg.hidden_dropout_prob, deterministic)

    # --- encoder ---
    final, hidden_minus2, mask_outer, rel_emb, rel_idx = _encoder_forward(
        params["encoder"], cfg, vt, x, attention_mask,
        deterministic=deterministic, rng=rngs.next(), remat=remat,
        act_constraint=act_constraint,
    )

    # --- Enhanced Mask Decoder (only when no absolute positions in input) ---
    if not cfg.position_biased_input:
        decoded = _emd_context_layer(
            params["encoder"], cfg, vt, hidden_minus2, pos_embeddings, mask_outer,
            rel_emb, rel_idx, deterministic=deterministic, rng=rngs.next(),
            act_constraint=act_constraint, mask_1d=attention_mask,
        )
    else:
        decoded = final

    # --- head ---
    if labels is not None and use_video:
        video_labels = jnp.full(video.shape[:2], -100, dtype=labels.dtype)
        labels = jnp.concatenate([video_labels, labels], axis=1)

    answers = params.get("answers")
    if answers is not None and not mlm:
        logits = _lm_head(params["lm_head"], cfg, decoded, answers["embeddings"], answers["bias"])
    elif labels is not None and gather_loss_positions:
        # TPU-BERT style masked-position gather (the original BERT TPU code's
        # max_predictions_per_seq trick): only ~mlm_prob of positions carry a
        # label, so computing the (B, L, vocab) full-vocab logits — 1.2 GB of
        # f32 at the 0.9B train shape, plus its log-softmax temps and their
        # backward traffic — wastes most of the head FLOPs and the step's
        # HBM writes. Gather K labeled positions PER ROW (top_k along the
        # length axis, which stays unsharded under DP — a batch-flat gather
        # would drag the sharded batch axis into a cross-device top_k), run
        # the head on (B, K, H), and take the CE there. EXACTLY the full
        # path's loss (same positions, same mean-over-labeled normalization)
        # whenever every row has <= K labels; overflow drops that row's
        # latest positions (callers size K with a >5-sigma margin).
        K = min(int(gather_loss_positions), L)
        prio = (labels != -100).astype(jnp.int32) * L - jnp.arange(L)[None, :]
        _, idx = jax.lax.top_k(prio, K)  # (B, K) labeled slots, ascending
        h_sel = jnp.take_along_axis(decoded, idx[..., None], axis=1)
        labels_sel = jnp.take_along_axis(labels, idx, axis=1)
        logits_sel = _lm_head(
            params["lm_head"], cfg, h_sel,
            emb_p["word_embeddings"], params["lm_head"]["bias"],
        )
        loss = cross_entropy_ignore_index(logits_sel, labels_sel)
        return DebertaOutput(logits=logits_sel, loss=loss,
                             last_hidden_state=decoded)
    else:
        logits = _lm_head(
            params["lm_head"], cfg, decoded,
            emb_p["word_embeddings"], params["lm_head"]["bias"],
        )

    loss = None
    if labels is not None:
        loss = cross_entropy_ignore_index(logits, labels)

    return DebertaOutput(logits=logits, loss=loss, last_hidden_state=decoded)
