"""Visual oracle: learned attribute/relation log-likelihood scorer.

TPU-native ClassifierOracle (reference: src/nsvqa/nn/vision/
classifier_oracle.py + the MLP zoo in gqa_interpreter_experiments.py:18-77,
145-198). The reference's ``cached=True`` mode — precompute likelihoods once
per batch, then answer per-op queries with gathers
(batch_base_interpreter.py:53-61, classifier_oracle.py:139-156) — is the
*only* mode here, because it is the TPU-shaped formulation: two large
batched matmuls per scene, then the program executor is pure gathers and
fuzzy-logic arithmetic.

Key TPU reworks vs. the reference:

  * Attribute path: one fused ``(B*O, D) @ (D, V)`` matmul produces the full
    per-object vocabulary log-likelihood matrix (V = 2,335), padded with a
    "default" column 0 holding ``default_log_likelihood`` so signed token
    code 0 gathers the reference's missing-entry value (-30,
    classifier_oracle.py:69,79).
  * Relation path: instead of materialising ``(pairs, 1036)`` concatenated
    pair features (batch_gqa_boxfeatures_pipeline.py:251-279), the first
    linear layer is algebraically split ``W = [W_subj; W_obj; W_geom]`` so
    the O^2 term is a broadcast add of two (B, O, H) matmuls plus a tiny
    geometry contraction — an O(O) matmul instead of O(O^2) for the widest
    layer. Only the relations actually referenced by the batch (a small
    per-question token table, R slots) are scored: logits are contracted
    against the R gathered embedding rows, never the full 334-relation head.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dfol_vqa_tpu import nn
from dfol_vqa_tpu.config import Config
from dfol_vqa_tpu.models.featurizer import pair_geometry

DEFAULT_LOG_LIKELIHOOD = -30.0  # reference default_log_likelihood everywhere


# --------------------------------------------- trainable interpreter (F > 1)
#
# The reference's ``oracle_output_dim > 1`` "trainable interpreter" makes the
# oracle emit an F-vector per (object, concept) cell and gives every
# BatchBayesianLogicCell a small LoglikelihoodMLP mapping that vector to the
# scalar log-likelihood the Bayesian update consumes (batch_base_ops.py:57-58,
# 190-192), replacing the fixed ``-relu(-mean(ll))``. Upstream the build path
# for it is dead — gqa_interpreter_experiments.py:209 reads
# ``neural_dict['embedding_network']`` which the ``oracle_output_dim != 1``
# branch (:184-198) never creates, so it crashes before the first forward.
# Here the idea is resurrected in the TPU-shaped formulation:
#
#   * modules are tied PER CELL ARITY — one arity-1 module for every
#     FilterBatch-style site and one arity-2 module for every
#     RelateBatch-style site — mirroring where the reference hangs the module
#     (on the BLC, which exists in exactly those two arities) and the same
#     tying choice already made for ``trainable_gate`` (ops/cells.py:40-50);
#   * because the module is elementwise over the feature axis and tied per
#     arity, it COMMUTES WITH EVERY GATHER the executor performs — so it is
#     fused into the cache build: one batched MLP over the full (U, O, V, F)
#     attribute / (B, R, O, O, F) relation feature grid on the MXU, instead
#     of per-slot scalar MLPs inside the executor. The downstream interpreter
#     consumes ordinary scalar caches and needs no changes; negation and
#     option normalisation stay downstream of the module, matching the
#     reference order (module -> negation -> update, batch_base_ops.py:
#     190-213). Train-time module dropout draws one mask per cache cell
#     (reused by each gather of that cell) rather than per call site — the
#     only semantic daylight, noted here.
#
# Feature channels: channel 0 is the existing GloVe-seeded embedding head's
# logit; channels 1..F-1 come from ``embedding_extra`` (a (E, V, F-1) head).
# All channels pass a sigmoid — the RegularMLP final the reference's F-dim
# oracle heads use (gqa_interpreter_experiments.py:32,184-189).


def _op_module_ll(
    params,
    cfg: Config,
    logits0: jnp.ndarray,
    logits_extra: jnp.ndarray,
    arity: int,
    rng=None,
    deterministic: bool = True,
) -> jnp.ndarray:
    """Per-channel concept logits (..., ) + (..., F-1) -> scalar log-likelihood.

    The cache-fused analog of BatchBayesianLogicCell._trainable_module
    (batch_base_ops.py:190-192): sigmoid feature vector -> operator MLP.

    RESIDUAL, IDENTITY AT INIT (r4): the module emits a pre-sigmoid DELTA
    on top of the channel-0 logit — ``logsigmoid(logits0 + mlp(feats))`` —
    and init_oracle_params zero-initializes the module's final layer, so an
    F>1 model reproduces the F=1 model bitwise at step 0 and the extra
    channels are strictly additive capacity. The r3 formulation
    (``logsigmoid(mlp(feats))`` with a random final layer) started every
    F>1 run from a scrambled oracle and lost −0.24 accuracy at equal steps
    (TRAINABLE_ABLATION_r03)."""
    feats = jax.nn.sigmoid(
        jnp.concatenate([logits0[..., None], logits_extra], axis=-1)
    )
    mod = params["op_modules"]["arity%d" % arity]
    if mod is None:
        raise ValueError(
            "oracle_output_dim > 1 requires operator_layers_config to be a "
            "list (e.g. []); None (identity operator module) cannot reduce "
            "the feature axis."
        )
    delta = nn.mlp_apply(
        mod, feats, final="none", dropout_rate=cfg.dropout, rng=rng,
        deterministic=deterministic,
    )[..., 0]
    return jax.nn.log_sigmoid(logits0 + delta)


def _extra_emb_select(params, tok0: jnp.ndarray):
    """Gather (B, R) 0-based token codes from the extra feature heads.

    Returns (e_sel_x (B, R, E, F-1), b_sel_x (B, R, F-1))."""
    w_f = params["embedding_extra"]["w"]  # (E, V_pad, F-1)
    b_f = params["embedding_extra"]["b"]  # (V_pad, F-1)
    e_sel_x = jnp.take(jnp.moveaxis(w_f, 1, 0), tok0, axis=0)  # (B, R, E, F-1)
    b_sel_x = jnp.take(b_f, tok0, axis=0)  # (B, R, F-1)
    return e_sel_x, b_sel_x


def init_oracle_params(key, cfg: Config, ontology) -> Dict[str, Any]:
    """Build the oracle parameter pytree (gqa_interpreter_experiments.py:107-198).

    embedding head: Linear(embedding_input_dim -> V) with weight rows seeded
    by the GloVe vectors of each vocabulary token (…:147-162)."""
    k_feat, k_attr, k_rel, k_emb = jax.random.split(key, 4)
    params: Dict[str, Any] = {}

    params["featurizer"] = nn.mlp_init(
        k_feat, cfg.box_features_dim, cfg.featurizer_layers_config, cfg.oracle_input_dim
    )
    params["attribute_network"] = nn.mlp_init(
        k_attr, cfg.attr_input_dim, cfg.attribute_network_layers_config, cfg.word_embedding_dim
    )
    params["relation_network"] = nn.mlp_init(
        k_rel, cfg.rel_input_dim, cfg.relation_network_layers_config, cfg.embedding_input_dim
    )

    concept_num = ontology.num_tokens
    pad_mult = max(1, cfg.tpu.vocab_pad_multiple)
    concept_pad = -(-concept_num // pad_mult) * pad_mult
    emb_in = cfg.embedding_input_dim
    w = jax.random.normal(k_emb, (concept_pad, emb_in), jnp.float32)
    glove = ontology.embedding_matrix()[1:, :]  # (V, word_dim)
    d = min(cfg.word_embedding_dim, glove.shape[1], emb_in)
    w = w.at[:concept_num, :d].set(jnp.asarray(glove[:, :d]))
    # padded vocab rows (codes > V) are never addressed; zero them so any
    # accidental use is conspicuous
    w = w.at[concept_num:, :].set(0.0)
    params["embedding"] = {"w": w.T, "b": jnp.zeros((concept_pad,), jnp.float32)}

    F = cfg.oracle_output_dim
    if F > 1:
        # trainable-interpreter extras (see module-level note above): F-1
        # additional per-concept logit channels + the two per-arity operator
        # modules (reference operator_layers_config, CONFIG_YAML.md:77 /
        # gqa_interpreter_experiments.py:233)
        k_x, k_o1, k_o2 = jax.random.split(jax.random.fold_in(key, 23), 3)
        scale = 1.0 / np.sqrt(emb_in)
        params["embedding_extra"] = {
            "w": scale * jax.random.normal(k_x, (emb_in, concept_pad, F - 1), jnp.float32),
            "b": jnp.zeros((concept_pad, F - 1), jnp.float32),
        }
        if cfg.operator_layers_config is None:
            raise ValueError(
                "oracle_output_dim > 1 requires operator_layers_config to be "
                "a list (e.g. [] for a single Linear(F -> 1))."
            )
        def zero_final(mod):
            # identity at init (see _op_module_ll): the module's output is a
            # residual delta; a zero final layer makes it vanish at step 0,
            # so F>1 == F=1 bitwise until training moves the extras
            last = mod["layers"][-1]
            mod["layers"][-1] = {
                "w": jnp.zeros_like(last["w"]),
                "b": jnp.zeros_like(last["b"]),
            }
            return mod

        params["op_modules"] = {
            "arity1": zero_final(nn.mlp_init(k_o1, F, cfg.operator_layers_config, 1)),
            "arity2": zero_final(nn.mlp_init(k_o2, F, cfg.operator_layers_config, 1)),
        }
    return params


# ----------------------------------------------------------------- attributes


def attr_cache(
    params,
    attr_in: jnp.ndarray,
    cfg: Config,
    rng=None,
    deterministic: bool = True,
    default_ll: float = DEFAULT_LOG_LIKELIHOOD,
) -> jnp.ndarray:
    """attr_in (B, O, D+4) -> (B, V+1, O) log-likelihoods (vocab-major).

    Row v (1-based token code) = logsigmoid(<emb_w[:, v-1], h> + b[v-1])
    (classifier_oracle.py:44-82 without the sparse scatter); row 0 holds
    ``default_ll`` so code-0 gathers return the reference default.

    VOCAB-MAJOR layout (see types.py World.attr_ll): the executor fetches
    per-token (O,) rows, so the token axis must be the gather-major axis.
    The transpose fuses into the cache-producing matmul's epilogue; the
    win is every downstream gather (scripts/o100_experiments4.py: 0.083 ms
    -> 0.002 ms per lookup at O=128, 1.05 ms -> ~0 for option fan-outs).

    With ``oracle_output_dim > 1`` the head emits F logit channels per
    concept and the arity-1 operator module reduces them (trainable
    interpreter, see module note) — the cache stays (B, V+1, O) scalars.
    """
    trainable = cfg.oracle_output_dim > 1 and "op_modules" in params
    r_trunk, r_mod = (
        jax.random.split(rng) if (rng is not None and trainable) else (rng, None)
    )
    h = nn.mlp_apply(
        params["attribute_network"],
        attr_in,
        final="sigmoid",
        dropout_rate=cfg.dropout,
        rng=r_trunk,
        deterministic=deterministic,
    )
    compute_dtype = jnp.dtype(cfg.tpu.compute_dtype)
    logits = (
        jnp.dot(
            h.astype(compute_dtype),
            params["embedding"]["w"].astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        + params["embedding"]["b"]
    )
    if trainable:
        logits_x = (
            jnp.einsum(
                "boe,evk->bovk",
                h.astype(compute_dtype),
                params["embedding_extra"]["w"].astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )
            + params["embedding_extra"]["b"]
        )
        ll = _op_module_ll(
            params, cfg, logits, logits_x, arity=1, rng=r_mod,
            deterministic=deterministic,
        )
    else:
        ll = jax.nn.log_sigmoid(logits)
    ll = jnp.moveaxis(ll, -1, 1)  # (B, V, O) vocab-major
    B, _, O = ll.shape
    pad = jnp.full((B, 1, O), default_ll, ll.dtype)
    return jnp.concatenate([pad, ll], axis=1)


# ------------------------------------------------------------------ relations


def _first_layer_split(p0, d_att: int):
    """Split the first relation-MLP linear into subject/object/geometry parts."""
    w = p0["w"]  # (2*d_att + 4, H)
    return w[:d_att], w[d_att : 2 * d_att], w[2 * d_att :], p0["b"]


def rel_cache(
    params,
    attr_in: jnp.ndarray,
    pos: jnp.ndarray,
    rel_tokens: jnp.ndarray,
    cfg: Config,
    rng=None,
    deterministic: bool = True,
    default_ll: float = DEFAULT_LOG_LIKELIHOOD,
) -> jnp.ndarray:
    """Score each (subject, object) pair against a per-question token table.

    Args:
      attr_in: (B, O, D+4) featurized objects (subject/object views share it).
      pos: (B, O, 4) normalized bbox features.
      rel_tokens: (B, R) int32 *unsigned* token codes (0 = pad slot).

    Returns (B, R, O, O) log-likelihoods (R-major: the (O, O) minor dims sit
    on full TPU tiles; R-last would pad R~8 lanes to 128); pad slots get
    ``default_ll``.

    Semantics match classifier_oracle.py:84-137 with the dense pair grid; the
    decomposed first layer is exact for the linear part (dropout, when
    active, is applied per-object on the subject/object streams and per-pair
    on deeper layers — same marginal rate, see module docstring).
    """
    rp = params["relation_network"]
    emb_w = params["embedding"]["w"]  # (E, V)
    emb_b = params["embedding"]["b"]  # (V,)
    compute_dtype = jnp.dtype(cfg.tpu.compute_dtype)

    B, O, d_att = attr_in.shape
    R = rel_tokens.shape[1]
    geom = pair_geometry(pos)  # (B, O, O, 4)

    tok0 = jnp.clip(rel_tokens - 1, 0)  # (B, R) 0-based, pads -> 0
    e_sel = jnp.take(emb_w.T, tok0, axis=0)  # (B, R, E)
    b_sel = jnp.take(emb_b, tok0, axis=0)  # (B, R)

    if rp is None:
        raise NotImplementedError(
            "relation_network_layers_config=None (identity relation network) "
            "is not supported by the fused relation path; configure at least "
            "an empty list [] as in all shipped reference configs."
        )

    layers = rp["layers"]
    n = len(layers)
    rngs = (
        jax.random.split(rng, n + 3) if (rng is not None and not deterministic) else [None] * (n + 3)
    )

    trainable = cfg.oracle_output_dim > 1 and "op_modules" in params
    if trainable:
        e_sel_x, b_sel_x = _extra_emb_select(params, tok0)

    def _contract_ll(h):
        """(B, I, O, E) sigmoid pair code -> (B, R, I, O) log-likelihoods."""
        logits = (
            jnp.einsum(
                "bije,bre->brij",
                h.astype(compute_dtype),
                e_sel.astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )
            + b_sel[:, :, None, None]
        )
        if not trainable:
            return jax.nn.log_sigmoid(logits)
        logits_x = (
            jnp.einsum(
                "bije,bref->brijf",
                h.astype(compute_dtype),
                e_sel_x.astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )
            + b_sel_x[:, :, None, None, :]
        )
        return _op_module_ll(
            params, cfg, logits, logits_x, arity=2, rng=rngs[n + 2],
            deterministic=deterministic,
        )

    w_s, w_o, w_g, b0 = _first_layer_split(layers[0], d_att)
    x = nn.dropout(attr_in, cfg.dropout, rngs[0], deterministic)
    x_obj = nn.dropout(attr_in, cfg.dropout, rngs[1], deterministic)
    x = x.astype(compute_dtype)
    x_obj = x_obj.astype(compute_dtype)

    h_s = jnp.dot(x, w_s.astype(compute_dtype), preferred_element_type=jnp.float32)
    h_o = jnp.dot(x_obj, w_o.astype(compute_dtype), preferred_element_type=jnp.float32)

    def pair_tail(h_s_blk):
        """(B, O_blk, H0) subject slice -> (B, O_blk, O, R) logits."""
        h = (
            h_s_blk[:, :, None, :]
            + h_o[:, None, :, :]
            + jnp.einsum("bijg,gh->bijh", geom, w_g, preferred_element_type=jnp.float32)
            + b0
        )
        for i, lp in enumerate(layers[1:], start=1):
            h = jax.nn.elu(h)
            h = nn.dropout(h, cfg.dropout, rngs[i + 1], deterministic)
            h = jnp.dot(
                h.astype(compute_dtype),
                lp["w"].astype(compute_dtype),
                preferred_element_type=jnp.float32,
            ) + lp["b"]
        h = jax.nn.sigmoid(h)  # RegularMLP final (gqa_interpreter_experiments.py:32)
        return _contract_ll(h)

    block = cfg.tpu.rel_block_size
    if block and block < O:
        nblk = -(-O // block)
        pad_o = nblk * block - O
        h_s_p = jnp.pad(h_s, ((0, 0), (0, pad_o), (0, 0)))
        # note: geom must be sliced per block too; fold via index map
        geom_p = jnp.pad(geom, ((0, 0), (0, pad_o), (0, 0), (0, 0)))

        def blk_fn(i):
            sl = lambda a: jax.lax.dynamic_slice_in_dim(a, i * block, block, axis=1)
            h = (
                sl(h_s_p)[:, :, None, :]
                + h_o[:, None, :, :]
                + jnp.einsum("bijg,gh->bijh", sl(geom_p), w_g, preferred_element_type=jnp.float32)
                + b0
            )
            for k, lp in enumerate(layers[1:], start=1):
                h = jax.nn.elu(h)
                h = nn.dropout(h, cfg.dropout, rngs[k + 1], deterministic)
                h = jnp.dot(
                    h.astype(compute_dtype),
                    lp["w"].astype(compute_dtype),
                    preferred_element_type=jnp.float32,
                ) + lp["b"]
            h = jax.nn.sigmoid(h)
            return _contract_ll(h)

        out = jax.lax.map(blk_fn, jnp.arange(nblk))  # (nblk, B, R, block, O)
        out = jnp.moveaxis(out, 0, 2).reshape(B, R, nblk * block, O)[:, :, :O]
        ll = out
    else:
        ll = pair_tail(h_s)

    pad_slot = (rel_tokens == 0)[:, :, None, None]
    return jnp.where(pad_slot, default_ll, ll)


def rel_cache_shared(
    params,
    attr_in_u: jnp.ndarray,
    pos_u: jnp.ndarray,
    img_index: jnp.ndarray,
    rel_tokens: jnp.ndarray,
    cfg: Config,
    rng=None,
    deterministic: bool = True,
    default_ll: float = DEFAULT_LOG_LIKELIHOOD,
    rel_gather=None,
) -> jnp.ndarray:
    """Relation cache with the pair MLP computed once per UNIQUE image.

    The heavy O^2 pair code h2 = sigmoid(MLP(pair)) depends only on the
    scene, not the question; with GQA's ~10 questions/image, computing it on
    (U, O, O, E) and doing only the per-question relation-table contraction
    on (B, ...) removes ~90%% of the pair-MLP FLOPs. Trades an (U, O, O, E)
    HBM intermediate for the reuse — preferable once B/U is large (the
    executor picks between this and the fused per-question kernel)."""
    rp = params["relation_network"]
    emb_w = params["embedding"]["w"]
    emb_b = params["embedding"]["b"]
    compute_dtype = jnp.dtype(cfg.tpu.compute_dtype)

    U, O, d_att = attr_in_u.shape
    # the Mosaic kernel contracts scalar (F=1) caches; the trainable-
    # interpreter feature path stays on the XLA tail below. Route choice
    # between the kernel pair and the XLA tail is MEASURED per dims
    # (tpu.resolve_rel_route, VERDICT r4 item 2 — the old `O >= 64` gate
    # went stale once contract-then-gather overtook the kernel at B=32).
    use_kernel = (
        cfg.tpu.use_pallas and O >= 64 and jax.default_backend() == "tpu"
        and cfg.oracle_output_dim == 1
        and cfg.tpu.resolve_rel_route(O, int(img_index.shape[0])) == "pallas"
    )
    if use_kernel:
        # Pad the OBJECT axis to the kernel's 128-lane alignment BEFORE the
        # pair MLP and emit h2 directly in the stream dtype: the O100
        # decomposition (O100_DECOMPOSE.json) showed the separate
        # f32->bf16 cast + pad pass over the (U, O, O, E) intermediate cost
        # ~0.14 ms/batch — comparable to the contract kernel itself. Padded
        # rows produce garbage h2 values; the executor masks pad objects
        # everywhere downstream, and parity slices [:O, :O].
        O_pad = -(-O // 128) * 128
        if O_pad != O:
            attr_in_u = jnp.pad(attr_in_u, ((0, 0), (0, O_pad - O), (0, 0)))
            pos_u = jnp.pad(pos_u, ((0, 0), (0, O_pad - O), (0, 0)))
    layers = rp["layers"]
    n = len(layers)
    rngs = (
        jax.random.split(rng, n + 3) if (rng is not None and not deterministic) else [None] * (n + 3)
    )
    w_s, w_o, w_g, b0 = _first_layer_split(layers[0], d_att)
    x = nn.dropout(attr_in_u, cfg.dropout, rngs[0], deterministic).astype(compute_dtype)
    x_obj = nn.dropout(attr_in_u, cfg.dropout, rngs[1], deterministic).astype(compute_dtype)
    h_s = jnp.dot(x, w_s.astype(compute_dtype), preferred_element_type=jnp.float32)
    h_o = jnp.dot(x_obj, w_o.astype(compute_dtype), preferred_element_type=jnp.float32)
    # Fused pair-MLP kernel (ops/pallas/pair_mlp.py): keeps every hidden
    # (U, O_pad, O_pad, H) activation in VMEM — on XLA each layer's
    # activation round-trips HBM on a bandwidth-bound step. Engaged on the
    # Mosaic path when no inter-layer dropout fires (input dropout above is
    # outside the trunk either way) and the compute dtype is fp32 (the
    # kernel's dots run at default MXU precision).
    fuse_mlp = (
        use_kernel
        and cfg.tpu.fused_pair_mlp
        and (deterministic or cfg.dropout == 0.0)
        and compute_dtype == jnp.float32
    )
    if fuse_mlp:
        from dfol_vqa_tpu.ops.pallas.pair_mlp import pair_mlp_fused

        h2 = pair_mlp_fused(
            pos_u, h_s, h_o, w_g, b0, layers[1:],
            out_dtype=jnp.dtype(cfg.tpu.rel_stream_dtype),
        )
    elif (
        use_kernel
        and (deterministic or cfg.dropout == 0.0)
        and compute_dtype == jnp.float32
    ):
        # Kernel route, fused_pair_mlp off: use the kernel's exact XLA
        # formulation (rank-1 f32 geometry + exp(x)-1 ELU + default-
        # precision dots) so toggling tpu.fused_pair_mlp is numerically
        # inert on chip up to MXU accumulation schedule (1 bf16 ULP on a
        # <=1e-5 element fraction; answers bitwise — verify_pair_mlp_tpu).
        # The general einsum tail below differs at full bf16 resolution
        # (its K=4 geometry einsum rounds operands on the MXU).
        from dfol_vqa_tpu.ops.pallas.pair_mlp import pair_mlp_xla

        h2 = pair_mlp_xla(
            pos_u, h_s, h_o, w_g, b0, layers[1:],
            out_dtype=jnp.dtype(cfg.tpu.rel_stream_dtype),
        )
    else:
        geom = pair_geometry(pos_u)
        h = (
            h_s[:, :, None, :]
            + h_o[:, None, :, :]
            + jnp.einsum("uijg,gh->uijh", geom, w_g, preferred_element_type=jnp.float32)
            + b0
        )
        for i, lp in enumerate(layers[1:], start=1):
            h = jax.nn.elu(h)
            h = nn.dropout(h, cfg.dropout, rngs[i + 1], deterministic)
            h = jnp.dot(
                h.astype(compute_dtype), lp["w"].astype(compute_dtype),
                preferred_element_type=jnp.float32,
            ) + lp["b"]
        h2 = None  # sigmoid applied per-branch below
    if use_kernel:
        # fused gather+contract kernel: the per-question step below
        # materialises a (B, O, O, E) gather in HBM — ~30x the bytes of the
        # (B, R, O, O) result and the round-1 O=100 throughput collapse;
        # the kernel keeps the per-image h2 row band resident in VMEM
        # instead (3.0x measured at O=100). Small O stays on XLA: the
        # kernel pads O to 128 (Mosaic lane alignment) and the XLA tail is
        # already fast there.
        from dfol_vqa_tpu.ops.pallas.shared_contract import shared_contract_pallas

        # the kernel is h2-gather bandwidth-bound (~B x O^2 x E bytes per
        # batch); h2/e_sel stream at tpu.rel_stream_dtype (default bf16 —
        # bit-identical to f32 storage at JAX's default TPU matmul
        # precision, which decomposes f32 MXU operands to bf16 anyway,
        # while halving the dominant HBM traffic). Accumulation stays fp32.
        # The cast fuses into the sigmoid epilogue: h2 is materialised ONCE,
        # already padded and in the stream dtype (see the pad above).
        stream = jnp.dtype(cfg.tpu.rel_stream_dtype)
        if h2 is None:
            h2 = jax.nn.sigmoid(h).astype(stream)
        tok0 = jnp.clip(rel_tokens - 1, 0)
        e_sel = jnp.take(emb_w.T, tok0, axis=0).astype(stream)
        b_sel = jnp.take(emb_b, tok0, axis=0)
        # emit directly in the cache storage dtype: with bf16 caches the
        # narrowing happens in the kernel epilogue instead of a separate
        # full-tensor cast pass over (B, R, O_pad, O_pad)
        return shared_contract_pallas(
            h2, img_index, e_sel, b_sel, rel_tokens, default_ll, valid_o=O,
            out_dtype=jnp.dtype(
                cfg.tpu.resolve_cache_dtype(int(img_index.shape[0]))),
        )

    h2 = jax.nn.sigmoid(h)  # (U, O, O, E) shared pair code

    tok0 = jnp.clip(rel_tokens - 1, 0)
    e_sel = jnp.take(emb_w.T, tok0, axis=0)  # (B, R, E)
    b_sel = jnp.take(emb_b, tok0, axis=0)  # (B, R)

    trainable = cfg.oracle_output_dim > 1 and "op_modules" in params
    B = img_index.shape[0]
    if (
        rel_gather is not None
        and cfg.tpu.rel_contract_then_gather
        and not trainable
        and U < B  # no image sharing -> the per-question form is cheaper
    ):
        # Contract-then-gather (see config.tpu.rel_contract_then_gather):
        # project h2 once per unique image onto the relation SUB-vocabulary
        # (columns from GQAOntology._relation_index — every token the
        # compiler routes into a rel slot is a relation arg,
        # program_compiler.py rel_slot_of), then gather each question's
        # (O, O) plane. Identical E-contraction as the per-question einsum,
        # ~(B*E)/(U*K) ~ 9x fewer HBM bytes at GQA question sharing.
        # Out-of-relation-vocabulary tokens (impossible via the compiler;
        # reachable only by hand-built batches) map to the appended zero
        # column -> logsigmoid(b_sel), and pad slots are overwritten with
        # default_ll below either way.
        cols, inv = rel_gather
        K = int(cols.shape[0])
        emb_rel = jnp.concatenate(
            [jnp.take(emb_w, jnp.asarray(cols), axis=1),
             jnp.zeros((emb_w.shape[0], 1), emb_w.dtype)], axis=1,
        )  # (E, K+1)
        # Keep the pair axes FLATTENED to one O^2 lane dimension throughout:
        # a (U, K, O, O) layout would put O~24 on the minor (lane) dim and
        # pad it 128/O-fold physically (measured SLOWER than the
        # per-question form at O=24); (U, K+1, O^2) tiles cleanly and the
        # per-question gather emits (B, R, O^2) rows.
        h2k = jnp.einsum(
            "upe,ek->ukp",
            h2.astype(compute_dtype).reshape(U, O * O, -1),
            emb_rel.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )  # (U, K+1, O^2)
        slot = jnp.take(jnp.asarray(inv), tok0)  # (B, R) in [0, K]
        flat = img_index[:, None] * (K + 1) + slot
        logits = (
            jnp.take(h2k.reshape(U * (K + 1), O * O), flat, axis=0)
            + b_sel[:, :, None]
        )
        ll = jax.nn.log_sigmoid(logits).reshape(-1, rel_tokens.shape[1], O, O)
        pad_slot = (rel_tokens == 0)[:, :, None, None]
        if cfg.tpu.debug_checks:
            # loud failure for hand-built batches: a non-pad token outside
            # the relation sub-vocabulary (slot == K, the zero column) would
            # silently diverge from the per-question formulation — poison it
            # so downstream metrics/assertions trip instead
            bad = ((slot == K) & (rel_tokens != 0))[:, :, None, None]
            ll = jnp.where(bad, jnp.nan, ll)
        return jnp.where(pad_slot, default_ll, ll)

    h2_q = jnp.take(h2, img_index, axis=0)  # (B, O, O, E) gather view
    logits = (
        jnp.einsum(
            "bije,bre->brij",
            h2_q.astype(compute_dtype),
            e_sel.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        + b_sel[:, :, None, None]
    )
    if cfg.oracle_output_dim > 1 and "op_modules" in params:
        e_sel_x, b_sel_x = _extra_emb_select(params, tok0)
        logits_x = (
            jnp.einsum(
                "bije,bref->brijf",
                h2_q.astype(compute_dtype),
                e_sel_x.astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )
            + b_sel_x[:, :, None, None, :]
        )
        ll = _op_module_ll(
            params, cfg, logits, logits_x, arity=2, rng=rngs[n + 2],
            deterministic=deterministic,
        )
    else:
        ll = jax.nn.log_sigmoid(logits)
    pad_slot = (rel_tokens == 0)[:, :, None, None]
    return jnp.where(pad_slot, default_ll, ll)


def rel_scores_for_pairs(
    params,
    attr_in: jnp.ndarray,
    pos: jnp.ndarray,
    pair_idx: jnp.ndarray,
    cfg: Config,
    rel_cols: Optional[jnp.ndarray] = None,
    rng=None,
    deterministic: bool = True,
) -> jnp.ndarray:
    """Score LISTED object pairs against relation vocabulary columns.

    Direct-supervision relation path (classifier_oracle.py:104-112 with
    meta_data['relation_pairobject_map']): instead of the O x O grid, only
    ``pair_idx (B, P, 2)`` = (subject, object) indices are featurized.

    Returns (B, P, |rel_cols|); rel_cols defaults to all relation-vocabulary
    columns (0-based token indices)."""
    rp = params["relation_network"]
    emb_w = params["embedding"]["w"]
    emb_b = params["embedding"]["b"]
    B, P, _ = pair_idx.shape

    # gather subject/object rows: (B, P, D)
    f_s = jnp.take_along_axis(attr_in, pair_idx[..., 0][..., None], axis=1)
    f_o = jnp.take_along_axis(attr_in, pair_idx[..., 1][..., None], axis=1)
    p_s = jnp.take_along_axis(pos, pair_idx[..., 0][..., None], axis=1)
    p_o = jnp.take_along_axis(pos, pair_idx[..., 1][..., None], axis=1)

    x, y, w, h = (p_s[..., 0], p_s[..., 1], p_s[..., 2], p_s[..., 3])
    x2, y2, w2, h2 = (p_o[..., 0], p_o[..., 1], p_o[..., 2], p_o[..., 3])
    dx = (x + w / 2.0) - (x2 + w2 / 2.0)
    dy = (y + h / 2.0) - (y2 + h2 / 2.0)
    dist = jnp.sqrt(dx * dx + dy * dy)
    angle = jnp.arcsin(dy / jnp.clip(dist, min=1e-10))
    h_side = jnp.sign(x2 - x)
    v_side = jnp.sign(y2 - y)
    geom = jnp.stack([dist, angle, h_side, v_side], axis=-1)

    pair_feat = jnp.concatenate([f_s, f_o, geom], axis=-1)  # (B, P, 1036)
    hmid = nn.mlp_apply(
        rp, pair_feat, final="sigmoid", dropout_rate=cfg.dropout, rng=rng,
        deterministic=deterministic,
    )
    if rel_cols is None:
        logits = jnp.dot(hmid, emb_w, preferred_element_type=jnp.float32) + emb_b
    else:
        w_sel = jnp.take(emb_w, rel_cols, axis=1)
        logits = jnp.dot(hmid, w_sel, preferred_element_type=jnp.float32) + jnp.take(
            emb_b, rel_cols, axis=0
        )
    if cfg.oracle_output_dim > 1 and "op_modules" in params:
        # trainable interpreter: listed-pair scores feed arity-2 cells too
        w_f = params["embedding_extra"]["w"]  # (E, V_pad, F-1)
        b_f = params["embedding_extra"]["b"]
        if rel_cols is not None:
            w_f = jnp.take(w_f, rel_cols, axis=1)
            b_f = jnp.take(b_f, rel_cols, axis=0)
        logits_x = (
            jnp.einsum("bpe,evk->bpvk", hmid, w_f, preferred_element_type=jnp.float32)
            + b_f
        )
        return _op_module_ll(params, cfg, logits, logits_x, arity=2, rng=None,
                             deterministic=deterministic)
    return jax.nn.log_sigmoid(logits)


# -------------------------------------------------------- full caches (scene)


def full_caches(
    params, attr_in: jnp.ndarray, pos: jnp.ndarray, cfg: Config, relation_index: np.ndarray
):
    """compute_all_log_likelihood analog (classifier_oracle.py:139-156).

    Returns (attr (B,V+1,O) vocab-major, rel (B,V_rel,O,O)) — the full
    relation head over ``relation_index`` columns (layouts per types.py)."""
    a = attr_cache(params, attr_in, cfg)
    rel_idx = jnp.asarray(relation_index)
    B = attr_in.shape[0]
    rel_tokens = jnp.broadcast_to(rel_idx[None, :] + 1, (B, rel_idx.shape[0]))
    r = rel_cache(params, attr_in, pos, rel_tokens, cfg)
    return a, r


# ---------------------------------------------------------------- test double


def static_attr_cache(
    ll_table: np.ndarray, default_ll: float = DEFAULT_LOG_LIKELIHOOD
) -> jnp.ndarray:
    """StaticOracle analog (base_oracle.py:79-93): a (B, O, V) lookup table
    becomes a (B, V+1, O) vocab-major cache with the default row prepended."""
    B, O, _ = ll_table.shape
    t = np.moveaxis(ll_table, 1, 2)  # (B, V, O)
    pad = np.full((B, 1, O), default_ll, np.float32)
    return jnp.asarray(np.concatenate([pad, t], axis=1))
