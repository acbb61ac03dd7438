"""Differentiable FOL update kernels (dense-masked Bayesian logic cell).

TPU-native reformulation of BatchBayesianLogicCell
(reference: src/nsvqa/nn/interpreter/batch_base_ops.py:42-237). The sparse
``(B, O_total)`` map matmuls and per-arity transpose gymnastics of
``_forward_core`` collapse, in per-question dense-padded layout, to masked
reductions over the partner-object axis:

arity 1 (FilterBatch core, batch_base_ops.py:301-405):
    att' = att + ll                                    # product of evidences

arity 2 (RelateBatch core, …:471-596, _forward_core …:62-151):
    subj'[b,i] = subj[b,i] + lpn( sum_{j!=i, valid j} lpn(ll[b,i,j] + obj[b,j],
                                                          q_obj[b]), q_obj[b] )
    obj' [b,j] = obj[b,j]  + lpn( sum_{i!=j, valid i} lpn(ll[b,i,j] + subj[b,i],
                                                          q_subj[b]), q_subj[b] )

where lpn is log_parametric_not with beta=1, the diagonal exclusion matches
the reference's self-relation discount (…:112: "log_posterior[:, d, d] = 0"),
and validity masking replaces the sparse batch_object_map marginalisation
(…:124-127). Quantifier EXISTS (alpha=1) makes lpn a soft-NOT so the inner
reduction is a fuzzy OR over partner objects; FOR_ALL (alpha=0) makes it a
pass-through (fuzzy AND).

All kernels broadcast over an optional leading option axis K: shapes
``(B, O)``/``(B, K, O)`` for attentions and ``(B, O, O)``/``(B, K, O, O)``
for relation likelihoods.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from dfol_vqa_tpu import logic


def neural_logic_gate(gate_params, log_p: jnp.ndarray, log_q: jnp.ndarray) -> jnp.ndarray:
    """Trainable soft logic gate (NeuralLogicGate, batch_base_ops.py:19-38).

    A 6-parameter composition of log_parametric_not transforms with
    data-dependent alphas/betas from a Linear(2, 6) + sigmoid:
        res = lpn( lpn(p, a0, a3) + lpn(q, a1, a4), a2, a5 ).
    Enabled by the ``trainable_gate`` config (off in all shipped reference
    configs; CONFIG_YAML.md marks it N/A). Unlike the reference — which
    instantiates a separate gate per op module — gates here are shared per
    combine-site kind (filter / relate-partner / relate-self), which is the
    parameter-tying one actually wants when the flag is on.
    """
    lp = jnp.broadcast_to(log_p, jnp.broadcast_shapes(log_p.shape, log_q.shape))
    lq = jnp.broadcast_to(log_q, lp.shape)
    x = jnp.stack([lp, lq], axis=-1)
    alpha = jax.nn.sigmoid(
        jnp.einsum("...i,ij->...j", x, gate_params["w"]) + gate_params["b"]
    )
    nlp = logic.log_parametric_not(lp, alpha[..., 0], alpha[..., 3])
    nlq = logic.log_parametric_not(lq, alpha[..., 1], alpha[..., 4])
    return logic.log_parametric_not(nlp + nlq, alpha[..., 2], alpha[..., 5])


def apply_negation(ll: jnp.ndarray, negated: jnp.ndarray) -> jnp.ndarray:
    """Negate a log-likelihood where `negated` is 1 (batch_base_ops.py:212-213).

    lpn(ll, negated, 1): negated=0 -> exp/log roundtrip identity, negated=1
    -> log(1 - exp(ll))."""
    return logic.log_parametric_not(ll, negated, 1.0)


def filter_update(log_attention: jnp.ndarray, ll: jnp.ndarray, gate=None) -> jnp.ndarray:
    """Arity-1 Bayesian update: posterior = prior + likelihood.

    The reference arity-1 `_forward_core` reduces to exactly this addition
    (loop body at batch_base_ops.py:90-149 with arity=1 skips the partner
    marginalisation). With ``trainable_gate``, the addition is replaced by
    the neural logic gate (batch_base_ops.py:135-138)."""
    if gate is not None:
        return neural_logic_gate(gate, ll, log_attention)
    return log_attention + ll


def relate_update(
    subj_att: jnp.ndarray,
    obj_att: jnp.ndarray,
    ll: jnp.ndarray,
    q_subj: jnp.ndarray,
    q_obj: jnp.ndarray,
    obj_mask: jnp.ndarray,
    gates=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Arity-2 Bayesian update over a dense (.., O, O) relation likelihood.

    Args:
      subj_att, obj_att: (B, O) or (B, K, O) log attentions.
      ll: (B, O, O) or (B, K, O, O); ll[..., i, j] scores (subject i, object j).
      q_subj, q_obj: quantifiers, shape broadcastable to attentions minus O.
      obj_mask: (B, O) object validity.

    Returns (subj', obj') with the same shapes as the inputs.
    """
    O = subj_att.shape[-1]
    eye = jnp.eye(O, dtype=subj_att.dtype)

    if subj_att.ndim == 3:  # (B, K, O)
        mask_j = obj_mask[:, None, None, :]  # over partner j
        mask_i = obj_mask[:, None, :, None]  # over partner i
        not_diag = (1.0 - eye)[None, None, :, :]
    else:
        mask_j = obj_mask[:, None, :]
        mask_i = obj_mask[:, :, None]
        not_diag = (1.0 - eye)[None, :, :]

    qo = q_obj[..., None, None]  # broadcast over (i, j)
    qs = q_subj[..., None, None]
    g_subj = gates[0] if gates is not None else None  # dim-0 (subject) gate
    g_obj = gates[1] if gates is not None else None  # dim-1 (object) gate

    def combine(acc, prior, gate):
        if gate is not None:
            return neural_logic_gate(gate, acc, prior)
        return acc + prior

    # Subject update: marginalise the object partner (j axis, last).
    term = logic.log_parametric_not(combine(ll, obj_att[..., None, :], g_obj), qo, 1.0)
    term = term * not_diag * mask_j
    subj_new = combine(
        logic.log_parametric_not(jnp.sum(term, axis=-1), q_obj[..., None], 1.0),
        subj_att,
        g_subj,
    )

    # Object update: marginalise the subject partner (i axis, second-to-last).
    term = logic.log_parametric_not(combine(ll, subj_att[..., :, None], g_subj), qs, 1.0)
    term = term * not_diag * mask_i
    obj_new = combine(
        logic.log_parametric_not(jnp.sum(term, axis=-2), q_subj[..., None], 1.0),
        obj_att,
        g_obj,
    )

    return subj_new, obj_new


def normalize_over_options(
    ll: jnp.ndarray, opt_mask: jnp.ndarray, enabled: bool = True
) -> jnp.ndarray:
    """Per-option-group log-softmax-style normalisation of oracle outputs.

    Dense masked replacement of the oracle's cluster normalisation
    (classifier_oracle.py:22-42,68-77 / util.py ClusteredLogSoftmax): within
    each question's option group, res = ll - log(sum_k exp(ll_k)).

    Upstream subtlety reproduced exactly: `_build_map` returns None — i.e.
    normalisation is skipped for the WHOLE batch — only when every cluster
    is a singleton (size == cluster_num, classifier_oracle.py:27-28). If any
    question in the batch has >1 option, singleton groups ARE normalised
    (their value becomes ll - log(exp(ll)), an exp/log roundtrip of ~0).

    Args:
      ll: (B, K, ...) per-option log-likelihoods.
      opt_mask: (B, K) option validity.
    """
    if not enabled:
        return ll
    extra = ll.ndim - 2
    m = opt_mask.reshape(opt_mask.shape + (1,) * extra)
    denom = logic.masked_logsumexp(ll, m, axis=1)
    normed = ll - denom[:, None, ...]
    any_multi = jnp.max(jnp.sum(opt_mask, axis=1)) > 1
    return jnp.where(any_multi, normed, ll)
