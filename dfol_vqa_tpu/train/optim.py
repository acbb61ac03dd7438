"""Optimizer assembly: torch-semantics Adam + grad clip + freeze masks.

Mirrors the reference optimisation recipe (gqa_interpreter_experiments.py:
256-262 Adam(lr, weight_decay) over requires_grad params; trainer.py:429-442
clip_grad_norm_ before step). Notes on exact semantics:

  * torch.optim.Adam's ``weight_decay`` is ADDITIVE L2 on the gradient
    *before* the moment updates (not AdamW) — hence
    ``optax.add_decayed_weights`` placed before ``scale_by_adam``.
  * Clipping is a global-norm clip of the raw gradients (trainer.py:438).
  * The reference freezes modules via requires_grad_(False); here frozen
    subtrees are excluded with ``optax.masked`` so they receive neither
    updates nor weight decay.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import optax

from dfol_vqa_tpu.config import Config


def trainable_labels(params: Dict[str, Any], cfg: Config) -> Dict[str, Any]:
    """'train'/'freeze' label pytree (reference freeze_* flags,
    CONFIG_YAML.md:81-93)."""

    def mask_for(top: str, sub: str = ""):
        if top == "featurizer":
            return not cfg.freeze_featurizer
        if top == "attribute_network":
            return not cfg.freeze_attribute_network
        if top == "relation_network":
            return not cfg.freeze_relation_network
        if top == "embedding":
            if sub == "b" and cfg.freeze_embedding_bias:
                return False
            return not cfg.freeze_embedding_network
        if top == "embedding_extra":
            # trainable-interpreter extra concept channels are part of the
            # embedding head; op_modules (interpreter-level) have no freeze
            # flag in the reference surface and stay trainable
            return not cfg.freeze_embedding_network
        if top == "calibrator":
            return not cfg.freeze_attention_network
        return True

    def lbl(flag: bool) -> str:
        return "train" if flag else "freeze"

    out = {}
    for top, v in params.items():
        if v is None:
            out[top] = None
        elif top == "embedding":
            out[top] = {k: lbl(mask_for(top, k)) for k in v}
        else:
            out[top] = jax.tree_util.tree_map(lambda _: lbl(mask_for(top)), v)
    return out


def build_optimizer(cfg: Config, params: Dict[str, Any]) -> optax.GradientTransformation:
    labels = trainable_labels(params, cfg)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.clip_norm),
        optax.add_decayed_weights(cfg.weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale(-cfg.learning_rate),
    )
    return optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()}, labels)
