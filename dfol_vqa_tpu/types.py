"""Core runtime types: dense-masked replacements for the reference batch types.

Reference: src/nsvqa/nn/interpreter/batch_base_types.py. The upstream design
packs a batch of scenes into one ragged object axis and carries sparse
``(B, O_total)`` batch↔object maps plus ``(P, Q)`` predicate↔question maps.
On TPU we use a dense padded layout instead:

  * objects:   ``(B, O)`` with a float validity mask (O = max objects/image),
  * predicates: an explicit option axis ``(B, K)`` with a validity mask,
  * attention: ``log_attention`` with shape ``(B, O)`` or ``(B, K, O)``.

Everything is a registered pytree so it flows through jit/scan/grad.
"""

from __future__ import annotations

import dataclasses
from enum import IntEnum
from typing import Optional

import jax
import jax.numpy as jnp

from dfol_vqa_tpu import logic


class Quantifier(IntEnum):
    """batch_base_types.py:15-17."""

    FOR_ALL = 0
    EXISTS = 1


class QuestionType(IntEnum):
    """batch_base_types.py:19-24."""

    BINARY = 0
    QUERY = 1
    STATEMENT = 2
    OBJECT_STATEMENT = 3
    SCENE_GRAPH = 4


class TokenType(IntEnum):
    """batch_base_types.py:26-30."""

    ATTRIBUTE = 0
    RELATION = 1
    NAME = 2
    CATEGORY = 3


def _pytree_dataclass(cls):
    return jax.tree_util.register_dataclass(dataclasses.dataclass(cls))


@_pytree_dataclass
class World:
    """A batch of scenes with precomputed oracle likelihood caches.

    Dense analog of BatchWorld (batch_base_types.py:191-252) fused with the
    reference's ``cached=True`` oracle precompute (batch_base_interpreter.py:
    53-61): per batch we hold the full per-object attribute log-likelihood
    matrix and a small per-question relation-table cache, so program
    execution is pure gathers + fuzzy-logic arithmetic.

    Scenes are deduplicated per unique image: GQA averages ~10 questions per
    image, so the expensive per-object caches are computed once per image
    (U rows) and addressed per question through ``img_index`` — an
    optimisation the reference's per-question ragged layout cannot express.
    """

    obj_mask: jnp.ndarray  # (B, O) float {0,1} per QUESTION
    attr_ll: jnp.ndarray  # (U, V+1, O) per UNIQUE image; row 0 = default ll.
    # VOCAB-MAJOR layout (r5): executor lookups address whole (img, token)
    # rows, so a token fetch is ONE contiguous (O,)-row gather — measured
    # ~40x faster on TPU than the object-major (U, O, V+1) layout, whose
    # per-(object, token) element gathers dominated the O=100 executor
    # (scripts/o100_experiments4.py). The O minor dim sits on the 128-lane
    # axis, shared with every downstream attention tensor.
    rel_ll: jnp.ndarray  # (B, R, O, O): per-question relation-table cache
    # (R-major so the (O, O) minor dims sit on full TPU (8,128) tiles)
    rel_tokens: jnp.ndarray  # (B, R) int32 unsigned token codes (0 = pad)
    attr_in: jnp.ndarray  # (B, O, D_att) featurized object inputs (gathered)
    pos: jnp.ndarray  # (B, O, 4) normalized bbox positional features
    img_index: jnp.ndarray = None  # (B,) question -> unique-image row

    def __post_init__(self):
        if self.img_index is None:
            B = self.obj_mask.shape[0]
            object.__setattr__(self, "img_index", jnp.arange(B, dtype=jnp.int32))

    @property
    def batch_size(self) -> int:
        return self.obj_mask.shape[0]

    @property
    def object_num(self) -> int:
        return self.obj_mask.shape[1]


@_pytree_dataclass
class VariableSet:
    """Soft set of objects per question (optionally per option).

    Dense analog of BatchVariableSet (batch_base_types.py:34-187):
    ``log_attention`` is ``(B, O)`` or ``(B, K, O)``; ``quantifier`` matches
    the leading dims. The sparse batch_object_map becomes ``obj_mask``.
    """

    log_attention: jnp.ndarray  # (B, O) or (B, K, O)
    quantifier: jnp.ndarray  # (B,) or (B, K) float
    obj_mask: jnp.ndarray  # (B, O)

    def _mask(self) -> jnp.ndarray:
        if self.log_attention.ndim == 3:
            return self.obj_mask[:, None, :]
        return self.obj_mask

    def log_probability(self, hard_mode: bool = False) -> jnp.ndarray:
        """Aggregate object attention into a per-question truth value.

        Soft mode (batch_base_types.py:114-123):
            lpn( sum_o mask * lpn(att, q), q )
        Hard mode (…:104-112): min over `where(mask, lpn(att,q), 0)` then lpn
        — including the upstream quirk that masked entries participate in the
        min as exactly 0.
        """
        q = self.quantifier[..., None]
        mask = self._mask()
        inner = logic.log_parametric_not(self.log_attention, q, 1.0)
        if hard_mode:
            agg = logic.masked_min(inner, mask, axis=-1)
        else:
            agg = logic.masked_sum(inner, mask, axis=-1)
        return logic.log_parametric_not(agg, self.quantifier, 1.0)

    def gate(self, other: "VariableSet", flag: jnp.ndarray) -> "VariableSet":
        """Blend two sets by a per-question {0,1} flag (…:149-168)."""
        g = flag
        quant = self.quantifier * g + other.quantifier * (1.0 - g)
        att = self.log_attention * g[..., None] + other.log_attention * (1.0 - g[..., None])
        return VariableSet(att, quant, self.obj_mask)

    def apply_modulations(
        self, modulations: Optional[jnp.ndarray], input_att: Optional[jnp.ndarray] = None
    ) -> "VariableSet":
        """Attention calibration transform (batch_base_types.py:170-187).

        ``modulations`` is (..., M) with M>=2 in sigmoid space:
        alpha,beta (x10), optional c (x10), d, gate g."""
        if modulations is None:
            return self
        m = modulations
        max_activation = 10.0
        alpha = m[..., 0:1] * max_activation
        beta = m[..., 1:2] * max_activation
        c = m[..., 2:3] * max_activation if m.shape[-1] > 2 else jnp.ones((1,), m.dtype)
        d = m[..., 3:4] if m.shape[-1] > 3 else 0.5 * jnp.ones((1,), m.dtype)
        att = self.log_attention
        temp = alpha * att + logic.safe_log(c) + logic.safe_log(d)
        new_att = temp - logic.safe_log(
            jnp.exp(beta * logic.log_not(att) + logic.safe_log(1.0 - d)) + jnp.exp(temp)
        )
        if m.shape[-1] > 4 and input_att is not None:
            g = m[..., 4:5]
            new_att = logic.safe_log(g * jnp.exp(new_att) + (1.0 - g) * jnp.exp(input_att))
        return VariableSet(new_att, self.quantifier, self.obj_mask)


@_pytree_dataclass
class AttentionState:
    """LSTM (h, c) carried through the program for attention calibration.

    Dense analog of BatchAttentionState (batch_base_types.py:256-310)."""

    h: jnp.ndarray  # (B, S)
    c: jnp.ndarray  # (B, S)

    def gate(self, other: "AttentionState", flag: jnp.ndarray) -> "AttentionState":
        g = flag[..., None]
        return AttentionState(
            self.h * g + other.h * (1.0 - g), self.c * g + other.c * (1.0 - g)
        )

    @staticmethod
    def zeros(batch: int, dim: int, dtype=jnp.float32) -> "AttentionState":
        return AttentionState(jnp.zeros((batch, dim), dtype), jnp.zeros((batch, dim), dtype))


def fresh_variable_set(
    world: World, quantifier: float = float(Quantifier.EXISTS)
) -> VariableSet:
    """world.variable_set() analog: log-attention 0 (= certainty 1)."""
    B, O = world.obj_mask.shape
    return VariableSet(
        jnp.zeros((B, O), jnp.float32),
        jnp.full((B,), quantifier, jnp.float32),
        world.obj_mask,
    )
