"""Log-space fuzzy-logic primitives (product t-norm).

TPU-native reimplementation of the ∇-FOL soft first-order logic algebra
(reference semantics: src/nsvqa/nn/interpreter/util.py:17-47). All functions
are pure jnp and safe under jit/vmap/grad. Truth values live in log space:
``x = log p`` with ``p ∈ [0, 1]``, so every value is ``<= 0``.

Design notes (TPU):
  * ``safe_log`` clamps at 1e-20 for float32 (1e-6 for half precision),
    matching the reference clamp points exactly (util.py:22-25) — required
    for bitwise-comparable answer distributions.
  * Aggregations take an explicit ``mask`` instead of the reference's sparse
    batch↔object maps; masked elements contribute the identity of the
    reduction (0 in log space = certainty 1 for AND).
  * ``log_parametric_not(x, alpha, beta)`` is the single primitive the whole
    interpreter is built on: alpha=1 -> NOT, alpha=0 -> identity (through an
    exp/log roundtrip, which we reproduce deliberately: the roundtrip's
    saturation at the clamp point is part of the reference numerics).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "safe_log",
    "safe_exp",
    "log_and",
    "log_or",
    "log_not",
    "log_and_tensor",
    "log_or_tensor",
    "log_parametric_not",
    "masked_sum",
    "masked_min",
    "masked_logsumexp",
]

_EPS_F32 = 1e-20
_EPS_HALF = 1e-6


def _eps_for(x: jnp.ndarray) -> float:
    if x.dtype in (jnp.float16, jnp.bfloat16):
        return _EPS_HALF
    return _EPS_F32


def safe_exp(x):
    """exp (reference util.py:17-20 applies no clamp on exp)."""
    return jnp.exp(x)


def safe_log(x):
    """log with the reference's underflow clamp (util.py:22-25)."""
    x = jnp.asarray(x)
    return jnp.log(jnp.clip(x, min=_eps_for(x)))


def log_and(a, b):
    """Product t-norm AND: log(p*q) (util.py:29-30)."""
    return a + b


def log_not(x):
    """log(1 - p) (util.py:35-36)."""
    return safe_log(1.0 - safe_exp(x))


def log_or(a, b):
    """De-Morgan OR: log(1 - (1-p)(1-q)) (util.py:32-33)."""
    return safe_log(1.0 - (1.0 - safe_exp(a)) * (1.0 - safe_exp(b)))


def log_and_tensor(x, axis=None, mask=None):
    """AND-reduce: sum of logs (util.py:38-39), optionally masked."""
    if mask is not None:
        x = x * mask
    return jnp.sum(x, axis=axis)


def log_or_tensor(x, axis=None, mask=None):
    """OR-reduce via De Morgan (util.py:41-44), optionally masked.

    Masked-out entries contribute log_not identity (0)."""
    t = log_not(x)
    if mask is not None:
        t = t * mask
    return log_not(jnp.sum(t, axis=axis))


def log_parametric_not(x, alpha, beta=1.0):
    """log(alpha + beta * (1 - 2*alpha) * exp(x))  (util.py:46-47).

    alpha=1, beta=1 -> NOT; alpha=0, beta=1 -> identity-through-roundtrip.
    Used with quantifiers as continuous alpha (EXISTS=1 flips, FOR_ALL=0
    passes through).
    """
    return safe_log(alpha + beta * (1.0 - 2.0 * alpha) * safe_exp(x))


def masked_sum(x, mask, axis):
    """Sum with a {0,1} float mask (dense replacement for sparse map matmuls)."""
    return jnp.sum(x * mask, axis=axis)


def masked_min(x, mask, axis):
    """Min over `where(mask, x, 0)`.

    Matches the reference hard-mode aggregation (batch_base_types.py:103-112),
    which multiplies by the dense 0/1 map before `.min()` — masked entries
    participate as exactly 0 (= log 1), the same quirk as upstream.
    """
    return jnp.min(jnp.where(mask > 0, x, 0.0), axis=axis)


def masked_logsumexp(x, mask, axis):
    """log(sum(mask * exp(x))) with the reference's safe_log clamp.

    Reproduces the oracle's per-cluster normalisation denominator
    (classifier_oracle.py:68-77) in dense masked form. Note the reference
    computes a plain exp-sum-log (no max-subtraction); values are bounded
    above by 0 so overflow cannot occur, and the clamp handles underflow.
    """
    return safe_log(jnp.sum(jnp.exp(x) * mask, axis=axis))
