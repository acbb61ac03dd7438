"""Minimal functional NN layers (pure-pytree parameters).

The reference model zoo (gqa_interpreter_experiments.py:18-77) is three tiny
MLP families plus LSTM cells. We implement them as explicit parameter
pytrees + pure apply functions instead of a module framework: the
interpreter's executor threads parameters through `lax.scan`/`jax.grad`
directly, and a transparent pytree keeps checkpoint surgery (the reference's
``strict=False`` partial restore, batch_base_interpreter.py:42-43) trivial.

Initialisation matches torch defaults (kaiming-uniform fan-in for Linear,
uniform 1/sqrt(hidden) for LSTMCell) so training dynamics are comparable.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


# --------------------------------------------------------------------- linear


def linear_init(key, in_dim: int, out_dim: int, dtype=jnp.float32) -> Params:
    """torch.nn.Linear default init: U(-k, k), k = 1/sqrt(in_dim)."""
    kw, kb = jax.random.split(key)
    k = 1.0 / math.sqrt(in_dim)
    return {
        "w": jax.random.uniform(kw, (in_dim, out_dim), dtype, -k, k),
        "b": jax.random.uniform(kb, (out_dim,), dtype, -k, k),
    }


def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return jnp.dot(x, p["w"], preferred_element_type=jnp.float32) + p["b"]


# -------------------------------------------------------------------- dropout


def dropout(x: jnp.ndarray, rate: float, rng, deterministic: bool) -> jnp.ndarray:
    if deterministic or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


# ------------------------------------------------------------------------ MLP
#
# RegularMLP   : [Dropout, Linear, ELU]*H + [Dropout, Linear, Sigmoid]
#                (gqa_interpreter_experiments.py:18-36)
# LoglikelihoodMLP: same but final LogSigmoid (…:40-56)
# layers_config=None => identity network (RegularMLP with None config).


def mlp_init(key, in_dim: int, hidden: Optional[Sequence[int]], out_dim: int) -> Optional[Params]:
    if hidden is None:
        return None
    dims = [in_dim] + list(hidden) + [out_dim]
    keys = jax.random.split(key, len(dims) - 1)
    return {"layers": [linear_init(k, dims[i], dims[i + 1]) for i, k in enumerate(keys)]}


def mlp_apply(
    p: Optional[Params],
    x: jnp.ndarray,
    final: str = "sigmoid",
    dropout_rate: float = 0.0,
    rng=None,
    deterministic: bool = True,
) -> jnp.ndarray:
    """Apply a RegularMLP/LoglikelihoodMLP; `final` in {sigmoid, logsigmoid, none}."""
    if p is None:
        return x
    layers = p["layers"]
    n = len(layers)
    rngs = jax.random.split(rng, n) if (rng is not None and not deterministic) else [None] * n
    for i, lp in enumerate(layers):
        x = dropout(x, dropout_rate, rngs[i], deterministic)
        x = linear(lp, x)
        if i < n - 1:
            x = jax.nn.elu(x)
    if final == "sigmoid":
        x = jax.nn.sigmoid(x)
    elif final == "logsigmoid":
        x = jax.nn.log_sigmoid(x)
    elif final == "none":
        pass
    else:
        raise ValueError(final)
    return x


# ------------------------------------------------------------------ LSTM cell
#
# torch.nn.LSTMCell semantics (gates i,f,g,o); used by the attention-transfer
# calibrator (gqa_interpreter_experiments.py:122-123).


def lstm_cell_init(key, in_dim: int, hidden_dim: int, dtype=jnp.float32) -> Params:
    k = 1.0 / math.sqrt(hidden_dim)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "w_ih": jax.random.uniform(k1, (in_dim, 4 * hidden_dim), dtype, -k, k),
        "w_hh": jax.random.uniform(k2, (hidden_dim, 4 * hidden_dim), dtype, -k, k),
        "b_ih": jax.random.uniform(k3, (4 * hidden_dim,), dtype, -k, k),
        "b_hh": jax.random.uniform(k4, (4 * hidden_dim,), dtype, -k, k),
    }


def lstm_cell(p: Params, x: jnp.ndarray, state):
    """One LSTMCell step. state = (h, c); returns (h', c')."""
    h, c = state
    gates = (
        jnp.dot(x, p["w_ih"], preferred_element_type=jnp.float32)
        + p["b_ih"]
        + jnp.dot(h, p["w_hh"], preferred_element_type=jnp.float32)
        + p["b_hh"]
    )
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c2 = f * c + i * g
    h2 = o * jnp.tanh(c2)
    return h2, c2


# ----------------------------------------------------------------- utilities


def param_count(params) -> int:
    leaves = jax.tree_util.tree_leaves(params)
    return int(sum(np.prod(l.shape) for l in leaves if hasattr(l, "shape")))
