"""Unit tests for the fuzzy-logic primitives against closed-form math."""

import numpy as np
import jax.numpy as jnp
import pytest

from dfol_vqa_tpu import logic


def probs(rng, shape):
    return rng.uniform(0.02, 0.98, size=shape).astype(np.float32)


def test_log_and_is_product(rng):
    p, q = probs(rng, 16), probs(rng, 16)
    out = np.exp(logic.log_and(np.log(p), np.log(q)))
    np.testing.assert_allclose(out, p * q, rtol=1e-5)


def test_log_or_matches_de_morgan(rng):
    p, q = probs(rng, 16), probs(rng, 16)
    out = np.exp(logic.log_or(jnp.log(p), jnp.log(q)))
    np.testing.assert_allclose(out, 1 - (1 - p) * (1 - q), rtol=1e-5)


def test_log_not(rng):
    p = probs(rng, 16)
    np.testing.assert_allclose(np.exp(logic.log_not(jnp.log(p))), 1 - p, rtol=1e-5)


def test_safe_log_clamps_at_1e20():
    assert np.isclose(float(logic.safe_log(jnp.float32(0.0))), np.log(1e-20))
    assert np.isclose(float(logic.safe_log(jnp.float32(-1.0))), np.log(1e-20))


def test_log_parametric_not_endpoints(rng):
    x = np.log(probs(rng, 8))
    ident = logic.log_parametric_not(jnp.asarray(x), 0.0, 1.0)
    np.testing.assert_allclose(np.asarray(ident), x, rtol=1e-5)
    flipped = logic.log_parametric_not(jnp.asarray(x), 1.0, 1.0)
    np.testing.assert_allclose(np.exp(flipped), 1 - np.exp(x), rtol=1e-5)


def test_log_or_tensor_masked(rng):
    p = probs(rng, (3, 5))
    mask = (rng.uniform(size=(3, 5)) > 0.4).astype(np.float32)
    mask[:, 0] = 1.0
    out = np.exp(logic.log_or_tensor(jnp.log(p), axis=1, mask=mask))
    expected = 1 - np.prod(np.where(mask > 0, 1 - p, 1.0), axis=1)
    np.testing.assert_allclose(out, expected, rtol=1e-4)


def test_masked_logsumexp(rng):
    x = np.log(probs(rng, (2, 7)))
    mask = np.ones((2, 7), np.float32)
    mask[0, 3:] = 0
    out = logic.masked_logsumexp(jnp.asarray(x), jnp.asarray(mask), axis=1)
    expected = np.log((np.exp(x) * mask).sum(1))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


def test_masked_min_includes_zero_quirk():
    # masked entries participate as exactly 0 (upstream hard-mode quirk)
    x = jnp.asarray([[0.5, -2.0, -1.0]])
    mask = jnp.asarray([[0.0, 1.0, 1.0]])
    assert float(logic.masked_min(x, mask, axis=1)[0]) == -2.0
    x2 = jnp.asarray([[0.5, 2.0, 1.0]])  # positive logs can't occur, but quirk:
    assert float(logic.masked_min(x2, mask, axis=1)[0]) == 0.0
