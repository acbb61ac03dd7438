"""Shared test helpers: static-oracle worlds and tiny program builders."""

from typing import Dict, List, Optional

import numpy as np
import jax.numpy as jnp

from dfol_vqa_tpu.types import World


def op(operator: str, *arguments):
    return {"operator": operator, "arguments": list(arguments)}


def question(branches, last_op, answer=None, image_id="img0", qid="q0"):
    return {
        "program": {"branches": branches, "last_op": last_op},
        "answer": answer,
        "imageId": image_id,
        "question_id": qid,
    }


def static_world(
    ontology,
    attr_tables: List[Dict[str, np.ndarray]],
    rel_tables: List[Dict[str, np.ndarray]],
    counts: List[int],
    O: int,
    rel_tokens: np.ndarray,
    default_ll: float = -30.0,
) -> World:
    """Build a World from per-question token->loglikelihood tables.

    attr_tables[b][token] = (O,) log-likelihoods; rel_tables[b][token] =
    (O, O). This is the dense analog of the reference StaticOracle
    (base_oracle.py:79-93)."""
    B = len(counts)
    V = ontology.num_tokens
    attr_ll = np.full((B, V + 1, O), default_ll, np.float32)  # vocab-major
    for b, table in enumerate(attr_tables):
        for tok, vals in table.items():
            code = ontology.encode_token(tok)
            attr_ll[b, code, :] = vals
    R = rel_tokens.shape[1]
    rel_ll = np.full((B, R, O, O), default_ll, np.float32)  # R-major (types.py)
    for b, table in enumerate(rel_tables):
        for tok, vals in table.items():
            code = ontology.encode_token(tok)
            slots = np.where(rel_tokens[b] == code)[0]
            for s in slots:
                rel_ll[b, s] = vals
    mask = np.zeros((B, O), np.float32)
    for b, n in enumerate(counts):
        mask[b, :n] = 1.0
    return World(
        obj_mask=jnp.asarray(mask),
        attr_ll=jnp.asarray(attr_ll),
        rel_ll=jnp.asarray(rel_ll),
        rel_tokens=jnp.asarray(rel_tokens),
        attr_in=jnp.zeros((B, O, 4), jnp.float32),
        pos=jnp.zeros((B, O, 4), jnp.float32),
    )
