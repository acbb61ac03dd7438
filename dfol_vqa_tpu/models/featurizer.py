"""Scene featurisation: box features -> oracle inputs + pair geometry.

Dense reformulation of BatchGQABoxFeaturizer
(reference: src/nsvqa/data/batch_gqa_boxfeatures_pipeline.py:193-281).
Object rows are ``[rcnn_2048 ‖ image_w,image_h ‖ bbox x,y,w,h]`` exactly as
collated upstream (…:71). The ragged same-image pair extraction
(util.py:87-103) disappears: geometry is computed for the full dense
``(B, O, O)`` pair grid and invalid pairs are masked downstream.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from dfol_vqa_tpu import nn
from dfol_vqa_tpu.config import Config


def featurize_objects(
    featurizer_params,
    objects: jnp.ndarray,
    cfg: Config,
    rng=None,
    deterministic: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """objects (B, O, box_dim+6) -> (attr_in (B, O, D+4), pos (B, O, 4)).

    Mirrors featurize_scene (batch_gqa_boxfeatures_pipeline.py:199-211):
    optional featurizer MLP on the 2048-d features, positional features =
    bbox normalised by image size (clamped at 1).
    """
    feats = objects[..., :-6]
    wh = objects[..., -6:-4]
    bbox = objects[..., -4:]
    f = nn.mlp_apply(
        featurizer_params,
        feats,
        final="sigmoid",
        dropout_rate=cfg.dropout,
        rng=rng,
        deterministic=deterministic,
    )
    denom = jnp.clip(jnp.concatenate([wh, wh], axis=-1), min=1.0)
    pos = bbox / denom
    return jnp.concatenate([f, pos], axis=-1), pos


def pair_geometry(pos: jnp.ndarray) -> jnp.ndarray:
    """(B, O, 4) -> (B, O, O, 4): [distance, angle, h_side, v_side].

    Subject = first O axis (i), object = second (j), matching the reference
    relation feature tail (batch_gqa_boxfeatures_pipeline.py:258-279):
      distance = |center_i - center_j|,
      angle    = asin((cy_i - cy_j) / max(distance, 1e-10)),
      h_side   = sign(x_j - x_i),  v_side = sign(y_j - y_i).
    """
    x, y, w, h = pos[..., 0], pos[..., 1], pos[..., 2], pos[..., 3]
    cx = x + w / 2.0
    cy = y + h / 2.0
    dx = cx[..., :, None] - cx[..., None, :]
    dy = cy[..., :, None] - cy[..., None, :]
    dist = jnp.sqrt(dx * dx + dy * dy)
    # ratio clamped to [-1, 1]: fp32 rounding can make |dy|/dist marginally
    # exceed 1 when dx ~ 0, which would NaN the asin (a hazard the reference
    # shares; the clamp only changes those pathological pairs)
    angle = jnp.arcsin(jnp.clip(dy / jnp.clip(dist, min=1e-10), -1.0, 1.0))
    h_side = jnp.sign(x[..., None, :] - x[..., :, None])
    v_side = jnp.sign(y[..., None, :] - y[..., :, None])
    return jnp.stack([dist, angle, h_side, v_side], axis=-1)
