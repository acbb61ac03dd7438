"""Hop-by-hop reasoning visualization + trace export.

Reference analog: VQATrainer._visualize_batch (trainer.py:542-596) renders
per-op attention overlays with OpenCV windows. Here the executor's
return_trace path exposes every slot's (B, O) attention; we render overlays
to image files (matplotlib, headless-safe) and/or export the trace as JSON,
which doubles as the machine-readable interpretability surface.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np
import jax.numpy as jnp


def trace_to_dict(batch, out, trace) -> list:
    """Per-question execution trace: ops, args and attention per hop."""
    cb = batch.compiled
    spec = batch.spec
    result = []
    B = len(cb.image_ids)
    for qi in range(B):
        if cb.question_mask[qi] == 0:
            continue
        hops = []
        for b, grid in enumerate(spec.grid):
            slot_traces = trace[b]
            live = [si for si, opc in enumerate(grid) if opc != 0]
            for tr_i, si in enumerate(live):
                if cb.op_mask[qi, b, si] == 0:
                    continue
                hops.append(
                    {
                        "branch": b,
                        "op": {1: "select", 2: "filter", 3: "relate"}[grid[si]],
                        "token": int(cb.arg_tok[qi, b, si]),
                        "attention": np.exp(np.asarray(slot_traces[tr_i][qi])).tolist(),
                    }
                )
        result.append(
            {
                "question_id": cb.question_ids[qi],
                "image_id": cb.image_ids[qi],
                "terminal_op": spec.terminal_op,
                "answer": cb.answers[qi],
                "log_probability": np.asarray(out["log_probability"])[qi].tolist(),
                "hops": hops,
            }
        )
    return result


def render_question(image_path, image_id, bboxes, attentions, ops, out_file,
                    show: bool = False):
    """Overlay per-hop attention boxes on the image.

    Writes ``out_file``; with ``show=True`` (and a display) also opens an
    interactive window per question, the reference's ``-v`` behavior
    (trainer.py:542-596, OpenCV imshow/waitKey)."""
    import matplotlib

    if not show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import matplotlib.patches as patches

    img_file = os.path.join(image_path, f"{image_id}.jpg")
    n = len(attentions)
    fig, axes = plt.subplots(1, max(n, 1), figsize=(6 * max(n, 1), 6))
    if n <= 1:
        axes = [axes]
    img = plt.imread(img_file) if os.path.exists(img_file) else None
    for h, (att, op_label) in enumerate(zip(attentions, ops)):
        ax = axes[h]
        if img is not None:
            ax.imshow(img)
        for o, a in enumerate(att):
            if o >= len(bboxes):
                break
            x, y, w, hgt = bboxes[o]
            ax.add_patch(
                patches.Rectangle((x, y), w, hgt, linewidth=1 + 3 * a,
                                  edgecolor=(0, 1, 0, min(1.0, 0.15 + a)), facecolor="none")
            )
        ax.set_title(op_label)
        ax.axis("off")
    fig.savefig(out_file, bbox_inches="tight")
    if show:
        plt.show()  # blocks until the window closes (reference waitKey)
    plt.close(fig)


def visualize_loop(trainer, interp, loader, params, image_path: Optional[str],
                   import_path: Optional[str], out_dir: str = "visualizations",
                   show: bool = False):
    """Visualization epoch (trainer.py:516-596): trace JSON always, image
    overlays when the GQA images directory is available."""
    if import_path is not None:
        params = trainer.load(import_path, params)
    os.makedirs(out_dir, exist_ok=True)
    all_traces = []
    for batch in loader:
        arrays = {k: jnp.asarray(v) for k, v in batch.arrays.items()}
        out = interp.forward(
            params, jnp.asarray(batch.objects), jnp.asarray(batch.obj_mask),
            arrays, batch.spec, False, None, return_trace=True,
        )
        entries = trace_to_dict(batch, out, out["trace"])
        all_traces.extend(entries)
        if image_path and os.path.isdir(image_path):
            box_dim = batch.objects.shape[-1] - 6
            img_index = batch.arrays.get("img_index")
            for qi, entry in enumerate(entries):
                # objects are stored per UNIQUE image; map question -> row
                row = int(img_index[qi]) if img_index is not None else qi
                bboxes = batch.objects[row, :, box_dim + 2 :]
                render_question(
                    image_path, entry["image_id"], bboxes,
                    [h["attention"] for h in entry["hops"]],
                    [f"{h['op']}({h['token']})" for h in entry["hops"]],
                    os.path.join(out_dir, f"{entry['question_id']}.png"),
                    show=show,
                )
    with open(os.path.join(out_dir, "traces.json"), "w") as f:
        json.dump(all_traces, f)
    return all_traces
