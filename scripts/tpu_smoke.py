"""Real-TPU smoke test: Mosaic Pallas kernel + end-to-end step on hardware.

The pytest suite runs on CPU (Pallas in interpret mode); this script verifies
on an actual TPU that (a) the fused relation-oracle kernel compiles under
Mosaic, forward and custom-VJP backward, (b) it matches the XLA formulation,
and (c) a full train step runs. First compiles take minutes on a remote
(tunneled) TPU frontend.

Usage: python scripts/tpu_smoke.py
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from dfol_vqa_tpu.compiler.program_compiler import ProgramCompiler
    from dfol_vqa_tpu.config import Config
    from dfol_vqa_tpu.data.dataset import ProgramDataset
    from dfol_vqa_tpu.data.features import SyntheticFeatures
    from dfol_vqa_tpu.data.loader import BatchLoader
    from dfol_vqa_tpu.data.synthetic import generate_questions
    from dfol_vqa_tpu.models.interpreter import Interpreter
    from dfol_vqa_tpu.ontology import GQAOntology

    t0 = time.time()

    def log(msg):
        print(f"[{time.time() - t0:6.1f}s] {msg}", flush=True)

    dev = jax.devices()[0]
    log(f"device: {dev.platform} ({dev.device_kind})")

    cfg = Config()
    cfg.tpu.max_object_num = 16
    cfg.tpu.use_pallas = True
    ont = GQAOntology()
    interp = Interpreter(cfg, ont)
    params = interp.init_params(jax.random.PRNGKey(0))

    # distinct imageIds -> low dedup -> forces the Pallas path (U*2 > B)
    qs = generate_questions(ont, 8, terminal="verify_rel", length=2, seed=12)
    for i, q in enumerate(qs):
        q["imageId"] = f"u{i}"
    loader = BatchLoader(
        [ProgramDataset(qs, ont)],
        ProgramCompiler(ont, object_num=16, rel_slots=cfg.tpu.rel_table_size),
        SyntheticFeatures(box_dim=cfg.box_features_dim, min_objects=4, max_objects=16),
        8, 16, shuffle=False, prefetch=0,
    )
    b = next(iter(loader))
    arrays = {k: jnp.asarray(v) for k, v in b.arrays.items()}
    obj, mask = jnp.asarray(b.objects), jnp.asarray(b.obj_mask)

    log("compiling Pallas forward (Mosaic)...")
    out = interp.forward(params, obj, mask, arrays, b.spec, False, None)
    lp = np.asarray(out["log_probability"])
    assert np.isfinite(lp).all()
    log("forward OK; compiling custom-VJP backward...")

    def loss_fn(p):
        return interp.forward(p, obj, mask, arrays, b.spec, True, None)["loss"]

    grads = jax.grad(loss_fn)(params)
    gn = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gn) and gn > 0
    log(f"backward OK (grad L1 = {gn:.1f}); comparing against the XLA path...")

    cfg2 = Config()
    cfg2.tpu.max_object_num = 16
    cfg2.tpu.use_pallas = False  # force the XLA formulation for comparison
    interp2 = Interpreter(cfg2, ont)
    out2 = interp2.forward(params, obj, mask, arrays, b.spec, False, None)
    d = float(np.max(np.abs(lp - np.asarray(out2["log_probability"]))))
    assert d < 1e-4, f"pallas/XLA divergence: {d}"
    log(f"PASS: Mosaic relation-oracle kernel matches XLA (max |dlog p| = {d:.2e})")

    # ---- shared-image gather+contract kernel (ops/pallas/shared_contract.py)
    # questions share images heavily (U*2 <= B) -> the shared path engages;
    # with use_pallas the (B,O,O,E) gather is replaced by the fused kernel
    log("compiling shared-image gather+contract kernel (Mosaic)...")
    qs2 = generate_questions(ont, 8, terminal="verify_rel", length=2, seed=13)
    for i, q in enumerate(qs2):
        q["imageId"] = f"s{i // 4}"  # 2 unique images for 8 questions
    loader2 = BatchLoader(
        [ProgramDataset(qs2, ont)],
        ProgramCompiler(ont, object_num=16, rel_slots=cfg.tpu.rel_table_size),
        SyntheticFeatures(box_dim=cfg.box_features_dim, min_objects=4, max_objects=16),
        8, 16, shuffle=False, prefetch=0,
    )
    b2 = next(iter(loader2))
    arrays2 = {k: jnp.asarray(v) for k, v in b2.arrays.items()}
    obj2, mask2 = jnp.asarray(b2.objects), jnp.asarray(b2.obj_mask)
    o_pal = interp.forward(params, obj2, mask2, arrays2, b2.spec, False, None)
    o_xla = interp2.forward(params, obj2, mask2, arrays2, b2.spec, False, None)
    d2 = float(np.max(np.abs(
        np.asarray(o_pal["log_probability"]) - np.asarray(o_xla["log_probability"])
    )))
    assert d2 < 1e-4, f"shared-contract pallas/XLA divergence: {d2}"

    def loss2(p):
        return interp.forward(p, obj2, mask2, arrays2, b2.spec, True, None)["loss"]

    g2 = jax.grad(loss2)(params)
    gn2 = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g2))
    assert np.isfinite(gn2) and gn2 > 0
    log(f"PASS: shared gather+contract kernel matches XLA (max |dlog p| = {d2:.2e}, "
        f"bwd grad L1 = {gn2:.1f})")


if __name__ == "__main__":
    main()
