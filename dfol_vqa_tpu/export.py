"""AOT serving artifact: the closed executable set, serialized.

The reference deploys inference by shipping the full Python/torch stack and
re-tracing the model on every host (its predict path re-builds the
interpreter per run, reference src/nsvqa/train/trainer.py:685-760). Here the
serving engine's warm executable set (serve.py: canonical BucketSpec x
batch-rung eval steps) is itself the deployable artifact: each step is
exported to serialized StableHLO via ``jax.export``, so a serving host needs
neither the model code nor a tracing pass — deserialize, compile, serve.

Artifact layout (a directory):

    manifest.json   — engine dims/policy + one entry per executable:
                      {spec, meta, batch, file}
    NNNN.bin        — jax.export serialized bytes (versioned, stable)

Platform notes: by default modules are exported for the platform doing the
export. Pass ``platforms=("cpu", "tpu")`` to build one artifact that runs on
both — but note kernel selection happens at TRACE time, so an artifact
exported on a CPU host takes the XLA (non-Pallas) relation path even on TPU;
export on a TPU host (scripts/export_serving.py --tpu) to capture the Mosaic
kernels for O >= 64. Exported modules are single-device (mesh serving
re-traces; GSPMD sharding metadata is out of scope for this artifact).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax import export as jax_export

from dfol_vqa_tpu.compiler.program_compiler import SUPERVISION_OPS, BucketSpec
from dfol_vqa_tpu.data.device_prefetch import to_device_batch

MANIFEST = "manifest.json"


# ------------------------------------------------------- spec/meta <-> json


def spec_to_json(spec: BucketSpec) -> dict:
    d = dataclasses.asdict(spec)
    d["grid"] = [list(g) for g in spec.grid]
    return d


def spec_from_json(d: dict) -> BucketSpec:
    d = dict(d)
    d["grid"] = tuple(tuple(int(x) for x in g) for g in d["grid"])
    return BucketSpec(**d)


def meta_to_json(meta: Tuple) -> list:
    return [list(m) if isinstance(m, tuple) else m for m in meta]


def meta_from_json(rows: list) -> Tuple:
    out = []
    for m in rows[:-1]:
        k, shape, dtype, off = m
        out.append((str(k), tuple(int(s) for s in shape), str(dtype), int(off)))
    return tuple(out) + ((int(rows[-1][0]),),)


# ------------------------------------------------------------------- export


def _sds(x) -> jax.ShapeDtypeStruct:
    # read .dtype directly when present (jax arrays expose it without a
    # device->host transfer; np.asarray would read back every parameter)
    dtype = getattr(x, "dtype", None)
    if dtype is None:
        dtype = np.asarray(x).dtype
    return jax.ShapeDtypeStruct(np.shape(x), dtype)


def export_serving_set(
    engine,
    questions: Sequence[dict],
    out_dir: str,
    batch_sizes: Optional[Sequence[int]] = None,
    platforms: Optional[Sequence[str]] = None,
    include_traces: bool = False,
) -> dict:
    """Export every canonical spec in ``questions`` x batch rungs to
    ``out_dir``. Returns the manifest dict.

    Mirrors ``ServingEngine.warmup`` exactly (same _prepare/_assemble path),
    so the artifact keys match what live traffic produces."""
    from dfol_vqa_tpu.serve import _Request, _pad_ladder

    if engine.mesh is not None:
        raise ValueError("export is single-device; build the engine without a mesh")
    if batch_sizes is None:
        top = _pad_ladder(engine.max_batch, engine.batch_ladder)
        batch_sizes = [b for b in engine.batch_ladder if b <= top]
    reps: Dict[BucketSpec, object] = {}
    for q in questions:
        if q["program"]["last_op"]["operator"] in SUPERVISION_OPS:
            continue
        key, cb = engine._prepare(q)
        if key not in reps:
            objs, mask = engine.features.batch(
                [q["imageId"]], engine.cfg.tpu.max_object_num
            )
            reps[key] = _Request(q, objs[0], mask[0], cb)

    os.makedirs(out_dir, exist_ok=True)
    params_sds = jax.tree.map(_sds, engine.params)
    entries = []

    def emit(lb, make_fn, B, kind):
        _, objs_d, mask_d, packed_d = to_device_batch(lb, engine.transfer_dtype)
        fn = jax.jit(make_fn(lb.spec, lb.meta))
        exp = jax_export.export(fn, platforms=platforms)(
            params_sds, _sds(objs_d), _sds(mask_d), _sds(packed_d)
        )
        fname = f"{len(entries):04d}.bin"
        with open(os.path.join(out_dir, fname), "wb") as f:
            f.write(exp.serialize())
        entries.append(
            {
                "spec": spec_to_json(lb.spec),
                "meta": meta_to_json(lb.meta),
                "batch": B,
                "kind": kind,
                "file": fname,
            }
        )

    for key, r in sorted(reps.items(), key=lambda kv: repr(kv[0])):
        for B in batch_sizes:
            lb, _ = engine._assemble(key, [r], pad_to=B)
            emit(lb, engine._make_step, B, "eval")
        if include_traces:
            # the /v1/trace diagnostics step always runs at batch rung 1
            lb, _ = engine._assemble(key, [r], pad_to=1)
            emit(lb, engine._make_trace_step, 1, "trace")
    manifest = {
        "format": "dfol_vqa_tpu.serving_set.v1",
        "platforms": list(platforms) if platforms else [jax.default_backend()],
        "transfer_dtype": engine.transfer_dtype,
        "object_num": engine.cfg.tpu.max_object_num,
        "rel_table_size": engine.cfg.tpu.rel_table_size,
        "option_pad_ladder": list(engine.cfg.tpu.option_pad_ladder),
        "seg_ladder": list(engine.seg_ladder),
        "fill_ladder": list(engine.fill_ladder),
        "batch_sizes": list(batch_sizes),
        "n_specs": len(reps),
        "executables": entries,
    }
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def load_serving_set(in_dir: str, engine=None) -> Dict[tuple, object]:
    """Deserialize an exported artifact into the ``executables`` mapping
    ``ServingEngine`` consumes: (BucketSpec, meta) -> jax.export.Exported.

    No model code runs here — only StableHLO deserialization; the engine
    compiles each module lazily on first use (jax.jit(exp.call)).

    Pass the consuming ``engine`` to validate compatibility: a mismatched
    ``object_num`` or batch ladder would otherwise never hit the artifact's
    keys (the 'never traces' host silently compiles everything), and a
    mismatched ``transfer_dtype`` would fail at call time."""
    with open(os.path.join(in_dir, MANIFEST)) as f:
        manifest = json.load(f)
    if manifest.get("format") != "dfol_vqa_tpu.serving_set.v1":
        raise ValueError(f"unrecognized artifact format: {manifest.get('format')}")
    if engine is not None:
        want = {
            "object_num": engine.cfg.tpu.max_object_num,
            "transfer_dtype": engine.transfer_dtype,
            "rel_table_size": engine.cfg.tpu.rel_table_size,
            "option_pad_ladder": list(engine.cfg.tpu.option_pad_ladder),
            "seg_ladder": list(engine.seg_ladder),
            "fill_ladder": list(engine.fill_ladder),
        }
        for k, v in want.items():
            if manifest.get(k) != v:
                raise ValueError(
                    f"artifact/engine mismatch on {k}: artifact has "
                    f"{manifest.get(k)!r}, engine expects {v!r}"
                )
        from dfol_vqa_tpu.compiler.program_compiler import _pad_ladder

        top = _pad_ladder(engine.max_batch, engine.batch_ladder)
        reachable = {b for b in engine.batch_ladder if b <= top}
        missing = reachable - set(manifest["batch_sizes"])
        if missing:
            raise ValueError(
                f"artifact lacks batch rungs {sorted(missing)} that the "
                f"engine's policy can produce (has {manifest['batch_sizes']})"
            )
    out: Dict[tuple, object] = {}
    for e in manifest["executables"]:
        spec = spec_from_json(e["spec"])
        meta = meta_from_json(e["meta"])
        key = (spec, meta)
        if e.get("kind", "eval") == "trace":
            key = (spec, meta, "trace")  # the engine's trace-step cache key
        with open(os.path.join(in_dir, e["file"]), "rb") as f:
            out[key] = jax_export.deserialize(f.read())
    return out
