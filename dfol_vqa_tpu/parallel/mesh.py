"""Device-mesh parallelism: data + model axes under GSPMD.

The reference's only strategy is single-process multi-GPU DataParallel with
a custom whole-batch scatter (src/nsvqa/nn/interpreter/data_parallel.py:
54-83) plus dormant multi-node plumbing that no caller enables
(data_pipeline.py:793-801; SURVEY.md §2.3). The TPU-native replacement:

  * a ``jax.sharding.Mesh`` with axes ``('data',)`` or ``('data', 'model')``;
  * batch tensors sharded over ``data`` (one jit'd step, XLA inserts the
    gradient psum over ICI — no NCCL/DataParallel analog needed);
  * the wide oracle tensors sharded over ``model``: the vocabulary axis of
    the embedding head / attribute cache and (via propagation) the
    O x O x R relation cache — the "sequence/context parallel" analog for
    this workload, where the O^2 pair dimension is the memory scaler
    (SURVEY.md §5 long-context note);
  * multi-host: `jax.distributed.initialize` + per-host dataset sharding
    (data/dataset.py num_shards/shard_index) make the reference's dead
    multi-node path real.

Everything below uses jit + NamedSharding (GSPMD) rather than shard_map:
the executor's masked einsums partition mechanically, and XLA chooses the
collective schedule.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P



def make_mesh(
    mesh_shape: Optional[Tuple[int, ...]] = None,
    axis_names: Optional[Tuple[str, ...]] = None,
    devices=None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if mesh_shape is None:
        mesh_shape = (n,)
        axis_names = ("data",)
    axis_names = axis_names or ("data", "model")[: len(mesh_shape)]
    arr = np.asarray(devices).reshape(mesh_shape)
    return Mesh(arr, axis_names)


def _has_model_axis(mesh: Mesh) -> bool:
    return "model" in mesh.axis_names and mesh.shape["model"] > 1


def param_sharding(params: Dict[str, Any], mesh: Mesh, fsdp: bool = False) -> Dict[str, Any]:
    """Params replicated, except the embedding head which is vocab-sharded
    over the model axis (tensor-parallel analog for the 2,335-wide head).

    ``fsdp=True`` additionally shards every weight matrix's first divisible
    axis over ``data`` (ZeRO-3 analog): GSPMD all-gathers each leaf just
    before use and reduce-scatters its gradient, so per-device parameter +
    optimizer memory drops by the data-axis size. Small/indivisible leaves
    stay replicated — the memory win is in the wide oracle matrices."""
    repl = NamedSharding(mesh, P())

    def leaf_spec(x) -> NamedSharding:
        if not fsdp or np.ndim(x) == 0:
            return repl
        n_data = mesh.shape.get("data", 1)
        if n_data <= 1:
            return repl
        for axis, dim in enumerate(np.shape(x)):
            if dim % n_data == 0 and dim >= n_data:
                spec = [None] * np.ndim(x)
                spec[axis] = "data"
                return NamedSharding(mesh, P(*spec))
        return repl

    shardings = jax.tree_util.tree_map(leaf_spec, params)
    if _has_model_axis(mesh) and "embedding" in params:
        V = params["embedding"]["b"].shape[0]
        if V % mesh.shape["model"] == 0:  # vocab must divide the model axis
            # combined fsdp x tp: input dim over data, vocab over model
            D = params["embedding"]["w"].shape[0]
            row = "data" if fsdp and D % mesh.shape.get("data", 1) == 0 else None
            shardings["embedding"] = {
                "w": NamedSharding(mesh, P(row, "model")),
                "b": NamedSharding(mesh, P("model")),
            }
    if _has_model_axis(mesh) and "embedding_extra" in params:
        # trainable-interpreter extra channels (E, V, F-1): same vocab split
        V = params["embedding_extra"]["b"].shape[0]
        if V % mesh.shape["model"] == 0:
            D = params["embedding_extra"]["w"].shape[0]
            row = "data" if fsdp and D % mesh.shape.get("data", 1) == 0 else None
            shardings["embedding_extra"] = {
                "w": NamedSharding(mesh, P(row, "model", None)),
                "b": NamedSharding(mesh, P("model", None)),
            }
    return shardings


def batch_sharding(mesh: Mesh):
    """Batch tensors: leading (question) axis over 'data'.

    Tensors whose leading dim does not divide the data-axis size are
    replicated instead — e.g. the unique-image scene tensors, whose leading
    dim is ladder-padded (powers of 2) and may not divide an odd mesh."""
    n_data = mesh.shape.get("data", 1)

    def spec(x):
        dim0 = np.shape(x)[0] if np.ndim(x) else 0
        if np.ndim(x) == 0 or dim0 % n_data != 0:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, P("data", *([None] * (np.ndim(x) - 1))))

    return spec


def shard_batch(mesh: Mesh, *trees):
    sp = batch_sharding(mesh)
    out = tuple(
        jax.tree_util.tree_map(lambda x: jax.device_put(jnp.asarray(x), sp(x)), t)
        for t in trees
    )
    return out if len(out) > 1 else out[0]


def shard_params(mesh: Mesh, params, fsdp: bool = False):
    sh = param_sharding(params, mesh, fsdp=fsdp)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params, sh,
        is_leaf=lambda x: x is None,
    )


def shard_train_step(step_fn, mesh: Mesh):
    """jit a (params, opt_state, objects, obj_mask, arrays, rng) step under
    the mesh; GSPMD partitions compute and inserts ICI collectives."""
    repl = NamedSharding(mesh, P())

    data_spec = batch_sharding(mesh)

    jitted = jax.jit(
        step_fn,
        donate_argnums=(0, 1),
    )

    def wrapped(params, opt_state, objects, obj_mask, arrays, rng):
        objects = jax.device_put(objects, data_spec(objects))
        obj_mask = jax.device_put(obj_mask, data_spec(obj_mask))
        if isinstance(arrays, dict):
            arrays = {k: jax.device_put(v, data_spec(v)) for k, v in arrays.items()}
        else:
            # packed one-buffer transfer form: a flat int32 buffer whose
            # leading axis is NOT the batch axis — replicate it (a few KB)
            # and let GSPMD shard the unpacked program tensors in-jit
            arrays = jax.device_put(arrays, repl)
        return jitted(params, opt_state, objects, obj_mask, arrays, rng)

    return wrapped


def chunk_batch_sharding(mesh: Mesh):
    """Sharding for chunk-stacked batch tensors (leading axis = the lax.scan
    chunk axis, which must NOT shard): the per-step axis (axis 1 — unique
    images / questions) shards over 'data' when divisible, else replicated.

    This is what lets ``tpu.train_chunk > 1`` (fused multi-step dispatch)
    compose with a device mesh instead of silently dropping to per-step
    dispatch: the scan body sees per-step tensors already sharded over
    'data', and GSPMD inserts the same gradient psum it would for the
    unchunked step."""
    n_data = mesh.shape.get("data", 1)

    def spec(x):
        if np.ndim(x) < 2 or np.shape(x)[1] % n_data != 0:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, P(None, "data", *([None] * (np.ndim(x) - 2))))

    return spec


def shard_train_chunk(step_fn, mesh: Mesh, padded: bool = False):
    """jit a fused-chunk (params, opt_state, objects, obj_mask, packed, rng)
    step under the mesh. ``objects``/``obj_mask`` are (chunk, ...) stacks;
    ``packed`` is the flat int32 program buffer stack (chunk, P) — its minor
    axis is a serialization offset, not a batch axis, so it replicates and
    GSPMD shards the unpacked per-step program tensors in-jit by
    propagation from the objects' data-axis sharding. With ``padded`` the
    step additionally takes a replicated ``n_valid`` scalar gating the
    trailing pad steps (trainer._train_step_chunk_padded)."""
    repl = NamedSharding(mesh, P())
    chunk_spec = chunk_batch_sharding(mesh)
    jitted = jax.jit(step_fn, donate_argnums=(0, 1))

    def wrapped(params, opt_state, objects, obj_mask, packed, rng, *rest):
        objects = jax.device_put(jnp.asarray(objects), chunk_spec(objects))
        obj_mask = jax.device_put(jnp.asarray(obj_mask), chunk_spec(obj_mask))
        packed = jax.device_put(jnp.asarray(packed), repl)
        return jitted(params, opt_state, objects, obj_mask, packed, rng, *rest)

    return wrapped
