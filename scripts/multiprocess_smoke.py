"""Multi-PROCESS training smoke: 2 JAX processes x 4 CPU devices each.

The reference ships dormant multi-node plumbing that no caller enables
(src/nsvqa/data/data_pipeline.py:793-801, --local_rank with no
init_process_group). This script executes the made-real path end to end:

  * ``jax.distributed.initialize`` with a local coordinator (2 processes),
  * an 8-device global ('data',) mesh spanning both processes,
  * host-sharded loaders (dataset num_shards=process_count,
    shard_index=process_index — each process compiles/collates only its
    shard, the multi-node analog of the reference's DistributedSampler),
  * global batches assembled from per-process shards with
    ``jax.make_array_from_process_local_data``,
  * ONE jitted train step under the mesh: GSPMD inserts the gradient
    all-reduce across processes; every process computes the same loss.

Run (parent): python scripts/multiprocess_smoke.py
Worker internals: python scripts/multiprocess_smoke.py --worker K --port P
"""

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PROC = 2
DEV_PER_PROC = 4
BATCH = 8  # global batch; 4 questions per process shard


def worker(pid: int, port: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={DEV_PER_PROC}"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=N_PROC,
        process_id=pid,
    )
    assert jax.process_count() == N_PROC
    assert len(jax.devices()) == N_PROC * DEV_PER_PROC
    assert len(jax.local_devices()) == DEV_PER_PROC

    import jax.numpy as jnp
    import numpy as np
    import optax

    from dfol_vqa_tpu.compiler.program_compiler import ProgramCompiler
    from dfol_vqa_tpu.config import Config
    from dfol_vqa_tpu.data.dataset import ProgramDataset
    from dfol_vqa_tpu.data.features import SyntheticFeatures
    from dfol_vqa_tpu.data.loader import BatchLoader
    from dfol_vqa_tpu.data.synthetic import generate_questions
    from dfol_vqa_tpu.models.interpreter import Interpreter
    from dfol_vqa_tpu.ontology import GQAOntology
    from dfol_vqa_tpu.parallel.mesh import make_mesh, batch_sharding
    from dfol_vqa_tpu.train.optim import build_optimizer
    from jax.sharding import NamedSharding, PartitionSpec as P

    O = 8
    cfg = Config()
    cfg.tpu.max_object_num = O
    ont = GQAOntology()
    interp = Interpreter(cfg, ont)
    params = interp.init_params(jax.random.PRNGKey(0))  # same seed everywhere

    # host-sharded loader: THIS process compiles only shard `pid` of the
    # deterministic global batch sequence (unique image ids so the scene
    # tensors keep the per-question layout: simplest cross-host assembly)
    qs = generate_questions(ont, BATCH * 4, terminal="exist", length=2, seed=3)
    for i, q in enumerate(qs):
        q["imageId"] = f"mp{i}"
    compiler = ProgramCompiler(ont, object_num=O, rel_slots=cfg.tpu.rel_table_size)
    feats = SyntheticFeatures(box_dim=cfg.box_features_dim, min_objects=4, max_objects=O)
    loader = BatchLoader(
        [ProgramDataset(qs, ont)], compiler, feats, BATCH // N_PROC, O,
        shuffle=False, prefetch=0, num_shards=N_PROC, shard_index=pid,
    )
    batch = next(iter(loader))

    mesh = make_mesh((N_PROC * DEV_PER_PROC,), ("data",))
    data_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def globalize(x):
        """Assemble a global array from per-process shards (axis 0): every
        batch tensor here is per-question (B_local) or per-unique-image
        (U_local) and concatenates across processes in process order."""
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P("data", *([None] * (x.ndim - 1)))), x
        )

    spec = batch.spec
    U_local = batch.objects.shape[0]
    # img_index addresses THIS process's scene rows; after the data-axis
    # concatenation each process's rows sit at offset pid * U_local
    local_arrays = dict(batch.arrays)
    local_arrays["img_index"] = (
        np.asarray(local_arrays["img_index"]) + pid * U_local
    ).astype(np.int32)
    objects = globalize(batch.objects)
    obj_mask = globalize(batch.obj_mask)
    # program tensors: shard every per-question array over data
    arrays = {k: globalize(v) for k, v in local_arrays.items()}
    params = jax.device_put(params, repl)
    tx = build_optimizer(cfg, params)

    with mesh:
        opt_state = jax.device_put(tx.init(params), repl)

        @jax.jit
        def step(params, opt_state, objects, obj_mask, arrays, rng):
            def loss_fn(p):
                out = interp.forward(p, objects, obj_mask, arrays, spec, True, rng)
                return out["loss"] / jnp.maximum(jnp.sum(arrays["question_mask"]), 1.0)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        params, opt_state, loss = step(
            params, opt_state, objects, obj_mask, arrays, jax.random.PRNGKey(0)
        )
        loss = float(loss)

    assert np.isfinite(loss)
    print(f"WORKER {pid} ok: devices={len(jax.devices())} loss={loss:.6f}", flush=True)
    jax.distributed.shutdown()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--port", type=int, default=0)  # 0 = pick a free port
    args = ap.parse_args()
    if args.worker is not None:
        worker(args.worker, args.port)
        return
    if args.port == 0:
        import socket

        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            args.port = s.getsockname()[1]

    t0 = time.time()
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(k),
             "--port", str(args.port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for k in range(N_PROC)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    rcs = [p.returncode for p in procs]
    losses = []
    for k, out in enumerate(outs):
        for line in out.splitlines():
            if line.startswith(f"WORKER {k} ok"):
                losses.append(float(line.rsplit("loss=", 1)[1]))
    ok = all(r == 0 for r in rcs) and len(losses) == N_PROC
    if not ok:
        for k, out in enumerate(outs):
            print(f"--- worker {k} (rc={rcs[k]}) ---\n{out[-3000:]}")
        sys.exit(1)
    assert abs(losses[0] - losses[1]) < 1e-5, losses
    print(
        f"PASS multiprocess smoke: {N_PROC} processes x {DEV_PER_PROC} devices, "
        f"identical global loss {losses[0]:.6f} ({time.time() - t0:.1f}s)"
    )


if __name__ == "__main__":
    main()
