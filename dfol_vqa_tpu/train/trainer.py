"""Training/evaluation/prediction loops.

TPU-native VQATrainer (reference: src/nsvqa/train/trainer.py:22-770). The
per-batch work — forward, loss, backward, clip, Adam step — is ONE donated
jit function per bucket signature; the Python loop only moves host data and
bookkeeping. Capabilities mirrored from upstream:

  * per-question-type losses (trainer.py:181-262) — computed inside the
    executor (models/interpreter.py), summed and normalised by true batch
    size here (trainer.py:429-442);
  * 17-bucket per-terminal-op error accounting (trainer.py:64-86,477-485);
  * step-frequency checkpointing of best/last with best selection by
    err[metric_index] on validation (trainer.py:404-423), last-checkpoint
    save on crash via try/finally (trainer.py:638-651);
  * prediction JSON export incl. GQA submission mode (trainer.py:320-339);
  * hard/easy example mining (trainer.py:33-45,301-316);
  * losses.npy / errors.npy dumps (trainer.py:674-678).
"""

from __future__ import annotations

import json
import logging
import os
import time
from collections import OrderedDict
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dfol_vqa_tpu.compiler.program_compiler import BucketSpec
from dfol_vqa_tpu.config import Config
from dfol_vqa_tpu.data.loader import BatchLoader, LoadedBatch
from dfol_vqa_tpu.models.interpreter import Interpreter, question_type_of
from dfol_vqa_tpu.train import checkpoint as ckpt
from dfol_vqa_tpu.train.optim import build_optimizer
from dfol_vqa_tpu.types import QuestionType

# per-terminal-op metric buckets (reference trainer.py:64-83)
OP_INDEX = OrderedDict(
    [
        ("query_attr", 1), ("choose_attr", 2), ("verify_attrs", 3), ("choose_rel", 4),
        ("verify_rel", 5), ("exist", 6), ("and", 7), ("or", 8), ("all_same", 9),
        ("all_different", 10), ("two_same", 11), ("two_different", 12), ("compare", 13),
        ("object_attr", 14), ("object_rel", 15), ("scene", 16),
    ]
)
ERROR_DIM = len(OP_INDEX) + 1


class VQATrainer:
    def __init__(
        self,
        cfg: Config,
        interpreter: Interpreter,
        logger: Optional[logging.Logger] = None,
        hardset_path: Optional[str] = None,
        mesh=None,
    ):
        self.cfg = cfg
        self.interp = interpreter
        self.logger = logger or logging.getLogger("dfol_vqa_tpu")
        self.global_step = 0
        self._train_cache: Dict[Any, Any] = {}
        self._eval_cache: Dict[Any, Any] = {}
        self._tx = None
        self._mesh = mesh
        self._hardset_path = hardset_path
        self._hardset: Optional[dict] = None
        self._easyset: Optional[dict] = None
        self._best_error = np.inf

    # --------------------------------------------------------------- step fns

    def _train_step(self, spec: BucketSpec, meta=None):
        key = (spec, meta)
        if key in self._train_cache:
            return self._train_cache[key]
        interp = self.interp

        def step(params, opt_state, objects, obj_mask, arrays, rng):
            if meta is not None:
                from dfol_vqa_tpu.compiler.program_compiler import unpack_arrays

                arrays = unpack_arrays(arrays, meta)
            # derive this step's key and the next carry INSIDE jit: a host-side
            # split would cost an extra device round-trip per step
            rng, sub = jax.random.split(rng)

            def loss_fn(p):
                out = interp.forward(p, objects, obj_mask, arrays, spec, True, sub)
                n = jnp.maximum(jnp.sum(arrays["question_mask"]), 1.0)
                return out["loss"] / n, out

            (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = self._tx.update(grads, opt_state, params)
            import optax

            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, out["match"], rng

        fn = jax.jit(step, donate_argnums=(0, 1))
        if self._mesh is not None:
            from dfol_vqa_tpu.parallel.mesh import shard_train_step

            fn = shard_train_step(step, self._mesh)
        self._train_cache[key] = fn
        return fn

    def _train_step_chunk(self, spec: BucketSpec, meta, k: int):
        """k same-bucket training steps in ONE dispatch via lax.scan
        (cfg.tpu.train_chunk); carries (params, opt_state, rng)."""
        key = (spec, meta, k, "chunk")
        if key in self._train_cache:
            return self._train_cache[key]
        interp = self.interp

        def step(params, opt_state, objects, obj_mask, packed, rng):
            from dfol_vqa_tpu.compiler.program_compiler import unpack_arrays
            import optax

            def body(carry, xs):
                params, opt_state, rng = carry
                o, m, p = xs
                arrays = unpack_arrays(p, meta)
                rng, sub = jax.random.split(rng)

                def loss_fn(pp):
                    out = interp.forward(pp, o, m, arrays, spec, True, sub)
                    n = jnp.maximum(jnp.sum(arrays["question_mask"]), 1.0)
                    return out["loss"] / n, out

                (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
                updates, opt_state = self._tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state, rng), (loss, out["match"])

            (params, opt_state, rng), (losses, matches) = jax.lax.scan(
                body, (params, opt_state, rng), (objects, obj_mask, packed)
            )
            return params, opt_state, losses, matches, rng

        if self._mesh is not None:
            # chunked dispatch composes with the mesh: the chunk (scan) axis
            # stays unsharded, the per-step batch axes shard over 'data'
            from dfol_vqa_tpu.parallel.mesh import shard_train_chunk

            fn = shard_train_chunk(step, self._mesh)
        else:
            fn = jax.jit(step, donate_argnums=(0, 1))
        self._train_cache[key] = fn
        return fn

    def _train_step_chunk_padded(self, spec: BucketSpec, meta, k: int):
        """Like :meth:`_train_step_chunk`, but steps at index >= ``n_valid``
        are update-gated no-ops, so partial chunks padded up to ``k`` (by
        duplicating the tail batch) all share THIS ONE executable. Without
        gating, every distinct tail length is a fresh XLA compile signature
        — the dominant source of cold-run compiles in mixed-family epochs
        (bucket runs are mostly 1-3 batches long under proportional-random
        sampling). Gating cost: one select per param/opt leaf per step —
        the same order as the Adam update itself."""
        key = (spec, meta, k, "chunk_padded")
        if key in self._train_cache:
            return self._train_cache[key]
        interp = self.interp

        def step(params, opt_state, objects, obj_mask, packed, rng, n_valid):
            from dfol_vqa_tpu.compiler.program_compiler import unpack_arrays
            import optax

            def body(carry, xs):
                params, opt_state, rng = carry
                o, m, p, idx = xs
                valid = idx < n_valid
                arrays = unpack_arrays(p, meta)
                rng_next, sub = jax.random.split(rng)

                def loss_fn(pp):
                    out = interp.forward(pp, o, m, arrays, spec, True, sub)
                    n = jnp.maximum(jnp.sum(arrays["question_mask"]), 1.0)
                    return out["loss"] / n, out

                (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
                updates, new_opt = self._tx.update(grads, opt_state, params)
                new_params = optax.apply_updates(params, updates)
                sel = lambda a, b: jnp.where(valid, a, b)
                params = jax.tree_util.tree_map(sel, new_params, params)
                opt_state = jax.tree_util.tree_map(sel, new_opt, opt_state)
                rng = jnp.where(valid, rng_next, rng)
                return (params, opt_state, rng), (loss, out["match"])

            (params, opt_state, rng), (losses, matches) = jax.lax.scan(
                body, (params, opt_state, rng),
                (objects, obj_mask, packed, jnp.arange(k, dtype=jnp.int32)),
            )
            return params, opt_state, losses, matches, rng

        if self._mesh is not None:
            from dfol_vqa_tpu.parallel.mesh import shard_train_chunk

            fn = shard_train_chunk(step, self._mesh, padded=True)
        else:
            fn = jax.jit(step, donate_argnums=(0, 1))
        self._train_cache[key] = fn
        return fn

    @staticmethod
    def _pad_chunk(arr, k: int):
        """Pad a (g, ...) chunk stack up to (k, ...) by repeating the last
        element (device-side — padded steps never reach the host)."""
        g = arr.shape[0]
        if g >= k:
            return arr
        return jnp.concatenate(
            [arr, jnp.broadcast_to(arr[-1], (k - g,) + arr.shape[1:])], axis=0
        )

    def _eval_step(self, spec: BucketSpec, meta=None):
        key = (spec, meta)
        if key in self._eval_cache:
            return self._eval_cache[key]
        interp = self.interp

        @jax.jit
        def step(params, objects, obj_mask, arrays):
            if meta is not None:
                from dfol_vqa_tpu.compiler.program_compiler import unpack_arrays

                arrays = unpack_arrays(arrays, meta)
            out = interp.forward(params, objects, obj_mask, arrays, spec, False, None)
            return out

        self._eval_cache[key] = step
        return step

    # ------------------------------------------------------------- utilities

    def _prepare_output_metric_dict(self, error: np.ndarray) -> dict:
        return dict(zip(["over_all"] + list(OP_INDEX.keys()), error.flatten().tolist()))

    def decode_answers(self, out, batch: LoadedBatch) -> List[List[str]]:
        """Device answer flags -> answer-string lists (ties kept, in option
        order). Delegates to the decode shared with the serving engine."""
        from dfol_vqa_tpu.models.interpreter import decode_answer_flags

        return decode_answer_flags(out["answer_flags"], batch.spec, batch.compiled)

    # ------------------------------------------------------------------ train

    def train(
        self,
        train_loader: BatchLoader,
        validation_loader: Optional[BatchLoader],
        params,
        *,
        metric_index: int = 0,
        last_export_path_base: Optional[str] = None,
        best_export_path_base: Optional[str] = None,
        seed: int = 0,
        load_model: Optional[str] = None,
        reset_step: bool = False,
    ):
        cfg = self.cfg
        self._tx = build_optimizer(cfg, params)
        opt_state = self._tx.init(params)
        rng = jax.random.PRNGKey(seed)

        errors = np.zeros((ERROR_DIM, cfg.epoch_num, cfg.repetition_num), np.float32)
        losses = np.zeros((cfg.epoch_num, cfg.repetition_num), np.float32)
        self._best_error = np.inf

        for rep in range(cfg.repetition_num):
            # per-repetition checkpoint reload (trainer.py:625-633); drain
            # async writes first so the reload sees a complete file
            ckpt.wait_pending()
            if load_model == "best" and best_export_path_base:
                try:
                    params = self.load(best_export_path_base, params)
                except FileNotFoundError:
                    pass
            elif load_model == "last" and last_export_path_base:
                try:
                    params = self.load(last_export_path_base, params)
                except FileNotFoundError:
                    pass
            if reset_step:
                self.global_step = 0
            # Host snapshot for the crash-save path: the jitted train step
            # donates the params buffers (donate_argnums), so if a step
            # raises after dispatch, `params` can reference invalidated
            # device memory and the finally-block save would itself fail.
            # Taken once per repetition, then refreshed for free from the
            # device_get each epoch-end save performs anyway (a per-epoch
            # tree_map(np.asarray, ...) costs one RPC per leaf on tunneled
            # frontends).
            crash_backup = jax.tree_util.tree_map(np.asarray, params)
            for epoch in range(cfg.epoch_num):
                start = time.time()
                try:
                    from dfol_vqa_tpu.data.device_prefetch import chunk_prefetch

                    # per-step losses stay on device; synced once per epoch
                    # (a per-step host fetch would serialize the pipeline)
                    loss_acc: List = []
                    total_n = 0
                    # chunked dispatch composes with the mesh (r3): the chunk
                    # axis is never sharded (parallel/mesh.py shard_train_chunk)
                    chunk = max(1, cfg.tpu.train_chunk)

                    next_ckpt = self.global_step + cfg.checkpointing_frequency

                    def maybe_checkpoint():
                        """Mid-epoch validate+save every checkpointing_frequency
                        steps (reference trainer.py:404-423) — evaluated only at
                        dispatch boundaries so fused chunks stay intact (a
                        mid-chunk flush would silently break the scan fusion
                        the fast training path depends on)."""
                        nonlocal params, next_ckpt, crash_backup
                        if validation_loader is None or self.global_step < next_ckpt:
                            return
                        next_ckpt = self.global_step + cfg.checkpointing_frequency
                        err = self.test_epoch(validation_loader, params)
                        # one device_get serves crash backup + both saves
                        crash_backup = jax.device_get(params)
                        if last_export_path_base:
                            self._save(last_export_path_base, crash_backup)
                        if best_export_path_base and err[metric_index] <= self._best_error:
                            self._best_error = err[metric_index]
                            self._save(best_export_path_base, crash_backup)
                        if cfg.verbose:
                            self.logger.info(
                                "Checkpointing: Step %d, Best Err %.5f: error=%s",
                                self.global_step, self._best_error,
                                self._prepare_output_metric_dict(err),
                            )

                    # chunks stack HOST-side and ship as one transfer per
                    # tensor (device_prefetch.chunk_prefetch): on tunneled
                    # frontends per-batch device_puts pay an RPC each and
                    # dominated curriculum wall-clock
                    for group, objs, masks, packs in chunk_prefetch(
                        train_loader, chunk, size=2
                    ):
                        if len(group) == 1:
                            batch = group[0]
                            fn = self._train_step(batch.spec, batch.meta)
                            params, opt_state, loss, match, rng = fn(
                                params, opt_state, objs[0], masks[0], packs[0], rng
                            )
                            loss_acc.append((loss, batch.batch_size))
                            total_n += batch.batch_size
                            self.global_step += 1
                        else:
                            b0 = group[0]
                            if cfg.tpu.pad_chunks:
                                # tail chunks pad to the full length and share
                                # the full chunk's executable (n_valid-gated)
                                fn = self._train_step_chunk_padded(
                                    b0.spec, b0.meta, chunk
                                )
                                params, opt_state, losses_d, matches_d, rng = fn(
                                    params, opt_state,
                                    self._pad_chunk(objs, chunk),
                                    self._pad_chunk(masks, chunk),
                                    self._pad_chunk(packs, chunk),
                                    rng, np.int32(len(group)),
                                )
                            else:
                                fn = self._train_step_chunk(
                                    b0.spec, b0.meta, len(group)
                                )
                                params, opt_state, losses_d, matches_d, rng = fn(
                                    params, opt_state, objs, masks, packs, rng
                                )
                            for i, batch in enumerate(group):
                                loss_acc.append((losses_d[i], batch.batch_size))
                                total_n += batch.batch_size
                                self.global_step += 1
                        maybe_checkpoint()
                    if loss_acc:
                        # ONE readback for the epoch's per-step losses
                        ls = np.asarray(jnp.stack([jnp.asarray(l) for l, _ in loss_acc]))
                        ns = np.asarray([n for _, n in loss_acc], np.float64)
                        losses[epoch, rep] = float(ls @ ns) / max(total_n, 1)
                    if validation_loader is not None:
                        errors[:, epoch, rep] = self.test_epoch(validation_loader, params)
                finally:
                    if last_export_path_base:
                        try:
                            # crash path must leave a complete file behind:
                            # drain async writes, then save synchronously
                            ckpt.wait_pending()
                            host_p = jax.device_get(params)
                            self._save(last_export_path_base, host_p, sync=True)
                            # valid start-of-next-epoch state: refresh the
                            # crash backup for free from this snapshot
                            crash_backup = host_p
                        except Exception:
                            # params referenced donated (invalidated) buffers;
                            # fall back to the last known-valid host snapshot
                            self._save(last_export_path_base, crash_backup, sync=True)
                # best selection is only meaningful when validation ran —
                # otherwise errors[] is identically zero and the first epoch
                # would pin _best_error to 0.0 forever
                if (
                    validation_loader is not None
                    and best_export_path_base
                    and errors[metric_index, epoch, rep] < self._best_error
                ):
                    self._best_error = errors[metric_index, epoch, rep]
                    self._save(best_export_path_base, params)
                if cfg.verbose:
                    self.logger.info(
                        "Rep %d, Epoch %d: Step %d, Best Err %.5f: error=%s, loss=%.5f (%.1fs)",
                        rep + 1, epoch + 1, self.global_step, self._best_error,
                        self._prepare_output_metric_dict(errors[:, epoch, rep]),
                        losses[epoch, rep], time.time() - start,
                    )

        ckpt.wait_pending()  # all async checkpoint writes durable before return
        if best_export_path_base:
            base = os.path.relpath(best_export_path_base)
            np.save(os.path.join(base, "losses"), losses, allow_pickle=False)
            np.save(os.path.join(base, "errors"), errors, allow_pickle=False)
        return params, errors, losses

    # ------------------------------------------------------------------- test

    def _eval_chunked(self, loader: BatchLoader, params):
        """Iterate eval batches, fusing runs of same-bucket batches into one
        scan dispatch (`tpu.eval_chunk`, interpreter.step_packed_many) —
        the eval analog of chunked training: per-batch dispatch pays an RPC
        round-trip per batch on remote frontends (reference trainer.py:
        685-720 looped per batch; fine on local CUDA, not over a tunnel).

        Yields (batch, out_dict) with device-array values (host sync is the
        caller's choice)."""
        from dfol_vqa_tpu.data.device_prefetch import chunk_prefetch

        chunk = max(1, self.cfg.tpu.eval_chunk)
        results: List = []
        for group, objs, masks, packs in chunk_prefetch(loader, chunk, size=2):
            if len(group) == 1:
                batch = group[0]
                out = self._eval_step(batch.spec, batch.meta)(
                    params, objs[0], masks[0], packs[0]
                )
                results.append((batch, out))
            else:
                b0 = group[0]
                if self.cfg.tpu.pad_chunks and len(group) < chunk:
                    # partial eval chunks pad to the full length (eval is
                    # stateless — padded outputs are simply dropped below),
                    # sharing the full chunk's executable per bucket spec
                    objs = self._pad_chunk(objs, chunk)
                    masks = self._pad_chunk(masks, chunk)
                    packs = self._pad_chunk(packs, chunk)
                fn = self.interp.step_packed_many(b0.spec, b0.meta, False)
                out = fn(params, objs, masks, packs)
                for i, batch in enumerate(group):
                    results.append((batch, {k: v[i] for k, v in out.items()}))
        return results

    def test_epoch(self, loader: BatchLoader, params) -> np.ndarray:
        """One evaluation pass with 17-bucket error accounting.

        Same-bucket batches are fused into chunked scan dispatches
        (tpu.eval_chunk) and device outputs are synced once at the end
        (unless hardset mining needs per-batch answers), so eval throughput
        isn't bounded by per-batch host round-trips."""
        error = np.zeros(ERROR_DIM, np.float32)
        total = np.zeros(ERROR_DIM, np.float32)
        # pin params on device once: host pytrees would otherwise re-transfer
        # on every jit call (a per-batch RPC on remote TPU frontends)
        params = jax.device_put(params)

        pending = []
        for batch, out in self._eval_chunked(loader, params):
            if self._hardset is not None:
                match = np.asarray(out["match"]) * batch.compiled.question_mask
                self._mine_hardset(batch, match)
                pending.append((batch, match))
            else:
                pending.append((batch, out["match"]))
        for batch, match in pending:
            qm = batch.compiled.question_mask
            match = np.asarray(match) * qm
            n = qm.sum()
            err = float(n - match.sum())
            # terminals without a dedicated bucket (e.g. 'end', which the
            # compiler synthesizes for select/filter/relate-terminal files)
            # count toward over_all only
            op_i = OP_INDEX.get(batch.spec.terminal_op)
            error[0] += err
            total[0] += n
            if op_i is not None:
                error[op_i] += err
                total[op_i] += n
        # per-bucket question counts: consumers (curriculum reporting) use
        # this to distinguish a true 0-error bucket from an EMPTY bucket,
        # which would otherwise render as a fake perfect accuracy
        self.last_test_counts = total.copy()
        with np.errstate(invalid="ignore", divide="ignore"):
            return np.where(total > 0, error / np.maximum(total, 1), 0.0)

    def test(self, loader: BatchLoader, params, import_path_base: Optional[str] = None):
        if import_path_base is not None:
            params, self.global_step = ckpt.load(import_path_base, self.cfg.model_name, params)
        if self._hardset_path is not None:
            self._hardset, self._easyset = {}, {}
        start = time.time()
        error = self.test_epoch(loader, params)
        duration = time.time() - start
        if self._hardset_path is not None:
            self._dump_hardsets()
        if self.cfg.verbose:
            self.logger.info("error=%s", self._prepare_output_metric_dict(error))
            self.logger.info("Time spent: %s seconds", duration)
        return error, duration

    # ---------------------------------------------------------------- predict

    def predict(
        self,
        loader: BatchLoader,
        params,
        out_file,
        import_path_base: Optional[str] = None,
        is_submission: bool = False,
    ):
        if import_path_base is not None:
            params, self.global_step = ckpt.load(import_path_base, self.cfg.model_name, params)
        params = jax.device_put(params)
        predictions: List[dict] = []
        for batch, out in self._eval_chunked(loader, params):
            answers = self.decode_answers(out, batch)
            qtype = question_type_of(batch.spec.terminal_op)
            qm = batch.compiled.question_mask
            for qi, qid in enumerate(batch.compiled.question_ids):
                if qm[qi] == 0:
                    continue
                ans = answers[qi]
                if is_submission:
                    predictions.append(
                        {"questionId": qid, "prediction": ans[0] if ans else ""}
                    )
                elif qtype == QuestionType.QUERY:
                    predictions.append(
                        {
                            "questionId": qid,
                            "prediction": ans,
                            "type": "open" if batch.spec.terminal_op == "query_attr" else "binary",
                            "options": batch.compiled.option_strings[qi],
                        }
                    )
                else:
                    predictions.append(
                        {
                            "questionId": qid,
                            "prediction": ans[0] if ans else "",
                            "type": "binary",
                        }
                    )
        json.dump(predictions, out_file)
        return predictions

    # ---------------------------------------------------------------- hardset

    def _mine_hardset(self, batch: LoadedBatch, match: np.ndarray):
        if batch.compiled.original is None:
            return
        os.makedirs(os.path.join(self._hardset_path, "hard"), exist_ok=True)
        os.makedirs(os.path.join(self._hardset_path, "easy"), exist_ok=True)
        op = batch.spec.terminal_op
        hard_f = os.path.join(self._hardset_path, "hard", f"hard_{op}.json")
        easy_f = os.path.join(self._hardset_path, "easy", f"easy_{op}.json")
        with open(hard_f, "a") as hf, open(easy_f, "a") as ef:
            for qi, q in enumerate(batch.compiled.original):
                if batch.compiled.question_mask[qi] == 0:
                    continue
                qid = batch.compiled.question_ids[qi]
                if match[qi] >= 1.0:
                    ef.write(json.dumps(q) + "\n")
                    self._easyset[qid] = q
                else:
                    hf.write(json.dumps(q) + "\n")
                    self._hardset[qid] = q

    def _dump_hardsets(self):
        with open(os.path.join(self._hardset_path, "hard.json"), "w") as f:
            json.dump(self._hardset, f)
        with open(os.path.join(self._hardset_path, "easy.json"), "w") as f:
            json.dump(self._easyset, f)

    # ------------------------------------------------------------ checkpoints

    def _save(self, export_path_base: str, params, sync: bool = False):
        ckpt.save(export_path_base, self.cfg.model_name, params, self.global_step,
                  backend=self.cfg.tpu.checkpoint_backend,
                  async_write=self.cfg.tpu.async_save and not sync)

    def load(self, import_path_base: str, params):
        params, self.global_step = ckpt.load(import_path_base, self.cfg.model_name, params)
        return params
