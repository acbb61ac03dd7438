"""Online serving engine: continuous batching for ∇-FOL inference.

The reference only serves predictions *offline* — a dataset-order loop that
writes a JSON file (reference src/nsvqa/train/trainer.py:685-760, the
``predict`` path). Production VQA serving is an online problem: single
requests arrive at arbitrary times, must be answered with bounded latency,
and the accelerator only earns its keep when requests are batched. This
module is the TPU-native online path the reference never had.

Design (all three axes exist to keep the XLA executable set CLOSED under
arbitrary request traffic — compilation is the one unbounded cost on TPU):

* **Grid canonicalization.** One executable exists per ``BucketSpec``, and a
  spec embeds the merged slot grid, so ad-hoc request mixes would mint
  unboundedly many specs. Every compiled group is therefore re-padded onto a
  canonical grid ``SELECT (FILTER^F RELATE)^S FILTER^F`` with ``S``/``F``
  drawn from small ladders. Masked slots are *exact* no-ops: the interpreter
  gates every slot by ``(tok != 0) * op_mask`` (models/interpreter.py
  ``_run_branch``), so canonicalization provably never changes answers
  (tests/test_serving.py pins this bitwise).
* **Option-axis ladder.** Already provided by the compiler's
  ``option_pad_ladder`` (K is padded at compile time).
* **Batch-axis ladder.** Request groups are padded to the next ladder batch
  size by repeating row 0 with ``question_mask = 0``; padding rows are
  decoded and discarded.

Batching policy: requests are compiled + canonicalized individually at
``submit`` time (client-thread work, parallel across frontends) and routed
to a queue keyed by their full canonical ``BucketSpec`` — terminal op,
canonical grid, option rung, relation-table width. A queue flushes when it
reaches ``max_batch`` or its oldest request has waited ``max_delay_ms``
(the standard continuous-batching latency/throughput dial); dispatch then
just CONCATENATES the member batches and pads the row axis to the batch
ladder. Because the queue key IS the spec, the executable set is exactly
``{warmed specs} x {batch rungs}`` — ``warmup()`` precompiles that product
from a representative sample, after which serving mints zero compilations
for any traffic whose signatures were seen (a genuinely novel signature
costs one compile and joins the set; the space is bounded by the
seg/fill/option/batch ladders).

Latency is measured honestly for this environment: a request completes only
when its answer flags have been read back to the host (under the axon
remote-TPU frontend ``block_until_ready`` resolves on enqueue, so device
readback is the only trustworthy barrier — see bench.py methodology note).

Dispatch/readback overlap: the dispatcher thread only ENQUEUES work (jax
dispatch is asynchronous) and hands the blocking readback + future
resolution to a small completion pool, so consecutive groups pipeline
through the device instead of each paying a full host<->device round-trip
of dead time — on a tunneled frontend the difference between RTT-bound
and device-bound throughput.
"""

from __future__ import annotations

import dataclasses
import json
import threading
import time
from collections import OrderedDict
from concurrent import futures
from concurrent.futures import Future
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from dfol_vqa_tpu.compiler.program_compiler import (
    OP_FILTER,
    OP_PAD,
    OP_RELATE,
    OP_SELECT,
    SUPERVISION_OPS,
    BucketSpec,
    CompiledBatch,
    ProgramCompiler,
    _pad_ladder,
    unpack_arrays,
)
from dfol_vqa_tpu.config import Config
from dfol_vqa_tpu.data.device_prefetch import to_device_batch
from dfol_vqa_tpu.data.loader import LoadedBatch
from dfol_vqa_tpu.models.interpreter import Interpreter, decode_answer_flags
from dfol_vqa_tpu.ontology import GQAOntology

# ----------------------------------------------------------- canonical grids


def branch_structure(grid: Sequence[int]) -> Tuple[int, int]:
    """(n_relate_segments, max_fillers_per_segment) of one branch grid.

    Merged grids produced by ``ProgramCompiler._align_grid`` always have the
    shape SELECT (fillers… relate)… fillers…; OP_PAD columns (branch-length
    padding) do not participate."""
    segs, max_fill, cur = 0, 0, 0
    for op in grid:
        if op == OP_FILTER:
            cur += 1
        elif op == OP_RELATE:
            max_fill = max(max_fill, cur)
            cur = 0
            segs += 1
    return segs, max(max_fill, cur)


def canonical_grid(S: int, F: int) -> Tuple[int, ...]:
    g: List[int] = [OP_SELECT]
    for _ in range(S):
        g.extend([OP_FILTER] * F + [OP_RELATE])
    g.extend([OP_FILTER] * F)
    return tuple(g)


def _slot_mapping(grid: Sequence[int], F: int) -> Dict[int, int]:
    """Map each real slot of a merged grid to its position in
    ``canonical_grid(S, F)`` (OP_PAD slots are dropped)."""
    mapping: Dict[int, int] = {}
    seg, fill = 0, 0
    for si, op in enumerate(grid):
        if op == OP_SELECT:
            mapping[si] = 0
        elif op == OP_FILTER:
            mapping[si] = 1 + seg * (F + 1) + fill
            fill += 1
        elif op == OP_RELATE:
            mapping[si] = 1 + seg * (F + 1) + F
            seg += 1
            fill = 0
    return mapping


_GRID_FIELDS = ("op_mask", "arg_tok", "arg_aux", "arg_flag", "rel_idx")


def canonicalize_batch(
    spec: BucketSpec,
    cb: CompiledBatch,
    seg_ladder: Sequence[int] = (0, 1, 2, 3),
    fill_ladder: Sequence[int] = (0, 1, 2, 4),
) -> Tuple[BucketSpec, CompiledBatch]:
    """Re-pad a compiled batch onto the canonical slot grid.

    Exact by construction: inserted slots carry op_mask = 0 / tok = 0 and the
    interpreter blends them away (``upd = (tok != 0) * op_mask``)."""
    if spec.terminal_op in SUPERVISION_OPS:
        return spec, cb  # no branch grid to canonicalize
    S = _pad_ladder(max((branch_structure(g)[0] for g in spec.grid), default=0), seg_ladder)
    F = _pad_ladder(max((branch_structure(g)[1] for g in spec.grid), default=0), fill_ladder)
    G = canonical_grid(S, F)
    if all(g == G for g in spec.grid):
        return spec, cb
    B, nb, _ = cb.op_mask.shape
    L2 = len(G)
    new = {
        f: np.zeros((B, nb, L2), getattr(cb, f).dtype) for f in _GRID_FIELDS
    }
    for b, grid in enumerate(spec.grid):
        for old, pos in _slot_mapping(grid, F).items():
            for f in _GRID_FIELDS:
                new[f][:, b, pos] = getattr(cb, f)[:, b, old]
    spec2 = dataclasses.replace(spec, grid=(G,) * nb)
    cb2 = dataclasses.replace(cb, **new)
    return spec2, cb2


def pad_batch_rows(
    spec: BucketSpec, cb: CompiledBatch, batch_size: int
) -> Tuple[BucketSpec, CompiledBatch]:
    """Pad the question axis to ``batch_size`` by repeating row 0 with
    ``question_mask = 0`` (valid tokens, masked supervision; decode drops
    the rows)."""
    B = spec.batch_size
    pad = batch_size - B
    if pad <= 0:
        return spec, cb
    updates: Dict[str, object] = {}
    for f in dataclasses.fields(CompiledBatch):
        v = getattr(cb, f.name)
        if isinstance(v, np.ndarray):
            updates[f.name] = np.concatenate([v, np.repeat(v[:1], pad, axis=0)], axis=0)
        elif isinstance(v, list) and len(v) == B:
            updates[f.name] = v + [v[0]] * pad
    updates["question_mask"] = np.concatenate(
        [cb.question_mask, np.zeros((pad,), np.float32)]
    )
    return (
        dataclasses.replace(spec, batch_size=batch_size),
        dataclasses.replace(cb, **updates),
    )


def concat_batches(
    spec: BucketSpec, cbs: Sequence[CompiledBatch]
) -> Tuple[BucketSpec, CompiledBatch]:
    """Concatenate same-spec compiled batches along the question axis.

    Every array field of CompiledBatch is (B, ...); host-metadata lists are
    per-question. Exactness: group compilation is row-independent once the
    shape axes (grid/K/R) agree, which the shared spec guarantees."""
    if len(cbs) == 1:
        return dataclasses.replace(spec, batch_size=spec.batch_size), cbs[0]
    B = sum(len(c.question_mask) for c in cbs)
    updates: Dict[str, object] = {}
    for f in dataclasses.fields(CompiledBatch):
        vs = [getattr(c, f.name) for c in cbs]
        if isinstance(vs[0], np.ndarray):
            updates[f.name] = np.concatenate(vs, axis=0)
        elif isinstance(vs[0], list):
            updates[f.name] = [x for v in vs for x in v]
    return (
        dataclasses.replace(spec, batch_size=B),
        dataclasses.replace(cbs[0], **updates),
    )


# ------------------------------------------------------------------- engine


class EngineOverloaded(RuntimeError):
    """Raised by ``submit`` when the pending queue is at ``max_pending``.

    The engine's overload policy is ADMISSION CONTROL, not unbounded
    queueing: once the number of queued (not yet dispatched) requests
    reaches the bound, new arrivals fail fast instead of joining a queue
    whose wait time grows without limit. Under sustained overload the
    latency of *admitted* requests is therefore bounded by roughly
    ``max_pending / throughput`` + one batch service time, and clients get
    an immediate, retryable signal (the HTTP frontend maps this to 429).
    Without a bound, saturated p50 is just queue depth divided by
    throughput — seconds of wait that tell you nothing about the engine
    (the r4 artifact's 4.2 s p50 was exactly this)."""


@dataclass
class ServeResult:
    answers: List[str]  # tie-kept answer strings (find_max_ind semantics)
    latency_ms: float  # arrival -> host readback of this request's flags
    batch_size: int  # padded batch the request rode in
    spec: BucketSpec


class _Request:
    __slots__ = ("question", "objects", "obj_mask", "cb", "future", "t0")

    def __init__(self, question, objects, obj_mask, cb, t0=None):
        self.question = question
        self.objects = objects
        self.obj_mask = obj_mask
        self.cb = cb  # single-question canonicalized CompiledBatch
        self.future: Future = Future()
        # arrival time: callers that do per-request work (featurize, compile,
        # canonicalize) BEFORE constructing the request pass their entry
        # timestamp so latency_ms honestly covers arrival -> readback
        self.t0 = time.perf_counter() if t0 is None else t0


class ServingEngine:
    """Continuous-batching online inference over a warm executable set.

    ``submit`` returns a Future[ServeResult]; a dispatcher thread groups
    requests per terminal op and flushes on size/deadline. ``answer_many``
    is the synchronous convenience wrapper (also the warmup vehicle)."""

    def __init__(
        self,
        cfg: Config,
        ontology: GQAOntology,
        params,
        features=None,
        *,
        max_batch: int = 16,
        max_delay_ms: float = 10.0,
        batch_ladder: Sequence[int] = (1, 2, 4, 8, 16, 32, 64),
        seg_ladder: Sequence[int] = (0, 1, 2, 3),
        fill_ladder: Sequence[int] = (0, 1, 2, 4),
        transfer_dtype: Optional[str] = None,
        mesh=None,
        executables: Optional[Dict[tuple, object]] = None,
        max_inflight: int = 8,
        max_pending: Optional[int] = None,
        plan_cache_size: int = 4096,
        start: bool = True,
    ):
        self.cfg = cfg
        self.interp = Interpreter(cfg, ontology)
        self.compiler = ProgramCompiler(
            ontology,
            object_num=cfg.tpu.max_object_num,
            rel_slots=cfg.tpu.rel_table_size,
            option_pad_ladder=cfg.tpu.option_pad_ladder,
        )
        # multi-chip serving: params spread per param_sharding (replicated,
        # or model-sharded on a model axis); request batches shard their
        # question axis over 'data' while the packed program buffer — whose
        # leading axis is a serialization offset, not a batch axis —
        # replicates (a few KB) and GSPMD shards the unpacked tensors in-jit
        self.mesh = mesh
        self._sharding = None
        if mesh is not None:
            from dfol_vqa_tpu.parallel.mesh import batch_sharding, shard_params
            from jax.sharding import NamedSharding, PartitionSpec

            self.params = shard_params(mesh, params)
            bspec = batch_sharding(mesh)
            repl = NamedSharding(mesh, PartitionSpec())
            self._sharding = lambda x: repl if np.ndim(x) <= 1 else bspec(x)
        else:
            self.params = jax.device_put(params)
        self.features = features
        if int(max_batch) > max(batch_ladder):
            # beyond the top rung _pad_ladder returns the raw group size, so
            # every distinct oversized group would mint a fresh executable —
            # the closed-set invariant would silently break
            raise ValueError(
                f"max_batch={max_batch} exceeds the top batch-ladder rung "
                f"{max(batch_ladder)}; extend batch_ladder instead"
            )
        self.max_batch = int(max_batch)
        self.max_delay_s = float(max_delay_ms) / 1e3
        self.batch_ladder = tuple(batch_ladder)
        self.seg_ladder = tuple(seg_ladder)
        self.fill_ladder = tuple(fill_ladder)
        self.transfer_dtype = transfer_dtype

        self._step_cache: Dict[tuple, object] = {}
        # AOT-exported modules (export.load_serving_set): (spec, meta) ->
        # jax.export.Exported; hit before tracing the interpreter
        self._exported = executables or {}
        # queue key = canonical BucketSpec with batch_size zeroed
        self._pending: Dict[BucketSpec, List[_Request]] = {}
        self._pending_count = 0  # total queued rows, for admission control
        # admission control: None = unbounded (offline/warmup callers);
        # online daemons should set a bound — see EngineOverloaded
        self.max_pending = max_pending
        # plan cache: canonical-question JSON -> (queue key, CompiledBatch).
        # Program compilation + grid canonicalization are pure host Python
        # (~ms on this class of host) and dominate the per-request cost once
        # the executable set is warm; real traffic repeats questions
        # (dashboards, retries, templated clients), so this is the serving
        # analog of a database's query-plan cache. Entries are immutable:
        # every downstream transform (concat/pad) builds fresh arrays.
        self._plan_cache: "OrderedDict[str, Tuple[BucketSpec, CompiledBatch]]" = (
            OrderedDict()
        )
        self._plan_cache_size = int(plan_cache_size)
        self._plan_lock = threading.Lock()
        self._cond = threading.Condition()
        self._stop = False
        self._flush = False
        from collections import deque

        self.stats = {
            "requests": 0,
            "batches": 0,
            "compiled_steps": 0,  # steps traced+compiled from Python
            "aot_steps": 0,  # steps served from deserialized exports
            "padded_rows": 0,
            "plan_hits": 0,  # _prepare served from the plan cache
            "rejected": 0,  # admission-control fast-fails (EngineOverloaded)
            # rolling window; long-running engines must not grow unboundedly
            "latencies_ms": deque(maxlen=100_000),
        }
        # readbacks/future-resolution run here so the dispatcher thread can
        # enqueue the next group while earlier flags are still in flight
        # (dispatch/readback overlap; see _complete)
        from concurrent.futures import ThreadPoolExecutor

        self._stats_lock = threading.Lock()
        self._compile_lock = threading.Lock()  # _step_cache get-or-build
        self._completion = ThreadPoolExecutor(
            max_workers=4, thread_name_prefix="dfol-serve-readback"
        )
        # backpressure: dispatch may run at most this many groups ahead of
        # readback, bounding in-flight device buffers and queued completions
        self._inflight = threading.BoundedSemaphore(int(max_inflight))
        self._thread: Optional[threading.Thread] = None
        if start:
            self._thread = threading.Thread(target=self._dispatch_loop, daemon=True)
            self._thread.start()

    # ------------------------------------------------------------- frontend

    def _prepare(self, question: dict) -> Tuple[BucketSpec, CompiledBatch]:
        """Compile ONE question and canonicalize it onto the grid ladders.

        Returns (queue key, single-row batch). The key is the canonical
        spec with batch_size zeroed — everything XLA shape-specializes on.
        Results are memoized in the plan cache: the whole question dict
        (sort_keys JSON) is the cache key, so two requests share an entry
        only when byte-identical — identical program AND identical metadata
        (imageId, questionId, answers) — which makes reuse trivially exact."""
        ck = json.dumps(question, sort_keys=True, default=str)
        with self._plan_lock:
            hit = self._plan_cache.get(ck)
            if hit is not None:
                self._plan_cache.move_to_end(ck)
                self.stats["plan_hits"] += 1
                return hit
        spec, cb = self.compiler.compile([question])
        spec, cb = canonicalize_batch(spec, cb, self.seg_ladder, self.fill_ladder)
        out = (dataclasses.replace(spec, batch_size=0), cb)
        with self._plan_lock:
            self._plan_cache[ck] = out
            if len(self._plan_cache) > self._plan_cache_size:
                self._plan_cache.popitem(last=False)
        return out

    def submit(self, question: dict, objects=None, obj_mask=None) -> Future:
        """Enqueue one question; resolves to a ServeResult.

        ``objects (O, D+6)`` / ``obj_mask (O,)`` may be omitted when the
        engine owns a FeatureSource — then ``question['imageId']`` is looked
        up (per-request featurization, as an online detector front would).

        Compilation + canonicalization happen HERE, on the caller's thread
        (parallel across frontend threads); the dispatcher only concatenates.
        Latency is measured from THIS entry point, so the per-request
        featurize/compile/canonicalize work is inside latency_ms."""
        t0 = time.perf_counter()
        t = question["program"]["last_op"]["operator"]
        if t in SUPERVISION_OPS:
            raise ValueError(
                f"{t} is a training-supervision terminal, not a servable question"
            )
        if objects is None:
            objs, mask = self.features.batch(
                [question["imageId"]], self.cfg.tpu.max_object_num
            )
            objects, obj_mask = objs[0], mask[0]
        key, cb = self._prepare(question)
        r = _Request(question, np.asarray(objects), np.asarray(obj_mask), cb, t0)
        with self._cond:
            if self._stop:
                raise RuntimeError("engine stopped")
            if (
                self.max_pending is not None
                and self._pending_count >= self.max_pending
            ):
                with self._stats_lock:
                    self.stats["rejected"] += 1
                raise EngineOverloaded(
                    f"{self._pending_count} requests queued >= "
                    f"max_pending={self.max_pending}; retry with backoff"
                )
            self._pending.setdefault(key, []).append(r)
            self._pending_count += 1
            self._cond.notify()
        with self._stats_lock:
            self.stats["requests"] += 1
        return r.future

    def warmup(self, questions: Sequence[dict], batch_sizes=None,
               traces: bool = False, workers: Optional[int] = None) -> dict:
        """Precompile the executable set for a representative sample.

        For every distinct canonical spec in ``questions``, compile + run the
        eval step at every batch-ladder rung that the policy can produce
        (``<= rung(max_batch)``, or an explicit ``batch_sizes``). After this,
        serving mints ZERO compilations for traffic whose signatures appeared
        in the sample (tests/test_serving.py::test_executable_set_closed).

        ``workers`` > 1 compiles the set from a thread pool: XLA compilation
        releases the GIL (and on a remote frontend mostly waits on the
        compile RPC), so independent (spec, batch) executables overlap —
        cold-start drops by ~the pool width on remote backends. Safe because
        ``_eval_step`` serializes jitted-fn creation per key behind
        ``_compile_lock`` and stats are lock-guarded; distinct work items
        compile distinct executables. Default: 8 when more than one work
        item, else serial.

        CHANGELOG (r3): the default switched from serial to this 8-thread
        pool for all callers (http_frontend, bench.py) — cold-start/warmup
        timings from before that change are not comparable."""
        if batch_sizes is None:
            top = _pad_ladder(self.max_batch, self.batch_ladder)
            batch_sizes = [b for b in self.batch_ladder if b <= top]
        reps: Dict[BucketSpec, _Request] = {}
        for q in questions:
            t = q["program"]["last_op"]["operator"]
            if t in SUPERVISION_OPS:
                continue
            key, cb = self._prepare(q)
            if key not in reps:
                objs, mask = self.features.batch(
                    [q["imageId"]], self.cfg.tpu.max_object_num
                )
                reps[key] = _Request(q, objs[0], mask[0], cb)
        work = [(key, r, B) for key, r in reps.items() for B in batch_sizes]
        if traces:  # also pre-compile the /v1/trace diagnostics step
            work += [(key, r, None) for key, r in reps.items()]
        if workers is None:
            workers = 8 if len(work) > 1 else 1
        t0 = time.perf_counter()
        before = self.stats["compiled_steps"] + self.stats["aot_steps"]

        def _one(item):
            key, r, B = item
            if B is None:
                self.trace(r.question, r.objects, r.obj_mask)
            else:
                self._execute(key, [r], pad_to=B)

        if workers <= 1:
            for item in work:
                _one(item)
        else:
            with futures.ThreadPoolExecutor(max_workers=workers) as pool:
                # list() re-raises the first worker exception, if any
                list(pool.map(_one, work))
        return {
            "specs": len(reps),
            "batch_sizes": list(batch_sizes),
            # executables readied, whether traced+compiled or deserialized
            # from the AOT set (aot_steps) and backend-compiled only
            "compiled": self.stats["compiled_steps"]
            + self.stats["aot_steps"] - before,
            "seconds": time.perf_counter() - t0,
            "workers": workers,
        }

    def flush(self):
        """Dispatch everything pending regardless of deadlines."""
        with self._cond:
            self._flush = True
            self._cond.notify()

    def answer_many(self, questions, objects=None, obj_mask=None) -> List[ServeResult]:
        """Synchronous convenience: submit all, flush, wait. Also the warmup
        vehicle — run once over representative questions to pre-compile the
        canonical executable set."""
        futs = [
            self.submit(
                q,
                None if objects is None else objects[i],
                None if obj_mask is None else obj_mask[i],
            )
            for i, q in enumerate(questions)
        ]
        self.flush()
        return [f.result() for f in futs]

    def stop(self):
        with self._cond:
            self._stop = True
            self._flush = True
            self._cond.notify()
        if self._thread is not None:
            self._thread.join()
        self._completion.shutdown(wait=True)  # drain in-flight readbacks

    # ----------------------------------------------------------- dispatcher

    def _ready_groups(self, now: float) -> List[Tuple[BucketSpec, List[_Request]]]:
        """Pop request groups that should dispatch now (caller holds lock)."""
        out: List[Tuple[BucketSpec, List[_Request]]] = []
        for key in list(self._pending):
            q = self._pending[key]
            while len(q) >= self.max_batch:
                out.append((key, q[: self.max_batch]))
                del q[: self.max_batch]
            if q and (self._flush or now - q[0].t0 >= self.max_delay_s):
                out.append((key, q))
                self._pending[key] = []
            if not self._pending[key]:
                del self._pending[key]
        self._pending_count -= sum(len(g) for _, g in out)
        return out

    def _dispatch_loop(self):
        while True:
            with self._cond:
                while True:
                    now = time.perf_counter()
                    groups = self._ready_groups(now)
                    if groups:
                        break
                    if self._stop and not self._pending:
                        return
                    self._flush = False
                    oldest = min(
                        (q[0].t0 for q in self._pending.values() if q), default=None
                    )
                    timeout = (
                        None if oldest is None else max(oldest + self.max_delay_s - now, 0.0)
                    )
                    self._cond.wait(timeout=timeout)
                if not self._pending:
                    self._flush = False
            for key, g in groups:
                self._process(key, g)

    # ------------------------------------------------------------ execution

    def _make_step(self, spec: BucketSpec, meta):
        """The raw (unjitted) eval step — also the export surface."""
        interp = self.interp

        def fn(params, objects, obj_mask, packed):
            arrays = unpack_arrays(packed, meta)
            out = interp.forward(
                params, objects, obj_mask, arrays, spec, False, None
            )
            return out["answer_flags"]

        return fn

    def _eval_step(self, spec: BucketSpec, meta):
        key = (spec, meta)
        # lock: concurrent callers (dispatcher, warmup, HTTP trace threads)
        # must share ONE jitted fn per key or first calls compile twice
        with self._compile_lock:
            fn = self._step_cache.get(key)
            if fn is None:
                exp = self._exported.get(key)
                if exp is not None:
                    fn = jax.jit(exp.call)  # deserialized StableHLO: no tracing
                    stat = "aot_steps"
                else:
                    fn = jax.jit(self._make_step(spec, meta))
                    stat = "compiled_steps"
                with self._stats_lock:
                    self.stats[stat] += 1
                self._step_cache[key] = fn
        return fn

    def _make_trace_step(self, spec: BucketSpec, meta):
        """Raw (unjitted) eval+trace step — also the trace export surface."""
        interp = self.interp

        def fn(params, objects, obj_mask, packed):
            arrays = unpack_arrays(packed, meta)
            out = interp.forward(
                params, objects, obj_mask, arrays, spec, False, None,
                return_trace=True,
            )
            return {"log_probability": out["log_probability"],
                    "answer_flags": out["answer_flags"],
                    "trace": out["trace"]}

        return fn

    def _trace_step(self, spec: BucketSpec, meta):
        """Jitted eval step that also returns the hop-by-hop attention trace
        (diagnostics; cached separately from the serving steps). Consults
        the AOT set first — artifacts exported with include_traces serve
        traces without tracing the model either."""
        key = (spec, meta, "trace")
        with self._compile_lock:
            fn = self._step_cache.get(key)
            if fn is None:
                exp = self._exported.get(key)
                if exp is not None:
                    fn = jax.jit(exp.call)
                    stat = "aot_steps"
                else:
                    fn = jax.jit(self._make_trace_step(spec, meta))
                    stat = "trace_steps"
                with self._stats_lock:
                    self.stats[stat] = self.stats.get(stat, 0) + 1
                self._step_cache[key] = fn
        return fn

    def trace(self, question: dict, objects=None, obj_mask=None) -> dict:
        """Hop-by-hop reasoning trace for ONE question (synchronous).

        The online face of the reference's visualization epoch (reference
        trainer.py:516-596): per-slot object attentions plus the decoded
        answer, as the JSON schema viz.trace_to_dict defines. Runs on the
        caller's thread at batch rung 1 — a diagnostics surface, not the
        batched serving path (its executables are cached separately)."""
        from dfol_vqa_tpu.viz import trace_to_dict

        t = question["program"]["last_op"]["operator"]
        if t in SUPERVISION_OPS:
            raise ValueError(
                f"{t} is a training-supervision terminal, not a servable question"
            )
        if objects is None:
            objs, mask = self.features.batch(
                [question["imageId"]], self.cfg.tpu.max_object_num
            )
            objects, obj_mask = objs[0], mask[0]
        key, cb = self._prepare(question)
        r = _Request(question, np.asarray(objects), np.asarray(obj_mask), cb)
        lb, _ = self._assemble(key, [r], pad_to=1)
        step = self._trace_step(lb.spec, lb.meta)
        _, objs_d, mask_d, packed_d = to_device_batch(
            lb, self.transfer_dtype, sharding=self._sharding
        )
        out = jax.tree.map(
            np.asarray, step(self.params, objs_d, mask_d, packed_d)
        )  # host readback = completion
        entry = trace_to_dict(lb, out, out["trace"])[0]
        entry["answers"] = decode_answer_flags(
            out["answer_flags"], lb.spec, lb.compiled
        )[0]
        return entry

    def _assemble(self, key: BucketSpec, group: List[_Request], pad_to=None):
        """Concat same-spec request rows + pad to the batch ladder.

        Returns (LoadedBatch, pad). Shared by serving, warmup, and AOT
        export (export.py needs the exact device-arg shapes)."""
        spec, cb = concat_batches(
            dataclasses.replace(key, batch_size=len(group)),
            [r.cb for r in group],
        )
        B2 = pad_to if pad_to is not None else _pad_ladder(len(group), self.batch_ladder)
        spec, cb = pad_batch_rows(spec, cb, B2)
        pad = B2 - len(group)
        objects = np.stack([r.objects for r in group] + [group[0].objects] * pad)
        obj_mask = np.stack([r.obj_mask for r in group] + [group[0].obj_mask] * pad)
        return LoadedBatch(spec, cb, objects, obj_mask), pad

    def _dispatch(self, key: BucketSpec, group: List[_Request], pad_to=None):
        """Assemble + enqueue one group; flags stay ON DEVICE.

        Returns (spec, cb, device_flags, pad). jax dispatch is asynchronous
        (and the axon frontend acks on enqueue), so this returns as soon as
        the work is queued — completion is the caller's readback."""
        lb, pad = self._assemble(key, group, pad_to)
        step = self._eval_step(lb.spec, lb.meta)
        _, objs_d, mask_d, packed_d = to_device_batch(
            lb, self.transfer_dtype, sharding=self._sharding
        )
        flags_d = step(self.params, objs_d, mask_d, packed_d)
        return lb.spec, lb.compiled, flags_d, pad

    def _execute(self, key: BucketSpec, group: List[_Request], pad_to=None):
        """Synchronous dispatch + readback (warmup/export path)."""
        spec, cb, flags_d, pad = self._dispatch(key, group, pad_to)
        # host readback IS the completion barrier (axon enqueue semantics)
        return spec, cb, np.asarray(flags_d), pad

    def _complete(self, group, spec, cb, flags_d, pad):
        """Readback + future resolution for one in-flight group.

        Runs on the completion pool so the dispatcher can enqueue the next
        group immediately — otherwise every group pays a full host<->device
        round-trip of dead time between dispatches and throughput under
        load is RTT-bound instead of device-bound."""
        try:
            self._complete_inner(group, spec, cb, flags_d, pad)
        finally:
            self._inflight.release()

    def _complete_inner(self, group, spec, cb, flags_d, pad):
        try:
            flags = np.asarray(flags_d)  # the honest completion barrier
            t_done = time.perf_counter()
            # the decode shared with the offline trainer (padding rows are
            # decoded too and dropped by the group slice)
            decoded = decode_answer_flags(flags, spec, cb)
            with self._stats_lock:
                self.stats["batches"] += 1
                self.stats["padded_rows"] += pad
                for r in group:
                    self.stats["latencies_ms"].append(
                        (t_done - r.t0) * 1e3
                    )
            for i, r in enumerate(group):
                r.future.set_result(
                    ServeResult(
                        answers=decoded[i],
                        latency_ms=(t_done - r.t0) * 1e3,
                        batch_size=spec.batch_size, spec=spec,
                    )
                )
        except BaseException as e:
            for r in group:
                if not r.future.done():
                    r.future.set_exception(e)

    def _process(self, key: BucketSpec, group: List[_Request]):
        # backpressure: block the dispatcher when max_inflight groups have
        # been enqueued but not read back, so intake cannot outrun readback
        self._inflight.acquire()
        submitted = False
        try:
            spec, cb, flags_d, pad = self._dispatch(key, group)
            self._completion.submit(self._complete, group, spec, cb, flags_d, pad)
            submitted = True
        except BaseException as e:  # surface errors to every waiter
            for r in group:
                if not r.future.done():
                    r.future.set_exception(e)
        finally:
            if not submitted:
                self._inflight.release()


# --------------------------------------------------------------- demo build


def build_demo_engine(tiny: bool = False, objects: int = 24,
                      max_batch: int = 32, max_delay_ms: float = 10.0,
                      executables=None, seed: int = 0,
                      batch_ladder: Optional[Sequence[int]] = None,
                      max_pending: Optional[int] = None,
                      seg_ladder: Optional[Sequence[int]] = None,
                      fill_ladder: Optional[Sequence[int]] = None):
    """Demo/bench engine over the planted world.

    THE single construction shared by the HTTP daemon CLI
    (http_frontend.main), scripts/serving_bench.py and
    scripts/export_serving.py, so the benched configuration and the served
    daemon cannot silently diverge. Returns (cfg, ontology, world, engine).
    ``tiny`` = small dims for CPU smokes; otherwise production dims
    (2048-d boxes, 512-d oracle) with bf16 feature transfer."""
    import jax

    from dfol_vqa_tpu.data.planted import PlantedWorld

    if tiny:
        cfg = Config(
            box_features_dim=32, oracle_input_dim=24, word_embedding_dim=16,
            attribute_network_layers_config=[16],
            relation_network_layers_config=[16],
            featurizer_layers_config=[], dropout=0.0, verbose=False,
        )
        cfg.tpu.max_object_num = 8
    else:
        cfg = Config()
        cfg.tpu.max_object_num = objects
    ont = GQAOntology()
    interp = Interpreter(cfg, ont)
    params = interp.init_params(jax.random.PRNGKey(seed))
    world = PlantedWorld(
        ont, box_dim=cfg.box_features_dim, n_nouns=6, n_attrs=4,
        n_images=48, min_objects=4, max_objects=cfg.tpu.max_object_num,
        noise=0.1, seed=seed,
    )
    extra = {} if batch_ladder is None else {"batch_ladder": tuple(batch_ladder)}
    if seg_ladder is not None:
        extra["seg_ladder"] = tuple(seg_ladder)
    if fill_ladder is not None:
        extra["fill_ladder"] = tuple(fill_ladder)
    eng = ServingEngine(
        cfg, ont, params, features=world,
        max_batch=max_batch, max_delay_ms=max_delay_ms,
        transfer_dtype=None if tiny else "bfloat16",
        executables=executables,
        max_pending=max_pending,
        **extra,
    )
    return cfg, ont, world, eng
