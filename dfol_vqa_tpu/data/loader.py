"""Batch loader: questions + features -> compiled device batches.

Replaces the reference's DataLoader + collator stack (trainer.py:603-607,
batch_gqa_boxfeatures_pipeline.py): compiles each question batch with the
AOT ProgramCompiler, joins dense padded object features, and prefetches on a
background thread so host IO overlaps device compute.
"""

from __future__ import annotations

import queue
import threading

import numpy as np
from typing import Iterator, List, Sequence

from dfol_vqa_tpu.compiler.program_compiler import (
    BucketSpec,
    CompiledBatch,
    ProgramCompiler,
    batch_arrays,
    pack_arrays,
    pack_meta,
)
from dfol_vqa_tpu.data.dataset import ProgramDataset, iter_batches, iter_index_batches
from dfol_vqa_tpu.data.features import FeatureSource


class LoadedBatch:
    __slots__ = ("spec", "compiled", "objects", "obj_mask", "arrays", "meta", "packed")

    def __init__(self, spec: BucketSpec, compiled: CompiledBatch, objects, obj_mask,
                 img_index=None):
        self.spec = spec
        self.compiled = compiled
        self.objects = objects  # (U_pad, O, D+6) unique-image scenes
        self.obj_mask = obj_mask  # (U_pad, O)
        self.arrays = batch_arrays(compiled)
        if img_index is not None:
            self.arrays["img_index"] = img_index
        # one-buffer transfer form (pack_meta docstring)
        self.meta = pack_meta(self.arrays)
        self.packed = pack_arrays(self.arrays, self.meta)

    @property
    def batch_size(self) -> int:
        return int(self.compiled.question_mask.sum())


class PrecompiledDataset:
    """A file-dataset compiled ONCE into per-question tensor rows.

    Because a file holds one bucket (terminal op and similar length), all its
    questions share a single slot grid: compiling the whole file in one
    ProgramCompiler.compile call yields (N, ...) arrays from which any batch
    is a pure row gather — per-batch host compilation disappears and every
    batch from the file shares one BucketSpec (one XLA program)."""

    def __init__(self, dataset: ProgramDataset, compiler: ProgramCompiler,
                 keep_original: bool = False):
        questions = [dataset[i] for i in range(len(dataset))]
        self.spec_all, self.cb = compiler.compile(questions, keep_original=keep_original)
        self.n = len(questions)

    def gather(self, indices, batch_size: int) -> "tuple":
        import dataclasses

        idx = list(indices)
        n_pad = batch_size - len(idx)
        if n_pad:
            idx = idx + [idx[-1]] * n_pad
        sel = np.asarray(idx)
        cb = self.cb
        fields = {}
        for f in dataclasses.fields(type(cb)):
            v = getattr(cb, f.name)
            if isinstance(v, np.ndarray):
                fields[f.name] = v[sel]
            elif isinstance(v, list) and len(v) == self.n:
                fields[f.name] = [v[i] for i in idx]
            else:
                fields[f.name] = v
        out = type(cb)(**fields)
        if n_pad:
            out.question_mask = out.question_mask.copy()
            out.question_mask[-n_pad:] = 0.0
        spec = dataclasses.replace(self.spec_all, batch_size=batch_size)
        return spec, out


class BatchLoader:
    def __init__(
        self,
        datasets: Sequence[ProgramDataset],
        compiler: ProgramCompiler,
        features: FeatureSource,
        batch_size: int,
        object_num: int,
        *,
        shuffle: bool,
        seed: int = 0,
        num_shards: int = 1,
        shard_index: int = 0,
        prefetch: int = 2,
        keep_original: bool = False,
        precompile: bool = True,
    ):
        self._datasets = datasets
        self._compiler = compiler
        self._features = features
        self._batch_size = batch_size
        self._O = object_num
        self._shuffle = shuffle
        self._seed = seed
        self._num_shards = num_shards
        self._shard_index = shard_index
        self._prefetch = prefetch
        self._keep_original = keep_original
        self._epoch = 0
        # per-epoch choose-option shuffling requires runtime compilation
        self._precompile = precompile and not getattr(compiler, "_shuffle_choose", False)
        self._precompiled = None

    def __len__(self) -> int:
        n = sum(len(d) for d in self._datasets)
        return -(-n // self._batch_size)

    def _get_precompiled(self):
        if self._precompiled is None:
            self._precompiled = [
                PrecompiledDataset(d, self._compiler, self._keep_original)
                for d in self._datasets
            ]
        return self._precompiled

    def _produce(self) -> Iterator[LoadedBatch]:
        seed = self._seed + self._epoch
        if self._precompile:
            pre = self._get_precompiled()
            for di, indices in iter_index_batches(
                self._datasets, self._batch_size, shuffle=self._shuffle, seed=seed,
                num_shards=self._num_shards, shard_index=self._shard_index,
            ):
                spec, cb = pre[di].gather(indices, self._batch_size)
                objects, obj_mask, img_index = self._features.batch_unique(
                    cb.image_ids, self._O
                )
                yield LoadedBatch(spec, cb, objects, obj_mask, img_index)
            return
        for questions, n_pad in iter_batches(
            self._datasets,
            self._batch_size,
            shuffle=self._shuffle,
            seed=seed,
            num_shards=self._num_shards,
            shard_index=self._shard_index,
        ):
            spec, cb = self._compiler.compile(questions, keep_original=self._keep_original)
            if n_pad:
                cb.question_mask[-n_pad:] = 0.0
            objects, obj_mask, img_index = self._features.batch_unique(cb.image_ids, self._O)
            yield LoadedBatch(spec, cb, objects, obj_mask, img_index)

    def __iter__(self) -> Iterator[LoadedBatch]:
        self._epoch += 1
        if self._prefetch <= 0:
            yield from self._produce()
            return
        q: "queue.Queue" = queue.Queue(maxsize=self._prefetch)
        _SENTINEL = object()
        err: List[BaseException] = []

        def worker():
            try:
                for item in self._produce():
                    q.put(item)
            except BaseException as e:  # propagate to consumer
                err.append(e)
            finally:
                q.put(_SENTINEL)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            yield item
        t.join()
        if err:
            raise err[0]
