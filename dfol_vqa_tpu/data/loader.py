"""Batch loader: questions + features -> compiled device batches.

Replaces the reference's DataLoader + collator stack (trainer.py:603-607,
batch_gqa_boxfeatures_pipeline.py): compiles each question batch with the
AOT ProgramCompiler, joins dense padded object features, and prefetches on a
background thread so host IO overlaps device compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, List, Sequence

from dfol_vqa_tpu.compiler.program_compiler import (
    BucketSpec,
    CompiledBatch,
    ProgramCompiler,
    batch_arrays,
    pack_arrays,
    pack_meta,
)
from dfol_vqa_tpu.data.dataset import ProgramDataset, iter_batches
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

    def __len__(self) -> int:
        n = sum(len(d) for d in self._datasets)
        return -(-n // self._batch_size)

    def _produce(self) -> Iterator[LoadedBatch]:
        seed = self._seed + self._epoch
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
