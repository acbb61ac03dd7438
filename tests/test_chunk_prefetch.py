"""chunk_prefetch grouping semantics (round 3).

The trainer/eval loops ship same-bucket batches as ONE stacked transfer per
tensor (device_prefetch.chunk_prefetch) because per-batch device_puts pay an
RPC each on tunneled frontends. These tests pin the grouping rules: chunks
never mix specs/metas/shapes, the tail flushes, and the stacked device
arrays are exactly np.stack of the per-batch tensors.
"""

import numpy as np
import pytest

from dfol_vqa_tpu.data.device_prefetch import chunk_prefetch, quantize_objects


class FakeBatch:
    def __init__(self, spec, meta, objects, seed):
        rng = np.random.default_rng(seed)
        self.spec = spec
        self.meta = meta
        self.objects = objects
        self.obj_mask = rng.random((objects.shape[0], objects.shape[1])).astype(np.float32)
        self.packed = rng.random(17).astype(np.float32)
        self.obj_scale = np.maximum(
            np.max(np.abs(objects[..., :-6]), axis=-1) / 127.0, 1e-12
        ).astype(np.float32)


def _mk(spec="s0", meta="m0", shape=(3, 4, 10), seed=0):
    rng = np.random.default_rng(100 + seed)
    return FakeBatch(spec, meta, rng.standard_normal(shape).astype(np.float32), seed)


def test_groups_by_chunk_with_tail_flush():
    batches = [_mk(seed=i) for i in range(5)]
    got = list(chunk_prefetch(iter(batches), chunk=2))
    assert [len(g) for g, *_ in got] == [2, 2, 1]
    # stacked device tensors == np.stack of the originals, order preserved
    flat = [b for g, *_ in got for b in g]
    assert flat == batches
    for g, objs, masks, packs in got:
        np.testing.assert_array_equal(
            np.asarray(objs), np.stack([b.objects for b in g]))
        np.testing.assert_array_equal(
            np.asarray(masks), np.stack([b.obj_mask for b in g]))
        np.testing.assert_array_equal(
            np.asarray(packs), np.stack([b.packed for b in g]))


@pytest.mark.parametrize("field", ["spec", "meta", "shape"])
def test_boundary_forces_flush(field):
    if field == "spec":
        batches = [_mk(seed=0), _mk(seed=1), _mk(spec="s1", seed=2), _mk(spec="s1", seed=3)]
    elif field == "meta":
        batches = [_mk(seed=0), _mk(seed=1), _mk(meta="m1", seed=2), _mk(meta="m1", seed=3)]
    else:
        batches = [_mk(seed=0), _mk(seed=1), _mk(shape=(2, 4, 10), seed=2),
                   _mk(shape=(2, 4, 10), seed=3)]
    got = list(chunk_prefetch(iter(batches), chunk=4))
    assert [len(g) for g, *_ in got] == [2, 2]
    # a chunk is homogeneous: one jit signature per dispatch
    for g, *_ in got:
        assert len({(b.spec, b.meta, b.objects.shape) for b in g}) == 1


def test_chunk_one_degenerates_to_per_batch():
    batches = [_mk(seed=i) for i in range(3)]
    got = list(chunk_prefetch(iter(batches), chunk=1))
    assert [len(g) for g, *_ in got] == [1, 1, 1]
    for (g, objs, _m, _p), b in zip(got, batches):
        np.testing.assert_array_equal(np.asarray(objs)[0], b.objects)


def test_int8_transfer_quantizes_per_batch():
    batches = [_mk(seed=i) for i in range(2)]
    ((g, objs, _m, _p),) = list(chunk_prefetch(iter(batches), chunk=2,
                                               transfer_dtype="int8"))
    assert np.asarray(objs).dtype == np.int8
    np.testing.assert_array_equal(
        np.asarray(objs),
        np.stack([quantize_objects(b.objects, b.obj_scale) for b in batches]))


def test_producer_error_propagates():
    def gen():
        yield _mk(seed=0)
        raise ValueError("boom")

    with pytest.raises(ValueError, match="boom"):
        list(chunk_prefetch(gen(), chunk=4))
