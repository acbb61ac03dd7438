"""Host->device transfer pipelining.

The reference hides host->GPU copies behind DataLoader pin_memory +
non_blocking .cuda() (data_pipeline.py:103-110, trainer.py:145-149). The
TPU-native analog: issue async ``jax.device_put`` for upcoming batches on a
background thread while the chip computes the current one, so steady-state
throughput is max(compute, transfer) instead of their sum. Optionally casts
the (large) object-feature tensor to bfloat16 on the host, halving transfer
bytes; the featurizer matmul consumes bf16 natively on the MXU.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax
import numpy as np

try:
    import ml_dtypes

    _BF16 = ml_dtypes.bfloat16
except ImportError:  # pragma: no cover
    _BF16 = None


def quantize_objects(objects, obj_scale):
    """Per-object-row symmetric int8 quantization of the FEATURE columns.

    Halves feature transfer bytes vs bf16; the interpreter dequantizes
    in-jit with the same scale (shipped via the packed program buffer).
    The 6 trailing geometry columns (image w/h + bbox, pixel scale) are
    zeroed here and restored on-device from the unquantized
    ``arrays["obj_geom"]`` copy — a shared scale across feature and
    geometry columns would flush the O(1) RCNN features to zero."""
    from dfol_vqa_tpu.data.loader import GEOM_DIM

    q = np.round(
        np.clip(
            np.asarray(objects, np.float32) / obj_scale[..., None], -127.0, 127.0
        )
    ).astype(np.int8)
    q[..., -GEOM_DIM:] = 0
    return q


def to_device_batch(batch, transfer_dtype: Optional[str] = None, sharding=None):
    """LoadedBatch -> (batch, objects, obj_mask, packed) on device.

    Program tensors travel as ONE packed buffer (compiler.pack_arrays);
    consumers unpack inside jit via `batch.meta`."""
    obj = batch.objects
    if transfer_dtype == "int8":
        obj = quantize_objects(obj, batch.obj_scale)
    elif transfer_dtype == "bfloat16" and _BF16 is not None:
        obj = obj.astype(_BF16)
    put = (lambda x: jax.device_put(x, sharding(x))) if sharding else jax.device_put
    objects = put(obj)
    obj_mask = put(batch.obj_mask)
    packed = put(batch.packed)
    return batch, objects, obj_mask, packed


def chunk_prefetch(
    loader, chunk: int, size: int = 2, transfer_dtype: Optional[str] = None
) -> Iterator:
    """Group same-bucket batches into chunks of ``chunk`` HOST-side, stack
    them, and ship each chunk as ONE device transfer per tensor.

    On remote-TPU frontends every device_put pays an RPC round-trip
    (~30 ms on this dev tunnel); per-batch transfers made the curriculum
    host-bound at 3 puts x 31 batches per epoch. Stacking on the host turns
    a chunk's 3 x chunk puts into 3. Yields
    ``(batches, objects, obj_mask, packed)`` with device arrays stacked on
    a leading ``len(batches)`` axis — the shape the fused chunk step
    (trainer._train_step_chunk / interpreter.step_packed_many) consumes."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    _SENTINEL = object()
    err = []

    def groups():
        buf = []
        for b in loader:
            if buf and (
                buf[0].spec != b.spec
                or buf[0].meta != b.meta
                or buf[0].objects.shape != b.objects.shape
            ):
                yield buf
                buf = []
            buf.append(b)
            if len(buf) >= chunk:
                yield buf
                buf = []
        if buf:
            yield buf

    def prep(objects, batch):
        if transfer_dtype == "int8":
            return quantize_objects(objects, batch.obj_scale)
        if transfer_dtype == "bfloat16" and _BF16 is not None:
            return objects.astype(_BF16)
        return objects

    def worker():
        try:
            for g in groups():
                objs = np.stack([prep(b.objects, b) for b in g])
                masks = np.stack([b.obj_mask for b in g])
                packs = np.stack([b.packed for b in g])
                q.put((g, jax.device_put(objs), jax.device_put(masks),
                       jax.device_put(packs)))
        except BaseException as e:
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


def device_prefetch(
    loader, size: int = 2, transfer_dtype: Optional[str] = None, sharding=None
) -> Iterator:
    """Wrap a BatchLoader: yields (batch, objects, obj_mask, arrays) with the
    device transfers issued `size` batches ahead on a worker thread."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    _SENTINEL = object()
    err = []

    def worker():
        try:
            for b in loader:
                q.put(to_device_batch(b, transfer_dtype, sharding))
        except BaseException as e:
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
