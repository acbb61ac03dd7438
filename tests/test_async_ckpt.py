"""Async checkpoint writes (tpu.async_save, VERDICT r2 item 9)."""

import os
import time

import numpy as np
import jax

from dfol_vqa_tpu.train import checkpoint as ckpt


def _params(scale=1.0):
    rng = np.random.default_rng(0)
    return {
        "a": {"w": rng.standard_normal((256, 256)).astype(np.float32) * scale},
        "b": [rng.standard_normal(64).astype(np.float32) * scale],
    }


def test_async_save_produces_valid_file(tmp_path):
    p = _params()
    ckpt.save(str(tmp_path), "m", p, global_step=7, async_write=True)
    ckpt.wait_pending()
    restored, step = ckpt.load(str(tmp_path), "m", _params(scale=0.0))
    assert step == 7
    np.testing.assert_array_equal(restored["a"]["w"], p["a"]["w"])


def test_async_saves_serialize_last_wins(tmp_path):
    """Successive async saves to the same path must not interleave; the
    last submitted snapshot is what ends up on disk."""
    for i in range(5):
        ckpt.save(str(tmp_path), "m", _params(scale=float(i)), global_step=i,
                  async_write=True)
    ckpt.wait_pending()
    restored, step = ckpt.load(str(tmp_path), "m", _params(scale=0.0))
    assert step == 4
    np.testing.assert_array_equal(restored["a"]["w"], _params(scale=4.0)["a"]["w"])


def test_async_save_snapshot_is_immediate(tmp_path):
    """The device->host snapshot happens before save() returns (donation
    safety): mutating the params afterwards must not affect the file."""
    p = _params()
    ckpt.save(str(tmp_path), "m", p, global_step=1, async_write=True)
    expect = p["a"]["w"].copy()
    p["a"]["w"][:] = -1.0  # simulate the donated buffer being reused
    ckpt.wait_pending()
    restored, _ = ckpt.load(str(tmp_path), "m", _params(scale=0.0))
    np.testing.assert_array_equal(restored["a"]["w"], expect)


def test_wait_pending_raises_write_failure(tmp_path):
    p = _params()
    bad = str(tmp_path / "dir_as_file")
    ckpt.save(str(tmp_path), "m", p, async_write=True)
    ckpt.wait_pending()
    # target path unwritable: final rename collides with a directory
    os.makedirs(os.path.join(str(tmp_path), "m2.npz"))
    ckpt.save(str(tmp_path), "m2", p, async_write=True)
    import pytest

    with pytest.raises(Exception):
        ckpt.wait_pending()


def test_trainer_async_save_stall_removed(ontology, tmp_path):
    """The train-loop-visible cost of an async save is the host snapshot
    only; measure both modes at a production-shaped param size and record
    the stall ratio (informational; asserts only a sane ordering)."""
    from dfol_vqa_tpu.config import Config
    from dfol_vqa_tpu.train.trainer import VQATrainer

    rng = np.random.default_rng(1)
    big = {"w": rng.standard_normal((2048, 512)).astype(np.float32),
           "emb": rng.standard_normal((2432, 300)).astype(np.float32)}

    cfg = Config()
    cfg.tpu.async_save = False
    t_sync = VQATrainer(cfg, interpreter=None)
    t0 = time.perf_counter()
    t_sync._save(str(tmp_path / "sync"), big)
    sync_s = time.perf_counter() - t0

    cfg2 = Config()
    cfg2.tpu.async_save = True
    t_async = VQATrainer(cfg2, interpreter=None)
    t0 = time.perf_counter()
    t_async._save(str(tmp_path / "async"), big)
    async_s = time.perf_counter() - t0
    ckpt.wait_pending()

    # both files valid
    for d in ("sync", "async"):
        restored, _ = ckpt.load(str(tmp_path / d), "model",
                                {"w": np.zeros_like(big["w"]),
                                 "emb": np.zeros_like(big["emb"])})
        np.testing.assert_array_equal(restored["w"], big["w"])
    print(f"save stall: sync={sync_s*1e3:.1f}ms async={async_s*1e3:.1f}ms")
    # async path must not be materially slower; the absolute floor absorbs
    # scheduler jitter on a loaded 1-core host (both legs are ~10ms, so a
    # single preemption can flip a pure ratio assertion)
    assert async_s <= max(sync_s * 1.5, 0.25)
