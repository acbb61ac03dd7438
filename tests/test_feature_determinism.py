"""Cross-process determinism for every FeatureSource (VERDICT r3 weak #3).

Builtin ``hash()`` is PYTHONHASHSEED-randomized across interpreters; any
feature source seeded with it produces different scenes in spawn workers,
subprocess-per-stage curriculum runs, and re-runs. All sources must emit
byte-identical scenes across interpreters with different hash seeds.
SyntheticFeatures had exactly this bug until r4 (features.py:134 used
``hash((seed, image_id))``); PlantedWorld was fixed in r2 (planted.py crc32).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SYNTH_SNIPPET = """
import sys, zlib
sys.path.insert(0, {repo!r})
from dfol_vqa_tpu.data.features import SyntheticFeatures
src = SyntheticFeatures(box_dim=32, min_objects=3, max_objects=7, seed=5)
feats, n = src.image("img_123")
print(zlib.crc32(feats.tobytes()), n)
"""

_PLANTED_SNIPPET = """
import sys, zlib
sys.path.insert(0, {repo!r})
from dfol_vqa_tpu.ontology import GQAOntology
from dfol_vqa_tpu.data.planted import PlantedWorld
w = PlantedWorld(GQAOntology(), box_dim=16, n_nouns=4, n_attrs=4, n_images=4,
                 min_objects=3, max_objects=5, noise=0.3, seed=5)
feats, n = w.image(w.image_ids[1])
print(zlib.crc32(feats.tobytes()), n)
"""

_H5_SNIPPET = """
import sys, zlib
sys.path.insert(0, {repo!r})
from dfol_vqa_tpu.data.features import GQAHdf5Features
src = GQAHdf5Features({h5dir!r}, "gqa_objects", 2, {info!r})
feats, n = src.image("7")
print(zlib.crc32(feats.tobytes()), n)
"""


def _run_twice(snippet: str) -> list:
    outs = []
    for hash_seed in ("1", "31337"):
        env = dict(os.environ, PYTHONHASHSEED=hash_seed)
        r = subprocess.run(
            [sys.executable, "-c", snippet],
            capture_output=True, text=True, env=env, check=True,
        )
        outs.append(r.stdout.strip().splitlines()[-1])
    return outs


@pytest.mark.slow
@pytest.mark.parametrize("snippet", [_SYNTH_SNIPPET, _PLANTED_SNIPPET],
                         ids=["synthetic", "planted"])
def test_generated_sources_cross_process(snippet):
    outs = _run_twice(snippet.format(repo=REPO))
    assert outs[0] == outs[1]


@pytest.mark.slow
def test_hdf5_source_cross_process(tmp_path):
    h5py = pytest.importorskip("h5py")
    rng = np.random.default_rng(0)
    for chunk in range(2):
        with h5py.File(tmp_path / f"gqa_objects_{chunk}.h5", "w") as f:
            f.create_dataset("features", data=rng.standard_normal((3, 5, 8)).astype("f4"))
            f.create_dataset("bboxes", data=rng.uniform(0, 100, (3, 5, 4)).astype("f4"))
    info = {"7": {"file": 1, "idx": 2, "objectsNum": 4, "width": 640, "height": 480}}
    info_path = tmp_path / "gqa_objects_info.json"
    info_path.write_text(json.dumps(info))
    outs = _run_twice(
        _H5_SNIPPET.format(repo=REPO, h5dir=str(tmp_path), info=str(info_path))
    )
    assert outs[0] == outs[1]


def test_synthetic_distinct_across_seeds():
    from dfol_vqa_tpu.data.features import SyntheticFeatures

    a = SyntheticFeatures(box_dim=32, seed=1).image("img_9")[0]
    b = SyntheticFeatures(box_dim=32, seed=2).image("img_9")[0]
    assert not np.array_equal(a, b)
