"""Plumbing tests for scripts/curriculum_run.py (the CURRICULUM artifact
producer): dataset generation + H5 round-trip, stage-dir symlinking, and
artifact assembly. Training itself is covered by test_curriculum.py /
test_learning.py; this pins the orchestration."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts"))

import curriculum_run as cr  # noqa: E402

from dfol_vqa_tpu.data.dataset import ProgramDataset  # noqa: E402
from dfol_vqa_tpu.data.planted import PlantedWorld  # noqa: E402


@pytest.fixture(scope="module")
def world(ontology):
    return PlantedWorld(ontology, box_dim=16, n_nouns=6, n_attrs=6, n_images=96,
                        min_objects=3, max_objects=8, noise=0.1, seed=0,
                        image_id_space="vocab")


def test_write_datasets_roundtrip(tmp_path, ontology, world):
    made = cr.write_datasets(world, ontology, str(tmp_path), scale=0.05)
    # every (split, family, length) cell exists and decodes
    assert len(made) == 4 * len(cr.T4) * 3
    ds = ProgramDataset(made[("test", "compare", 1)], ontology)
    assert len(ds) == int(128 * 0.05)
    q = ds[0]
    assert q["program"]["last_op"]["operator"] == "compare"
    assert q["answer"] in world.nouns
    # train/test scene splits are disjoint
    train_ids = {ProgramDataset(made[("all", "exist", 0)], ontology)[i]["imageId"]
                 for i in range(6)}
    test_ids = {ProgramDataset(made[("test", "exist", 0)], ontology)[i]["imageId"]
                for i in range(6)}
    assert not (train_ids & test_ids)


def test_stage_dir_symlinks(tmp_path, ontology, world):
    made = cr.write_datasets(world, ontology, str(tmp_path), scale=0.05)
    files = [made[("all", f, L)] for f in cr.T1 for L in (0, 1)]
    d = cr.stage_dir(str(tmp_path), "train_cur0", files)
    assert sorted(os.listdir(d)) == sorted(os.path.basename(f) for f in files)
    # idempotent
    assert cr.stage_dir(str(tmp_path), "train_cur0", files) == d


def test_artifact_assembly(tmp_path, world):
    rows = [dict(stage=i, version=f"curriculum_{i}", families=cr.T4,
                 lengths=[0, 1], train_split="all", epochs=2,
                 learning_rate=1e-3, calibrator=i >= 6,
                 test_acc_overall=0.5 + 0.05 * i,
                 test_acc_per_family={}, seconds=1.0) for i in range(8)]

    class A:
        noise, scale, epoch_scale = 0.1, 0.05, 0.1
        out = str(tmp_path)
        json = None

    cr._write_artifact(A, world, rows, 10.0)
    art = json.load(open(tmp_path / "CURRICULUM.json"))
    assert art["trajectory"] == [r["test_acc_overall"] for r in rows]
    assert art["calibrator_gain"] == pytest.approx(
        rows[7]["test_acc_overall"] - rows[5]["test_acc_overall"])
