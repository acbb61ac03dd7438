"""Curriculum workflow integration: cur0-style oracle training, then
cur6-style calibrator-on-frozen-oracle with best-checkpoint initialisation
(README.md curriculum guide; reference -l best workflow)."""

import os

import numpy as np
import pytest
import yaml
import jax

from dfol_vqa_tpu.compiler.h5_codec import ProgramH5Codec
from dfol_vqa_tpu.data.synthetic import generate_questions
from dfol_vqa_tpu.ontology import GQAOntology


def write_split(root, ontology, name, seed):
    codec = ProgramH5Codec(ontology)
    d = root / name
    d.mkdir(exist_ok=True)
    qs = generate_questions(ontology, 16, terminal="exist", length=1, seed=seed)
    for i, q in enumerate(qs):
        q["imageId"] = ontology._images[(seed * 50 + i) % 300]
    codec.write_h5(qs, str(d / f"p_{name}_exist_1.h5"))


def base_cfg(root):
    return {
        "model_name": "cur",
        "train_path": str(root / "train"),
        "validation_path": str(root / "val"),
        "test_path": str(root / "test"),
        "model_path": str(root / "runs"),
        "epoch_num": 1,
        "train_batch_size": 8,
        "test_batch_size": 8,
        "box_features_dim": 32,
        "oracle_input_dim": 16,
        "word_embedding_dim": 12,
        "featurizer_layers_config": [],
        "attribute_network_layers_config": [8],
        "relation_network_layers_config": [8],
        "attention_transfer_state_dim": 6,
        "dropout": 0.0,
        "verbose": False,
        "ckeckpointing_frequency": 1000,
        "tpu": {"max_object_num": 6, "rel_table_size": 4},
    }


@pytest.mark.slow
def test_two_stage_curriculum(tmp_path, ontology):
    from dfol_vqa_tpu.experiments.gqa_experiment import main
    from dfol_vqa_tpu.train import checkpoint as ckpt

    for name, seed in [("train", 0), ("val", 1), ("test", 2)]:
        write_split(tmp_path, ontology, name, seed)

    # ---- curriculum 0: train the oracle from scratch
    cfg0 = dict(base_cfg(tmp_path), version="c0", activate_attention_transfer=False)
    p0 = tmp_path / "c0.yaml"
    p0.write_text(yaml.safe_dump(cfg0))
    main([str(p0), "-s", "0"])
    best0 = tmp_path / "runs" / "cur" / "c0" / "best"
    assert (best0 / "cur.npz").exists()

    # reference curriculum flow: duplicate previous best as the next stage's
    # starting checkpoint (README.md curriculum notes)
    import shutil

    best6 = tmp_path / "runs" / "cur" / "c6" / "best"
    best6.mkdir(parents=True)
    shutil.copy(best0 / "cur.npz", best6 / "cur.npz")

    # ---- curriculum 6: calibrator on top of the frozen oracle, init from best
    cfg6 = dict(
        base_cfg(tmp_path), version="c6",
        activate_attention_transfer=True,
        freeze_featurizer=True, freeze_attribute_network=True,
        freeze_relation_network=True, freeze_embedding_network=True,
        freeze_attention_network=False,
    )
    p6 = tmp_path / "c6.yaml"
    p6.write_text(yaml.safe_dump(cfg6))
    result = main([str(p6), "-s", "0", "-l", "best"])
    assert result["test_error"] is not None

    # frozen oracle weights unchanged from the c0 best checkpoint; calibrator
    # trained (present in the c6 checkpoint, absent from c0's)
    import numpy as _np

    d0 = _np.load(best0 / "cur.npz")
    last6 = tmp_path / "runs" / "cur" / "c6" / "last"
    d6 = _np.load(last6 / "cur.npz")
    _np.testing.assert_array_equal(d0["embedding/w"], d6["embedding/w"])
    assert any(k.startswith("calibrator/") for k in d6.files)
    assert not any(k.startswith("calibrator/") for k in d0.files)
