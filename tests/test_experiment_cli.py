"""End-to-end experiment/CLI tests on a tiny synthetic setup."""

import json
import os

import numpy as np
import pytest
import yaml

from dfol_vqa_tpu.compiler.h5_codec import ProgramH5Codec
from dfol_vqa_tpu.data.synthetic import generate_questions
from dfol_vqa_tpu.ontology import GQAOntology


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    """Write h5 question files + a YAML config pointing at them."""
    root = tmp_path_factory.mktemp("exp")
    ont = GQAOntology()
    codec = ProgramH5Codec(ont)

    for split, seed in [("train", 0), ("val", 1), ("test", 2)]:
        d = root / split
        d.mkdir()
        for term in ["exist", "query_attr"]:
            qs = generate_questions(ont, 12, terminal=term, length=1, seed=seed)
            for i, q in enumerate(qs):
                q["imageId"] = ont._images[(seed * 100 + i) % 500]
            codec.write_h5(qs, str(d / f"p_{split}_{term}.h5"))

    cfg = {
        "model_name": "tiny",
        "version": "t0",
        "train_path": str(root / "train"),
        "validation_path": str(root / "val"),
        "test_path": str(root / "test"),
        "model_path": str(root / "runs"),
        "epoch_num": 1,
        "repetition_num": 1,
        "train_batch_size": 6,
        "test_batch_size": 6,
        "box_features_dim": 32,
        "oracle_input_dim": 16,
        "word_embedding_dim": 12,
        "featurizer_layers_config": [],
        "attribute_network_layers_config": [8],
        "relation_network_layers_config": [8],
        "dropout": 0.0,
        "verbose": False,
        "ckeckpointing_frequency": 1000,
        "tpu": {"max_object_num": 6, "rel_table_size": 4},
    }
    cfg_path = root / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    return root, str(cfg_path)


def test_cli_train_and_test(tiny_setup):
    from dfol_vqa_tpu.experiments.gqa_experiment import main

    root, cfg_path = tiny_setup
    result = main([cfg_path, "-s", "1"])
    assert result["test_error"] is not None
    assert np.isfinite(result["test_error"]).all()
    ckpt = root / "runs" / "tiny" / "t0" / "last" / "tiny.npz"
    assert ckpt.exists()


def test_cli_test_only_with_load(tiny_setup):
    from dfol_vqa_tpu.experiments.gqa_experiment import main

    root, cfg_path = tiny_setup
    result = main([cfg_path, "-t", "-l", "last", "-s", "1"])
    assert result["train_loss"] is None
    assert result["test_error"] is not None


def test_cli_predict(tiny_setup):
    from dfol_vqa_tpu.experiments.gqa_experiment import main

    root, cfg_path = tiny_setup
    main([cfg_path, "-t", "-l", "last", "-p"])
    pred_dir = root / "runs" / "predictions" / "tiny" / "t0"
    files = list(pred_dir.glob("prediction_*.json"))
    assert files
    data = json.loads(files[0].read_text())
    assert len(data) == 24
    assert "questionId" in data[0] and "prediction" in data[0]


def test_visualize_trace_export(tiny_setup, tmp_path, ontology, monkeypatch):
    from dfol_vqa_tpu.experiments.experiment import GQAObjectBoxExperiment
    from dfol_vqa_tpu.config import Config
    from dfol_vqa_tpu.viz import visualize_loop
    from dfol_vqa_tpu.models.interpreter import Interpreter
    from dfol_vqa_tpu.train.trainer import VQATrainer
    import jax

    root, cfg_path = tiny_setup
    cfg = Config.from_yaml(cfg_path)
    exp = GQAObjectBoxExperiment()
    import logging

    logger = logging.getLogger("viz-test")
    ont = exp.build_ontology(cfg, logger)
    interp = Interpreter(cfg, ont)
    params = interp.init_params(jax.random.PRNGKey(0))
    trainer = VQATrainer(cfg, interp, logger)
    features = exp.build_features(cfg, logger)
    loader = exp.build_loader(cfg, cfg.test_path, ont, features, 4, shuffle=False)
    monkeypatch.chdir(tmp_path)
    traces = visualize_loop(trainer, interp, loader, params, None, None,
                            out_dir=str(tmp_path / "viz"))
    assert (tmp_path / "viz" / "traces.json").exists()
    assert len(traces) == 24
    assert "hops" in traces[0] and "log_probability" in traces[0]


def test_profiling_utils(tmp_path):
    from dfol_vqa_tpu.utils.profiling import StepTimer, annotate

    t = StepTimer(warmup=1)
    for _ in range(4):
        with t:
            with annotate("noop"):
                pass
    assert t.steps == 3
    assert np.isfinite(t.mean()) and np.isfinite(t.median())


def test_run_accepts_config_dict(tiny_setup):
    """base_experiment.py:43-44: configs may be passed programmatically."""
    import yaml
    from dfol_vqa_tpu.experiments.experiment import GQAObjectBoxExperiment

    root, cfg_path = tiny_setup
    cfg = yaml.safe_load(open(cfg_path))
    cfg["version"] = "t_dict"
    cfg["epoch_num"] = 1
    result = GQAObjectBoxExperiment().run(cfg, is_training=False, seed=0)
    assert result["test_error"] is not None
    # per-op buckets populated for both terminal families in the test dir
    from dfol_vqa_tpu.train.trainer import OP_INDEX

    err = result["test_error"]
    assert np.isfinite(err[OP_INDEX["exist"]])
    assert np.isfinite(err[OP_INDEX["query_attr"]])


def test_profile_trace_smoke(tmp_path):
    import jax
    from dfol_vqa_tpu.utils.profiling import profile_trace

    with profile_trace(str(tmp_path / "prof")):
        jax.block_until_ready(jax.numpy.ones((8, 8)) @ jax.numpy.ones((8, 8)))
    assert any((tmp_path / "prof").rglob("*"))


def test_visualize_image_render_uses_unique_image_rows(tmp_path, ontology):
    """Image overlays must look up bboxes via img_index: scenes are stored
    per UNIQUE image after dedup, so question-index addressing is wrong."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import jax

    from dfol_vqa_tpu.data.synthetic import generate_questions
    from dfol_vqa_tpu.models.interpreter import Interpreter
    from dfol_vqa_tpu.train.trainer import VQATrainer
    from dfol_vqa_tpu.viz import visualize_loop
    from tests.test_pipeline_train import make_loader, tiny_cfg

    cfg = tiny_cfg(dropout=0.0)
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    qs = generate_questions(ontology, 4, terminal="exist", length=1, seed=7)
    for q in qs:  # two questions per image -> dedup leaves U < B
        q["imageId"] = f"img{int(q['imageId'].lstrip('i')) // 2 if q['imageId'][1:].isdigit() else 0}"
    qs[1]["imageId"] = qs[0]["imageId"]
    qs[3]["imageId"] = qs[2]["imageId"]
    loader = make_loader(ontology, cfg, qs, batch_size=4, shuffle=False)
    trainer = VQATrainer(cfg, interp)
    imgs = tmp_path / "images"
    imgs.mkdir()
    for q in qs:
        fig = plt.figure(figsize=(1, 1))
        plt.imshow(np.zeros((8, 8, 3)))
        fig.savefig(imgs / f"{q['imageId']}.jpg")
        plt.close(fig)
    out = tmp_path / "viz"
    traces = visualize_loop(trainer, interp, loader, params, str(imgs), None,
                            out_dir=str(out))
    assert len(traces) == 4
    assert len(list(out.glob("*.png"))) == 4


@pytest.mark.slow
def test_cli_train_on_config_declared_mesh(tiny_setup, tmp_path):
    """End-to-end training driven by a YAML-declared (4,2) mesh with FSDP:
    the experiment builds the mesh, shards params, and trains + tests."""
    import yaml as _yaml

    from dfol_vqa_tpu.experiments.gqa_experiment import main

    root, cfg_path = tiny_setup
    with open(cfg_path) as f:
        cfg = _yaml.safe_load(f)
    cfg["model_name"] = "tiny_mesh"
    cfg["tpu"].update({"mesh_shape": [4, 2], "mesh_axes": ["data", "model"],
                       "fsdp": True})
    mesh_cfg = tmp_path / "cfg_mesh.yaml"
    mesh_cfg.write_text(_yaml.safe_dump(cfg))
    result = main([str(mesh_cfg), "-s", "1"])
    assert result["test_error"] is not None
    assert np.isfinite(result["test_error"]).all()
    assert (root / "runs" / "tiny_mesh" / "t0" / "last" / "tiny_mesh.npz").exists()
