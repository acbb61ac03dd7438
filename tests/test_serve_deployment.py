"""Deployment rehearsal: the full production loop end-to-end.

train -> checkpoint -> AOT export -> fresh serving host (forbidden to
trace) -> HTTP answers. Pins that the ONLINE path serves the TRAINED
model at the accuracy the offline evaluator measures — i.e. nothing is
lost between the trainer's world and the deployment artifact."""

import json
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfol_vqa_tpu.compiler.program_compiler import ProgramCompiler
from dfol_vqa_tpu.config import Config
from dfol_vqa_tpu.data.dataset import ProgramDataset
from dfol_vqa_tpu.data.loader import BatchLoader
from dfol_vqa_tpu.data.planted import PlantedWorld
from dfol_vqa_tpu.export import export_serving_set, load_serving_set
from dfol_vqa_tpu.http_frontend import ServingHTTPFrontend
from dfol_vqa_tpu.models.interpreter import Interpreter
from dfol_vqa_tpu.serve import ServingEngine
from dfol_vqa_tpu.train import checkpoint
from dfol_vqa_tpu.train.optim import build_optimizer
from dfol_vqa_tpu.train.trainer import VQATrainer

O = 8


@pytest.mark.slow  # full train->export->serve chain; quick tier keeps test_serving.py's engine suites
def test_train_checkpoint_export_serve(ontology, tmp_path, monkeypatch):
    cfg = Config(
        box_features_dim=32, oracle_input_dim=24, word_embedding_dim=16,
        attribute_network_layers_config=[16],
        relation_network_layers_config=[16],
        featurizer_layers_config=[], learning_rate=3e-3,
        dropout=0.0, weight_decay=0.0, verbose=False,
    )
    cfg.tpu.max_object_num = O
    world = PlantedWorld(ontology, box_dim=32, n_nouns=4, n_attrs=3,
                         n_images=64, min_objects=3, max_objects=O,
                         noise=0.05, seed=0)
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))

    train_qs = world.generate(256, hops=1, seed=1)
    test_qs = world.generate(64, hops=1, seed=2)
    compiler = ProgramCompiler(ontology, object_num=O, rel_slots=2)

    def loader(qs, shuffle):
        return BatchLoader([ProgramDataset(qs, ontology)], compiler, world,
                           32, O, shuffle=shuffle, prefetch=0)

    # ---- train (test_learning.py recipe) and measure offline accuracy
    trainer = VQATrainer(cfg, interp)
    trainer._tx = build_optimizer(cfg, params)
    opt_state = trainer._tx.init(params)
    rng = jax.random.PRNGKey(0)
    step = 0
    while step < 240:
        for batch in loader(train_qs, True):
            if step >= 240:
                break
            fn = trainer._train_step(batch.spec)
            params, opt_state, loss, _, rng = fn(
                params, opt_state, jnp.asarray(batch.objects),
                jnp.asarray(batch.obj_mask),
                {k: jnp.asarray(v) for k, v in batch.arrays.items()}, rng,
            )
            step += 1
    offline_acc = 1.0 - trainer.test_epoch(loader(test_qs, False), params)[0]
    assert offline_acc > 0.75

    # ---- checkpoint, then restore into FRESH params (the deployment host
    # starts from init + restore, never from the training process's pytree)
    checkpoint.save(str(tmp_path), "best", params, global_step=step)
    fresh = interp.init_params(jax.random.PRNGKey(99))
    restored, got_step = checkpoint.load(str(tmp_path), "best", fresh)
    assert got_step == step

    # ---- export the AOT artifact from the restored weights
    exporter = ServingEngine(cfg, ontology, restored, features=world,
                             max_batch=8, batch_ladder=(1, 2, 4, 8),
                             start=False)
    export_serving_set(exporter, test_qs, str(tmp_path / "art"),
                       include_traces=True)
    loaded = load_serving_set(str(tmp_path / "art"), engine=exporter)

    # ---- deployment host: restored weights + artifact, tracing forbidden
    eng = ServingEngine(cfg, ontology, restored, features=world,
                        max_batch=8, batch_ladder=(1, 2, 4, 8),
                        max_delay_ms=5.0, executables=loaded)
    monkeypatch.setattr(
        Interpreter, "forward",
        lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("traced on deployment host")),
    )
    front = ServingHTTPFrontend(eng, port=0)
    try:
        body = json.dumps({"questions": test_qs}).encode()
        req = urllib.request.Request(
            f"http://{front.host}:{front.port}/v1/answers", data=body)
        with urllib.request.urlopen(req, timeout=600) as r:
            out = json.loads(r.read())
        served = [res["answers"] for res in out["results"]]
        online_acc = float(np.mean(
            [q["answer"] in a for q, a in zip(test_qs, served)]
        ))
        # the served model IS the trained model: identical accuracy
        assert online_acc == pytest.approx(offline_acc, abs=1e-9)
        assert eng.stats["compiled_steps"] == 0  # zero traces end to end
    finally:
        front.close()
        eng.stop()
