"""End-to-end learning test on the planted-signal world (CPU-sized)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dfol_vqa_tpu.compiler.program_compiler import ProgramCompiler
from dfol_vqa_tpu.config import Config
from dfol_vqa_tpu.data.dataset import ProgramDataset
from dfol_vqa_tpu.data.loader import BatchLoader
from dfol_vqa_tpu.data.planted import PlantedWorld
from dfol_vqa_tpu.models.interpreter import Interpreter
from dfol_vqa_tpu.ontology import GQAOntology
from dfol_vqa_tpu.train.optim import build_optimizer
from dfol_vqa_tpu.train.trainer import VQATrainer


@pytest.mark.slow  # multi-epoch optimization; quick tier keeps test_pipeline_train's loop checks
def test_learns_planted_concepts_from_answers(ontology):
    cfg = Config(
        box_features_dim=32,
        oracle_input_dim=24,
        word_embedding_dim=16,
        attribute_network_layers_config=[16],
        relation_network_layers_config=[16],
        featurizer_layers_config=[],
        learning_rate=3e-3,
        dropout=0.0,
        weight_decay=0.0,
        verbose=False,
    )
    cfg.tpu.max_object_num = 8
    world = PlantedWorld(ontology, box_dim=32, n_nouns=4, n_attrs=3, n_images=64,
                         min_objects=3, max_objects=8, noise=0.05, seed=0)
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))

    train_qs = world.generate(256, hops=1, seed=1)
    test_qs = world.generate(64, hops=1, seed=2)
    compiler = ProgramCompiler(ontology, object_num=8, rel_slots=2)

    def loader(qs, shuffle):
        return BatchLoader([ProgramDataset(qs, ontology)], compiler, world, 32, 8,
                           shuffle=shuffle, prefetch=0)

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
                params, opt_state, jnp.asarray(batch.objects), jnp.asarray(batch.obj_mask),
                {k: jnp.asarray(v) for k, v in batch.arrays.items()}, rng,
            )
            step += 1
    err = trainer.test_epoch(loader(test_qs, False), params)
    acc = 1.0 - err[0]
    assert acc > 0.75, f"answer-only supervision failed to learn: acc={acc}"
