"""bfloat16 compute-dtype numerics: forward agreement with fp32 and
training stability (TODO.md 'bf16 end-to-end numerics study').

``tpu.compute_dtype`` casts the MXU matmul inputs (oracle attribute head,
relation-network first layer, Pallas kernel) to bf16 while accumulating in
fp32 (``preferred_element_type``), the standard TPU recipe. Parameters,
logic-space values and the optimizer stay fp32.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dfol_vqa_tpu.data.synthetic import generate_questions
from dfol_vqa_tpu.models.interpreter import Interpreter
from dfol_vqa_tpu.train.trainer import VQATrainer
from dfol_vqa_tpu.train.optim import build_optimizer

from tests.test_pipeline_train import make_loader, tiny_cfg


@pytest.mark.parametrize("terminal", ["exist", "query_attr"])
def test_bf16_forward_close_to_fp32(ontology, terminal):
    cfg32 = tiny_cfg(dropout=0.0)
    cfg16 = tiny_cfg(dropout=0.0)
    cfg16.tpu.compute_dtype = "bfloat16"
    i32 = Interpreter(cfg32, ontology)
    i16 = Interpreter(cfg16, ontology)
    params = i32.init_params(jax.random.PRNGKey(0))
    qs = generate_questions(ontology, 8, terminal=terminal, length=2, seed=3)
    loader = make_loader(ontology, cfg32, qs, batch_size=8, shuffle=False)
    batch = next(iter(loader))
    arrays = {k: jnp.asarray(v) for k, v in batch.arrays.items()}
    obj, mask = jnp.asarray(batch.objects), jnp.asarray(batch.obj_mask)
    out32 = i32.forward(params, obj, mask, arrays, batch.spec, False, None)
    out16 = i16.forward(params, obj, mask, arrays, batch.spec, False, None)
    p32 = np.exp(np.asarray(out32["log_probability"], np.float64))
    p16 = np.exp(np.asarray(out16["log_probability"], np.float64))
    # bf16 has ~3 decimal digits; probabilities should agree to a few %
    np.testing.assert_allclose(p16, p32, atol=0.06)
    assert np.isfinite(float(out16["loss"]))


def test_bf16_training_reduces_loss(ontology):
    cfg = tiny_cfg(learning_rate=0.01, dropout=0.0)
    cfg.tpu.compute_dtype = "bfloat16"
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    qs = generate_questions(ontology, 8, terminal="exist", length=1, seed=5)
    loader = make_loader(ontology, cfg, qs, batch_size=8, shuffle=False)
    trainer = VQATrainer(cfg, interp)
    trainer._tx = build_optimizer(cfg, params)
    opt_state = trainer._tx.init(params)
    batch = next(iter(loader))
    arrays = {k: jnp.asarray(v) for k, v in batch.arrays.items()}
    fn = trainer._train_step(batch.spec)
    losses = []
    for i in range(30):
        params, opt_state, loss, _, _rng = fn(
            params, opt_state, jnp.asarray(batch.objects), jnp.asarray(batch.obj_mask),
            arrays, jax.random.PRNGKey(i),
        )
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses[:3] + losses[-3:]
    # params stay fp32: compute_dtype only affects matmul inputs
    for leaf in jax.tree_util.tree_leaves(params):
        assert leaf.dtype == jnp.float32


def test_int8_feature_transfer_matches_f32(ontology):
    """int8-quantized feature transfer (per-object scale, dequant in-jit via
    the packed obj_scale) must preserve answers and stay within ~1% in
    probability of the f32 path."""
    import jax

    from dfol_vqa_tpu.data.device_prefetch import quantize_objects

    cfg = tiny_cfg(dropout=0.0)
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    qs = generate_questions(ontology, 8, terminal="exist", length=2, seed=9)
    loader = make_loader(ontology, cfg, qs, batch_size=8, shuffle=False)
    batch = next(iter(loader))
    mask = jnp.asarray(batch.obj_mask)
    packed = jnp.asarray(batch.packed)
    step = interp.step_packed(batch.spec, batch.meta, is_training=False)

    out32 = step(params, jnp.asarray(batch.objects), mask, packed, None)
    q8 = quantize_objects(batch.objects, batch.obj_scale)
    assert q8.dtype == np.int8
    out8 = step(params, jnp.asarray(q8), mask, packed, None)

    p32 = np.exp(np.asarray(out32["log_probability"]))
    p8 = np.exp(np.asarray(out8["log_probability"]))
    np.testing.assert_allclose(p8, p32, atol=0.02)
    assert np.array_equal(p32 > 0.5, p8 > 0.5)

    # the dequantized FEATURE columns must reconstruct to within half a
    # quantization step — synthetic scenes mix O(1) RCNN features with
    # pixel-scale geometry (~640), so a shared row scale would flush the
    # features to zero (round-1 advisor finding); the scale must therefore
    # be feature-only and geometry must travel exactly
    deq = q8.astype(np.float32) * batch.obj_scale[..., None]
    feats = np.asarray(batch.objects, np.float32)[..., :-6]
    feat_err = np.abs(deq[..., :-6] - feats)
    assert feat_err.max() <= 0.5 * batch.obj_scale.max() + 1e-6
    # relative fidelity: quant step is tiny vs the feature range
    assert batch.obj_scale.max() < 0.1 * np.abs(feats).max()
    np.testing.assert_array_equal(
        batch.arrays["obj_geom"], np.asarray(batch.objects, np.float32)[..., -6:]
    )


@pytest.mark.slow  # trains first; quick tier keeps the untrained int8-transfer + auto-cache-dtype tests
def test_int8_transfer_with_trained_weights_on_planted_features(ontology):
    """Round-1 advisor follow-through: the answer-losslessness of the int8
    transfer path must hold with TRAINED weights on concept-bearing features
    (randomly-initialised params cannot detect feature destruction). Train
    on the planted world until the oracle carries real signal, then compare
    int8 vs f32 transfer on held-out scenes."""
    from dfol_vqa_tpu.compiler.program_compiler import ProgramCompiler
    from dfol_vqa_tpu.data.dataset import ProgramDataset
    from dfol_vqa_tpu.data.device_prefetch import quantize_objects
    from dfol_vqa_tpu.data.loader import BatchLoader
    from dfol_vqa_tpu.data.planted import PlantedWorld

    cfg = tiny_cfg(dropout=0.0, learning_rate=3e-3, weight_decay=0.0,
                   oracle_input_dim=24, word_embedding_dim=16,
                   attribute_network_layers_config=[16],
                   relation_network_layers_config=[16])
    cfg.tpu.max_object_num = 8
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    world = PlantedWorld(ontology, box_dim=cfg.box_features_dim, n_nouns=6,
                         n_attrs=6, n_images=192, min_objects=3, max_objects=8,
                         noise=0.05, seed=0)
    compiler = ProgramCompiler(ontology, object_num=8, rel_slots=4)

    def loader(qs, shuffle):
        return BatchLoader([ProgramDataset(qs, ontology)], compiler, world, 32,
                           8, shuffle=shuffle, prefetch=0)

    trainer = VQATrainer(cfg, interp)
    trainer._tx = build_optimizer(cfg, params)
    opt_state = trainer._tx.init(params)
    train_qs = world.generate_family("exist", 256, length=0, seed=2,
                                     image_slice=(0.0, 0.8))
    rng = jax.random.PRNGKey(0)
    step = 0
    while step < 600:
        for batch in loader(train_qs, True):
            if step >= 600:
                break
            fn = trainer._train_step(batch.spec)
            params, opt_state, _, _, rng = fn(
                params, opt_state, jnp.asarray(batch.objects),
                jnp.asarray(batch.obj_mask),
                {k: jnp.asarray(v) for k, v in batch.arrays.items()}, rng)
            step += 1

    test_qs = world.generate_family("exist", 64, length=0, seed=3,
                                    image_slice=(0.8, 1.0))
    agree = prob_delta = 0.0
    n = matches = 0
    for batch in loader(test_qs, False):
        stepf = interp.step_packed(batch.spec, batch.meta, is_training=False)
        mask, packed = jnp.asarray(batch.obj_mask), jnp.asarray(batch.packed)
        out32 = stepf(params, jnp.asarray(batch.objects), mask, packed, None)
        q8 = quantize_objects(batch.objects, batch.obj_scale)
        out8 = stepf(params, jnp.asarray(q8), mask, packed, None)
        p32 = np.exp(np.asarray(out32["log_probability"], np.float64))
        p8 = np.exp(np.asarray(out8["log_probability"], np.float64))
        prob_delta = max(prob_delta, float(np.abs(p32 - p8).max()))
        agree += float(np.sum((p32 > 0.5) == (p8 > 0.5)))
        matches += float(np.sum(np.asarray(out32["match"])))
        n += p32.shape[0]
    assert matches / n > 0.7, f"model failed to train (acc={matches/n})"
    assert agree == n, f"int8 flipped {n - agree}/{n} trained-model answers"
    assert prob_delta < 0.03, f"int8 prob delta {prob_delta} too large"


@pytest.mark.slow
def test_bf16_cache_answers_agree_with_f32(ontology):
    """tpu.cache_dtype='bfloat16' stores the (U, V+1, O) attribute and
    (B, R, O, O) relation caches in bf16 (halving the eval step's dominant
    HBM traffic, BENCH r3 mfu_ladder); all fuzzy-logic arithmetic upcasts at
    the gathers. Unlike rel_stream_dtype this rounds the stored values, so
    answer-losslessness is pinned empirically: a fuzz sweep over every
    terminal family must produce IDENTICAL answer flags, and log-probs must
    agree to bf16 resolution."""
    ALL_TERMINALS = [
        "exist", "verify_attrs", "verify_rel", "query_attr", "choose_attr",
        "choose_rel", "and", "or", "all_same", "all_different", "two_same",
        "two_different", "compare",
    ]

    cfg32 = tiny_cfg(dropout=0.0)
    cfg16 = tiny_cfg(dropout=0.0)
    cfg16.tpu.cache_dtype = "bfloat16"
    i32 = Interpreter(cfg32, ontology)
    i16 = Interpreter(cfg16, ontology)
    params = i32.init_params(jax.random.PRNGKey(1))

    total = flips = 0
    for terminal in ALL_TERMINALS:
        for length in (1, 2):
            qs = generate_questions(ontology, 24, terminal=terminal,
                                    length=length, seed=11,
                                    neg_prob=0.15, wildcard_prob=0.1)
            loader = make_loader(ontology, cfg32, qs, batch_size=12, shuffle=False)
            for batch in loader:
                arrays = {k: jnp.asarray(v) for k, v in batch.arrays.items()}
                obj, mask = jnp.asarray(batch.objects), jnp.asarray(batch.obj_mask)
                out32 = i32.forward(params, obj, mask, arrays, batch.spec, False, None)
                out16 = i16.forward(params, obj, mask, arrays, batch.spec, False, None)
                f32 = np.asarray(out32["answer_flags"])
                f16 = np.asarray(out16["answer_flags"])
                qm = np.asarray(batch.compiled.question_mask, bool)
                flips += int(np.sum(f32[qm] != f16[qm]))
                total += int(qm.sum())
                np.testing.assert_allclose(
                    np.exp(np.asarray(out32["log_probability"], np.float64)),
                    np.exp(np.asarray(out16["log_probability"], np.float64)),
                    atol=0.02,
                )
    assert total > 500
    assert flips == 0, f"{flips}/{total} answer flags flipped under bf16 caches"


def test_auto_cache_dtype_resolution_and_exactness(ontology):
    """tpu.cache_dtype='auto' (VERDICT r4 item 6) resolves per batch from
    the measured table — fp32 below the bandwidth-saturating batch, bf16 at
    or above it — and a small-batch auto run is BITWISE the fp32 run."""
    cfg = tiny_cfg(dropout=0.0)
    cfg.tpu.cache_dtype = "auto"
    assert cfg.tpu.resolve_cache_dtype(32) == "float32"
    assert cfg.tpu.resolve_cache_dtype(255) == "float32"
    assert cfg.tpu.resolve_cache_dtype(256) == "bfloat16"
    assert cfg.tpu.resolve_cache_dtype(1024) == "bfloat16"
    pinned = tiny_cfg(dropout=0.0)
    pinned.tpu.cache_dtype = "bfloat16"
    assert pinned.tpu.resolve_cache_dtype(32) == "bfloat16"

    i_auto = Interpreter(cfg, ontology)
    i_f32 = Interpreter(tiny_cfg(dropout=0.0), ontology)
    params = i_f32.init_params(jax.random.PRNGKey(0))
    qs = generate_questions(ontology, 12, terminal="exist", length=1, seed=3)
    loader = make_loader(ontology, cfg, qs, batch_size=12, shuffle=False)
    for batch in loader:
        arrays = {k: jnp.asarray(v) for k, v in batch.arrays.items()}
        obj, mask = jnp.asarray(batch.objects), jnp.asarray(batch.obj_mask)
        a = i_auto.forward(params, obj, mask, arrays, batch.spec, False, None)
        b = i_f32.forward(params, obj, mask, arrays, batch.spec, False, None)
        np.testing.assert_array_equal(
            np.asarray(a["log_probability"]), np.asarray(b["log_probability"]))
