"""The program executor: jit-compiled ∇-FOL interpretation on TPU.

TPU-native replacement for BatchInterpreterBase/BatchGQAInterpreter
(reference: src/nsvqa/nn/interpreter/batch_base_interpreter.py:14-183,
batch_gqa_interpreter.py:13-86) and the 19-module GQA op library
(batch_gqa_ops.py:160-902). The reference walks a Python list of
OperatorBatches, dispatching ops by name string per batch at runtime; here
the AOT compiler (compiler/program_compiler.py) has already aligned every
program onto a static per-bucket slot grid, so execution is ONE jitted
function per BucketSpec:

    scene build (oracle caches)  ->  unrolled branch slot updates
        ->  terminal-op fan-out  ->  loss / metrics / answer flags

No Python control flow depends on tensor values; masks express everything
the reference did with `gate` and sparse maps. One XLA compilation is reused
for every batch with the same bucket signature (the bucketed file layout —
data segregated by terminal op and length, gqa_preprocess.py:136-147 —
keeps the signature set small).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dfol_vqa_tpu import logic
from dfol_vqa_tpu.compiler.program_compiler import (
    OP_FILTER,
    OP_PAD,
    OP_RELATE,
    OP_SELECT,
    BucketSpec,
)
from dfol_vqa_tpu.config import Config
from dfol_vqa_tpu.models import oracle as om
from dfol_vqa_tpu.models.featurizer import featurize_objects
from dfol_vqa_tpu.ontology import GQAOntology
from dfol_vqa_tpu.types import QuestionType, VariableSet, World

BINARY_OPS = ("exist", "verify_attrs", "verify_rel", "and", "or", "all_same",
              "all_different", "two_same", "two_different")
QUERY_OPS = ("query_attr", "choose_attr", "choose_rel", "compare")


def question_type_of(terminal_op: str) -> QuestionType:
    if terminal_op in QUERY_OPS:
        return QuestionType.QUERY
    if terminal_op == "end":
        return QuestionType.STATEMENT
    if terminal_op in ("object_attr", "object_rel"):
        return QuestionType.OBJECT_STATEMENT
    if terminal_op == "scene":
        return QuestionType.SCENE_GRAPH
    return QuestionType.BINARY


def decode_answer_flags(flags, spec, compiled) -> list:
    """Device answer flags -> per-question answer-string lists (ties kept,
    in option order — the reference's find_max_ind/unflatten_list semantics,
    util.py:52-66). The ONE decode shared by the offline trainer and the
    online serving engine, so the two paths cannot drift."""
    import numpy as np

    qtype = question_type_of(spec.terminal_op)
    flags = np.asarray(flags)
    answers = []
    for qi in range(len(compiled.image_ids)):
        if qtype == QuestionType.QUERY:
            opts = compiled.option_strings[qi]
            answers.append([opts[k] for k in range(len(opts)) if flags[qi, k]])
        elif qtype == QuestionType.STATEMENT:
            # end terminal answers with the set's tracked name
            # (batch_gqa_ops.py:776-778)
            names = compiled.names[qi] if compiled.names else ["entity"]
            answers.append([names[0]])
        else:
            answers.append(["yes"] if flags[qi, 0] else ["no"])
    return answers


def spec_needs_relations(spec: BucketSpec) -> bool:
    if spec.terminal_op in ("choose_rel", "verify_rel"):
        return True
    return any(OP_RELATE in g for g in spec.grid)


# ------------------------------------------------------------------- gathers


def _apply_negation_exact(ll: jnp.ndarray, neg: jnp.ndarray) -> jnp.ndarray:
    """Reference negation semantics (batch_base_ops.py:212-213): when ANY
    token in the op call is negated, lpn(ll, is_neg, 1) is applied to every
    row — an exp/log roundtrip for the non-negated ones too; with no
    negation present, no transform at all."""
    shaped = neg.reshape(neg.shape + (1,) * (ll.ndim - neg.ndim))
    any_neg = jnp.max(neg) > 0
    return jnp.where(any_neg, logic.log_parametric_not(ll, shaped, 1.0), ll)


def _gather_attr(world: World, tok: jnp.ndarray) -> jnp.ndarray:
    """attr_ll (U, V+1, O) + img_index, tok (B,) signed -> (B, O), negation
    applied (batch_base_ops.py:212-213). The vocab-major layout makes this
    ONE contiguous (O,)-row gather per question — flattening (U, V+1) to a
    single row axis lowers to a plain dynamic row fetch (~40x faster than
    the element gathers the object-major layout needed; o100_experiments4)."""
    U, Vp1, O = world.attr_ll.shape
    flat = world.img_index * Vp1 + jnp.abs(tok)
    ll = jnp.take(world.attr_ll.reshape(U * Vp1, O), flat, axis=0).astype(
        jnp.float32
    )
    return _apply_negation_exact(ll, (tok < 0).astype(ll.dtype))


def _gather_attr_options(world: World, toks: jnp.ndarray) -> jnp.ndarray:
    """attr_ll (U, V+1, O) + img_index, toks (B, K) signed -> (B, K, O) raw
    (sign NOT applied). Same flattened row-gather as _gather_attr."""
    U, Vp1, O = world.attr_ll.shape
    flat = world.img_index[:, None] * Vp1 + jnp.abs(toks)
    return jnp.take(world.attr_ll.reshape(U * Vp1, O), flat, axis=0).astype(
        jnp.float32
    )


def _apply_option_negation(ll: jnp.ndarray, toks: jnp.ndarray) -> jnp.ndarray:
    return _apply_negation_exact(ll, (toks < 0).astype(ll.dtype))


def _gather_rel(rel_ll: jnp.ndarray, idx: jnp.ndarray, tok: jnp.ndarray) -> jnp.ndarray:
    """rel_ll (B, R, O, O), idx (B,), tok (B,) signed -> (B, O, O).

    The R-major layout keeps the last two (O, O) dims on full (sublane,
    lane) tiles — an R-last layout pads R=8 lanes to 128 on TPU (16x the
    HBM bytes for the cache)."""
    ll = jnp.take_along_axis(rel_ll, idx[:, None, None, None], axis=1)[:, 0]
    ll = ll.astype(jnp.float32)
    return _apply_negation_exact(ll, (tok < 0).astype(ll.dtype))


def _gather_rel_options(rel_ll: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """rel_ll (B, R, O, O), idx (B, K) -> (B, K, O, O) raw."""
    return jnp.take_along_axis(rel_ll, idx[:, :, None, None], axis=1).astype(jnp.float32)


# -------------------------------------------------------------- logic pieces


def _log_probability(att, quant, obj_mask, hard: bool):
    vs = VariableSet(att, quant, obj_mask)
    return vs.log_probability(hard_mode=hard)


def _relate_core(subj, obj, ll, obj_mask, gates=None):
    """EXISTS-quantified arity-2 update (both chains are EXISTS sets in GQA
    programs; batch_gqa_ops.py:364-371)."""
    from dfol_vqa_tpu.ops.cells import relate_update

    shape = subj.shape[:-1]
    ones = jnp.ones(shape, subj.dtype)
    rel_gates = (gates["relate0"], gates["relate1"]) if gates else None
    return relate_update(subj, obj, ll, ones, ones, obj_mask, gates=rel_gates)


def _bce_terms(lp: jnp.ndarray):
    """Stable BCE log terms from a LOG probability.

    Matches torch.nn.functional.binary_cross_entropy semantics
    (trainer.py:194: log clamped at -100) with gradient-safe clamps:
    log(p) = lp directly (exact, unit gradient), and log(1-p) via expm1 with
    the reciprocal bounded at 1e-12 — torch's BCE backward clamps the same
    way; an unbounded 1/(1-p) overflows fp32 when p saturates."""
    lg = jnp.maximum(lp, -100.0)
    one_minus = -jnp.expm1(jnp.minimum(lp, -1e-12))
    lg1 = jnp.maximum(jnp.log(jnp.clip(one_minus, 1e-12)), -100.0)
    return lg, lg1


def _modulate(att: jnp.ndarray, mods: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Attention calibration transform (batch_base_types.py:170-187) on a raw
    log-attention tensor; mods (..., 4) in sigmoid space broadcast over O."""
    if mods is None:
        return att
    max_activation = 10.0
    alpha = mods[..., 0:1] * max_activation
    beta = mods[..., 1:2] * max_activation
    c = mods[..., 2:3] * max_activation
    d = mods[..., 3:4]
    temp = alpha * att + logic.safe_log(c) + logic.safe_log(d)
    return temp - logic.safe_log(
        jnp.exp(beta * logic.log_not(att) + logic.safe_log(1.0 - d)) + jnp.exp(temp)
    )


class Interpreter:
    """Builds worlds and executes compiled program batches.

    Equivalent public surface to BatchGQAInterpreter: parameter init/count,
    forward (with optional trace), save/load handled by train.checkpoint."""

    def __init__(self, cfg: Config, ontology: GQAOntology):
        # cfg.oracle_output_dim > 1 engages the trainable-interpreter path:
        # the oracle emits F feature channels per concept and per-arity
        # operator modules reduce them to the scalar caches the executor
        # consumes (models/oracle.py module note). The reference's own build
        # path for this mode is dead (gqa_interpreter_experiments.py:209
        # reads the embedding_network its :184-198 branch never creates);
        # here it is resurrected in cache-fused form.
        self.cfg = cfg
        self.ont = ontology
        self._step_cache: Dict[Any, Any] = {}
        self._emb_matrix = None

    @property
    def _attr_index_arr(self):
        # host-array cache (see embedding_matrix note on tracer leaks)
        if getattr(self, "_attr_idx_cache", None) is None:
            self._attr_idx_cache = np.asarray(self.ont._attribute_index, np.int32)
        return jnp.asarray(self._attr_idx_cache)

    @property
    def _rel_index_arr(self):
        if getattr(self, "_rel_idx_cache", None) is None:
            self._rel_idx_cache = np.asarray(self.ont._relation_index, np.int32)
        return jnp.asarray(self._rel_idx_cache)

    @property
    def _rel_gather_map(self):
        """Static (cols, inv) pair for the contract-then-gather relation
        path (oracle.rel_cache_shared): ``cols (K,)`` = 0-based embedding
        columns of the relation vocabulary, ``inv (num_tokens,)`` maps any
        0-based token column to its slot in ``cols`` (non-relations -> K,
        the appended zero column). Host numpy, embedded as constants."""
        if getattr(self, "_rel_gather_cache", None) is None:
            cols = np.asarray(self.ont._relation_index, np.int32)
            inv = np.full((self.ont.num_tokens,), len(cols), np.int32)
            inv[cols] = np.arange(len(cols), dtype=np.int32)
            self._rel_gather_cache = (cols, inv)
        return self._rel_gather_cache

    @property
    def embedding_matrix(self):
        """Whole-vocabulary GloVe matrix (V+1, D); used by the calibrator
        features (replaces per-batch meta_data['embedding']).

        The cache holds a HOST array (never a traced value — caching a jnp
        array created under jit would leak a tracer across compilations);
        jnp.asarray embeds it as a constant per compilation."""
        if self._emb_matrix is None:
            m = self.ont.embedding_matrix()
            if m.shape[1] != self.cfg.word_embedding_dim:
                m = m[:, : self.cfg.word_embedding_dim]
            self._emb_matrix = np.asarray(m)
        return jnp.asarray(self._emb_matrix)

    # ------------------------------------------------------------ parameters

    def init_params(self, key) -> Dict[str, Any]:
        params = om.init_oracle_params(key, self.cfg, self.ont)
        if self.cfg.trainable_gate:
            from dfol_vqa_tpu.nn import linear_init

            k = jax.random.fold_in(key, 11)
            ks = jax.random.split(k, 3)
            params["logic_gates"] = {
                "filter": linear_init(ks[0], 2, 6),
                "relate0": linear_init(ks[1], 2, 6),
                "relate1": linear_init(ks[2], 2, 6),
            }
        if self.cfg.activate_attention_transfer:
            from dfol_vqa_tpu.models.calibrator import init_calibrator_params

            params["calibrator"] = init_calibrator_params(
                jax.random.fold_in(key, 7), self.cfg, self.ont
            )
        return params

    # ----------------------------------------------------------- scene build

    def build_world(
        self,
        params,
        objects: jnp.ndarray,
        obj_mask: jnp.ndarray,
        rel_tokens: Optional[jnp.ndarray],
        rng=None,
        deterministic: bool = True,
        needs_rel: bool = True,
        img_index: Optional[jnp.ndarray] = None,
    ) -> World:
        """build_scene analog (batch_base_interpreter.py:45-70) in cached mode.

        ``objects``/``obj_mask`` may be per UNIQUE image (U rows) with
        ``img_index (B,)`` mapping questions to rows; the featurizer and the
        wide attribute head then run once per image."""
        cfg = self.cfg
        r_feat, r_attr, r_rel = (
            jax.random.split(rng, 3) if rng is not None else (None, None, None)
        )
        attr_in_u, pos_u = featurize_objects(
            params["featurizer"], objects, cfg, r_feat, deterministic
        )
        attr_ll = om.attr_cache(params, attr_in_u, cfg, r_attr, deterministic)
        if img_index is None:
            img_index = jnp.arange(obj_mask.shape[0], dtype=jnp.int32)
            attr_in, pos, q_mask = attr_in_u, pos_u, obj_mask
        else:
            attr_in = jnp.take(attr_in_u, img_index, axis=0)
            pos = jnp.take(pos_u, img_index, axis=0)
            q_mask = jnp.take(obj_mask, img_index, axis=0)
        obj_mask = q_mask
        B, O = obj_mask.shape
        U = attr_in_u.shape[0]
        if needs_rel and rel_tokens is not None:
            # Path choice (static, per jit signature): when questions share
            # images heavily (U <= B/2), compute the O^2 pair code once per
            # unique image and contract per question; otherwise run the
            # fused per-question Pallas kernel (custom VJP) or the XLA
            # formulation. Dropout falls back to XLA inside the kernel.
            if U * 2 <= B:
                rel_ll = om.rel_cache_shared(
                    params, attr_in_u, pos_u, img_index, rel_tokens, cfg, r_rel,
                    deterministic, rel_gather=self._rel_gather_map,
                )
            elif (
                cfg.tpu.use_pallas and jax.default_backend() == "tpu"
                and cfg.oracle_output_dim == 1
            ):
                from dfol_vqa_tpu.ops.pallas.relation_oracle import rel_cache_pallas

                rel_ll = rel_cache_pallas(
                    params, attr_in, pos, rel_tokens, cfg, r_rel, deterministic
                )
            else:
                rel_ll = om.rel_cache(
                    params, attr_in, pos, rel_tokens, cfg, r_rel, deterministic
                )
        else:
            R = 1 if rel_tokens is None else rel_tokens.shape[1]
            rel_ll = jnp.zeros((B, R, 1, 1), jnp.float32)
            rel_tokens = jnp.zeros((B, R), jnp.int32) if rel_tokens is None else rel_tokens
        # Cache storage dtype (tpu.cache_dtype): the convert fuses into the
        # producing matmul epilogue, so bf16 halves the caches' HBM write
        # AND all downstream gather reads; consumers upcast (see _gather_*)
        # so the fuzzy-logic algebra stays fp32.
        cache_dtype = jnp.dtype(cfg.tpu.resolve_cache_dtype(int(B)))
        attr_ll = attr_ll.astype(cache_dtype)
        rel_ll = rel_ll.astype(cache_dtype)
        return World(
            obj_mask=obj_mask,
            attr_ll=attr_ll,
            rel_ll=rel_ll,
            rel_tokens=rel_tokens,
            attr_in=attr_in,
            pos=pos,
            img_index=img_index,
        )

    # -------------------------------------------------------- branch executor

    def _run_branch(
        self,
        world: World,
        arrays: Dict[str, jnp.ndarray],
        branch: int,
        grid: Tuple[int, ...],
        slot_mods: Optional[list] = None,
        collect_trace: bool = False,
        gates=None,
    ):
        """Execute one branch's slot sequence; returns final (B, O) attention.

        Mirrors the reference execution loop (batch_base_interpreter.py:
        146-172) with `gate`-by-mask after every op (…:166-167). `slot_mods`
        is the calibrator's per-slot role dict list (models/calibrator.py)."""
        B, O = world.obj_mask.shape
        att = jnp.zeros((B, O), jnp.float32)
        trace = []
        for si, opc in enumerate(grid):
            if opc == OP_PAD:
                continue
            mods = slot_mods[si] if slot_mods is not None else None
            m = arrays["op_mask"][:, branch, si]  # (B,)
            tok = arrays["arg_tok"][:, branch, si]
            if opc in (OP_SELECT, OP_FILTER):
                from dfol_vqa_tpu.ops.cells import filter_update

                ll = _gather_attr(world, tok)
                upd = jnp.where(tok != 0, 1.0, 0.0) * m
                new = filter_update(att, ll, gates["filter"] if gates else None)
                if mods is not None:
                    new = _modulate(new, mods.get("filter"))
            else:  # OP_RELATE: select new set (+filter), relate, keep new side
                aux = arrays["arg_aux"][:, branch, si]
                s = arrays["arg_flag"][:, branch, si][:, None]
                ll_aux = _gather_attr(world, aux)
                x = jnp.where((aux != 0)[:, None], ll_aux, 0.0)
                if mods is not None and mods.get("select") is not None:
                    x = jnp.where(
                        (aux != 0)[:, None], _modulate(x, mods["select"]), x
                    )
                subj = s * x + (1.0 - s) * att
                obj = s * att + (1.0 - s) * x
                ll_rel = _gather_rel(world.rel_ll, arrays["rel_idx"][:, branch, si], tok)
                subj2, obj2 = _relate_core(subj, obj, ll_rel, world.obj_mask, gates)
                if mods is not None:
                    subj2 = _modulate(subj2, mods.get("subject"))
                    obj2 = _modulate(obj2, mods.get("object"))
                new = s * subj2 + (1.0 - s) * obj2
                upd = jnp.where(tok != 0, 1.0, 0.0) * m
            att = upd[:, None] * new + (1.0 - upd[:, None]) * att
            if collect_trace:
                trace.append(att)
        if collect_trace:
            return att, trace
        return att

    # ------------------------------------------------------------- terminals

    def _filter_fanout(self, world, att, options, opt_mask, normalize: bool, mods=None,
                       gates=None):
        """Fan-out filter over a (B, K) option axis (FilterBatch with a
        predicate_question_map, batch_base_ops.py:311-405)."""
        from dfol_vqa_tpu.ops.cells import normalize_over_options

        from dfol_vqa_tpu.ops.cells import filter_update

        ll = _gather_attr_options(world, options)  # (B, K, O)
        ll = normalize_over_options(ll, opt_mask, enabled=normalize and self.cfg.normalize_oracle)
        ll = _apply_option_negation(ll, options)
        out = filter_update(att[:, None, :], ll, gates["filter"] if gates else None)
        if mods is not None:
            out = _modulate(out, mods)
        return out

    def _terminal(
        self, world: World, arrays, spec: BucketSpec, atts, hard: bool, tmods=None,
        gates=None, params=None,
    ):
        """Compute the terminal op's log probability.

        Returns (lp, qtype) where lp is (B,) for BINARY/STATEMENT and (B, K)
        for QUERY terminals."""
        cfg = self.cfg
        term = spec.terminal_op
        mask = world.obj_mask
        opt_mask = arrays["opt_mask"]
        options = arrays["options"]
        ones = lambda x: jnp.ones(x.shape[:-1], x.dtype)

        # Reference hard-mode quirk, mirrored for parity: GQAQueryAttrBatch
        # (batch_gqa_ops.py:304-305), GQAAllDifferentBatch (:627-628) and
        # GQATwoDifferentBatch (:702-703) drop the hard_mode argument when
        # delegating to their inner op, so these three terminals always
        # aggregate softly even with hard_mode=True (pinned by the
        # hard-mode legs of scripts/answer_parity.py).
        if term in ("query_attr", "all_different", "two_different"):
            hard = False

        if term == "exist" or term == "end":
            att = atts[0]
            return _log_probability(att, ones(att), mask, hard)

        if term == "verify_attrs":
            # fan-out filter (normalized_probability=False), then AND across
            # predicates by predicate->question sum (batch_gqa_ops.py:452-463)
            att = atts[0]
            att_k = self._filter_fanout(
                world, att, options, opt_mask, normalize=False,
                mods=tmods.get("fanout") if tmods else None, gates=gates,
            )
            combined = jnp.sum(att_k * opt_mask[:, :, None], axis=1)
            return _log_probability(combined, ones(combined), mask, hard)

        if term in ("query_attr", "choose_attr"):
            att = atts[0]
            att_k = self._filter_fanout(
                world, att, options, opt_mask, normalize=True,
                mods=tmods.get("fanout") if tmods else None, gates=gates,
            )
            quant = jnp.ones(att_k.shape[:2], att_k.dtype)
            return _log_probability(att_k, quant, mask, hard)

        if term == "choose_rel":
            from dfol_vqa_tpu.ops.cells import normalize_over_options

            att = atts[0]
            aux = arrays["last_aux"]
            s = arrays["last_flag"][:, None]
            ll_aux = _gather_attr(world, aux)
            x = jnp.where((aux != 0)[:, None], ll_aux, 0.0)
            if tmods and tmods.get("select") is not None:
                x = jnp.where((aux != 0)[:, None], _modulate(x, tmods["select"]), x)
            subj = s * x + (1.0 - s) * att
            obj = s * att + (1.0 - s) * x
            ll = _gather_rel_options(world.rel_ll, arrays["opt_rel_idx"])  # (B,K,O,O)
            ll = normalize_over_options(ll, opt_mask, enabled=cfg.normalize_oracle)
            ll = _apply_option_negation(ll, options)
            subj2, obj2 = _relate_core(
                subj[:, None, :].repeat(spec.n_options, 1),
                obj[:, None, :].repeat(spec.n_options, 1),
                ll,
                mask,
                gates,
            )
            if tmods:
                subj2 = _modulate(subj2, tmods.get("subject"))
                obj2 = _modulate(obj2, tmods.get("object"))
            chosen = s[:, :, None] * subj2 + (1.0 - s[:, :, None]) * obj2
            quant = jnp.ones(chosen.shape[:2], chosen.dtype)
            return _log_probability(chosen, quant, mask, hard)

        if term == "verify_rel":
            att = atts[0]
            aux = arrays["last_aux"]
            s = arrays["last_flag"][:, None]
            ll_aux = _gather_attr(world, aux)
            x = jnp.where((aux != 0)[:, None], ll_aux, 0.0)
            if tmods and tmods.get("select") is not None:
                x = jnp.where((aux != 0)[:, None], _modulate(x, tmods["select"]), x)
            subj = s * x + (1.0 - s) * att
            obj = s * att + (1.0 - s) * x
            ll = _gather_rel(world.rel_ll, arrays["last_rel_idx"], arrays["last_tok"])
            subj2, obj2 = _relate_core(subj, obj, ll, mask, gates)
            if tmods:
                subj2 = _modulate(subj2, tmods.get("subject"))
                obj2 = _modulate(obj2, tmods.get("object"))
            final = s * subj2 + (1.0 - s) * obj2
            return _log_probability(final, ones(final), mask, hard)

        if term in ("and", "or"):
            lp1 = _log_probability(atts[0], ones(atts[0]), mask, hard)
            lp2 = _log_probability(atts[1], ones(atts[1]), mask, hard)
            return logic.log_and(lp1, lp2) if term == "and" else logic.log_or(lp1, lp2)

        if term in ("all_same", "all_different"):
            # implication (precondition => all-same) before a FOR_ALL
            # aggregation, then OR over the option fan-out
            # (batch_gqa_ops.py:582-608)
            att = atts[0]
            att_k = self._filter_fanout(
                world, att, options, opt_mask, normalize=True,
                mods=tmods.get("fanout") if tmods else None, gates=gates,
            )
            log_post = logic.log_not(logic.log_and(att[:, None, :], logic.log_not(att_k)))
            quant = jnp.zeros(log_post.shape[:2], log_post.dtype)  # FOR_ALL
            lp_k = _log_probability(log_post, quant, mask, hard)  # (B, K)
            lp = logic.log_not(jnp.sum(logic.log_not(lp_k) * opt_mask, axis=1))
            if term == "all_different":
                lp = logic.log_not(lp)
            return lp

        if term in ("two_same", "two_different"):
            att_k1 = self._filter_fanout(
                world, atts[0], options, opt_mask, normalize=True,
                mods=tmods.get("fanout0") if tmods else None, gates=gates,
            )
            att_k2 = self._filter_fanout(
                world, atts[1], options, opt_mask, normalize=True,
                mods=tmods.get("fanout1") if tmods else None, gates=gates,
            )
            quant = jnp.ones(att_k1.shape[:2], att_k1.dtype)
            lp_k = logic.log_and(
                _log_probability(att_k1, quant, mask, hard),
                _log_probability(att_k2, quant, mask, hard),
            )
            lp = logic.log_not(jnp.sum(logic.log_not(lp_k) * opt_mask, axis=1))
            if term == "two_different":
                lp = logic.log_not(lp)
            return lp

        if term == "compare":
            # two branches filtered by the same attribute, log-softmax,
            # is_less flip (batch_gqa_ops.py:730-758)
            from dfol_vqa_tpu.ops.cells import filter_update

            ll = _gather_attr(world, arrays["last_tok"])
            g = gates["filter"] if gates else None
            a1, a2 = filter_update(atts[0], ll, g), filter_update(atts[1], ll, g)
            if tmods:
                a1 = _modulate(a1, tmods.get("branch0"))
                a2 = _modulate(a2, tmods.get("branch1"))
            lp1 = _log_probability(a1, ones(atts[0]), mask, hard)
            lp2 = _log_probability(a2, ones(atts[1]), mask, hard)
            lp = jax.nn.log_softmax(jnp.stack([lp1, lp2], axis=1), axis=1)
            alpha = arrays["last_flag"][:, None]
            return logic.log_parametric_not(lp, alpha, 1.0)

        if term == "object_attr":
            # per-object attribute statements (GQAObjectAttrBatch,
            # batch_gqa_ops.py:795-830): fresh entity set filtered per
            # statement, probability read at the statement's object index
            from dfol_vqa_tpu.ops.cells import filter_update, normalize_over_options

            ll = _gather_attr_options(world, options)  # (B, K, O)
            ll = normalize_over_options(ll, opt_mask, enabled=cfg.normalize_oracle)
            ll = _apply_option_negation(ll, options)
            att_k = filter_update(jnp.zeros_like(ll), ll,
                                  gates["filter"] if gates else None)
            lp = jnp.take_along_axis(att_k, arrays["stmt_obj"][:, :, None], axis=2)[..., 0]
            return lp

        if term == "object_rel":
            # listed-pair relation statements (GQAObjectRelBatch,
            # batch_gqa_ops.py:851-870). Reference semantics, exactly:
            # statement k's relation token is scored against EVERY listed
            # pair of its question (classifier_oracle.py:115-137 scatters
            # each relation row over all pair positions), the scores are
            # cluster-normalised ACROSS the question's relation statements
            # per pair (the ClusteredLogSoftmax leg), unlisted (i, j) get
            # default_log_likelihood=0 (:858 — log 1, the FOR_ALL identity),
            # and a FOR_ALL x FOR_ALL relate update precedes the FOR_ALL
            # aggregation of the subject set (:860). Note the reference's
            # give_answer leg crashes upstream (:870 `range(relation_list)`
            # on a list), so parity is pinned on the training leg
            # (scripts/answer_parity.py supervision phase).
            from dfol_vqa_tpu.models.oracle import rel_scores_for_pairs
            from dfol_vqa_tpu.ops.cells import normalize_over_options, relate_update

            pair = jnp.stack([arrays["stmt_obj"], arrays["stmt_obj2"]], axis=-1)
            scores = rel_scores_for_pairs(params, world.attr_in, world.pos, pair, cfg)
            tok0 = jnp.clip(jnp.abs(options) - 1, 0)  # (B, K) statement tokens
            B, K = tok0.shape
            # sc[b, k, p] = score of statement k's token on listed pair p
            sc = jnp.take_along_axis(
                jnp.broadcast_to(scores[:, None], (B, K) + scores.shape[1:]),
                jnp.broadcast_to(tok0[:, :, None, None], (B, K, scores.shape[1], 1)),
                axis=3,
            )[..., 0]
            sc = normalize_over_options(sc, opt_mask, enabled=cfg.normalize_oracle)
            sc = _apply_option_negation(sc, options)
            O = mask.shape[-1]
            # scatter into (B, K, O, O) at the listed pair positions; pad
            # pair slots contribute 0 (the default) — their (0, 0) target is
            # the diagonal relate_update already excludes
            sc = sc * opt_mask[:, None, :]
            b_ix = jnp.arange(B)[:, None, None]
            k_ix = jnp.arange(K)[None, :, None]
            ll = jnp.zeros((B, K, O, O), sc.dtype).at[
                b_ix, k_ix, arrays["stmt_obj"][:, None, :], arrays["stmt_obj2"][:, None, :]
            ].set(sc)
            zeros_att = jnp.zeros((B, K, O), sc.dtype)
            q_all = jnp.zeros((B, K), sc.dtype)  # FOR_ALL
            subj2, _obj2 = relate_update(
                zeros_att, zeros_att, ll, q_all, q_all, mask,
                gates=(gates["relate0"], gates["relate1"]) if gates else None,
            )
            return _log_probability(subj2, q_all, mask, hard)

        if term == "scene":
            # full scene-graph supervision (GQASceneOpBatch,
            # batch_gqa_ops.py:888-899 / compute_all_log_likelihood)
            from dfol_vqa_tpu.models.oracle import rel_scores_for_pairs

            # vocab-major cache: take the attribute rows then transpose the
            # small (A, O) planes back to the supervision's (O, A) layout
            attr_lp = jnp.take(world.attr_ll, self._attr_index_arr + 1, axis=1)
            attr_lp = jnp.take(attr_lp, world.img_index, axis=0).astype(jnp.float32)
            attr_lp = jnp.swapaxes(attr_lp, 1, 2)  # (B, O, A)
            rel_lp = rel_scores_for_pairs(
                params, world.attr_in, world.pos, arrays["pair_idx"], cfg,
                rel_cols=self._rel_index_arr,
            )
            return {"attr": attr_lp, "rel": rel_lp}

        raise NotImplementedError(term)

    # ---------------------------------------------------------------- output

    def _answers_and_metrics(self, lp, arrays, spec: BucketSpec, qtype: QuestionType):
        """Answer flags + accuracy match, fully on device.

        QUERY tie rule: find_max_ind (util.py:64-66) — every option whose
        exp(lp) equals the max and exceeds likelihood_threshold is an answer;
        accuracy credit 1/|ties| (trainer.py:287-293), or first-answer-only
        when cfg.first_answer (trainer.py:284-285)."""
        cfg = self.cfg
        out: Dict[str, jnp.ndarray] = {"log_probability": lp}
        if qtype == QuestionType.OBJECT_STATEMENT:
            # weighted statement accuracy (trainer.py:277-299); the per-batch
            # weighted average is broadcast per question so the trainer's
            # error accounting matches the reference aggregate
            w = arrays["stmt_weight"] * arrays["opt_mask"] * arrays["question_mask"][:, None]
            pred = jnp.exp(lp) > 0.5
            tgt = arrays["answer_opt"] > 0.5
            match = (pred == tgt).astype(jnp.float32)
            avg = jnp.sum(match * w) / jnp.maximum(jnp.sum(w), 1e-6)
            out["answer_flags"] = pred
            out["match"] = jnp.broadcast_to(avg, lp.shape[:1])
            return out
        if qtype == QuestionType.SCENE_GRAPH:
            # trainer.py:265-275, with the prob>0.5 threshold applied in
            # probability space (the reference thresholds the LOG value at
            # 0.5, which is never true; we use the evidently intended rule)
            qm = arrays["question_mask"]
            obj_m = arrays.get("__obj_mask__")
            a_lp, r_lp = lp["attr"], lp["rel"]
            a_ans = (jnp.exp(a_lp) > 0.5).astype(jnp.float32)
            r_ans = (jnp.exp(r_lp) > 0.5).astype(jnp.float32)
            a_t, a_w = arrays["attr_answer"], arrays["attr_weight"]
            r_t = arrays["rel_answer"]
            r_w = arrays["rel_weight"] * arrays["pair_mask"][:, :, None]
            a_w = a_w * (a_t + a_ans > 0) * qm[:, None, None]
            if obj_m is not None:
                a_w = a_w * obj_m[:, :, None]
            r_w = r_w * (r_t + r_ans > 0) * qm[:, None, None]
            nom = jnp.sum((a_t != a_ans) * a_w) + jnp.sum((r_t != r_ans) * r_w)
            denom = jnp.maximum(jnp.sum(a_w) + jnp.sum(r_w), 1e-6)
            out["answer_flags"] = jnp.zeros((qm.shape[0], 1), bool)
            out["match"] = jnp.broadcast_to(1.0 - nom / denom, qm.shape)
            return out
        if qtype == QuestionType.QUERY and spec.terminal_op != "compare":
            opt_mask = arrays["opt_mask"]
            temp = jnp.exp(lp) * opt_mask
            mx = jnp.max(temp, axis=1, keepdims=True)
            flags = (temp == mx) & (temp > cfg.likelihood_threshold)
            # accuracy credit: substring rule (trainer.py:285-293)
            target = arrays.get("answer_match", arrays["answer_opt"])
            n_flags = jnp.sum(flags, axis=1)
            hit = jnp.sum(flags * target, axis=1)
            if cfg.first_answer:
                first = jnp.argmax(flags, axis=1)  # first flagged option
                match = jnp.take_along_axis(target, first[:, None], axis=1)[:, 0] * (
                    n_flags > 0
                )
            else:
                match = jnp.where(n_flags > 0, hit / jnp.maximum(n_flags, 1), 0.0)
            out["answer_flags"] = flags
            out["match"] = match
        elif spec.terminal_op == "compare":
            idx = jnp.argmax(lp, axis=1)
            flags = jax.nn.one_hot(idx, 2) > 0
            target = arrays.get("answer_match", arrays["answer_opt"])
            out["answer_flags"] = flags
            out["match"] = jnp.take_along_axis(target, idx[:, None], axis=1)[:, 0]
        else:  # BINARY / STATEMENT
            p = jnp.exp(lp)
            pred_yes = p > 0.5
            target = arrays["answer_binary"] > 0.5
            out["answer_flags"] = pred_yes[:, None]
            out["match"] = (pred_yes == target).astype(jnp.float32)
        return out

    def _loss(self, lp, arrays, spec: BucketSpec, qtype: QuestionType, params):
        """Per-question-type loss (trainer.py:181-262), summed over questions."""
        qmask = arrays["question_mask"]
        if qtype == QuestionType.STATEMENT:
            loss = -jnp.sum(lp * qmask)
        elif qtype == QuestionType.BINARY:
            t = arrays["answer_binary"]
            lg, lg1 = _bce_terms(lp)
            loss = -jnp.sum((t * lg + (1.0 - t) * lg1) * qmask)
        elif qtype == QuestionType.QUERY:
            # grouped softmax-CE over each question's options (trainer.py:207-230)
            opt_mask = arrays["opt_mask"]
            target = arrays["answer_opt"]
            denom = logic.masked_logsumexp(lp, opt_mask, axis=1)
            loss = jnp.sum((denom - jnp.sum(target * lp * opt_mask, axis=1)) * qmask)
        elif qtype == QuestionType.OBJECT_STATEMENT:
            # weighted BCE over statements (trainer.py:196-205)
            t = arrays["answer_opt"]
            w = arrays["stmt_weight"] * arrays["opt_mask"] * qmask[:, None]
            lg, lg1 = _bce_terms(lp)
            loss = -jnp.sum(w * (t * lg + (1.0 - t) * lg1))
        elif qtype == QuestionType.SCENE_GRAPH:
            # weighted BCE over the full attr matrix + listed-pair relations
            # (trainer.py:235-256)
            def bce(lp_x, t, w):
                lg, lg1 = _bce_terms(lp_x)
                return -jnp.sum(w * (t * lg + (1.0 - t) * lg1))

            a_w = arrays["attr_weight"] * qmask[:, None, None]
            obj_m = arrays.get("__obj_mask__")
            if obj_m is not None:
                a_w = a_w * obj_m[:, :, None]
            r_w = arrays["rel_weight"] * arrays["pair_mask"][:, :, None] * qmask[:, None, None]
            loss = bce(lp["attr"], arrays["attr_answer"], a_w) + bce(
                lp["rel"], arrays["rel_answer"], r_w
            )
        else:
            raise NotImplementedError(qtype)
        if self.cfg.l1_lambda > 0:
            leaves = jax.tree_util.tree_leaves(params)
            total = sum(jnp.sum(jnp.abs(l)) for l in leaves)
            n = sum(np.prod(l.shape) for l in leaves)
            loss = loss + self.cfg.l1_lambda * total / max(1, int(n))
        return loss

    # ------------------------------------------------------------ public API

    def forward(
        self,
        params,
        objects: jnp.ndarray,
        obj_mask: jnp.ndarray,
        arrays: Dict[str, jnp.ndarray],
        spec: BucketSpec,
        is_training: bool,
        rng=None,
        modulator_switch: bool = True,
        return_trace: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """Execute one compiled batch (not jitted; see `step` for the jitted
        wrapper). Mirrors BatchInterpreterBase.forward (…:72-183)."""
        if objects.dtype == jnp.int8:
            # int8 feature transfer (data/device_prefetch.py quantize_objects):
            # dequantize the feature columns with the per-object scale shipped
            # in the packed program buffer — halves host->device feature bytes
            # vs bf16 — and splice the geometry columns back in from their
            # unquantized copy (pixel-scale values don't survive a feature
            # scale, and vice versa)
            deq = objects.astype(jnp.float32) * arrays["obj_scale"][..., None]
            geom = arrays["obj_geom"]
            objects = jnp.concatenate([deq[..., : -geom.shape[-1]], geom], axis=-1)
        needs_rel = spec_needs_relations(spec)
        world = self.build_world(
            params,
            objects,
            obj_mask,
            arrays.get("rel_tokens"),
            rng=rng,
            deterministic=not is_training,
            needs_rel=needs_rel,
            img_index=arrays.get("img_index"),
        )
        return self.execute(
            params, world, arrays, spec, is_training,
            modulator_switch=modulator_switch, return_trace=return_trace,
        )

    def execute(
        self,
        params,
        world: World,
        arrays: Dict[str, jnp.ndarray],
        spec: BucketSpec,
        is_training: bool,
        modulator_switch: bool = True,
        return_trace: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """Run a compiled batch against a prebuilt World (e.g. a static-oracle
        test double or a cached scene)."""
        cfg = self.cfg
        qtype = question_type_of(spec.terminal_op)

        modulations = None
        # modulator disabled at test time only for query/choose terminals —
        # the reference QUERY flag excludes `compare` (data_pipeline.py:171,
        # trainer.py:97)
        open_terminal = spec.terminal_op in ("query_attr", "choose_attr", "choose_rel")
        use_modulator = (
            cfg.activate_attention_transfer
            and "calibrator" in params
            and modulator_switch
            and not (not is_training and open_terminal)
        )
        if use_modulator:
            from dfol_vqa_tpu.models.calibrator import compute_modulations

            modulations = compute_modulations(
                params["calibrator"], self, world, arrays, spec
            )

        gates = None
        if cfg.trainable_gate and params is not None and "logic_gates" in params:
            gates = params["logic_gates"]

        atts = []
        traces = []
        for b, grid in enumerate(spec.grid):
            mods_b = modulations["slots"][b] if modulations is not None else None
            if return_trace:
                att, tr = self._run_branch(
                    world, arrays, b, grid, mods_b, collect_trace=True, gates=gates
                )
                traces.append(tr)
            else:
                att = self._run_branch(world, arrays, b, grid, mods_b, gates=gates)
            atts.append(att)

        hard = (not is_training) and cfg.hard_mode
        tmods = modulations["terminal"] if modulations is not None else None
        arrays = dict(arrays)
        arrays["__obj_mask__"] = world.obj_mask  # for scene-graph masking
        lp = self._terminal(world, arrays, spec, atts, hard, tmods, gates, params)
        out = self._answers_and_metrics(lp, arrays, spec, qtype)
        out["loss"] = self._loss(lp, arrays, spec, qtype, params)
        out["type"] = jnp.asarray(int(qtype))
        if return_trace:
            out["trace"] = traces
        return out

    def step(self, spec: BucketSpec, is_training: bool):
        """Jitted forward for a bucket signature (cached per spec)."""
        key = (spec, is_training)
        if key not in self._step_cache:

            @partial(jax.jit, static_argnames=())
            def fn(params, objects, obj_mask, arrays, rng):
                return self.forward(
                    params, objects, obj_mask, arrays, spec, is_training, rng
                )

            self._step_cache[key] = fn
        return self._step_cache[key]

    def step_packed_many(self, spec: BucketSpec, meta, is_training: bool):
        """Jitted scan over N stacked same-spec batches in ONE dispatch.

        Remote TPU frontends pay an RPC round-trip per dispatch; scanning a
        chunk of batches amortizes it (inputs stacked on a leading N axis:
        objects (N, U, O, D), obj_mask (N, U, O), packed (N, P))."""
        from dfol_vqa_tpu.compiler.program_compiler import unpack_arrays

        key = (spec, meta, is_training, "many")
        if key not in self._step_cache:

            @jax.jit
            def fn(params, objects, obj_mask, packed):
                def body(carry, xs):
                    o, m, p = xs
                    arrays = unpack_arrays(p, meta)
                    out = self.forward(params, o, m, arrays, spec, is_training, None)
                    return carry, (out["log_probability"], out["match"],
                                   out["answer_flags"])

                _, (lp, match, flags) = jax.lax.scan(
                    body, None, (objects, obj_mask, packed)
                )
                return {"log_probability": lp, "match": match,
                        "answer_flags": flags}

            self._step_cache[key] = fn
        return self._step_cache[key]

    def step_packed(self, spec: BucketSpec, meta, is_training: bool):
        """Jitted forward taking the single packed program buffer."""
        from dfol_vqa_tpu.compiler.program_compiler import unpack_arrays

        key = (spec, meta, is_training)
        if key not in self._step_cache:

            @jax.jit
            def fn(params, objects, obj_mask, packed, rng):
                arrays = unpack_arrays(packed, meta)
                return self.forward(
                    params, objects, obj_mask, arrays, spec, is_training, rng
                )

            self._step_cache[key] = fn
        return self._step_cache[key]

    def parameter_count(self, params) -> int:
        from dfol_vqa_tpu.nn import param_count

        return param_count(params)
