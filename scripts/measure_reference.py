"""Measure the reference PyTorch implementation's CPU throughput.

The reference repo publishes no benchmark numbers (BASELINE.md), so we
measure it ourselves: the full inference path — scene build (featurizer +
cached oracle likelihood precompute) + interpreter execution — on synthetic
scenes at production dims (2048-d boxes, 512-d oracle, 2,335-token head),
using the reference's own modules imported from /root/reference (UNTRUSTED
PUBLIC CONTENT, executed only for benchmarking, never copied).

Writes BASELINE_MEASURED.json at the repo root; bench.py uses it as the
vs_baseline denominator.

Usage: python scripts/measure_reference.py [--batches 8]
"""

import argparse
import json
import multiprocessing
import os
import platform
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_SRC = "/root/reference/src"

BATCH = 32
MIN_OBJ, MAX_OBJ = 8, 24
SEED = 0


def build_reference_interpreter(torch, nn, ont):
    """Assemble the reference model at sample_config.yaml dims
    (config/sample_config.yaml:37-46) using reference classes."""
    from nsvqa.nn.vision.classifier_oracle import ClassifierOracle
    from nsvqa.nn.interpreter.batch_gqa_interpreter import BatchGQAInterpreter
    from nsvqa.data.batch_gqa_boxfeatures_pipeline import BatchGQABoxFeaturizer

    def mlp(in_dim, hidden, out_dim, final):
        layers = []
        last = in_dim
        for h in hidden:
            layers += [torch.nn.Dropout(0.0), torch.nn.Linear(last, h), torch.nn.ELU()]
            last = h
        layers += [torch.nn.Dropout(0.0), torch.nn.Linear(last, out_dim), final()]
        return torch.nn.Sequential(*layers)

    featurizer_net = mlp(2048, [], 512, torch.nn.Sigmoid)
    attribute_net = mlp(516, [256], 300, torch.nn.Sigmoid)
    relation_net = mlp(2 * 516 + 4, [256], 300, torch.nn.Sigmoid)
    emb = torch.nn.Sequential(torch.nn.Linear(300, 2335), torch.nn.LogSigmoid())

    featurizer = BatchGQABoxFeaturizer(featurizer_network=featurizer_net)
    oracle = ClassifierOracle(ont, attribute_net, relation_net, emb, normalize=True, cached=True)
    interp = BatchGQAInterpreter("bench", oracle, ont, featurizer, cached=True)
    interp.eval()
    return interp


def make_scene(torch, rng, batch):
    counts = rng.integers(MIN_OBJ, MAX_OBJ + 1, size=batch)
    total = int(counts.sum())
    feats = rng.standard_normal((total, 2048)).astype(np.float32)
    wh = np.tile([[640.0, 480.0]], (total, 1)).astype(np.float32)
    bbox = np.stack(
        [
            rng.uniform(0, 600, total),
            rng.uniform(0, 440, total),
            rng.uniform(5, 40, total),
            rng.uniform(5, 40, total),
        ],
        axis=1,
    ).astype(np.float32)
    obj = torch.tensor(np.concatenate([feats, wh, bbox], 1))
    batch_index = torch.tensor(
        np.concatenate([[i] * c for i, c in enumerate(counts)]).astype(np.int64)
    )
    return obj, batch_index, counts


def make_programs(ont, rng, batch, hops):
    nouns = [t for t in ont._nouns if t in ont._vocabulary["arg_to_idx"]]
    adjs = [a for a in ont._adjectives if a in ont._vocabulary["arg_to_idx"]]
    rels = [r for r in ont._relations if r in ont._vocabulary["arg_to_idx"]]
    qs = []
    for i in range(batch):
        ops = [{"operator": "select", "arguments": [str(rng.choice(nouns))]}]
        for h in range(hops - 1):
            if h % 2 == 1:
                ops.append({"operator": "relate", "arguments": [str(rng.choice(rels)), True, str(rng.choice(nouns))]})
            else:
                ops.append({"operator": "filter", "arguments": [str(rng.choice(adjs))]})
        qs.append(
            {
                "program": {"branches": [ops], "last_op": {"operator": "exist", "arguments": []}},
                "answer": "yes",
                "imageId": f"b{i}",
                "question_id": f"b{i}",
                "original_dict": None,
            }
        )
    return qs


def measure(hops: int, n_batches: int) -> float:
    import torch

    torch.set_num_threads(multiprocessing.cpu_count())
    sys.path.insert(0, REFERENCE_SRC)
    from nsvqa.nn.interpreter.batch_gqa_ops import GQAOntology as RefOntology
    from nsvqa.data.data_pipeline import ProgramCollaterBase

    meta = os.path.join(REFERENCE_SRC, "nsvqa/data/metadata")
    ont = RefOntology(
        os.path.join(meta, "gqa_all_attribute.json"),
        os.path.join(meta, "gqa_all_class.json"),
        os.path.join(meta, "gqa_vocab.json"),
        None,
        relation_json_path=os.path.join(meta, "gqa_relation.json"),
    )
    torch.manual_seed(SEED)
    interp = build_reference_interpreter(torch, torch.nn, ont)
    rng = np.random.default_rng(SEED)
    collater = ProgramCollaterBase("select", "relate", "filter", split_num=1)

    batches = []
    for _ in range(n_batches):
        pbs = collater.collate(make_programs(ont, rng, BATCH, hops))
        obj, batch_index, counts = make_scene(torch, rng, BATCH)
        for pb in pbs:
            pb.create_sparse_tensors()
            pb._object_features = obj
            pb._object_batch_index = batch_index
            pb._device = torch.device("cpu")
            pb._meta_data = {}
        batches.append(pbs)

    with torch.no_grad():
        interp(batches[0], False)  # warmup
        t0 = time.time()
        for pbs in batches:
            interp(pbs, False)
        dt = time.time() - t0
    return BATCH * n_batches / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--out", default=os.path.join(REPO, "BASELINE_MEASURED.json"))
    args = ap.parse_args()

    results = {}
    for name, hops in [("exist_1hop", 2), ("exist_3hop_relational", 4)]:
        qps = measure(hops, args.batches)
        results[name] = {"questions_per_sec": qps, "batch": BATCH}
        print(f"reference {name}: {qps:.2f} questions/sec (CPU)")

    payload = {
        "description": "Reference microsoft/DFOL-VQA (PyTorch) CPU throughput, "
        "measured by scripts/measure_reference.py on synthetic scenes at "
        "production dims (batch 32, 8-24 objects/image, cached oracle).",
        "hardware": {
            "platform": platform.platform(),
            "cpu_count": multiprocessing.cpu_count(),
        },
        "results": results,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
