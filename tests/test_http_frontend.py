"""HTTP frontend tests (http_frontend.py).

Drives the daemon over real sockets with concurrent clients: answers must
match the offline path, concurrent requests must coalesce into shared
batches, and malformed input must come back as 4xx JSON, not a hung
connection."""

import json
import threading
import urllib.error
import urllib.request

import jax
import pytest

from dfol_vqa_tpu.data.planted import PlantedWorld
from dfol_vqa_tpu.http_frontend import ServingHTTPFrontend
from dfol_vqa_tpu.models.interpreter import Interpreter
from dfol_vqa_tpu.serve import ServingEngine
from tests.test_serving import O, direct_answers, mixed_stream, small_cfg


@pytest.fixture(scope="module")
def world(ontology):
    return PlantedWorld(ontology, box_dim=32, n_nouns=4, n_attrs=3, n_images=32,
                        min_objects=3, max_objects=O, noise=0.1, seed=0)


@pytest.fixture(scope="module")
def served(ontology, world):
    cfg = small_cfg()
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    eng = ServingEngine(cfg, ontology, params, features=world,
                        max_batch=8, max_delay_ms=20.0)
    front = ServingHTTPFrontend(eng, port=0)
    yield cfg, params, front
    front.close()
    eng.stop()


def _post(front, path, payload):
    req = urllib.request.Request(
        f"http://{front.host}:{front.port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=600) as r:
        return json.loads(r.read())


def _get(front, path):
    with urllib.request.urlopen(
        f"http://{front.host}:{front.port}{path}", timeout=60
    ) as r:
        return json.loads(r.read())


def test_healthz_and_stats(served):
    _, _, front = served
    assert _get(front, "/healthz")["ok"] is True
    s = _get(front, "/stats")
    assert {"requests", "batches", "latency", "pending"} <= set(s)


def test_concurrent_requests_match_direct_and_share_batches(
    ontology, world, served
):
    cfg, params, front = served
    # repeated families so concurrent sockets produce same-spec requests
    qs = (world.generate_family("exist", 8, length=1, seed=13)
          + world.generate_family("query_attr", 4, length=1, seed=14))
    want = direct_answers(cfg, ontology, world, params, qs)

    eng = front.engine
    batches_before = eng.stats["batches"]
    results = [None] * len(qs)

    def client(i):
        results[i] = _post(front, "/v1/answer", {"question": qs[i]})

    threads = [threading.Thread(target=client, args=(i,)) for i in range(len(qs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert [r["answers"] for r in results] == want
    # same-spec requests from different sockets must ride shared batches:
    # strictly fewer dispatches than requests proves coalescing happened
    assert eng.stats["batches"] - batches_before < len(qs)
    assert any(r["batch_size"] > 1 for r in results)


def test_bulk_endpoint_and_inline_features(ontology, world, served):
    cfg, params, front = served
    qs = world.generate_family("exist", 3, length=1, seed=4)
    want = direct_answers(cfg, ontology, world, params, qs)

    out = _post(front, "/v1/answers", {"questions": qs})
    assert [r["answers"] for r in out["results"]] == want

    # inline features bypass the engine's FeatureSource
    objs, mask = world.batch([q["imageId"] for q in qs], O)
    out2 = _post(front, "/v1/answers", {
        "questions": qs, "objects": objs.tolist(), "obj_mask": mask.tolist(),
    })
    assert [r["answers"] for r in out2["results"]] == want


def test_trace_endpoint(ontology, world, served):
    cfg, params, front = served
    q = world.generate_family("verify_rel", 1, length=1, seed=6)[0]
    want = direct_answers(cfg, ontology, world, params, [q])[0]
    out = _post(front, "/v1/trace", {"question": q})
    assert out["answers"] == want
    assert out["hops"] and all("attention" in h for h in out["hops"])


@pytest.mark.parametrize(
    "path,payload,code",
    [
        ("/v1/answer", {"no_question": 1}, 400),           # missing key
        ("/v1/answer", {"question": {"program": {"branches": [], "last_op":
            {"operator": "scene", "arguments": []}}, "imageId": "x"}}, 400),
        ("/v1/nope", {}, 404),
        ("/v1/answers", {"questions": [{"program": {"branches": [],
            "last_op": {"operator": "exist", "arguments": []}}, "imageId": "x"}],
            "objects": [], "obj_mask": []}, 400),  # length mismatch
    ],
)
def test_error_paths(served, path, payload, code):
    _, _, front = served
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(front, path, payload)
    assert ei.value.code == code
    assert "error" in json.loads(ei.value.read())


def test_overload_maps_to_429(ontology, world):
    """Admission control surfaces as HTTP 429 with retryable: true."""
    cfg = small_cfg()
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    # start=False + huge delay: queued rows never drain, bound must trip
    eng = ServingEngine(cfg, ontology, params, features=world,
                        max_batch=8, max_delay_ms=1e6,
                        max_pending=1, start=False)
    front = ServingHTTPFrontend(eng, port=0)
    try:
        q = world.generate_family("exist", 1, length=0, seed=2)[0]
        # fill the queue directly (no .result(): nothing will drain it)
        eng.submit(q)
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(front, "/v1/answer", {"question": q})
        assert ei.value.code == 429
        body = json.loads(ei.value.read())
        assert body["retryable"] is True
        assert "max_pending" in body["error"]
    finally:
        front.close()
        eng.stop()
