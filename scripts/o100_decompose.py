"""Decompose the O=100 device time: where do the microseconds go?

VERDICT r2 item 5 asks to fuse the relate partner-reduction into the
shared-contract kernel so (B, R, O, O) never materializes — OR to produce a
measurement showing the fusion is a wash at GQA dims. This script times, on
the real chip with scan-length differencing (same methodology as
bench.measure_device):

  a) the FULL 3-hop eval model at O=100           (the end-to-end number)
  b) rel_cache_shared alone (pair MLP + kernel)   (the relation path)
  c) the pair MLP alone (h2 up to sigmoid)        (compute-bound part)
  d) the gather+contract kernel alone, h2 given   (the fusion target)
  e) relate_update consuming a (B, R, O, O) cache (what fusion would absorb)

If (d)+(e) is a small fraction of (a), fusing them cannot reach the 1.5x
target and the pair MLP (c) is the real cost center.

Writes O100_DECOMPOSE.json at the repo root.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

B, O, R = 32, 100, 8  # defaults; override with --batch/--objects (the
# mfu_ladder shows B>=256 at O=100 sitting at ~0.5-0.7x its own roofline,
# so the same decomposition at large B locates the missing bandwidth)


def diff_time(fn, args, k_small=4, k_big=64, reps=5):
    """Device seconds per call via scan-length differencing to a host read."""
    import jax
    import jax.numpy as jnp

    fns = {}
    for k in (k_small, k_big):

        def make(k):
            @jax.jit
            def f(*a):
                def body(carry, _):
                    out = fn(*a, carry)
                    return out, None

                carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
                return carry

            return f

        fns[k] = make(k)
    times = {}
    for k in (k_small, k_big):
        float(fns[k](*args))  # compile + warm
        rs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fns[k](*args))
            rs.append(time.perf_counter() - t0)
        times[k] = float(np.median(rs))
    return max((times[k_big] - times[k_small]) / (k_big - k_small), 1e-9)


def main():
    import argparse

    global B, O

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=B)
    ap.add_argument("--objects", type=int, default=O)
    ap.add_argument("--k-small", type=int, default=4)
    ap.add_argument("--k-big", type=int, default=64)
    ap.add_argument("--json", default=os.path.join(REPO, "O100_DECOMPOSE.json"))
    cli = ap.parse_args()
    B, O = cli.batch, cli.objects
    ks, kb = cli.k_small, cli.k_big

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, REPO)
    import bench
    from dfol_vqa_tpu.models import oracle as om
    from dfol_vqa_tpu.ops.cells import relate_update
    from dfol_vqa_tpu.ops.pallas.shared_contract import shared_contract_pallas

    bench.BATCH, bench.O_PAD, bench.MIN_OBJ, bench.MAX_OBJ = B, O, min(30, O), O

    # (a) full model
    sec_full, _ = bench.measure_device(hops=4, k_small=ks, k_big=kb)

    interp, batches = bench.build_batches(4)
    cfg = interp.cfg
    params = jax.device_put(interp.init_params(jax.random.PRNGKey(0)))
    spec, obj_np, mask_np, arrays_np, meta, _packed = batches[0]
    rng = np.random.default_rng(0)
    img_index = jnp.asarray(arrays_np["img_index"].astype(np.int32))
    U = int(np.max(arrays_np["img_index"])) + 1
    rel_tokens = jnp.asarray(arrays_np["rel_tokens"][:, :R].astype(np.int32))
    attr_in_u = jnp.asarray(rng.standard_normal((U, O, cfg.attr_input_dim)).astype(np.float32))
    pos_u = jnp.asarray(rng.uniform(0, 1, (U, O, 4)).astype(np.float32))

    # (b) rel_cache_shared end-to-end
    def rel_cache_fn(params, attr_in_u, pos_u, img_index, rel_tokens, carry):
        out = om.rel_cache_shared(params, attr_in_u + carry * 0, pos_u, img_index,
                                  rel_tokens, cfg)
        return jnp.sum(out) * 1e-30 + carry * 0.5

    sec_cache = diff_time(rel_cache_fn, (params, attr_in_u, pos_u, img_index, rel_tokens), ks, kb)

    # (c) pair MLP only (the h2 compute, up to sigmoid)
    def pair_mlp_fn(params, attr_in_u, pos_u, carry):
        from dfol_vqa_tpu.models.featurizer import pair_geometry
        from dfol_vqa_tpu.models.oracle import _first_layer_split

        rp = params["relation_network"]
        compute_dtype = jnp.dtype(cfg.tpu.compute_dtype)
        geom = pair_geometry(pos_u)
        layers = rp["layers"]
        w_s, w_o, w_g, b0 = _first_layer_split(layers[0], cfg.attr_input_dim)
        x = (attr_in_u + carry * 0).astype(compute_dtype)
        h_s = jnp.dot(x, w_s.astype(compute_dtype), preferred_element_type=jnp.float32)
        h_o = jnp.dot(x, w_o.astype(compute_dtype), preferred_element_type=jnp.float32)
        h = (h_s[:, :, None, :] + h_o[:, None, :, :]
             + jnp.einsum("uijg,gh->uijh", geom, w_g, preferred_element_type=jnp.float32)
             + b0)
        for lp in layers[1:]:
            h = jax.nn.elu(h)
            h = jnp.dot(h.astype(compute_dtype), lp["w"].astype(compute_dtype),
                        preferred_element_type=jnp.float32) + lp["b"]
        h2 = jax.nn.sigmoid(h)
        return jnp.sum(h2) * 1e-30 + carry * 0.5

    sec_mlp = diff_time(pair_mlp_fn, (params, attr_in_u, pos_u), ks, kb)

    # (d) kernel alone on a precomputed h2
    E = cfg.embedding_input_dim
    stream = jnp.dtype(cfg.tpu.rel_stream_dtype)
    h2 = jnp.asarray(rng.uniform(0, 1, (U, O, O, E)).astype(np.float32)).astype(stream)
    e_sel = jnp.asarray(rng.standard_normal((B, R, E)).astype(np.float32)).astype(stream)
    b_sel = jnp.asarray(rng.standard_normal((B, R)).astype(np.float32))

    def kernel_fn(h2, img_index, e_sel, b_sel, rel_tokens, carry):
        out = shared_contract_pallas(h2, img_index, e_sel + carry * 0, b_sel,
                                     rel_tokens, om.DEFAULT_LOG_LIKELIHOOD)
        return jnp.sum(out) * 1e-30 + carry * 0.5

    sec_kernel = diff_time(kernel_fn, (h2, img_index, e_sel, b_sel, rel_tokens), ks, kb)

    # (e) relate_update consuming the (B, R, O, O) cache
    ll = jnp.asarray(rng.uniform(-3, 0, (B, R, O, O)).astype(np.float32))
    att = jnp.asarray(rng.uniform(-3, 0, (B, R, O)).astype(np.float32))
    q = jnp.ones((B, R), jnp.float32)
    mask = jnp.asarray(mask_np[:, :O].astype(np.float32)) if mask_np.shape[0] == B else jnp.ones((B, O))

    def relate_fn(ll, att, q, mask, carry):
        s, o = relate_update(att + carry * 0, att, ll, q, q, mask)
        return jnp.sum(s) * 1e-30 + carry * 0.5

    sec_relate = diff_time(relate_fn, (ll, att, q, mask), ks, kb)

    out = dict(
        device=jax.devices()[0].device_kind,
        B=B, O=O, R=R, U=U,
        full_model_ms=round(sec_full * 1e3, 4),
        rel_cache_shared_ms=round(sec_cache * 1e3, 4),
        pair_mlp_ms=round(sec_mlp * 1e3, 4),
        contract_kernel_ms=round(sec_kernel * 1e3, 4),
        relate_update_ms=round(sec_relate * 1e3, 4),
        fusion_upper_bound_ms_saved=round((sec_kernel + sec_relate) * 1e3, 4),
        note=(
            "fusing the relate partner-reduction into the contract kernel can "
            "save at most (contract_kernel + relate_update) minus the fused "
            "kernel's own cost; compare against full_model_ms for the ceiling "
            "on end-to-end gain"
        ),
    )
    with open(cli.json, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
