"""Second round of O=100 on-chip experiments: tile sweep + full-model split."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def timeit(fn, *args, k_small=8, k_big=256):
    ks = {}
    for k in (k_small, k_big):
        @jax.jit
        def run(c0, *a, k=k):
            def body(c, _):
                out = fn(*((a[0] + c,) + a[1:]))
                return jnp.sum(out.astype(jnp.float32)) * 1e-30, None
            c, _ = jax.lax.scan(body, c0, None, length=k)
            return c
        float(run(jnp.float32(0.0), *args))
        reps = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(run(jnp.float32(0.0), *args))
            reps.append(time.perf_counter() - t0)
        ks[k] = float(np.median(reps))
    return (ks[k_big] - ks[k_small]) / (k_big - k_small)


def main():
    B, O, R, U, E, H, D = 32, 100, 8, 4, 300, 256, 516
    O_PAD = 128
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0].device_kind)

    x = jnp.asarray(rng.standard_normal((U, O_PAD, D)), jnp.float32)
    pos = jnp.asarray(rng.uniform(0.05, 0.95, (U, O_PAD, 4)), jnp.float32)
    w_s = jnp.asarray(rng.standard_normal((D, H)) * 0.05, jnp.float32)
    w_o = jnp.asarray(rng.standard_normal((D, H)) * 0.05, jnp.float32)
    w_g = jnp.asarray(rng.standard_normal((4, H)) * 0.05, jnp.float32)
    b0 = jnp.zeros((H,), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((H, E)) * 0.05, jnp.float32)
    b1 = jnp.zeros((E,), jnp.float32)
    layers = [{"w": w1, "b": b1}]
    h_s = jnp.dot(x, w_s)
    h_o = jnp.dot(x, w_o)

    from dfol_vqa_tpu.ops.pallas.pair_mlp import pair_mlp_fused

    for tile in (8, 16, 32, 64, 128):
        def mlp_pallas(h_s, h_o, tile=tile):
            return pair_mlp_fused(pos, h_s, h_o, w_g, b0, layers,
                                  out_dtype=jnp.bfloat16, tile=tile)
        try:
            t = timeit(mlp_pallas, h_s, h_o)
            print(f"pair_mlp Pallas tile={tile:3d}:   {t*1e3:8.3f} ms")
        except Exception as e:
            print(f"pair_mlp Pallas tile={tile:3d} failed: {str(e)[:160]}")

    # contract kernel tile sweep
    from dfol_vqa_tpu.ops.pallas.shared_contract import shared_contract_pallas

    h2 = jnp.asarray(rng.uniform(0, 1, (U, O_PAD, O_PAD, E)), jnp.float32).astype(jnp.bfloat16)
    img_index = jnp.asarray(np.repeat(np.arange(U), B // U), jnp.int32)
    e_sel = jnp.asarray(rng.standard_normal((B, R, E)), jnp.float32).astype(jnp.bfloat16)
    b_sel = jnp.asarray(rng.standard_normal((B, R)), jnp.float32)
    rel_tokens = jnp.asarray(rng.integers(1, 300, (B, R)), jnp.int32)

    for tile in (16, 32, 64, 128):
        def contract(h2, tile=tile):
            return shared_contract_pallas(h2, img_index, e_sel, b_sel,
                                          rel_tokens, -13.8, tile=tile, valid_o=O_PAD)
        try:
            t = timeit(contract, h2)
            print(f"contract Pallas tile={tile:3d}:   {t*1e3:8.3f} ms")
        except Exception as e:
            print(f"contract Pallas tile={tile:3d} failed: {str(e)[:160]}")

    # ---- full-model split at bench dims
    import bench
    bench.BATCH, bench.O_PAD, bench.MIN_OBJ, bench.MAX_OBJ = B, O, 30, O
    sec_full, _ = bench.measure_device(hops=4, k_small=8, k_big=256)
    print(f"full model (prod route):       {sec_full*1e3:8.3f} ms")

    interp, batches = bench.build_batches(4)
    cfg = interp.cfg
    params = jax.device_put(interp.init_params(jax.random.PRNGKey(0)))
    spec, obj_np, mask_np, arrays_np, meta, packed_np = batches[0]
    from dfol_vqa_tpu.compiler.program_compiler import unpack_arrays
    obj = jax.device_put(obj_np.astype(np.float32))
    mask = jax.device_put(mask_np)
    packed = jax.device_put(packed_np)

    # no-rel forward: build_world with needs_rel=False + executor
    import dfol_vqa_tpu.models.interpreter as itp

    orig = itp.spec_needs_relations
    itp.spec_needs_relations = lambda s: False
    try:
        def norel(obj, mask, packed):
            arrays = unpack_arrays(packed, meta)
            out = interp.forward(params, obj, mask, arrays, spec, False, None)
            return out["log_probability"]
        t_norel = timeit(norel, obj, mask, packed)
        print(f"full model minus rel path:     {t_norel*1e3:8.3f} ms")
    finally:
        itp.spec_needs_relations = orig

    # attr path only: featurize + attr cache
    from dfol_vqa_tpu.models.featurizer import featurize_objects
    from dfol_vqa_tpu.models import oracle as om

    def attr_path(obj, mask):
        attr_in_u, pos_u = featurize_objects(params["featurizer"], obj, cfg, None, True)
        return om.attr_cache(params, attr_in_u, cfg, None, True)

    t_attr = timeit(attr_path, obj, mask)
    print(f"featurize + attr cache:        {t_attr*1e3:8.3f} ms")

    # executor-ish remainder
    print(f"=> rel path in-model:          {(sec_full - t_norel)*1e3:8.3f} ms")
    print(f"=> executor+terminal+misc:     {(t_norel - t_attr)*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
