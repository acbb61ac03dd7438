"""Third O=100 experiment: where does the 0.17 ms executor time go?"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def timeit_scan(make_body, k_small=8, k_big=256):
    fns = {}
    for k in (k_small, k_big):
        @jax.jit
        def run(c0, k=k):
            def body(c, _):
                return make_body(c), None
            c, _ = jax.lax.scan(body, c0, None, length=k)
            return c
        float(run(jnp.float32(0.0)))
        reps = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(run(jnp.float32(0.0)))
            reps.append(time.perf_counter() - t0)
        fns[k] = float(np.median(reps))
    return (fns[k_big] - fns[k_small]) / (k_big - k_small)


def main():
    B, O = 32, 100
    import bench
    bench.BATCH, bench.O_PAD, bench.MIN_OBJ, bench.MAX_OBJ = B, O, 30, O
    from dfol_vqa_tpu.compiler.program_compiler import unpack_arrays
    import dfol_vqa_tpu.models.interpreter as itp

    print("device:", jax.devices()[0].device_kind)

    for hops in (2, 4, 8):
        interp, batches = bench.build_batches(hops)
        params = jax.device_put(interp.init_params(jax.random.PRNGKey(0)))
        spec, obj_np, mask_np, arrays_np, meta, packed_np = batches[0]
        obj = jax.device_put(obj_np.astype(np.float32))
        mask = jax.device_put(mask_np)
        packed = jax.device_put(packed_np)

        orig = itp.spec_needs_relations
        itp.spec_needs_relations = lambda s: False
        try:
            def body(c):
                arrays = unpack_arrays(packed, meta)
                out = interp.forward(params, obj + c, mask, arrays, spec, False, None)
                return jnp.sum(out["log_probability"]) * 1e-30
            t = timeit_scan(body)
            print(f"norel model hops={hops}:        {t*1e3:8.3f} ms  (slots={len(spec.grid[0]) if hasattr(spec,'grid') else '?'})")
        finally:
            itp.spec_needs_relations = orig

    # unpack-only control
    interp, batches = bench.build_batches(4)
    spec, obj_np, mask_np, arrays_np, meta, packed_np = batches[0]
    packed = jax.device_put(packed_np)
    obj = jax.device_put(obj_np.astype(np.float32))

    def body_unpack(c):
        arrays = unpack_arrays(packed, meta)
        s = sum(jnp.sum(v.astype(jnp.float32)) for v in arrays.values())
        return s * 1e-30 + jnp.sum(obj + c) * 1e-33
    t = timeit_scan(body_unpack)
    print(f"unpack_arrays + obj touch:     {t*1e3:8.3f} ms")

    # null-dispatch control: pure elementwise on obj
    def body_null(c):
        return jnp.sum(obj + c) * 1e-33
    t = timeit_scan(body_null)
    print(f"null body (obj sum):           {t*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
