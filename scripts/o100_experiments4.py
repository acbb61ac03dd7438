"""Fourth O=100 experiment: attr-cache gather layout."""

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
    U, O, V, B, K = 4, 128, 2432, 32, 16
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0].device_kind)

    attr_voh = jnp.asarray(rng.standard_normal((U, O, V)), jnp.float32)  # V-minor
    attr_omin = jnp.asarray(np.ascontiguousarray(np.moveaxis(np.asarray(attr_voh), 1, 2)))  # (U, V, O)
    img = jnp.asarray(rng.integers(0, U, (B,)), jnp.int32)
    tok = jnp.asarray(rng.integers(0, V, (B,)), jnp.int32)
    toks = jnp.asarray(rng.integers(0, V, (B, K)), jnp.int32)
    o_iota = jnp.arange(O, dtype=jnp.int32)

    def g_cur(c):
        t = jnp.clip(tok + c.astype(jnp.int32) * 0, 0, V - 1)
        ll = attr_voh[img[:, None], o_iota[None, :], t[:, None]]
        return jnp.sum(ll) * 1e-30

    t = timeit_scan(g_cur)
    print(f"gather cur layout (U,O,V):     {t*1e3:8.3f} ms")

    flat = attr_omin.reshape(U * V, O)

    def g_rows(c):
        t = jnp.clip(tok + c.astype(jnp.int32) * 0, 0, V - 1)
        ll = jnp.take(flat, img * V + t, axis=0)
        return jnp.sum(ll) * 1e-30

    t = timeit_scan(g_rows)
    print(f"gather row layout (U,V,O):     {t*1e3:8.3f} ms")

    def g_opt_cur(c):
        t = jnp.clip(toks + c.astype(jnp.int32) * 0, 0, V - 1)
        ll = attr_voh[img[:, None, None], o_iota[None, None, :], t[:, :, None]]
        return jnp.sum(ll) * 1e-30

    t = timeit_scan(g_opt_cur)
    print(f"options gather cur (B,K,O):    {t*1e3:8.3f} ms")

    def g_opt_rows(c):
        t = jnp.clip(toks + c.astype(jnp.int32) * 0, 0, V - 1)
        ll = jnp.take(flat, img[:, None] * V + t, axis=0)
        return jnp.sum(ll) * 1e-30

    t = timeit_scan(g_opt_rows)
    print(f"options gather rows (B,K,O):   {t*1e3:8.3f} ms")

    # one-hot matmul alternative for the single gather
    def g_dot(c):
        t = jnp.clip(tok + c.astype(jnp.int32) * 0, 0, V - 1)
        oh = jax.nn.one_hot(img * V + t, U * V, dtype=jnp.bfloat16)
        ll = jnp.dot(oh, flat.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        return jnp.sum(ll) * 1e-30

    t = timeit_scan(g_dot)
    print(f"one-hot matmul rows:           {t*1e3:8.3f} ms")

    # rel gather along R (current form) for reference
    R = 8
    rel = jnp.asarray(rng.standard_normal((B, R, O, O)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, R, (B,)), jnp.int32)

    def g_rel(c):
        i = jnp.clip(idx + c.astype(jnp.int32) * 0, 0, R - 1)
        ll = jnp.take_along_axis(rel, i[:, None, None, None], axis=1)[:, 0]
        return jnp.sum(ll) * 1e-30

    t = timeit_scan(g_rel)
    print(f"rel slot gather (B,O,O):       {t*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
