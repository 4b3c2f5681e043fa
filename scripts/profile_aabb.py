"""Chunk-AABB reduction variants at 1M (the 5.5 ms detection floor,
scripts/profile_detection.py).  All variants compute the same five
[cwx, cwy] outputs from masked [Wp, Hp] planes.

  A1  4-D reshape, reduce axes (1, 3)
  A2  two-step group reduce (reshape/axis)
  A3  lax.reduce_window (pooling path, window=stride=(4, 4))
  A4  shifted-slice min-tree on sublanes, then reduce_window on lanes

Run: python scripts/profile_aabb.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def timeit(label, fn, *a, n=20):
    out = fn(*a)
    jax.block_until_ready(out)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*a)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    print(f"{label:44s} {(time.time() - t0) / n * 1e3:9.3f} ms", flush=True)


def main() -> int:
    t0 = time.time()
    np.asarray(jax.block_until_ready(jnp.zeros(8)))
    print(f"warmup {time.time() - t0:.1f}s", flush=True)

    _BIG = 3.0e38

    wp, hp = 1056, 1280
    c = 4
    cwx, cwy = wp // c, hp // c
    key = jax.random.PRNGKey(0)
    px = jax.random.uniform(key, (wp, hp), jnp.float32) * 1000.0
    py = jax.random.uniform(key, (wp, hp), jnp.float32) * 1000.0
    alv = jax.random.uniform(jax.random.PRNGKey(1), (wp, hp)) > 0.1

    def outputs(creduce):
        cminx = creduce(px, jnp.min, lax.min, _BIG)
        cmaxx = creduce(px, jnp.max, lax.max, -_BIG)
        cminy = creduce(py, jnp.min, lax.min, _BIG)
        cmaxy = creduce(py, jnp.max, lax.max, -_BIG)
        cany = creduce(alv.astype(jnp.float32), jnp.max, lax.max, 0.0) > 0.0
        return cminx, cmaxx, cminy, cmaxy, cany

    @jax.jit
    def a1():
        def cr(p, op, lop, fill):
            v = jnp.where(alv, p, fill)
            return op(v.reshape(cwx, c, cwy, c), axis=(1, 3))
        return outputs(cr)

    @jax.jit
    def a2():
        def cr(p, op, lop, fill):
            v = jnp.where(alv, p, fill)
            v = op(v.reshape(cwx, c, hp), axis=1)
            return op(v.reshape(cwx, cwy, c), axis=2)
        return outputs(cr)

    @jax.jit
    def a3():
        def cr(p, op, lop, fill):
            v = jnp.where(alv, p, fill)
            return lax.reduce_window(
                v, np.float32(fill), lop, (c, c), (c, c), "VALID")
        return outputs(cr)

    @jax.jit
    def a4():
        def cr(p, op, lop, fill):
            v = jnp.where(alv, p, fill)
            # sublane tree: rows 4i..4i+3 → combined at stride via slices
            v = lop(lop(v[0::4], v[1::4]), lop(v[2::4], v[3::4]))
            return lax.reduce_window(
                v, np.float32(fill), lop, (1, c), (1, c), "VALID")
        return outputs(cr)

    for label, f in (("A1 4-D reshape", a1), ("A2 two-step reshape", a2),
                     ("A3 reduce_window 4x4", a3),
                     ("A4 slice-tree + reduce_window", a4)):
        t0 = time.time()
        jax.block_until_ready(f())
        print(f"  [{label}] compile {time.time() - t0:.1f}s", flush=True)
        timeit(label, f)

    # cross-check correctness
    r1, r3, r4 = a1(), a3(), a4()
    for i in range(5):
        np.testing.assert_array_equal(np.asarray(r1[i]), np.asarray(r3[i]))
        np.testing.assert_array_equal(np.asarray(r1[i]), np.asarray(r4[i]))
    print("variants agree", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
