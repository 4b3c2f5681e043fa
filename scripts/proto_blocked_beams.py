"""Prototype: blocked one-hot MXU beam pass at config-3 scale.

The general path's beam pass costs ~17 ms/substep at 100k/400k beams —
1.6M XLA gather rows (~90M rows/s).  This prototype evaluates the
directed-CSR alternative: per 256-particle block, dynamic-slice a
particle window [W, C] (no gather), build a [256·D, W] one-hot from the
partner indices, and fetch partner records as ONE MXU matmul; the
owner-side force accumulate is a free dense row-sum.

Measures, at N=100k, D=8, W=768:
  P1  window one-hot partner fetch (per-substep cost, full sweep)
  P2  reference: flat gather pos[partner] (the current approach)
  P3  full directed beam force pass (fetch + Hooke math + row-sum)

Run: python scripts/proto_blocked_beams.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def timeit(label, fn, *a, n=10):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    print(f"{label:52s} {(time.time() - t0) / n * 1e3:8.3f} ms", flush=True)


def main() -> int:
    t0 = time.time()
    np.asarray(jax.block_until_ready(jnp.zeros(8)))
    print(f"warmup {time.time() - t0:.1f}s", flush=True)

    side = 316
    n = side * side  # ≈ 100k, 2D lattice with 8-neighborhood (D=8)
    D = 8
    BLK = 256
    W = 1024  # window: partners span ±(side+1) ≈ ±317 → 256+2·317 ≤ 890

    # directed incidence: partner index per (particle, slot); dead slots
    # point at the owner (masked)
    x = np.arange(side)[:, None]
    y = np.arange(side)[None, :]
    lin = (x * side + y)
    partners = np.full((n, D), -1, np.int64)
    offs = [(0, 1), (1, 0), (1, 1), (1, -1), (0, -1), (-1, 0), (-1, -1), (-1, 1)]
    for k, (dx, dy) in enumerate(offs):
        valid = ((x + dx >= 0) & (x + dx < side) & (y + dy >= 0) & (y + dy < side))
        p = np.where(valid, lin + dx * side + dy, lin)
        partners[:, k] = p.reshape(-1)
        partners[~valid.reshape(-1), k] = -1
    alive_slot = partners >= 0
    partners = np.where(alive_slot, partners, np.arange(n)[:, None])

    nb = -(-n // BLK)
    npad = nb * BLK
    partners_p = np.concatenate(
        [partners,
         np.repeat(np.arange(n, npad)[:, None], D, axis=1)], axis=0
    )
    alive_p = np.pad(alive_slot, ((0, npad - n), (0, 0)))
    # per-block window start (clamped so wlo+W <= npad)
    wlo = np.empty(nb, np.int32)
    for b in range(nb):
        blk = partners_p[b * BLK : (b + 1) * BLK]
        lo = min(int(blk.min()), b * BLK)
        wlo[b] = max(0, min(lo, npad - W))
        width = max(int(blk.max()), (b + 1) * BLK - 1) - wlo[b] + 1
        assert width <= W, (b, width)

    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (npad, 2), jnp.float32) * 1000.0
    tbl = jnp.concatenate([pos, jnp.ones((npad, 2), jnp.float32)], axis=1)  # [N,4]
    prt = jnp.asarray(partners_p, jnp.int32)
    alv = jnp.asarray(alive_p)
    wlo_j = jnp.asarray(wlo, jnp.int32)

    # ---- P1: blocked one-hot partner fetch --------------------------------
    @jax.jit
    def fetch_blocked(tbl):
        iota = jnp.arange(W, dtype=jnp.int32)

        def block(b):
            win = lax.dynamic_slice(tbl, (wlo_j[b] * 1, 0), (W, 4))
            rel = prt[b * BLK : (b + 1) * BLK].reshape(-1) - wlo_j[b]  # dyn? static slice via index b
            oh = (iota[None, :] == rel[:, None]).astype(jnp.float32)  # [BLK*D, W]
            return jnp.dot(oh, win, precision=lax.Precision.HIGHEST)

        out = lax.map(block, jnp.arange(nb, dtype=jnp.int32))
        return out

    # note: prt[b*BLK:(b+1)*BLK] with traced b is a dynamic_slice — fine.
    @jax.jit
    def fetch_blocked2(tbl):
        iota = jnp.arange(W, dtype=jnp.int32)

        def block(b):
            win = lax.dynamic_slice(tbl, (wlo_j[b], 0), (W, 4))
            pblk = lax.dynamic_slice(prt, (b * BLK, 0), (BLK, D))
            rel = pblk.reshape(-1) - wlo_j[b]
            oh = (iota[None, :] == rel[:, None]).astype(jnp.float32)
            return jnp.dot(oh, win, precision=lax.Precision.HIGHEST)

        return lax.map(block, jnp.arange(nb, dtype=jnp.int32))

    timeit("P1 blocked one-hot partner fetch [N,D,4]", fetch_blocked2, tbl)

    # ---- P2: flat gather reference ---------------------------------------
    @jax.jit
    def fetch_gather(tbl):
        return tbl[prt.reshape(-1)]

    timeit("P2 flat gather partner fetch", fetch_gather, tbl)

    # ---- P3: full directed force pass ------------------------------------
    spring, damp = 60.0, 20.0
    rest = jnp.float32(10.0)

    @jax.jit
    def beam_pass_blocked(tbl):
        iota = jnp.arange(W, dtype=jnp.int32)

        def block(b):
            win = lax.dynamic_slice(tbl, (wlo_j[b], 0), (W, 4))
            own = lax.dynamic_slice(tbl, (b * BLK, 0), (BLK, 4))
            pblk = lax.dynamic_slice(prt, (b * BLK, 0), (BLK, D))
            ablk = lax.dynamic_slice(alv, (b * BLK, 0), (BLK, D))
            rel = pblk.reshape(-1) - wlo_j[b]
            oh = (iota[None, :] == rel[:, None]).astype(jnp.float32)
            pj = jnp.dot(oh, win, precision=lax.Precision.HIGHEST).reshape(BLK, D, 4)
            d = pj[..., :2] - own[:, None, :2]
            ln = jnp.sqrt(jnp.sum(d * d, -1))
            ln = jnp.where(ln == 0, 1e-10, ln)
            fmag = (rest - ln) * spring + (rest - ln) * damp
            f = jnp.where(ablk[..., None], fmag[..., None] * d / ln[..., None], 0.0)
            return jnp.sum(f, axis=1)  # row-sum accumulate [BLK, 2]

        return lax.map(block, jnp.arange(nb, dtype=jnp.int32)).reshape(npad, 2)

    timeit("P3 full blocked directed beam pass", beam_pass_blocked, tbl)

    # correctness spot-check vs gather
    got = np.asarray(fetch_blocked2(tbl)).reshape(npad, D, 4)
    ref = np.asarray(fetch_gather(tbl)).reshape(npad, D, 4)
    np.testing.assert_array_equal(got, ref)
    print("fetch parity ok", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
