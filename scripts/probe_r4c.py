"""Far-field v4 probe, part 3: find a fast planes→chunk-records path.

XLA relayout granularity sweep + composed-gather alternatives:

  Rg   [5,W,H] -> [C, 5*a*b] for chunk (a, b): granularity sweep
       (4,4) (4,8) (8,8) (4,32) (1,32) (2,16), fwd and back
  W2   two-step windowed gather: full-width row gather of pair-side
       chunk rows [2k*4, H] then take_along_axis lane slice -> [2k, 80]
  GPAD [C,80] gather vs [C,128] gather (does row padding matter?)
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(m):
    print(m, file=sys.stderr, flush=True)


W, H = 1024, 1024   # lane-aligned H (pad 1008->1024 is the plan)
NSUB = 64


def scan_time(label, fn, *args, n=3):
    @jax.jit
    def run(*a):
        def body(c, _):
            return fn(c, *a), None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=NSUB)
        return c

    out = jax.block_until_ready(run(*args))
    t0 = time.time()
    for _ in range(n):
        out = run(*args)
    jax.block_until_ready(out)
    per = (time.time() - t0) / n / NSUB * 1e3
    log(f"{label:52s} {per:8.3f} ms/iter")
    return per


def main():
    t0 = time.time()
    np.asarray(jax.block_until_ready(jnp.zeros(8)))
    log(f"warmup {time.time() - t0:.1f}s dev={jax.devices()}")
    rng = np.random.default_rng(0)

    planes = jnp.asarray(rng.normal(size=(5, W, H)).astype(np.float32))

    for (a, b) in ((4, 4), (4, 8), (8, 8), (4, 32), (1, 32), (2, 16)):
        cw, ch = W // a, H // b
        C = cw * ch
        rec = 5 * a * b

        def fwd(c, pl, _a=a, _b=b, _cw=cw, _ch=ch, _C=C, _rec=rec):
            pl = pl + c * 1e-30
            t = pl.reshape(5, _cw, _a, _ch, _b).transpose(1, 3, 0, 2, 4)
            tab = t.reshape(_C, _rec)
            return c + jnp.sum(tab[::512, 0]) * 1e-30

        scan_time(f"Rg fwd chunk ({a},{b}) rec={rec}", fwd, planes)

        tab0 = jnp.asarray(
            rng.normal(size=(C, rec)).astype(np.float32))

        def bwd(c, tb, _a=a, _b=b, _cw=cw, _ch=ch):
            tb = tb + c * 1e-30
            t = tb.reshape(_cw, _ch, 5, _a, _b).transpose(2, 0, 3, 1, 4)
            pl = t.reshape(5, W, H)
            return c + jnp.sum(pl[:, ::512, 0]) * 1e-30

        scan_time(f"Rg bwd chunk ({a},{b})", bwd, tab0)

    # W2: two-step windowed gather for 4x4 chunks
    cw, ch = W // 4, H // 4
    C = cw * ch
    for k in (8192, 16384):
        ids = jnp.asarray(rng.integers(0, C, size=2 * k).astype(np.int32))

        def w2(c, pl, cid, _k=k):
            cid = cid + (c * 1e-30).astype(jnp.int32)
            cx = cid // ch
            cy = cid % ch
            rows = (cx[:, None] * 4 + jnp.arange(4, dtype=jnp.int32)[None, :]
                    ).reshape(-1)                      # [2k*4]
            strips = pl[:, rows]                       # [5, 2k*4, H]
            strips = strips.reshape(5, 2 * _k, 4, H)
            lane0 = cy * 4
            idx = (lane0[None, :, None, None]
                   + jnp.arange(4, dtype=jnp.int32)[None, None, None, :])
            idx = jnp.broadcast_to(idx, (5, 2 * _k, 4, 4))
            g = jnp.take_along_axis(strips, idx, axis=3)  # [5, 2k, 4, 4]
            return c + jnp.sum(g[:, ::64, 0, 0]) * 1e-30

        scan_time(f"W2 two-step gather k={k}", w2, planes, ids)

    # GPAD: 80 vs 128 row width gather
    for recw in (80, 128):
        tabp = jnp.asarray(
            rng.normal(size=(C, recw)).astype(np.float32))
        ids = jnp.asarray(rng.integers(0, C, size=32768).astype(np.int32))

        def gp(c, tb, idx):
            idx = idx + (c * 1e-30).astype(jnp.int32)
            rows = tb[idx]
            return c + jnp.sum(rows[::64, 0]) * 1e-30

        scan_time(f"GPAD gather 32k rows width {recw}", gp, tabp, ids)


if __name__ == "__main__":
    main()
