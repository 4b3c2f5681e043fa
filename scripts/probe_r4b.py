"""Far-field v4 probe, part 2: the apply path WITHOUT a full relayout.

  G2  windowed narrow gather: U unique chunks x 5 planes, window [c, c]
      via advanced indexing (far_gather_windows shape) — 4x4 and 8x8
  S2  windowed narrow scatter-add back (5 delta planes)
  R8  relayout planes->chunk-major at 8-granularity (is 8 wide enough
      for XLA to transpose at speed?)
  PR  paired AABB pooling px+py min/max in one pass (trigger/rebuild
      front-end cost, 4-granular and 8-granular)
  GM  gather from per-field chunk tables [C, 16] built once per rebuild
      (pair-side gather when a relayout IS amortized across R substeps)
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(m):
    print(m, file=sys.stderr, flush=True)


W, H = 1024, 1008
NSUB = 64


def scan_time(label, fn, *args, n=3):
    @jax.jit
    def run(*a):
        def body(c, _):
            return fn(c, *a), None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=NSUB)
        return c

    out = run(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = run(*args)
    jax.block_until_ready(out)
    per = (time.time() - t0) / n / NSUB * 1e3
    log(f"{label:56s} {per:8.3f} ms/iter")
    return per


def main():
    t0 = time.time()
    np.asarray(jax.block_until_ready(jnp.zeros(8)))
    log(f"warmup {time.time() - t0:.1f}s dev={jax.devices()}")
    rng = np.random.default_rng(0)

    planes = jnp.asarray(rng.normal(size=(5, W, H)).astype(np.float32))

    for c in (4, 8):
        cw, ch = W // c, H // c
        for u in (4096, 16384):
            if c == 8 and u == 16384:
                u = 8192
            cxs = jnp.asarray(
                rng.integers(0, cw, size=u).astype(np.int32))
            cys = jnp.asarray(
                rng.integers(0, ch, size=u).astype(np.int32))

            def g2(cc, pl, cx, cy, _c=c):
                ii = jnp.arange(_c, dtype=jnp.int32)
                xi = (cx[:, None] * _c + ii[None, :])[:, :, None]
                yj = (cy[:, None] * _c + ii[None, :])[:, None, :]
                xi = xi + (cc * 1e-30).astype(jnp.int32)
                g = pl[:, xi, yj]          # [5, u, c, c]
                return cc + jnp.sum(g[:, ::64, 0, 0]) * 1e-30

            scan_time(f"G2 windowed gather {c}x{c} U={u}", g2, planes,
                      cxs, cys)

            vals = jnp.asarray(
                rng.normal(size=(5, u, c, c)).astype(np.float32))

            def s2(cc, v, cx, cy, _c=c):
                ii = jnp.arange(_c, dtype=jnp.int32)
                xi = (cx[:, None] * _c + ii[None, :])[:, :, None]
                yj = (cy[:, None] * _c + ii[None, :])[:, None, :]
                xi = xi + (cc * 1e-30).astype(jnp.int32)
                out = jnp.zeros((5, W, H), jnp.float32)
                out = jax.vmap(lambda o, vv: o.at[xi, yj].add(vv))(out, v)
                return cc + jnp.sum(out[:, ::512, 0]) * 1e-30

            scan_time(f"S2 windowed scatter {c}x{c} U={u}", s2, vals,
                      cxs, cys)

    # R8: 8-granular relayout
    cw, ch = W // 8, H // 8
    C8 = cw * ch

    def r8(c, pl):
        pl = pl + c * 1e-30
        t = pl.reshape(5, cw, 8, ch, 8).transpose(1, 3, 0, 2, 4)
        return c + jnp.sum(t.reshape(C8, 320)[::512, 0]) * 1e-30

    scan_time("R8 planes->chunk-major 8x8 [C8,320]", r8, planes)

    # PR: paired pooling (both coords, min+max, one kernel graph)
    for c in (4, 8):
        cw, ch = W // c, H // c

        def pr(cc, pl, _c=c, _cw=cw, _ch=ch):
            x = pl[0] + cc * 1e-30
            y = pl[1] + cc * 1e-30
            tx = x.reshape(_cw, _c, _ch, _c)
            ty = y.reshape(_cw, _c, _ch, _c)
            mnx = tx.min(axis=(1, 3))
            mxx = tx.max(axis=(1, 3))
            mny = ty.min(axis=(1, 3))
            mxy = ty.max(axis=(1, 3))
            return cc + (jnp.sum(mnx[::64, 0]) + jnp.sum(mxx[::64, 0])
                         + jnp.sum(mny[::64, 0])
                         + jnp.sum(mxy[::64, 0])) * 1e-30

        scan_time(f"PR AABB pool both coords {c}-granular", pr, planes)

    # GM: gather pair sides from per-field tables [C, c*c]
    c = 4
    cw, ch = W // c, H // c
    C = cw * ch
    tables = jnp.asarray(rng.normal(size=(5, C, 16)).astype(np.float32))
    for k in (8192, 16384):
        ids = jnp.asarray(rng.integers(0, C, size=2 * k).astype(np.int32))

        def gm(cc, tb, idx):
            idx = idx + (cc * 1e-30).astype(jnp.int32)
            rows = tb[:, idx]          # [5, 2k, 16]
            return cc + jnp.sum(rows[:, ::64, 0]) * 1e-30

        scan_time(f"GM per-field table gather 2x{k} rows", gm, tables,
                  ids)


if __name__ == "__main__":
    main()
