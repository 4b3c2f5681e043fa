"""Micro-measurements for the far-field v4 redesign (round 3).

Everything is measured IN-SCAN (single jit, 64 iterations, carry
perturbation defeats CSE) because the axon transport's per-dispatch
floor is ~1.7 ms — single-call timings are meaningless.

Sections (1M-scale shapes: planes [1024, 1008], chunks 4x4 ->
C = 256*252 = 64512 chunk records of 80 f32):

  R1  relayout planes [5, W, H] -> chunk-major [C, 80] (interleaved)
  R2  relayout back [C, 80] -> [5, W, H]
  G   row gather [K, 2] sides from [C, 80], K in {8k, 16k, 40k}
      (sorted and shuffled index variants)
  S   row scatter-add [U, 80] into [C, 80], U in {4k, 16k}
  M   pair math proxy: [2K, 80] windows -> 256 pair tests each
  P   chunk AABB pooling: [W, H] -> [C] min/max via reshape-reduce
  C1  compaction A: two-level (active-chunk sort 63k -> [4096, 108]
      offset mask -> sort 442k)
  C2  compaction B: flat sort of the full [C, 108] mask (6.9M)
  CS  cumsum over 6.9M i32 (prefix-sum compaction ingredient)
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
CW, CH = W // 4, H // 4          # 256 x 252 chunk grid
C = CW * CH                      # 64512
NSUB = 64


def scan_time(label, fn, *args, n=3):
    """fn(carry_scalar, *args) -> new_carry_scalar; scanned NSUB times."""

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

    # ---- R1/R2 relayout ----
    def to_chunk_major(c, pl):
        pl = pl + c * 1e-30
        # [5, W, H] -> [5, CW, 4, CH, 4] -> [CW, CH, 5, 4, 4] -> [C, 80]
        t = pl.reshape(5, CW, 4, CH, 4).transpose(1, 3, 0, 2, 4)
        return jnp.sum(t.reshape(C, 80)[::4096, 0]) * 1e-30 + c

    scan_time("R1 planes->chunk-major [C,80]", to_chunk_major, planes)

    table = jnp.asarray(rng.normal(size=(C, 80)).astype(np.float32))

    def to_planes(c, tb):
        tb = tb + c * 1e-30
        t = tb.reshape(CW, CH, 5, 4, 4).transpose(2, 0, 3, 1, 4)
        return jnp.sum(t.reshape(5, W, H)[:, ::512, 0]) * 1e-30 + c

    scan_time("R2 chunk-major->planes", to_planes, table)

    # ---- G row gathers ----
    for k in (8192, 16384, 40960):
        ids_sorted = jnp.asarray(
            np.sort(rng.integers(0, C, size=2 * k)).astype(np.int32))
        ids_shuf = jnp.asarray(
            rng.integers(0, C, size=2 * k).astype(np.int32))

        def g(c, tb, ids):
            rows = tb[ids + (c * 1e-30).astype(jnp.int32)]
            return c + jnp.sum(rows[::64, 0]) * 1e-30

        scan_time(f"G gather {2*k} rows x80 sorted", g, table, ids_sorted)
        scan_time(f"G gather {2*k} rows x80 shuffled", g, table, ids_shuf)

    # ---- S row scatter-add ----
    for u in (4096, 16384):
        uids = jnp.asarray(
            np.sort(rng.choice(C, size=u, replace=False)).astype(np.int32))
        vals = jnp.asarray(rng.normal(size=(u, 80)).astype(np.float32))

        def s(c, tb, ids, v):
            out = jnp.zeros((C, 80), jnp.float32).at[
                ids + (c * 1e-30).astype(jnp.int32)
            ].add(v)
            return c + jnp.sum(out[::4096, 0]) * 1e-30

        scan_time(f"S scatter-add {u} rows x80", s, table, uids, vals)

    # ---- M pair math proxy ----
    k = 16384
    ga = jnp.asarray(rng.normal(size=(k, 80)).astype(np.float32))
    gb = jnp.asarray(rng.normal(size=(k, 80)).astype(np.float32))

    def m(c, a, b):
        a = a + c * 1e-30
        # 4x4 vs 4x4 all-pairs: [k, 16, 1] vs [k, 1, 16] per field
        ax = a[:, 0:16][:, :, None]
        ay = a[:, 16:32][:, :, None]
        bx = b[:, 0:16][:, None, :]
        by = b[:, 16:32][:, None, :]
        dx = bx - ax
        dy = by - ay
        d2 = dx * dx + dy * dy
        hit = d2 < 1.0
        inv = jax.lax.rsqrt(jnp.maximum(d2, 1e-6))
        imp = jnp.where(hit, (1.0 - d2) * inv, 0.0)
        fx = jnp.sum(imp * dx, axis=2)
        fy = jnp.sum(imp * dy, axis=1)
        return c + (jnp.sum(fx[::64, 0]) + jnp.sum(fy[::64, 0])) * 1e-30

    scan_time(f"M pair math {k} chunk pairs (256 tests)", m, ga, gb)

    # ---- P chunk AABB pooling ----
    def p(c, pl):
        x = pl[0] + c * 1e-30
        t = x.reshape(CW, 4, CH, 4)
        mn = t.min(axis=(1, 3))
        mx = t.max(axis=(1, 3))
        return c + (jnp.sum(mn[::64, 0]) + jnp.sum(mx[::64, 0])) * 1e-30

    scan_time("P AABB pool [W,H]->2x[CW,CH]", p, planes)

    # ---- C1 two-level compaction ----
    NOFF = 108
    act_mask = jnp.asarray(
        (rng.random((CW, CH)) < 0.06).astype(np.int32))  # ~4k active
    off_hits = jnp.asarray(
        (rng.random((4096, NOFF)) < 0.04).astype(np.int32))

    def c1(c, am, oh):
        am = am + (c * 1e-30).astype(jnp.int32)
        flat = am.reshape(-1)
        # sort-based compaction of active chunk ids
        order = jnp.argsort(-flat)          # actives first
        act = order[:4096].astype(jnp.int32)
        # stage 2: per-active-chunk offset mask -> pair slots
        oh2 = oh + act[:, None] * 0         # fake dependency
        flat2 = oh2.reshape(-1)
        order2 = jnp.argsort(-flat2)
        pairs = order2[:32768]
        return c + jnp.sum(pairs[::512].astype(jnp.float32)) * 1e-30

    scan_time("C1 two-level compaction (63k + 442k sorts)", c1,
              act_mask, off_hits)

    # ---- C2 flat big sort ----
    big = jnp.asarray((rng.random(C * NOFF) < 0.004).astype(np.int32))

    def c2(c, bm):
        bm = bm + (c * 1e-30).astype(jnp.int32)
        order = jnp.argsort(-bm)
        return c + jnp.sum(order[:32768:512].astype(jnp.float32)) * 1e-30

    scan_time("C2 flat sort 6.9M mask", c2, big)

    # ---- CS cumsum 6.9M ----
    def cs(c, bm):
        bm = bm + (c * 1e-30).astype(jnp.int32)
        s = jnp.cumsum(bm)
        return c + s[-1].astype(jnp.float32) * 1e-30

    scan_time("CS cumsum 6.9M i32", cs, big)


if __name__ == "__main__":
    main()
