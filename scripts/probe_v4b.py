"""Scan-wrapped primitive measurements for the v4 chunk-slot far-field
design: per-call dispatch through the axon tunnel costs ~1.7 ms, so
every op is measured inside a 64-iteration lax.scan in ONE jit call
(iteration-dependent inputs prevent hoisting), minus an empty-scan
baseline.
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(m):
    print(m, file=sys.stderr, flush=True)


NSCAN = 64


def scan_time(label, body, c0, n=8, base_ms=0.0):
    """body(carry, i) -> carry; returns per-iteration ms."""

    @jax.jit
    def run(c):
        c, _ = jax.lax.scan(lambda cc, i: (body(cc, i), None), c,
                            jnp.arange(NSCAN, dtype=jnp.int32))
        return c

    c = run(c0)
    jax.block_until_ready(jax.tree_util.tree_leaves(c)[0])
    t0 = time.time()
    for _ in range(n):
        c = run(c)
    jax.block_until_ready(jax.tree_util.tree_leaves(c)[0])
    ms = (time.time() - t0) / n / NSCAN * 1e3
    log(f"{label:56s} {ms:8.4f} ms/it ({ms - base_ms:+8.4f} net)")
    return ms


def main():
    t0 = time.time()
    np.asarray(jax.block_until_ready(jnp.zeros(8)))
    log(f"warmup {time.time() - t0:.1f}s")

    rng = np.random.default_rng(0)
    C = 65536

    planes = jnp.asarray(rng.standard_normal((5, 1024, 1024)), jnp.float32)
    base = scan_time("base (carry bump only)",
                     lambda c, i: c + 1.0, jnp.float32(0))

    # chunkify: [5, W, H] -> [C, 80]; depends on carry to avoid hoist
    def b_chunkify(c, i):
        p = planes + c
        z = p.reshape(5, 256, 4, 256, 4).transpose(1, 3, 2, 4, 0)
        return c + z.reshape(C, 80)[0, 0]
    scan_time("chunkify [5,1024,1024]", b_chunkify, jnp.float32(0),
              base_ms=base)

    # row gather
    Z = jnp.asarray(rng.standard_normal((C, 80)), jnp.float32)
    for k in (8192, 32768, 65536):
        idx = jnp.asarray(rng.integers(0, C - 2, k), jnp.int32)

        def b_take(c, i, idx=idx):
            g = jnp.take(Z, idx + (i & 1), axis=0)
            return c + g[0, 0]
        scan_time(f"take rows w=80 k={k}", b_take, jnp.float32(0),
                  base_ms=base)

    # element gather for comparison (what the current far apply does)
    flat = jnp.asarray(rng.standard_normal(C * 16), jnp.float32)
    for k in (131072, 1048576):
        eidx = jnp.asarray(rng.integers(0, C * 16 - 2, k), jnp.int32)

        def b_etake(c, i, eidx=eidx):
            g = jnp.take(flat, eidx + (i & 1))
            return c + g[0]
        scan_time(f"take elems k={k}", b_etake, jnp.float32(0),
                  base_ms=base)

    # row scatter-add
    for k in (8192, 32768):
        idx = jnp.asarray(np.sort(rng.integers(0, C - 2, k)), jnp.int32)
        vals = jnp.asarray(rng.standard_normal((k, 32)), jnp.float32)

        def b_scat(c, i, idx=idx, vals=vals):
            out = jnp.zeros((C, 32), jnp.float32).at[idx + (i & 1)].add(
                vals + c)
            return c + out[0, 0]
        scan_time(f"scatter-add rows w=32 k={k} sorted", b_scat,
                  jnp.float32(0), base_ms=base)

    # sort
    for n_ in (65536, 524288):
        keys = jnp.asarray(rng.integers(0, 1 << 30, n_), jnp.int32)

        def b_sort(c, i, keys=keys):
            s = jnp.sort(keys + (i & 1))
            return c + s[0]
        scan_time(f"sort int32 n={n_}", b_sort, jnp.int32(0), base_ms=base)

    # argsort (needed for compaction)
    keys = jnp.asarray(rng.integers(0, 1 << 30, 65536), jnp.int32)

    def b_argsort(c, i):
        s = jnp.argsort(keys + (i & 1))
        return c + s[0]
    scan_time("argsort int32 n=65536", b_argsort, jnp.int32(0),
              base_ms=base)

    # slot-sweep (54 annulus offsets, D=8, [256,256] chunk grid)
    D = 8
    aabb = jnp.asarray(rng.standard_normal((4, 256, 256)), jnp.float32)
    offs = [(x, y) for x in range(0, 8) for y in range(-7, 8)
            if (x > 0 or y > 0) and max(abs(x), abs(y)) >= 2][:54]

    def b_sweep(c, i):
        mnx, mxx, mny, mxy = aabb + c
        slots = [jnp.full((256, 256), -1, jnp.int32) for _ in range(D)]
        cnt = jnp.zeros((256, 256), jnp.int32)
        for (dx, dy) in offs:
            pmnx = jnp.roll(mnx, (-dx, -dy), (0, 1))
            pmxx = jnp.roll(mxx, (-dx, -dy), (0, 1))
            pmny = jnp.roll(mny, (-dx, -dy), (0, 1))
            pmxy = jnp.roll(mxy, (-dx, -dy), (0, 1))
            hit = ((mnx <= pmxx) & (pmnx <= mxx)
                   & (mny <= pmxy) & (pmny <= mxy))
            pid = jnp.int32(dx * 256 + dy)
            ins = hit
            for d in range(D):
                put = ins & (slots[d] < 0)
                slots[d] = jnp.where(put, pid, slots[d])
                ins = ins & ~put
            cnt = cnt + hit.astype(jnp.int32)
        return c + slots[0][0, 0].astype(jnp.float32) + cnt[0, 0]
    scan_time("slot-sweep 54 offsets D=8", b_sweep, jnp.float32(0),
              base_ms=base)

    # full v4 apply pipeline
    for K in (8192, 32768):
        ca = jnp.asarray(np.sort(rng.integers(0, C - 2, K)), jnp.int32)
        cb = jnp.asarray(rng.integers(0, C - 2, K), jnp.int32)

        def b_apply(c, i, ca=ca, cb=cb, K=K):
            p = planes + c
            z = p.reshape(5, 256, 4, 256, 4).transpose(1, 3, 2, 4, 0)
            z = z.reshape(C, 80)
            ga = jnp.take(z, ca + (i & 1), axis=0).reshape(K, 16, 5)
            gb = jnp.take(z, cb + (i & 1), axis=0).reshape(K, 16, 5)
            dx = ga[:, :, None, 0] - gb[:, None, :, 0]
            dy = ga[:, :, None, 1] - gb[:, None, :, 1]
            d2 = dx * dx + dy * dy
            ok = (d2 < 1.0) & (ga[:, :, None, 4] > 0) & (
                gb[:, None, :, 4] > 0)
            inv = jax.lax.rsqrt(jnp.maximum(d2, 1e-12))
            dvx = ga[:, :, None, 2] - gb[:, None, :, 2]
            dvy = ga[:, :, None, 3] - gb[:, None, :, 3]
            j = jnp.where(ok, (dvx * dx + dvy * dy) * inv, 0.0)
            ix = jnp.sum(j * dx * inv, axis=2)
            iy = jnp.sum(j * dy * inv, axis=2)
            imp = jnp.concatenate([ix, iy], axis=1)
            out = jnp.zeros((C, 32), jnp.float32).at[ca + (i & 1)].add(imp)
            q = out.reshape(256, 256, 4, 4, 2).transpose(4, 0, 2, 1, 3)
            return c + q.reshape(2, 1024, 1024)[0, 0, 0] * 1e-9
        scan_time(f"v4 apply full K={K}", b_apply, jnp.float32(0),
                  base_ms=base)

    # v4 apply with slot layout: [A, D] partners, dense slot reduce,
    # unique-row scatter (A active chunks, D=4 slots)
    for A, D_ in ((16384, 4), (32768, 4)):
        act = jnp.asarray(np.sort(rng.choice(C - 2, A, replace=False)),
                          jnp.int32)
        part = jnp.asarray(rng.integers(0, C - 2, (A, D_)), jnp.int32)

        def b_slot(c, i, act=act, part=part, A=A, D_=D_):
            p = planes + c
            z = p.reshape(5, 256, 4, 256, 4).transpose(1, 3, 2, 4, 0)
            z = z.reshape(C, 80)
            ga = jnp.take(z, act + (i & 1), axis=0).reshape(A, 1, 16, 5)
            gb = jnp.take(z, (part + (i & 1)).reshape(-1),
                          axis=0).reshape(A, D_, 16, 5)
            dx = ga[:, :, :, None, 0] - gb[:, :, None, :, 0]
            dy = ga[:, :, :, None, 1] - gb[:, :, None, :, 1]
            d2 = dx * dx + dy * dy
            ok = d2 < 1.0
            inv = jax.lax.rsqrt(jnp.maximum(d2, 1e-12))
            j = jnp.where(ok, d2 * inv, 0.0)
            ix = jnp.sum(j * dx, axis=(1, 3))
            iy = jnp.sum(j * dy, axis=(1, 3))
            imp = jnp.concatenate([ix, iy], axis=1)
            out = jnp.zeros((C, 32), jnp.float32).at[act + (i & 1)].add(imp)
            q = out.reshape(256, 256, 4, 4, 2).transpose(4, 0, 2, 1, 3)
            return c + q.reshape(2, 1024, 1024)[0, 0, 0] * 1e-9
        scan_time(f"v4 slot apply A={A} D={D_}", b_slot, jnp.float32(0),
                  base_ms=base)


if __name__ == "__main__":
    main()
