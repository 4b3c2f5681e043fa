"""Measure layout-change alternatives for the far-field gather/scatter at 1M.

The far path needs, per substep:
  gather: 2k chunk records (16 particles x 5 planes) out of [1024,1024] planes
  scatter: 2k chunk records of 5 delta terms back into [1024,1024] planes

Candidates measured here (all on real TPU):
  G1 full chunk-major relayout (current; trailing-4 transpose)
  G2 8x8-block relayout (coarser inner block)
  G3 flat element gather (2k*16 linear ids per plane, 5 planes stacked)
  G4 windowed slice gather: vmap dynamic_slice (4,4) over 2k offsets
  G5 row gather + in-row lane select via reshape-and-pick
  S1 one-hot matmul scatter to chunk-flat + transpose out (current)
  S2 XLA windowed scatter-add (4,4)
  S3 flat element scatter-add (2k*16 linear ids)
  S4 one-hot matmul direct to plane layout, 5 separate terms

Run: python scripts/profile_layout.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(label, fn, *args, n=30, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = jax.device_get(leaf.reshape(-1)[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args, **kw)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = jax.device_get(leaf.reshape(-1)[0])
    el = (time.time() - t0) / n * 1e3
    print(f"{label:58s} {el:8.3f} ms", flush=True)
    return el


def main():
    t0 = time.time()
    np.asarray(jax.block_until_ready(jnp.zeros(8)))
    print(f"warmup {time.time()-t0:.1f}s {jax.devices()}", flush=True)

    W = H = 1024
    c = 4
    cwx, cwy = W // c, H // c
    cc = c * c
    k2 = 2048  # 2k chunk records
    rng = np.random.default_rng(0)
    planes = jnp.asarray(rng.standard_normal((5, W, H)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, cwx * cwy, k2), jnp.int32)
    exs = ids // cwy
    eys = ids % cwy
    contrib = jnp.asarray(rng.standard_normal((k2, 5 * cc)), jnp.float32)

    # --- reference timing: one hot substep's worth of elementwise work ----
    @jax.jit
    def baseline_elementwise(p):
        return p * 1.0001 + 0.1
    timeit("baseline: 5-plane elementwise touch", baseline_elementwise, planes)

    # --- G1 current: chunk-major relayout then row gather ------------------
    @jax.jit
    def g1(planes, ids):
        tbl = (planes.reshape(5, cwx, c, cwy, c)
               .transpose(1, 3, 0, 2, 4)
               .reshape(cwx * cwy, 5 * cc))
        return tbl[ids]
    timeit("G1 chunk-major relayout + row gather (current)", g1, planes, ids)

    # --- G2 8x8 block relayout --------------------------------------------
    @jax.jit
    def g2_relayout(planes):
        return (planes.reshape(5, W // 8, 8, H // 8, 8)
                .transpose(1, 3, 0, 2, 4)
                .reshape((W // 8) * (H // 8), 5 * 64))
    timeit("G2 8x8-block relayout only", g2_relayout, planes)

    # --- G3 flat element gather --------------------------------------------
    kk = jnp.arange(cc, dtype=jnp.int32)
    lin = ((exs[:, None] * c + kk[None, :] // c) * H
           + (eys[:, None] * c + kk[None, :] % c))  # [k2, cc]

    @jax.jit
    def g3(planes, lin):
        flat = planes.reshape(5, W * H)
        return jax.vmap(lambda p: p[lin.reshape(-1)])(flat)
    timeit("G3 flat element gather (5 x 32k elements)", g3, planes, lin)

    # --- G4 windowed slice gather ------------------------------------------
    @jax.jit
    def g4(planes, exs, eys):
        def slice_one(x, y):
            return jax.lax.dynamic_slice(planes, (0, x * c, y * c), (5, c, c))
        return jax.vmap(slice_one)(exs, eys)
    timeit("G4 vmapped dynamic_slice (5,4,4) windows", g4, planes, exs, eys)

    # --- G5 row gather + lane-group pick ------------------------------------
    @jax.jit
    def g5(planes, exs, eys):
        # rows needed: 4 per chunk per plane; gather [5, k2*4, H] then pick
        # the 4-lane group via one-hot over H//c lane groups
        rows = exs[:, None] * c + jnp.arange(c, dtype=jnp.int32)[None, :]
        g = jax.vmap(lambda p: p[rows.reshape(-1)])(planes)  # [5, k2*4, H]
        g = g.reshape(5, k2, c, H // c, c)
        onehot = (jnp.arange(H // c, dtype=jnp.int32)[None, :]
                  == eys[:, None]).astype(jnp.float32)  # [k2, H//c]
        return jnp.einsum("pkig j->pkij" if False else "pkigj,kg->pkij",
                          g, onehot)
    timeit("G5 row gather + one-hot lane-group pick", g5, planes, exs, eys)

    # --- S1 current scatter --------------------------------------------------
    @jax.jit
    def s1(contrib, exs, eys):
        xs_iota = jnp.arange(cwx, dtype=jnp.int32)
        ys_iota = jnp.arange(cwy, dtype=jnp.int32)
        blk = 512
        out_flat = jnp.zeros((cwx, cwy * 5 * cc), jnp.float32)
        for b0 in range(0, k2, blk):
            ex = exs[b0:b0 + blk]
            ey = eys[b0:b0 + blk]
            cb_ = contrib[b0:b0 + blk]
            bl = ex.shape[0]
            ohx = (xs_iota[:, None] == ex[None, :]).astype(jnp.float32)
            ohy = (ey[:, None] == ys_iota[None, :]).astype(jnp.float32)
            d = (ohy[:, :, None] * cb_[:, None, :]).reshape(bl, cwy * 5 * cc)
            out_flat = out_flat + jnp.dot(ohx, d,
                                          preferred_element_type=jnp.float32)
        out = (out_flat.reshape(cwx, cwy, 5, c, c)
               .transpose(2, 0, 3, 1, 4)
               .reshape(5, W, H))
        return out
    timeit("S1 one-hot to chunk-flat + transpose (current)", s1,
           contrib, exs, eys)

    # --- S2 windowed scatter-add ---------------------------------------------
    @jax.jit
    def s2(contrib, exs, eys):
        out = jnp.zeros((5, W, H), jnp.float32)
        upd = contrib.reshape(k2, 5, c, c).transpose(0, 1, 2, 3)
        return out.at[:, exs[:, None, None] * c
                      + jnp.arange(c)[None, :, None],
                      eys[:, None, None] * c
                      + jnp.arange(c)[None, None, :]].add(
                          upd.transpose(1, 0, 2, 3))
    timeit("S2 advanced-index scatter-add windows", s2, contrib, exs, eys)

    # --- S3 flat element scatter-add ----------------------------------------
    @jax.jit
    def s3(contrib, lin):
        out = jnp.zeros((5, W * H), jnp.float32)
        vals = contrib.reshape(k2, 5, cc).transpose(1, 0, 2).reshape(5, -1)
        out = jax.vmap(lambda o, v: o.at[lin.reshape(-1)].add(v))(out, vals)
        return out.reshape(5, W, H)
    timeit("S3 flat element scatter-add (5 x 32k)", s3, contrib, lin)

    # --- S4 one-hot direct to plane layout, term by term ---------------------
    @jax.jit
    def s4(contrib, exs, eys):
        # contributions [k2, 5, c, c]; produce [5, W, H] with X one-hot on
        # the MXU and Y placement via lane one-hot within 4-lane groups
        cb_ = contrib.reshape(k2, 5, c, c)
        ohx = (jnp.arange(W, dtype=jnp.int32)[:, None]
               == (exs * c)[None, :]).astype(jnp.float32)  # [W, k2] row base
        outs = []
        ohyg = (jnp.arange(H // c, dtype=jnp.int32)[None, :]
                == eys[:, None]).astype(jnp.float32)  # [k2, H//c]
        for t in range(5):
            # d[(e,i), Y] with Y grouped: [k2, c_i, H//c, c_j]
            d = ohyg[:, None, :, None] * cb_[:, t][:, :, None, :]
            d = d.reshape(k2, c, H)
            term = jnp.stack([
                jnp.dot(ohx, d[:, i, :], preferred_element_type=jnp.float32)
                for i in range(c)
            ])  # [c, W, H] at row base; shift rows by i via roll? no — ohx_i
            outs.append(term)
        return outs
    # NOTE: S4 as written places all i at row base (incorrect math) — this is
    # a LAYOUT-COST probe only; correctness handled in the real impl.
    timeit("S4 probe: per-term one-hot direct to planes", s4,
           contrib, exs, eys)

    # --- R1: band detection cost at particle level (current rebuild core) ---
    px, py = planes[0], planes[1]
    alv = planes[2] > 0.0

    def band_offsets(s, cmax):
        r = 2 * cmax - 1
        return [(dx, dy) for dx in range(0, r + 1) for dy in range(-r, r + 1)
                if (dx > 0 or dy > 0) and max(abs(dx), abs(dy)) > s]

    offs = band_offsets(2, 4)
    print(f"band offsets (c=4, s=2): {len(offs)}")

    @jax.jit
    def r1(px, py, alv):
        br = 7
        pxb = jnp.pad(px, ((0, br), (br, br)), constant_values=3e38)
        pyb = jnp.pad(py, ((0, br), (br, br)), constant_values=3e38)
        ab = jnp.pad(alv, ((0, br), (br, br)), constant_values=False)
        flag = jnp.zeros((W, H), bool)
        for dx, dy in offs:
            d2 = ((pxb[dx:dx + W, br + dy:br + dy + H] - px) ** 2
                  + (pyb[dx:dx + W, br + dy:br + dy + H] - py) ** 2)
            flag = flag | (alv & ab[dx:dx + W, br + dy:br + dy + H]
                           & (d2 < 1.5))
        return flag
    timeit("R1 particle-level band stencil (100 offsets)", r1, px, py, alv,
           n=10)

    # --- R2: micro-chunk AABB band (cheb-3 particle + micro annulus) --------
    offs3 = [o for o in offs if max(abs(o[0]), abs(o[1])) == 3]
    print(f"cheb-3 offsets: {len(offs3)}")

    @jax.jit
    def r2(px, py, alv):
        br = 3
        pxb = jnp.pad(px, ((0, br), (br, br)), constant_values=3e38)
        pyb = jnp.pad(py, ((0, br), (br, br)), constant_values=3e38)
        ab = jnp.pad(alv, ((0, br), (br, br)), constant_values=False)
        flag = jnp.zeros((W, H), bool)
        for dx, dy in offs3:
            d2 = ((pxb[dx:dx + W, br + dy:br + dy + H] - px) ** 2
                  + (pyb[dx:dx + W, br + dy:br + dy + H] - py) ** 2)
            flag = flag | (alv & ab[dx:dx + W, br + dy:br + dy + H]
                           & (d2 < 1.5))
        # micro 2x2 AABBs
        mc = 2
        mx, my = W // mc, H // mc
        big = jnp.float32(3e38)
        pxm = jnp.where(alv, px, big).reshape(mx, mc, my, mc)
        pxM = jnp.where(alv, px, -big).reshape(mx, mc, my, mc)
        pym = jnp.where(alv, py, big).reshape(mx, mc, my, mc)
        pyM = jnp.where(alv, py, -big).reshape(mx, mc, my, mc)
        anym = alv.reshape(mx, mc, my, mc).any(axis=(1, 3))
        minx = pxm.min(axis=(1, 3)); maxx = pxM.max(axis=(1, 3))
        miny = pym.min(axis=(1, 3)); maxy = pyM.max(axis=(1, 3))
        moffs = [(dx, dy) for dx in range(0, 5) for dy in range(-4, 5)
                 if (dx > 0 or dy > 0) and max(abs(dx), abs(dy)) >= 2]
        mr = 4
        m = 0.6
        mb = lambda a, fill: jnp.pad(a, ((0, mr), (mr, mr)),
                                     constant_values=fill)
        minxb, maxxb = mb(minx, big), mb(maxx, -big)
        minyb, maxyb = mb(miny, big), mb(maxy, -big)
        anyb = mb(anym, False)
        mflag = jnp.zeros((mx, my), bool)
        for dx, dy in moffs:
            sh = lambda a: a[dx:dx + mx, mr + dy:mr + dy + my]
            ov = (anym & sh(anyb)
                  & (minx - m <= sh(maxxb) + m) & (sh(minxb) - m <= maxx + m)
                  & (miny - m <= sh(maxyb) + m) & (sh(minyb) - m <= maxy + m))
            mflag = mflag | ov
        return flag, mflag
    timeit("R2 cheb-3 particle + micro-AABB annulus", r2, px, py, alv, n=10)


if __name__ == "__main__":
    main()
