"""Bisect far-field DETECTION cost at 1M by compiling successive-stage
composites (frame-difference methodology — per-op timings lie through
the axon dispatch overhead).

Stages (cumulative):
  S0  pad + chunk AABB reductions
  S1  + particle band stencil (≈40 offsets on the 1M plane)
  S2  + band chunk adjacency masks
  S3  + annulus accumulate (any/count/bitmask words, ≈480 offsets)
  S4  + tile test + far refinement  (== far_candidate_count)
AABB reduction variants:
  A1  4-D reshape, reduce axes (1, 3)
  A2  two-step sublane-then-lane group reduce (current)

Run: python scripts/profile_detection.py
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


def timeit(label, fn, *a, n=10):
    out = fn(*a)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = jax.device_get(leaf.reshape(-1)[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*a)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = jax.device_get(leaf.reshape(-1)[0])
    el = (time.time() - t0) / n * 1e3
    print(f"{label:52s} {el:9.3f} ms", flush=True)
    return el


def main() -> int:
    t0 = time.time()
    np.asarray(jax.block_until_ready(jnp.zeros(8)))
    print(f"warmup {time.time() - t0:.1f}s", flush=True)

    from softbody_tpu.models import tearing_cloth_lattice
    from softbody_tpu.ops.farfield import (
        FarFieldSpec, _BIG, _chunk_dims, _pad_plane,
    )
    from softbody_tpu.ops.pallas.fused_substep2 import PX, PY, pack_lattice2

    lstate, spec, cfg, consts = tearing_cloth_lattice(
        n_particles=1_000_000, fall_speed=4.0
    )
    w, h = lstate.shape
    spacing = 980.0 / (w - 1)
    ff = FarFieldSpec(max_pairs=512, max_tile_pairs=256, skin=1.5 * spacing)
    hot, obs, immut, ec = pack_lattice2(lstate, tile_w=64)
    alive = immut[0] > 0.0
    px, py = hot[PX], hot[PY]
    radius = cfg.particle_radius
    s = spec.collision_stencil

    wp_, hp_ = px.shape
    cwx, cwy, wp, hp = _chunk_dims(wp_, hp_, ff)
    c = ff.chunk
    tc = ff.tile_chunks
    print(f"plane {wp_}x{hp_} chunks {cwx}x{cwy} tc={tc}", flush=True)

    def stage(upto, aabb="A2"):
        @jax.jit
        def f(pxu, pyu, alv_u):
            reach = 2.0 * radius + ff.skin
            m = jnp.float32(radius + 0.5 * ff.skin)
            pxp = _pad_plane(pxu, wp, hp, 0.0)
            pyp = _pad_plane(pyu, wp, hp, 0.0)
            alv = _pad_plane(alv_u, wp, hp, False)

            if aabb == "A1":
                def creduce(plane, op, fill):
                    v = jnp.where(alv, plane, fill)
                    return op(v.reshape(cwx, c, cwy, c), axis=(1, 3))
            else:
                def creduce(plane, op, fill):
                    v = jnp.where(alv, plane, fill)
                    v = op(v.reshape(cwx, c, hp), axis=1)
                    return op(v.reshape(cwx, cwy, c), axis=2)

            cminx = creduce(pxp, jnp.min, _BIG)
            cmaxx = creduce(pxp, jnp.max, -_BIG)
            cminy = creduce(pyp, jnp.min, _BIG)
            cmaxy = creduce(pyp, jnp.max, -_BIG)
            cany = creduce(alv.astype(jnp.float32), jnp.max, 0.0) > 0.0
            acc = (cminx.sum() + cmaxx.sum() + cminy.sum() + cmaxy.sum()
                   + cany.sum())
            if upto == 0:
                return acc

            reach2 = jnp.float32(reach * reach)
            br = 2 * c - 1
            px_b = jnp.pad(pxp, ((0, br), (br, br)), constant_values=_BIG)
            py_b = jnp.pad(pyp, ((0, br), (br, br)), constant_values=_BIG)
            alv_b = jnp.pad(alv, ((0, br), (br, br)), constant_values=False)

            def shifted(plane_b, dx, dy):
                return plane_b[dx: dx + wp, br + dy: br + dy + hp]

            flag = jnp.zeros((wp, hp), bool)
            for dx, dy in ff.band_half_offsets(s):
                d2 = (shifted(px_b, dx, dy) - pxp) ** 2 + (
                    shifted(py_b, dx, dy) - pyp) ** 2
                flag = flag | (alv & shifted(alv_b, dx, dy) & (d2 < reach2))
            cflag = jnp.any(flag.reshape(cwx, c, cwy, c), axis=(1, 3))
            if upto == 1:
                return acc + cflag.sum()

            ar = 2 * tc - 1
            cany_b = jnp.pad(cany, ((0, ar), (ar, ar)),
                             constant_values=False)
            cflag_b = jnp.pad(cflag, ((0, ar), (ar, ar)),
                              constant_values=False)
            cminx_b = jnp.pad(cminx, ((0, ar), (ar, ar)), constant_values=_BIG)
            cmaxx_b = jnp.pad(cmaxx, ((0, ar), (ar, ar)), constant_values=-_BIG)
            cminy_b = jnp.pad(cminy, ((0, ar), (ar, ar)), constant_values=_BIG)
            cmaxy_b = jnp.pad(cmaxy, ((0, ar), (ar, ar)), constant_values=-_BIG)

            def csh(plane_b, dx, dy):
                return plane_b[dx: dx + cwx, ar + dy: ar + dy + cwy]

            adj = ((0, 0), (0, 1), (1, -1), (1, 0), (1, 1))
            band_masks = []
            for dx, dy in adj:
                band_masks.append(
                    (cflag | csh(cflag_b, dx, dy)) & cany
                    & csh(cany_b, dx, dy))
            band_stack = jnp.stack(band_masks)
            if upto == 2:
                return acc + band_stack.sum()

            def aabb_overlap_shift(dx, dy):
                return (
                    cany & csh(cany_b, dx, dy)
                    & (cminx - m <= csh(cmaxx_b, dx, dy) + m)
                    & (csh(cminx_b, dx, dy) - m <= cmaxx + m)
                    & (cminy - m <= csh(cmaxy_b, dx, dy) + m)
                    & (csh(cminy_b, dx, dy) - m <= cmaxy + m)
                )

            offs = ff.annulus_half_offsets()
            n_words = -(-len(offs) // 32)
            ann_any = jnp.zeros((cwx, cwy), bool)
            ann_count = jnp.zeros((cwx, cwy), jnp.int32)
            wds = [jnp.zeros((cwx, cwy), jnp.uint32) for _ in range(n_words)]
            for i, (dx, dy) in enumerate(offs):
                hit_o = aabb_overlap_shift(dx, dy)
                ann_any = ann_any | hit_o
                ann_count = ann_count + hit_o.astype(jnp.int32)
                wds[i // 32] = wds[i // 32] | (
                    hit_o.astype(jnp.uint32) << jnp.uint32(i % 32))
            if upto == 3:
                return (acc + band_stack.sum() + ann_count.sum()
                        + sum(wd.sum() for wd in wds))
            return acc

        return f

    for label, f in (
        ("S0 AABB reductions (A2 two-step)", stage(0)),
        ("S0 AABB reductions (A1 4-D)", stage(0, "A1")),
        ("S1 + band stencil", stage(1)),
        ("S2 + band chunk masks", stage(2)),
        ("S3 + annulus accumulate + bitmask", stage(3)),
    ):
        t0 = time.time()
        out = f(px, py, alive)
        jax.block_until_ready(out)
        print(f"  [{label}] compile {time.time() - t0:.1f}s", flush=True)
        timeit(label, f, px, py, alive)

    from softbody_tpu.ops import farfield as FFmod
    cnt = jax.jit(functools.partial(
        FFmod.far_candidate_count, s=s, ff=ff, radius=radius))
    pos = jnp.stack([px, py], axis=-1)
    t0 = time.time()
    jax.block_until_ready(cnt(pos, alive)[0])
    print(f"  [S4 full count] compile {time.time() - t0:.1f}s", flush=True)
    timeit("S4 far_candidate_count (full detection)", cnt, pos, alive)

    reb = jax.jit(functools.partial(
        FFmod.rebuild_far_list_planes, s=s, ff=ff, radius=radius))
    t0 = time.time()
    jax.block_until_ready(reb(px, py, alive).ca)
    print(f"  [S5 rebuild] compile {time.time() - t0:.1f}s", flush=True)
    timeit("S5 rebuild (bitmask compaction)", reb, px, py, alive)
    return 0


if __name__ == "__main__":
    sys.exit(main())
