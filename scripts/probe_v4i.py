"""Bisect the v4 rebuild at 1M: detection vs candidate core vs
compaction, and the candidate core's three sources individually."""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    t0 = time.time()
    np.asarray(jax.block_until_ready(jnp.zeros(8)))
    log(f"warmup {time.time() - t0:.1f}s")

    from softbody_tpu import PhysicsConstants, UserInput
    from softbody_tpu.models import tearing_cloth_lattice
    from softbody_tpu.ops import farfield as F
    from softbody_tpu.ops.farfield import (
        FarFieldSpec, _candidates_from_chunks, _chunk_detection,
        rebuild_far_list_from_chunks,
    )
    from softbody_tpu.ops.pallas.fused_substep2 import (
        ALIVE, PAD_H, PAD_W, PX, PY, VX, VY, pack_lattice2, padded_dims,
    )

    lstate, spec, cfg, consts = tearing_cloth_lattice(
        n_particles=1_000_000, fall_speed=2.5, slits=7,
        strain_limit=0.22, yield_strain=0.18,
    )
    hot_cache = "/tmp/v4_active_hot.npy"
    hot = jax.device_put(np.load(hot_cache))
    _, _, immut, ec = pack_lattice2(lstate, tile_w=64)
    w, h = padded_dims(spec.width, spec.height, 64)
    spacing = 980.0 / (lstate.shape[0] - 1)
    ff = FarFieldSpec(max_pairs=8192, max_tile_pairs=256,
                      skin=0.75 * spacing, horizon=8)
    alive = immut[ALIVE] > 0.0

    def interior(p):
        return jax.lax.slice(p, (PAD_W, PAD_H), (PAD_W + w, PAD_H + h))

    alive_int = interior(alive)
    px, py = interior(hot[PX]), interior(hot[PY])
    vx, vy = interior(hot[VX]), interior(hot[VY])

    NS = 16

    def scan_time(label, fn, *args, n=3):
        @jax.jit
        def run(*a):
            def body(c, _):
                return fn(c, *a), None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=NS)
            return c
        out = jax.block_until_ready(run(*args))
        t0 = time.time()
        for _ in range(n):
            out = run(*args)
        jax.block_until_ready(out)
        log(f"{label:52s} {(time.time() - t0) / n / NS * 1e3:8.3f} ms")

    s = spec.collision_stencil
    r = cfg.particle_radius

    def det(c, a, b, vxx, vyy):
        cp = _chunk_detection(a + c * 1e-30, b, alive_int, s=s, ff=ff,
                              radius=r, vxu=vxx, vyu=vyy, dt=cfg.dt)
        return c + cp.iminx[0, 0] * 1e-30
    scan_time("1 _chunk_detection", det, px, py, vx, vy)

    cp0 = _chunk_detection(px, py, alive_int, s=s, ff=ff, radius=r,
                           vxu=vx, vyu=vy, dt=cfg.dt)

    def cand(c, cp_im):
        cp = cp0._replace(iminx=cp_im + c * 1e-30)
        out = _candidates_from_chunks(cp, ff=ff)
        return c + out[1].astype(jnp.float32)[0, 0] * 1e-30
    scan_time("2 _candidates_from_chunks", cand, cp0.iminx)

    def reb(c, cp_im):
        cp = cp0._replace(iminx=cp_im + c * 1e-30)
        fl = rebuild_far_list_from_chunks(cp, px, py, vx, vy, ff=ff)
        return c + fl.n_pairs.astype(jnp.float32) * 1e-30
    scan_time("3 rebuild_from_chunks (cand+compact)", reb, cp0.iminx)

    # source bisection: annulus loop only
    cwx, cwy = cp0.cany.shape
    tc = ff.tile_chunks
    ar = 2 * tc - 1
    ann_offsets = ff.annulus_half_offsets()
    log(f"annulus offsets: {len(ann_offsets)}  chunk grid {cwx}x{cwy}")

    def ann_only(c, im):
        iminx = im + c * 1e-30
        imaxx, iminy, imaxy = cp0.imaxx, cp0.iminy, cp0.imaxy
        cany = cp0.cany
        cminx_b = jnp.pad(iminx, ((0, ar), (ar, ar)),
                          constant_values=F._BIG)
        cmaxx_b = jnp.pad(imaxx, ((0, ar), (ar, ar)),
                          constant_values=-F._BIG)
        cminy_b = jnp.pad(iminy, ((0, ar), (ar, ar)),
                          constant_values=F._BIG)
        cmaxy_b = jnp.pad(imaxy, ((0, ar), (ar, ar)),
                          constant_values=-F._BIG)
        cany_b = jnp.pad(cany, ((0, ar), (ar, ar)),
                         constant_values=False)

        def csh(pb, dx, dy):
            return pb[dx:dx + cwx, ar + dy:ar + dy + cwy]

        n_words = -(-len(ann_offsets) // 32)
        ann_any = jnp.zeros((cwx, cwy), bool)
        ann_count = jnp.zeros((cwx, cwy), jnp.int32)
        words = [jnp.zeros((cwx, cwy), jnp.uint32)
                 for _ in range(n_words)]
        for i, (dx, dy) in enumerate(ann_offsets):
            hit = (cany & csh(cany_b, dx, dy)
                   & (iminx <= csh(cmaxx_b, dx, dy))
                   & (csh(cminx_b, dx, dy) <= imaxx)
                   & (iminy <= csh(cmaxy_b, dx, dy))
                   & (csh(cminy_b, dx, dy) <= imaxy))
            ann_any = ann_any | hit
            ann_count = ann_count + hit.astype(jnp.int32)
            words[i // 32] = words[i // 32] | (
                hit.astype(jnp.uint32) << jnp.uint32(i % 32))
        acc = ann_count.sum().astype(jnp.float32)
        for ww in words:
            acc = acc + ww.sum().astype(jnp.float32)
        return c + acc * 1e-30
    scan_time("4 annulus loop only", ann_only, cp0.iminx)

    # stacked-annulus variant (no OR chain)
    def ann_stacked(c, im):
        iminx = im + c * 1e-30
        imaxx, iminy, imaxy = cp0.imaxx, cp0.iminy, cp0.imaxy
        cany = cp0.cany
        cminx_b = jnp.pad(iminx, ((0, ar), (ar, ar)),
                          constant_values=F._BIG)
        cmaxx_b = jnp.pad(imaxx, ((0, ar), (ar, ar)),
                          constant_values=-F._BIG)
        cminy_b = jnp.pad(iminy, ((0, ar), (ar, ar)),
                          constant_values=F._BIG)
        cmaxy_b = jnp.pad(imaxy, ((0, ar), (ar, ar)),
                          constant_values=-F._BIG)
        cany_b = jnp.pad(cany, ((0, ar), (ar, ar)),
                         constant_values=False)

        def csh(pb, dx, dy):
            return pb[dx:dx + cwx, ar + dy:ar + dy + cwy]

        hits = jnp.stack([
            (cany & csh(cany_b, dx, dy)
             & (iminx <= csh(cmaxx_b, dx, dy))
             & (csh(cminx_b, dx, dy) <= imaxx)
             & (iminy <= csh(cmaxy_b, dx, dy))
             & (csh(cminy_b, dx, dy) <= imaxy))
            for dx, dy in ann_offsets
        ])                                        # [108, cwx, cwy]
        ann_any = jnp.any(hits, axis=0)
        ann_count = jnp.sum(hits.astype(jnp.int32), axis=0)
        n_off = len(ann_offsets)
        n_words = -(-n_off // 32)
        pad = n_words * 32 - n_off
        hw = jnp.pad(hits.astype(jnp.uint32),
                     ((0, pad), (0, 0), (0, 0)))
        hw = hw.reshape(n_words, 32, cwx, cwy)
        shifts = jnp.arange(32, dtype=jnp.uint32)[None, :, None, None]
        words = jnp.bitwise_or.reduce((hw << shifts), axis=1)
        acc = (ann_count.sum().astype(jnp.float32)
               + words.sum().astype(jnp.float32))
        return c + ann_any.any().astype(jnp.float32) * 1e-30 + acc * 1e-30
    scan_time("5 annulus stacked variant", ann_stacked, cp0.iminx)


if __name__ == "__main__":
    main()
