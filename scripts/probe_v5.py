"""Bisect the v2/v3 auto-frame per-substep overheads at 1M and measure
the far-field rebuild + apply pieces IN-SCAN (single jit; the axon
per-call dispatch floor is ~1.7 ms, so only scan-internal numbers are
real).  Informs the r3 far-field redesign:

  A   fused_frame2 plain                      (baseline, ~1.33 ms/sub)
  B   fused_frame2_far, empty K=512          (far input + empty apply)
  C   kernel trig=True (refs in, stats out), no detect, no conds
  D   kernel detect=True, X_DET=0
  E   kernel detect=True, X_DET=1
  F   in-scan current far apply (far_collision_terms) K=512/2048, full
  G   in-scan v4 row apply K=2048/8192 bisected: gather+math / +scatter
      / +planes
  H   in-scan FULL XLA rebuild (rebuild_far_list_planes) K=2048
  I   in-scan side-core rebuild (raw_planes_from_side → candidates)
      K=2048
"""

from __future__ import annotations

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

    import dataclasses as dc

    from softbody_tpu import PhysicsConstants, UserInput
    from softbody_tpu.models import tearing_cloth_lattice
    from softbody_tpu.ops import farfield as ffm
    from softbody_tpu.ops.farfield import (
        ChunkPlanes, FarFieldSpec, chunk_any_alive, empty_far_list,
        extrude_chunk_planes, far_collision_terms,
        kernel_side_from_planes, raw_planes_from_side,
        rebuild_far_list_from_chunks, rebuild_far_list_planes,
    )
    from softbody_tpu.ops.pallas import fused_substep2 as fs2
    from softbody_tpu.ops.pallas.fused_substep2 import (
        ALIVE, PAD_H, PAD_W, PX, PY, VX, VY,
        _consts_vector, fused_frame2, fused_frame2_far,
        fused_substep2_call, pack_lattice2, padded_dims,
    )

    lstate, spec, cfg, consts = tearing_cloth_lattice(
        n_particles=1_000_000, fall_speed=2.5, slits=7,
        strain_limit=0.22, yield_strain=0.18,
    )
    uin = UserInput.none()
    wl, hl = lstate.shape
    spacing = 980.0 / (wl - 1)
    hot0, obs0, immut, ec = pack_lattice2(lstate, tile_w=64)
    hot_np, obs_np = np.asarray(hot0), np.asarray(obs0)
    del hot0, obs0
    alive = immut[ALIVE] > 0.0
    nsub = cfg.subticks
    tile_w = 64
    w, h = padded_dims(spec.width, spec.height, tile_w)
    ht = h + 2 * PAD_H
    cvec0 = jnp.concatenate(
        [_consts_vector(consts, uin, cfg, spec.height), ec]
    )
    quantized = cfg.force_mode == "quantized"
    stencil = spec.collision_stencil
    kw = dict(w=w, h=h, stencil=stencil, quantized=quantized,
              tile_w=tile_w)

    def fresh():
        return jax.device_put(hot_np), jax.device_put(obs_np)

    def frame_time(label, fn, n=5):
        out = fn()
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        t0 = time.time()
        for _ in range(n):
            out = fn()
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        ms = (time.time() - t0) / n / nsub * 1e3
        log(f"{label:56s} {ms:8.4f} ms/sub")

    # A
    hot, obs = fresh()

    def run_a():
        nonlocal hot, obs
        hot, obs = fused_frame2(hot, obs, immut, ec, consts, uin, spec,
                                cfg, tile_w=tile_w)
        return hot
    frame_time("A fused_frame2 plain", run_a)

    # B: far input + empty apply, no trigger/cond
    ffb = FarFieldSpec(max_pairs=512, max_tile_pairs=256,
                       skin=0.5 * spacing, horizon=16)
    hot, obs = fresh()
    flb = empty_far_list(hot.shape[1], hot.shape[2], ffb)

    def run_b():
        nonlocal hot, obs
        hot, obs = fused_frame2_far(hot, obs, immut, ec, flb, consts,
                                    uin, spec, cfg, ffb, tile_w=tile_w)
        return hot
    frame_time("B frame2_far empty K=512", run_b)

    # C/D/E: kernel feature cost via custom scans
    def extras_vec(det):
        return jnp.stack([
            jnp.float32(cfg.dt), jnp.float32(det),
            jnp.float32(0), jnp.float32(0),
            jnp.float32(17 * cfg.dt),
            jnp.float32(2 * cfg.particle_radius + ffb.skin),
            jnp.float32(2.0 * cfg.dt), jnp.float32(0.0),
        ])

    def mk_trig_frame(det_flag, detect):
        cv = jnp.concatenate([cvec0, extras_vec(det_flag)])

        @jax.jit
        def go(hot):
            refs = jnp.stack([hot[PX], hot[PY], hot[VX], hot[VY]])

            def body(m, _):
                outs = fused_substep2_call(
                    m, immut, cv, refs=refs, detect=detect, **kw)
                return outs[0], None
            hot2, _ = jax.lax.scan(body, hot, None, length=nsub)
            return hot2
        return go

    for label, fn in (
        ("C kernel trig, no detect", mk_trig_frame(0.0, False)),
        ("D kernel detect X_DET=0", mk_trig_frame(0.0, True)),
        ("E kernel detect X_DET=1", mk_trig_frame(1.0, True)),
    ):
        hot, obs = fresh()

        def run_cde(fn=fn):
            nonlocal hot
            hot = fn(hot)
            return hot
        frame_time(label, run_cde)

    # F: current far apply in-scan (fixed synthetic list, full pair path)
    rng = np.random.default_rng(0)
    hot, obs = fresh()
    for k in (512, 2048):
        ffk = FarFieldSpec(max_pairs=k, max_tile_pairs=256,
                           skin=0.5 * spacing, horizon=16)
        fl = empty_far_list(hot.shape[1], hot.shape[2], ffk)
        cwx, cwy, _, _ = ffm._chunk_dims(hot.shape[1], hot.shape[2], ffk)
        ncc = cwx * cwy
        fl = dc.replace(
            fl,
            ca=jnp.asarray(rng.integers(0, ncc, k), jnp.int32),
            cb=jnp.asarray(rng.integers(0, ncc, k), jnp.int32),
            valid=jnp.ones(k, bool),
            n_pairs=jnp.int32(k),
        )

        @jax.jit
        def go_f(hot, fl=fl, ffk=ffk):
            def body(c, i):
                m = hot.at[PX, 0, 0].add(c * 1e-30)
                d = far_collision_terms(
                    m[PX], m[PY], m[VX], m[VY], alive, fl,
                    s=stencil, ff=ffk, radius=cfg.particle_radius,
                    dt=cfg.dt, ecoeff=0.75, friction=0.1, world_h=ht)
                return c + d[0][0, 0], None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=nsub)
            return c

        def run_f():
            return go_f(hot)
        frame_time(f"F current apply K={k} (all-valid)", run_f)

    # G: v4 row apply bisected (on the real packed planes)
    wp_, hp_ = hot.shape[1], hot.shape[2]
    c4 = 4
    cwx4, cwy4 = wp_ // c4, hp_ // c4
    C4 = cwx4 * cwy4
    for k in (2048, 8192):
        ca = jnp.asarray(np.sort(rng.integers(0, C4, k)), jnp.int32)
        cb = jnp.asarray(rng.integers(0, C4, k), jnp.int32)

        def z_of(m):
            p = jnp.stack([m[PX], m[PY], m[VX], m[VY],
                           alive.astype(jnp.float32)])
            z = p.reshape(5, cwx4, c4, cwy4, c4).transpose(1, 3, 2, 4, 0)
            return z.reshape(C4, 16 * 5)

        def pair_math(z, K):
            ga = jnp.take(z, ca, axis=0).reshape(K, 16, 5)
            gb = jnp.take(z, cb, axis=0).reshape(K, 16, 5)
            dx = ga[:, :, None, 0] - gb[:, None, :, 0]
            dy = ga[:, :, None, 1] - gb[:, None, :, 1]
            d2 = dx * dx + dy * dy
            ok = (d2 < 4.0 * cfg.particle_radius**2) & (
                ga[:, :, None, 4] > 0) & (gb[:, None, :, 4] > 0)
            inv = jax.lax.rsqrt(jnp.maximum(d2, 1e-12))
            dvx = ga[:, :, None, 2] - gb[:, None, :, 2]
            dvy = ga[:, :, None, 3] - gb[:, None, :, 3]
            jn = jnp.where(ok, (dvx * dx + dvy * dy) * inv, 0.0)
            ix = jnp.sum(jn * dx * inv, axis=2)
            iy = jnp.sum(jn * dy * inv, axis=2)
            return jnp.concatenate([ix, iy], axis=1)  # [K, 32]

        @jax.jit
        def g_math(hot, K=k):
            def body(c, i):
                m = hot.at[PX, 0, 0].add(c * 1e-30)
                imp = pair_math(z_of(m), K)
                return c + imp[0, 0], None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=nsub)
            return c

        @jax.jit
        def g_scat(hot, K=k):
            def body(c, i):
                m = hot.at[PX, 0, 0].add(c * 1e-30)
                imp = pair_math(z_of(m), K)
                out = jnp.zeros((C4, 32), jnp.float32).at[ca].add(imp)
                return c + out[0, 0], None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=nsub)
            return c

        @jax.jit
        def g_planes(hot, K=k):
            def body(c, i):
                m = hot.at[PX, 0, 0].add(c * 1e-30)
                imp = pair_math(z_of(m), K)
                out = jnp.zeros((C4, 32), jnp.float32).at[ca].add(imp)
                q = out.reshape(cwx4, cwy4, c4, c4, 2).transpose(
                    4, 0, 2, 1, 3)
                return c + q.reshape(2, wp_, hp_)[0, 0, 0], None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=nsub)
            return c

        frame_time(f"G v4 gather+math K={k}", lambda: g_math(hot))
        frame_time(f"G v4 +scatter K={k}", lambda: g_scat(hot))
        frame_time(f"G v4 +planes K={k}", lambda: g_planes(hot))

    # H: full XLA rebuild in-scan
    for k in (2048,):
        ffk = FarFieldSpec(max_pairs=k, max_tile_pairs=256,
                           skin=0.5 * spacing, horizon=4)

        @jax.jit
        def go_h(hot, ffk=ffk):
            def body(c, i):
                m = hot.at[PX, 0, 0].add(c * 1e-30)
                fl = rebuild_far_list_planes(
                    m[PX], m[PY], alive, s=stencil, ff=ffk,
                    radius=cfg.particle_radius, vx=m[VX], vy=m[VY],
                    dt=cfg.dt)
                return c + fl.n_pairs.astype(jnp.float32), None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=nsub)
            return c
        frame_time(f"H full XLA rebuild K={k} hor=4", lambda: go_h(hot))

    # I: side-core rebuild in-scan (what the v3 rebuild branch runs)
    ffk = FarFieldSpec(max_pairs=2048, max_tile_pairs=256,
                       skin=0.5 * spacing, horizon=4)
    cany = chunk_any_alive(alive, ffk)
    side0 = kernel_side_from_planes(
        hot[PX], hot[PY], alive, hot[VX], hot[VY],
        s=stencil, ff=ffk, radius=cfg.particle_radius,
        T_band=float(5 * cfg.dt), vbar=(jnp.float32(0), jnp.float32(0)),
        interior_off=(PAD_W, PAD_H), interior_shape=(w, h),
    )

    @jax.jit
    def go_i(hot, side0=side0, ffk=ffk):
        def body(c, i):
            m = hot.at[PX, 0, 0].add(c * 1e-30)
            side = side0 + c * 1e-30
            raw = raw_planes_from_side(side, hot.shape[1], hot.shape[2],
                                       (PAD_W, PAD_H), ffk)
            T = jnp.float32(5 * cfg.dt)
            iminx, imaxx, iminy, imaxy = extrude_chunk_planes(
                raw, cany, ff=ffk, radius=cfg.particle_radius, T=T,
                extruded=True)
            cp = ChunkPlanes(iminx, imaxx, iminy, imaxy, cany, raw.band,
                             jnp.zeros(2, jnp.float32))
            fl = rebuild_far_list_from_chunks(
                cp, m[PX], m[PY], m[VX], m[VY], ff=ffk)
            return c + fl.n_pairs.astype(jnp.float32), None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=nsub)
        return c
    frame_time("I side-core rebuild K=2048 hor=4", lambda: go_i(hot))


if __name__ == "__main__":
    main()
