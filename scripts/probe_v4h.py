"""Measure the (4,32)-record v4 pipeline at 1M: new rebuild (strip
caps), new apply stages, full frame.  Reuses /tmp/v4_active_hot.npy."""

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
    from softbody_tpu.ops.farfield import (
        FarFieldSpec, crop_far_list, rebuild_far_list_planes,
    )
    from softbody_tpu.ops.farfield4 import (
        bucketed_far_delta_planes, far_terms_from_mirror, mirror_table,
        unmirror_table,
    )
    from softbody_tpu.ops.pallas.fused_substep2 import (
        ALIVE, PAD_H, PAD_W, PX, PY, VX, VY,
        fused_frame2, fused_frame4, pack_lattice2, padded_dims,
    )

    lstate, spec, cfg, consts = tearing_cloth_lattice(
        n_particles=1_000_000, fall_speed=2.5, slits=7,
        strain_limit=0.22, yield_strain=0.18,
    )
    uin = UserInput.none()
    hot0, obs0, immut, ec = pack_lattice2(lstate, tile_w=64)
    w, h = padded_dims(spec.width, spec.height, 64)
    spacing = 980.0 / (lstate.shape[0] - 1)
    ffk = FarFieldSpec(max_pairs=8192, max_tile_pairs=256,
                       skin=0.75 * spacing, horizon=8)

    cache = "/tmp/v4_active_hot.npy"
    if os.path.exists(cache):
        hot = jax.device_put(np.load(cache))
        log("loaded cached active state")
    else:
        hot, obs = hot0, obs0
        for _ in range(10):
            hot, obs, st = fused_frame4(hot, obs, immut, ec, consts,
                                        uin, spec, cfg, ffk, tile_w=64)
        np.save(cache, np.asarray(jax.device_get(hot)))
        log(f"advanced 10 frames: {np.asarray(st)}")
    obs = obs0
    del hot0

    alive = immut[ALIVE] > 0.0

    def interior(p):
        return jax.lax.slice(p, (PAD_W, PAD_H), (PAD_W + w, PAD_H + h))

    alive_int = interior(alive)
    alive_f = alive_int.astype(jnp.float32)
    planes5 = jnp.stack([interior(hot[PX]), interior(hot[PY]),
                         interior(hot[VX]), interior(hot[VY]), alive_f])
    fl_full = rebuild_far_list_planes(
        interior(hot[PX]), interior(hot[PY]), alive_int,
        s=spec.collision_stencil, ff=ffk, radius=cfg.particle_radius,
        vx=interior(hot[VX]), vy=interior(hot[VY]), dt=cfg.dt)
    log(f"n_pairs={int(fl_full.n_pairs)} overflow={int(fl_full.overflow)}")
    table0 = mirror_table(planes5)

    NS = 32

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

    # rebuild with new strip caps (mc=4096)
    for K in (8192, 32768):
        ffK = FarFieldSpec(max_pairs=K, max_tile_pairs=256,
                           skin=0.75 * spacing, horizon=8)

        def reb(c, m, _ff=ffK):
            mm = m.at[PX, 0, 0].add(c * 1e-30)
            fl = rebuild_far_list_planes(
                interior(mm[PX]), interior(mm[PY]), alive_int,
                s=spec.collision_stencil, ff=_ff,
                radius=cfg.particle_radius, vx=interior(mm[VX]),
                vy=interior(mm[VY]), dt=cfg.dt)
            return c + fl.n_pairs.astype(jnp.float32) * 1e-30
        scan_time(f"rebuild mc=4096 K={K}", reb, hot)

    # mirror alone (interior planes)
    def mir(c, pl):
        tab = mirror_table(pl + c * 1e-30)
        return c + tab[0, 0] * 1e-30
    scan_time("mirror_table (4,32) interior", mir, planes5)

    def unmir(c, tb):
        out = unmirror_table(tb + c * 1e-30, w=w, h=h)
        return c + out[0, 0, 0] * 1e-30
    scan_time("unmirror_table", unmir, table0)

    # apply at crops
    for K in (1024, 4096):
        fl = crop_far_list(fl_full, K)

        def ap(c, tab, _fl=fl):
            tab = tab + c * 1e-30
            dtab = far_terms_from_mirror(
                tab, _fl, s=spec.collision_stencil, ff=ffk,
                radius=cfg.particle_radius, dt=cfg.dt, ecoeff=0.75,
                friction=consts.friction, w=w, h=h)
            return c + dtab[0, 0] * 1e-30
        scan_time(f"apply K={K} (records)", ap, table0)

    # full bucketed chain (mirror+apply+unmirror inside switch)
    def chain(c, pl, fl_=fl_full):
        pl = pl + c * 1e-30
        out = bucketed_far_delta_planes(
            pl, fl_, s=spec.collision_stencil, ff=ffk,
            radius=cfg.particle_radius, dt=cfg.dt, ecoeff=0.75,
            friction=consts.friction, w=w, h=h)
        return c + out[0, 0, 0] * 1e-30
    scan_time("full bucketed chain (active)", chain, planes5)

    # full v4 frame, active + flat
    def run_g():
        nonlocal hot, obs
        hot, obs, _st = fused_frame4(hot, obs, immut, ec, consts, uin,
                                     spec, cfg, ffk, tile_w=64)
        return hot

    out = run_g()
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(3):
        out = run_g()
    jax.block_until_ready(out)
    log(f"G v4 far-active /sub: {(time.time()-t0)/3/cfg.subticks*1e3:.3f} ms")


if __name__ == "__main__":
    main()
