"""Bisect the auto-frame per-substep overhead at 1M and measure the v3
path end-to-end (r3).  Donation-safe: every section re-device_puts from
host copies.

Sections:
  A  fused_frame2 (no far machinery)            — baseline ~766/s
  B  fused_frame2_auto, empty list, K=512       — r2 idle path
  G  fused_frame3_auto, empty list, K=512       — v3 idle path
  H  fused_frame3_auto, empty list, K=8192 (buckets 512/2048)
  D  list_invalid alone
  E  rebuild tc=4, K=512 / 8192
  F  far apply alone, K=512 / 2048 / 8192
  I  12-frame bench-like v3 run, K=8192 skin=0.5sp hor=16, per-frame
     stats through the FusedLatticeBackend
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(m):
    print(m, file=sys.stderr, flush=True)


def timeit(label, fn, n=10):
    out = fn()
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    log(f"{label:48s} {(time.time() - t0) / n * 1e3:9.3f} ms")
    return out


def main():
    t0 = time.time()
    np.asarray(jax.block_until_ready(jnp.zeros(8)))
    log(f"warmup {time.time() - t0:.1f}s")

    from softbody_tpu import PhysicsConstants, UserInput
    from softbody_tpu.models import tearing_cloth_lattice
    from softbody_tpu.ops.farfield import (
        FarFieldSpec, empty_far_list, far_collision_terms, list_invalid,
        rebuild_far_list_planes,
    )
    from softbody_tpu.ops.pallas.fused_substep2 import (
        PX, PY, VX, VY, ALIVE,
        far3_carry_init, fused_frame2, fused_frame2_auto,
        fused_frame3_auto, pack_lattice2,
    )

    lstate, spec, cfg, consts = tearing_cloth_lattice(
        n_particles=1_000_000, fall_speed=2.5, slits=7,
        strain_limit=0.22, yield_strain=0.18,
    )
    uin = UserInput.none()
    w, h = lstate.shape
    spacing = 980.0 / (w - 1)
    hot0, obs0, immut, ec = pack_lattice2(lstate, tile_w=64)
    hot_np, obs_np = np.asarray(hot0), np.asarray(obs0)
    del hot0, obs0
    alive = immut[ALIVE] > 0.0
    nsub = cfg.subticks

    def fresh():
        return jax.device_put(hot_np), jax.device_put(obs_np)

    # A
    hot, obs = fresh()

    def run_a():
        nonlocal hot, obs
        hot, obs = fused_frame2(hot, obs, immut, ec, consts, uin, spec,
                                cfg, tile_w=64)
        return hot
    timeit(f"A v2 plain ({nsub} sub)", run_a, n=6)

    # B: v2 auto empty K=512
    ffb = FarFieldSpec(max_pairs=512, max_tile_pairs=256,
                       skin=1.5 * spacing, horizon=32)
    hot, obs = fresh()
    flb = empty_far_list(hot.shape[1], hot.shape[2], ffb)

    def run_b():
        nonlocal hot, obs, flb
        hot, obs, flb, _ = fused_frame2_auto(
            hot, obs, immut, ec, flb, consts, uin, spec, cfg, ffb,
            tile_w=64)
        return hot
    timeit(f"B v2 auto empty K=512 ({nsub} sub)", run_b, n=6)

    # G/H: v3 auto empty
    for k, buckets in ((512, (128,)), (8192, (512, 2048))):
        ffk = FarFieldSpec(max_pairs=k, max_tile_pairs=256,
                           skin=0.5 * spacing, horizon=16)
        hot, obs = fresh()
        flk = empty_far_list(hot.shape[1], hot.shape[2], ffk)
        sd, tg = far3_carry_init(hot, immut, cfg, spec, ffk, tile_w=64)

        def run_g():
            nonlocal hot, obs, flk, sd, tg
            hot, obs, flk, sd, tg, _ = fused_frame3_auto(
                hot, obs, immut, ec, flk, sd, tg, consts, uin, spec,
                cfg, ffk, tile_w=64, buckets=buckets)
            return hot
        timeit(f"GH v3 auto empty K={k} ({nsub} sub)", run_g, n=6)

    # D: trigger alone
    hot, obs = fresh()
    ffd = FarFieldSpec(max_pairs=512, max_tile_pairs=256,
                       skin=1.5 * spacing, horizon=32)
    fld = rebuild_far_list_planes(
        hot[PX], hot[PY], alive, s=spec.collision_stencil, ff=ffd,
        radius=cfg.particle_radius, vx=hot[VX], vy=hot[VY], dt=cfg.dt)
    jit_trig = jax.jit(lambda m, f: list_invalid(
        m[PX], m[PY], m[VX], m[VY], alive, f, cfg.dt, ffd))
    timeit("D list_invalid", lambda: jit_trig(hot, fld))

    # E: rebuild
    for k in (512, 8192):
        ffe = FarFieldSpec(max_pairs=k, max_tile_pairs=256,
                           skin=0.5 * spacing, horizon=16)
        jit_reb = jax.jit(
            lambda m, _ff=ffe: rebuild_far_list_planes(
                m[PX], m[PY], alive, s=spec.collision_stencil, ff=_ff,
                radius=cfg.particle_radius, vx=m[VX], vy=m[VY],
                dt=cfg.dt))
        timeit(f"E rebuild tc4 K={k}", lambda: jit_reb(hot))

    # F: apply alone
    for k in (512, 2048, 8192):
        ffk = FarFieldSpec(max_pairs=k, max_tile_pairs=256,
                           skin=0.5 * spacing, horizon=16)
        flk = empty_far_list(hot.shape[1], hot.shape[2], ffk)
        jit_ap = jax.jit(
            lambda m, f, _ff=ffk: far_collision_terms(
                m[PX], m[PY], m[VX], m[VY], alive, f,
                s=spec.collision_stencil, ff=_ff,
                radius=cfg.particle_radius,
                dt=cfg.dt, ecoeff=0.75, friction=0.1,
                world_h=hot.shape[2])[0])
        timeit(f"F apply K={k} (idle)", lambda: jit_ap(hot, flk))

    # I: end-to-end bench-like v3 via the backend
    from softbody_tpu.engine.backends import FusedLatticeBackend

    ffi = FarFieldSpec(max_pairs=8192, max_tile_pairs=256,
                       skin=0.5 * spacing, horizon=16)
    backend = FusedLatticeBackend(spec, cfg, farfield=ffi, tile_w=64)
    state = backend.pack_state(lstate)
    t0 = time.time()
    state = backend.step(state, consts, uin)
    jax.block_until_ready(state[0])
    log(f"I compile+first frame {time.time() - t0:.1f}s")
    for f in range(12):
        t0 = time.time()
        state = backend.step(state, consts, uin)
        _ = jax.device_get(state[0][0, 8, 128])
        dt_f = time.time() - t0
        fl = backend._far_list
        npair, over = jax.device_get((fl.n_pairs, fl.overflow))
        st = backend.far_stats()
        log(json.dumps(dict(frame=f + 1, s=round(nsub / dt_f, 1),
                            pairs=int(npair), over=int(over), **st)))
    finite = bool(np.isfinite(
        np.asarray(jax.device_get(state[0][:2]))).all())
    log(f"I finite={finite}")


if __name__ == "__main__":
    main()
