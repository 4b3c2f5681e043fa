"""v4 frame cost bisection at 1M (round 3).

In-scan measurements (64-iter lax.scan, carry perturbation):

  A   fused_frame2 plain              (kernel floor)
  B   fused_frame4, flat cloth        (bucket-0 path: mirror gated?)
  C   rebuild_far_list_planes alone, K in {8192, 32768}
  D   raw_chunk_planes pooling only (creduce set)
  E   band pass only (the ~100-offset exact particle test)
  F   mirror_table + bucketed apply at forced bucket, pairs real
      (advance the scene until pairs exist)
  G   fused_frame4 on the advanced (far-active) state
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

    from softbody_tpu import PhysicsConstants, UserInput
    from softbody_tpu.models import tearing_cloth_lattice
    from softbody_tpu.ops import farfield as ffm
    from softbody_tpu.ops.farfield import (
        FarFieldSpec,
        raw_chunk_planes,
        rebuild_far_list_planes,
    )
    from softbody_tpu.ops.farfield4 import (
        bucketed_far_delta_planes,
        mirror_table,
    )
    from softbody_tpu.ops.pallas.fused_substep2 import (
        ALIVE, PX, PY, VX, VY,
        fused_frame2, fused_frame4, pack_lattice2,
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
    alive_f = alive.astype(jnp.float32)
    nsub = cfg.subticks

    def fresh():
        return jax.device_put(hot_np), jax.device_put(obs_np)

    def timeit(label, fn, n=3, iters=1):
        out = fn()
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        t0 = time.time()
        for _ in range(n):
            out = fn()
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        per = (time.time() - t0) / n / iters * 1e3
        log(f"{label:52s} {per:9.3f} ms")
        return out

    # A: kernel floor
    hot, obs = fresh()

    def run_a():
        nonlocal hot, obs
        hot, obs = fused_frame2(hot, obs, immut, ec, consts, uin, spec,
                                cfg, tile_w=64)
        return hot
    timeit(f"A v2 plain /sub", run_a, n=4, iters=nsub)

    # B: v4 flat (pairs=0) at two capacities
    for k in (8192, 32768):
        ffk = FarFieldSpec(max_pairs=k, max_tile_pairs=256,
                           skin=0.75 * spacing, horizon=8)
        hot, obs = fresh()

        def run_b(_ff=ffk):
            nonlocal hot, obs
            hot, obs, st = fused_frame4(hot, obs, immut, ec, consts,
                                        uin, spec, cfg, _ff, tile_w=64)
            return hot
        timeit(f"B v4 flat K={k} /sub", run_b, n=3, iters=nsub)

    # C: rebuild alone (in-scan)
    hot, obs = fresh()
    for k in (8192, 32768):
        ffk = FarFieldSpec(max_pairs=k, max_tile_pairs=256,
                           skin=0.75 * spacing, horizon=8)

        @jax.jit
        def reb_scan(m, _ff=ffk):
            def body(c, _):
                mm = m.at[PX, 0, 0].add(c * 1e-30)
                fl = rebuild_far_list_planes(
                    mm[PX], mm[PY], alive, s=spec.collision_stencil,
                    ff=_ff, radius=cfg.particle_radius, vx=mm[VX],
                    vy=mm[VY], dt=cfg.dt)
                return c + fl.n_pairs.astype(jnp.float32) * 1e-30, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=16)
            return c
        timeit(f"C rebuild K={k}", lambda _f=reb_scan: _f(hot), n=3,
               iters=16)

    # D/E: detection parts
    ffk = FarFieldSpec(max_pairs=8192, max_tile_pairs=256,
                       skin=0.75 * spacing, horizon=8)

    @jax.jit
    def pool_scan(m):
        def body(c, _):
            mm = m.at[PX, 0, 0].add(c * 1e-30)
            raw, cany, com = raw_chunk_planes(
                mm[PX], mm[PY], alive, s=spec.collision_stencil,
                ff=ffk, radius=cfg.particle_radius, vxu=mm[VX],
                vyu=mm[VY], T_band=8 * cfg.dt, vbar=(jnp.float32(0),
                                                     jnp.float32(0)))
            return c + raw.minx[0, 0] * 1e-30 + com[0] * 1e-30, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=16)
        return c
    timeit("D raw_chunk_planes (pool+band+com)", lambda: pool_scan(hot),
           n=3, iters=16)

    # E: band-only variant — position-only raw planes (no velocity
    # machinery) isolates pooling+band without extrusion deviation work
    @jax.jit
    def pos_scan(m):
        def body(c, _):
            mm = m.at[PX, 0, 0].add(c * 1e-30)
            raw, cany, com = raw_chunk_planes(
                mm[PX], mm[PY], alive, s=spec.collision_stencil,
                ff=ffk, radius=cfg.particle_radius)
            return c + raw.minx[0, 0] * 1e-30 + com[0] * 1e-30, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=16)
        return c
    timeit("E raw_chunk_planes position-only", lambda: pos_scan(hot),
           n=3, iters=16)

    # F: mirror + apply on a far-active state: advance 10 frames first
    log("advancing 10 frames to the far-active phase...")
    hot, obs = fresh()
    for _ in range(10):
        hot, obs, st = fused_frame4(hot, obs, immut, ec, consts, uin,
                                    spec, cfg, ffk, tile_w=64)
    st = np.asarray(st)
    log(f"state: rebuilds={st[0]} pairs={st[1]} overflow={st[2]}")

    fl0 = rebuild_far_list_planes(
        hot[PX], hot[PY], alive, s=spec.collision_stencil, ff=ffk,
        radius=cfg.particle_radius, vx=hot[VX], vy=hot[VY], dt=cfg.dt)
    log(f"fresh list n_pairs={int(fl0.n_pairs)}")

    @jax.jit
    def mirror_scan(m):
        def body(c, _):
            mm = m.at[PX, 0, 0].add(c * 1e-30)
            tab = mirror_table(jnp.stack(
                [mm[PX], mm[PY], mm[VX], mm[VY], alive_f]))
            return c + tab[0, 0] * 1e-30, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=32)
        return c
    timeit("F mirror_table (padded planes)", lambda: mirror_scan(hot),
           n=3, iters=32)

    @jax.jit
    def apply_scan(m, fl):
        def body(c, _):
            mm = m.at[PX, 0, 0].add(c * 1e-30)
            tab = mirror_table(jnp.stack(
                [mm[PX], mm[PY], mm[VX], mm[VY], alive_f]))
            far = bucketed_far_delta_planes(
                tab, fl, s=spec.collision_stencil, ff=ffk,
                radius=cfg.particle_radius, dt=cfg.dt, ecoeff=0.75,
                friction=consts.friction, w=mm.shape[1], h=mm.shape[2])
            return c + far[0, 0, 0] * 1e-30, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=32)
        return c
    timeit("F mirror+bucketed apply (active)", lambda: apply_scan(hot, fl0),
           n=3, iters=32)

    # G: v4 full frame on the active state
    def run_g():
        nonlocal hot, obs
        hot, obs, _st = fused_frame4(hot, obs, immut, ec, consts, uin,
                                     spec, cfg, ffk, tile_w=64)
        return hot
    timeit("G v4 far-active /sub", run_g, n=3, iters=nsub)


if __name__ == "__main__":
    main()
