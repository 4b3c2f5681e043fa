"""Far-field cost breakdown at the BENCHED tear state (1M scene).

The sweep's one-process rows have disagreed with standalone bench.py
runs (buckets2048 measured 399 vs 485 for the same apply bucket), so
this probe isolates the pieces directly on the real tear-window state:

  kernel   — near-field-only substep (scan of 64)
  napply K — narrow-row apply at capacity K (per substep)
  mapply K — mirror-table apply at capacity K (per substep)
  rebuild  — plain v4 rebuild
  rebact   — rebuild + activation schedule
  act      — n_active per substep of one cadence block (prints)

Run: python - < scripts/probe_r5.py   (one axon client at a time!)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
                if "__file__" in globals() else "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def main() -> int:
    t0 = time.time()
    np.asarray(jax.block_until_ready(jnp.zeros(8)))
    print(f"warmup readback {time.time() - t0:.1f}s; "
          f"devices={jax.devices()}", flush=True)

    from softbody_tpu import PhysicsConstants, UserInput
    from softbody_tpu.engine.backends import FusedLatticeBackend
    from softbody_tpu.models import tearing_cloth_lattice
    from softbody_tpu.ops.farfield import (
        FarFieldSpec,
        crop_far_list,
        rebuild_far_list_planes,
        rebuild_far_list_planes_active,
    )
    from softbody_tpu.ops.farfield4 import (
        far_delta_planes_narrow,
        far_terms_from_mirror,
        mirror_table,
        unmirror_table,
    )
    from softbody_tpu.ops.pallas.fused_substep2 import (
        ALIVE, PAD_H, PAD_W, PX, PY, VX, VY, padded_dims,
    )

    n_target = int(os.environ.get("PROBE_N", 1_000_000))
    uin = UserInput.none()
    lstate, spec, cfg, consts = tearing_cloth_lattice(
        n_particles=n_target, fall_speed=2.5, slits=7,
        strain_limit=0.22, yield_strain=0.18,
    )
    w_, h_ = lstate.shape
    spacing = 980.0 / (w_ - 1)
    ff = FarFieldSpec(max_pairs=16384, max_tile_pairs=256,
                      skin=0.75 * spacing, horizon=8)
    backend = FusedLatticeBackend(spec, cfg, farfield=ff, tile_w=64)
    state = backend.pack_state(lstate)

    # develop the tear: 2 warm frames + 8 "benched window" frames
    t0 = time.time()
    state = backend.step(state, consts, uin)
    jax.block_until_ready(state[0])
    print(f"compile+first {time.time() - t0:.1f}s", flush=True)
    for _ in range(9):
        state = backend.step(state, consts, uin)
    jax.block_until_ready(state[0])
    print(f"stats after window: {backend.far_stats()}", flush=True)

    hot, obs = state
    immut = backend._immut
    w, h = padded_dims(spec.width, spec.height, 64)

    def interior(p):
        return jax.lax.slice(p, (PAD_W, PAD_H), (PAD_W + w, PAD_H + h))

    alive_int = interior(immut[ALIVE] > 0.0)
    px, py = interior(hot[PX]), interior(hot[PY])
    vx, vy = interior(hot[VX]), interior(hot[VY])
    planes5 = jnp.stack([px, py, vx, vy, alive_int.astype(jnp.float32)])

    def timeit(label, fn, *args, iters=50):
        f = jax.jit(fn)
        r = f(*args)
        jax.block_until_ready(r)
        t0 = time.time()
        for _ in range(iters):
            r = f(*args)
        jax.block_until_ready(r)
        ms = (time.time() - t0) / iters * 1e3
        print(f"[{label}] {ms:.3f} ms", flush=True)
        return ms

    # rebuild variants
    def reb(p5):
        return rebuild_far_list_planes(
            p5[0], p5[1], p5[4] > 0, s=spec.collision_stencil, ff=ff,
            radius=cfg.particle_radius, vx=p5[2], vy=p5[3], dt=cfg.dt)

    def reba(p5):
        return rebuild_far_list_planes_active(
            p5[0], p5[1], p5[4] > 0, s=spec.collision_stencil, ff=ff,
            radius=cfg.particle_radius, vx=p5[2], vy=p5[3], dt=cfg.dt,
            R=8)

    timeit("rebuild", reb, planes5, iters=20)
    timeit("rebact", reba, planes5, iters=20)

    fl, n_act = jax.jit(reba)(planes5)
    print(f"[act] n_pairs={int(fl.n_pairs)} "
          f"n_active={list(np.asarray(n_act))} "
          f"overflow={int(fl.overflow)}", flush=True)

    # pair composition by chunk chebyshev distance: band pairs (<=1)
    # could move into a wider kernel stencil; annulus/far cannot
    npair = int(fl.n_pairs)
    ca = np.asarray(fl.ca)[:npair]
    cb = np.asarray(fl.cb)[:npair]
    cwy = h // ff.chunk
    dx = np.abs(ca // cwy - cb // cwy)
    dy = np.abs(ca % cwy - cb % cwy)
    cheb = np.maximum(dx, dy)
    hist = {int(d): int((cheb == d).sum()) for d in np.unique(cheb)[:12]}
    print(f"[comp] chunk-cheb histogram (first 12): {hist} "
          f"(band<=1: {int((cheb <= 1).sum())}, "
          f"far>=2: {int((cheb >= 2).sum())})", flush=True)

    kwargs = dict(s=spec.collision_stencil, ff=ff,
                  radius=cfg.particle_radius, dt=cfg.dt,
                  ecoeff=(consts.elasticity + 1.0) * 0.5,
                  friction=consts.friction, w=w, h=h)

    for k in (1024, 2048, 4096):
        flk = crop_far_list(fl, k)

        def nap(p5, f=flk):
            return far_delta_planes_narrow(p5, f, **kwargs)

        timeit(f"napply {k}", nap, planes5)

    for k in (2048, 4096):
        flk = crop_far_list(fl, k)

        def mapy(p5, f=flk):
            tab = mirror_table(p5)
            dtab = far_terms_from_mirror(tab, f, **kwargs)
            return unmirror_table(dtab, w=w, h=h)

        timeit(f"mapply {k}", mapy, planes5)

    # kernel-only substep at stencil 2 vs 3: if tear-front band pairs
    # dominate the list, widening the kernel stencil absorbs them into
    # dense near-field compute and shrinks the pair list
    from softbody_tpu.ops.pallas.fused_substep2 import fused_frame2
    import dataclasses as _dc

    for st_ in (2, 3):
        spec_s = _dc.replace(spec, collision_stencil=st_)

        def frame_near(hh, oo, sp=spec_s):
            return fused_frame2(hh, oo, immut, backend._edge_consts,
                                consts, uin, sp, cfg, tile_w=64)

        f = jax.jit(frame_near, donate_argnums=(0, 1))
        h2, o2 = f(jnp.copy(hot), jnp.copy(obs))
        jax.block_until_ready(h2)
        t0 = time.time()
        for _ in range(4):
            h2, o2 = f(h2, o2)
        jax.block_until_ready(h2)
        ms = (time.time() - t0) / (4 * cfg.subticks) * 1e3
        print(f"[kernel s={st_}] {ms:.3f} ms/substep", flush=True)

    print("done", flush=True)
    return 0


main()
