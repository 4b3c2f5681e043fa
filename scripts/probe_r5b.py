"""Far-field cost breakdown, SCAN-AMORTIZED (v2 of probe_r5).

probe_r5's per-call timings disagreed with whole-frame arithmetic
(napply@2048 "2.15 ms" + kernel 0.92 + rebuild/8 "0.92" = 4.0 ms/substep
vs a measured 2.06 ms frame): per-op jit calls through the axon tunnel
pay ~1-2 ms host dispatch, so cheap device ops measure as dispatch
latency.  Here every op runs inside a lax.scan of 64 with a carry
dependency (no hoisting), one dispatch per measurement.

Also: rebuild n_pairs at kernel stencil s in {2,3,4,5} — the tear-front
list is 99.8% band pairs (probe_r5 [comp]), so if their index-distance
distribution concentrates at s+1, widening the kernel stencil absorbs
them (kernel s=3 costs +0.58 ms/substep; worth it only if the list
collapses).

Run: python - < scripts/probe_r5b.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

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

    t0 = time.time()
    state = backend.step(state, consts, uin)
    jax.block_until_ready(state[0])
    print(f"compile+first {time.time() - t0:.1f}s", flush=True)
    # end-of-bench-window state: 1 compile frame + 9 more = 10 frames,
    # matching bench.py's timed window (1 warm + 8 timed) — the r5b
    # first cut used 6 frames, where the fold contacts had NOT yet
    # developed (far_pairs=0) and the stencil sweep below was vacuous
    for _ in range(9):
        state = backend.step(state, consts, uin)
    jax.block_until_ready(state[0])
    print(f"stats end-window: {backend.far_stats()}", flush=True)

    hot, obs = state
    immut = backend._immut
    w, h = padded_dims(spec.width, spec.height, 64)

    def interior(p):
        return jax.lax.slice(p, (PAD_W, PAD_H), (PAD_W + w, PAD_H + h))

    alive_int = interior(immut[ALIVE] > 0.0)
    planes5 = jnp.stack([interior(hot[PX]), interior(hot[PY]),
                         interior(hot[VX]), interior(hot[VY]),
                         alive_int.astype(jnp.float32)])

    N = 64

    def scan_time(label, body, init, iters=3):
        """body(carry) -> carry, one scan step; times N steps."""
        f = jax.jit(lambda c: jax.lax.scan(
            lambda cc, _: (body(cc), None), c, None, length=N)[0])
        r = f(init)
        jax.block_until_ready(r)
        t0 = time.time()
        for _ in range(iters):
            r = f(init)
        jax.block_until_ready(r)
        ms = (time.time() - t0) / (iters * N) * 1e3
        print(f"[{label}] {ms:.3f} ms", flush=True)
        return ms

    kwargs = dict(s=spec.collision_stencil, ff=ff,
                  radius=cfg.particle_radius, dt=cfg.dt,
                  ecoeff=(consts.elasticity + 1.0) * 0.5,
                  friction=consts.friction, w=w, h=h)

    # one real list at the probe state
    def reba(p5):
        return rebuild_far_list_planes_active(
            p5[0], p5[1], p5[4] > 0, s=spec.collision_stencil, ff=ff,
            radius=cfg.particle_radius, vx=p5[2], vy=p5[3], dt=cfg.dt,
            R=8)

    fl, n_act = jax.jit(reba)(planes5)
    print(f"[act] n_pairs={int(fl.n_pairs)} "
          f"n_active={[int(x) for x in np.asarray(n_act)]}", flush=True)

    eps = jnp.float32(1e-30)

    for k in (1024, 2048):
        flk = crop_far_list(fl, k)

        def nbody(c, f=flk):
            d = far_delta_planes_narrow(c, f, **kwargs)
            return c + d * eps

        scan_time(f"napply {k} (scan)", nbody, planes5)

    for k in (2048, 4096):
        flk = crop_far_list(fl, k)

        def mbody(c, f=flk):
            tab = mirror_table(c)
            dtab = far_terms_from_mirror(tab, f, **kwargs)
            d = unmirror_table(dtab, w=w, h=h)
            return c + d * eps

        scan_time(f"mapply {k} (scan)", mbody, planes5)

        def hbody(c, f=flk):
            tab = mirror_table(c)
            dtab = far_terms_from_mirror(tab, f, mb_out=128, **kwargs)
            d = unmirror_table(dtab, w=w, h=h, mb=128)
            return c + d * eps

        scan_time(f"mapply {k} mb_out=128 (scan)", hbody, planes5)

    # mapply cost split (all @2048):
    #   [gm]   mirror + gather + math  (no unmirror)
    #   [fixg] gather + math on a PRE-BUILT table (relayout hoisted)
    # → mirror relayout ≈ gm − fixg; delta unmirror ≈ mapply − gm.
    # (A bare "mirror only" body would be DCE'd/fused away — the row
    # gather is what forces the relayout to materialize.)
    flk2 = crop_far_list(fl, 2048)

    def gmbody(c):
        tab = mirror_table(c)
        dtab = far_terms_from_mirror(tab, flk2, **kwargs)
        return c + dtab[0, :1] * eps

    scan_time("mirror+gather+math 2048 (scan)", gmbody, planes5)

    tab0 = jax.jit(mirror_table)(planes5)

    def fixg(carry, t=tab0):
        # carry→table dependency keeps the body inside the scan (a *0
        # would constant-fold and hoist the whole thing); the broadcast
        # add costs one table read+write (~0.06 ms), subtract mentally
        dtab = far_terms_from_mirror(t + carry[0, 0, 0] * eps,
                                     flk2, **kwargs)
        return carry + dtab[0, :1] * eps

    scan_time("gather+math 2048, fixed table (scan)", fixg, planes5)

    def rbody(c):
        fl_ = rebuild_far_list_planes(
            c[0], c[1], c[4] > 0, s=spec.collision_stencil, ff=ff,
            radius=cfg.particle_radius, vx=c[2], vy=c[3], dt=cfg.dt)
        return c + eps * fl_.n_pairs.astype(jnp.float32)

    scan_time("rebuild (scan)", rbody, planes5, iters=1)

    def rabody(c):
        fl_, na = reba(c)
        return c + eps * na[0].astype(jnp.float32)

    scan_time("rebact (scan)", rabody, planes5, iters=1)

    # pair list size vs kernel stencil radius (band offsets shrink with
    # s; tells whether widening the kernel absorbs the tear-front list)
    for s_ in (2, 3, 4, 5, 7):
        def rb(p5, sv=s_):
            return rebuild_far_list_planes(
                p5[0], p5[1], p5[4] > 0, s=sv, ff=ff,
                radius=cfg.particle_radius, vx=p5[2], vy=p5[3],
                dt=cfg.dt)

        fls = jax.jit(rb)(planes5)
        print(f"[pairs s={s_}] n_pairs={int(fls.n_pairs)} "
              f"overflow={int(fls.overflow)}", flush=True)

    print("done", flush=True)
    return 0


main()
