"""Rebuild cost split + apply bucket sizing at the developed 1M tear.

probe_r5e facts: full rebuild 3.36 ms (÷8 cadence = 0.42 ms/substep),
mapply@2048 0.795 (gather+math 0.33 / mirror-in 0.185 / unmirror 0.28).
This probe splits the rebuild into its two stages —
``_chunk_detection`` (dense plane reductions) and
``rebuild_far_list_from_chunks`` (tile tests + sort compactions) — and
prices a 1280-capacity apply crop (the in-window list is ~1102 pairs,
so the 2048 bucket gathers ~2x the needed rows).

Run: python - < scripts/probe_r6.py
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
        _chunk_detection,
        crop_far_list,
        rebuild_far_list_from_chunks,
        rebuild_far_list_planes,
    )
    from softbody_tpu.ops.farfield4 import (
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
    eps = jnp.float32(1e-30)

    def scan_time(label, body, init, iters=3):
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

    det_kw = dict(s=spec.collision_stencil, ff=ff,
                  radius=cfg.particle_radius, dt=cfg.dt)

    # stage 1: dense detection (plane reductions -> chunk planes)
    def dbody(c):
        cp = _chunk_detection(c[0], c[1], c[4] > 0, vxu=c[2], vyu=c[3],
                              **det_kw)
        # consume every output plane so nothing is DCE'd
        tot = sum(jnp.sum(p.astype(jnp.float32)) for p in cp)
        return c + tot * eps

    scan_time("detection (scan)", dbody, planes5, iters=1)

    # stage 2: from_chunks (tile tests + compactions), detection hoisted
    cp0 = jax.jit(lambda p5: _chunk_detection(
        p5[0], p5[1], p5[4] > 0, vxu=p5[2], vyu=p5[3], **det_kw))(planes5)
    cp0 = jax.block_until_ready(cp0)

    def fbody(c, cp=cp0):
        # perturb only float planes (bool/int fields pass through); the
        # carry dependency stops the scan body from being hoisted
        cpd = jax.tree.map(
            lambda p: (p + (c[0, 0, 0] * eps).astype(p.dtype)
                       if jnp.issubdtype(p.dtype, jnp.inexact) else p),
            cp)
        fl_ = rebuild_far_list_from_chunks(cpd, c[0], c[1], c[2], c[3],
                                           ff=ff)
        return c + fl_.n_pairs.astype(jnp.float32) * eps

    scan_time("from_chunks (scan)", fbody, planes5, iters=1)

    def rbody(c):
        fl_ = rebuild_far_list_planes(
            c[0], c[1], c[4] > 0, s=spec.collision_stencil, ff=ff,
            radius=cfg.particle_radius, vx=c[2], vy=c[3], dt=cfg.dt)
        return c + eps * fl_.n_pairs.astype(jnp.float32)

    scan_time("rebuild full (scan)", rbody, planes5, iters=1)

    # apply at a 1280 crop (vs the 2048 bucket the 1102-pair list uses)
    fl = jax.jit(lambda p5: rebuild_far_list_planes(
        p5[0], p5[1], p5[4] > 0, s=spec.collision_stencil, ff=ff,
        radius=cfg.particle_radius, vx=p5[2], vy=p5[3],
        dt=cfg.dt))(planes5)
    print(f"[list] n_pairs={int(fl.n_pairs)}", flush=True)
    kwargs = dict(s=spec.collision_stencil, ff=ff,
                  radius=cfg.particle_radius, dt=cfg.dt,
                  ecoeff=(consts.elasticity + 1.0) * 0.5,
                  friction=consts.friction, w=w, h=h)
    for k in (1280, 1536, 2048):
        flk = crop_far_list(fl, k)

        def mbody(c, f=flk):
            tab = mirror_table(c)
            dtab = far_terms_from_mirror(tab, f, **kwargs)
            d = unmirror_table(dtab, w=w, h=h)
            return c + d * eps

        scan_time(f"mapply {k} (scan)", mbody, planes5)

    print("done", flush=True)
    return 0


main()
