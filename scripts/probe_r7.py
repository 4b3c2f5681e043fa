"""Rebuild STAGE split, scan-amortized, at the developed 1M tear.

The rebuild is the largest non-kernel term left after krec
(3.39 ms/rebuild ÷ cadence 8 ≈ 0.42 ms/substep).  probe_r6's per-call
split (detection 1.84) was dispatch-latency-tainted (the <2 ms
microbench trap); this probe re-measures each stage inside a
64-iteration lax.scan with a carry dependency:

  [rebuild]    full rebuild_far_list_planes        (reference)
  [cdet]       _chunk_detection only               (dense plane front-end)
  [rawcp]      raw_chunk_planes only               (AABB reductions + band)
  [fromchunks] rebuild_far_list_from_chunks only   (tile tests + _nz
               compactions + pair packing; fixed ChunkPlanes)

cdet − rawcp ≈ extrude_chunk_planes; rebuild − cdet − fromchunks ≈ 0
checks the split.  Run: python - < scripts/probe_r7.py
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

    from softbody_tpu import PhysicsConstants, UserInput  # noqa: F401
    from softbody_tpu.engine.backends import FusedLatticeBackend
    from softbody_tpu.models import tearing_cloth_lattice
    from softbody_tpu.ops.farfield import (
        FarFieldSpec,
        _chunk_detection,
        raw_chunk_planes,
        rebuild_far_list_from_chunks,
        rebuild_far_list_planes,
    )
    from softbody_tpu.ops.pallas.fused_substep2 import (
        ALIVE, PAD_W, PX, PY, VX, VY, padded_dims,
    )

    n_target = int(os.environ.get("PROBE_N", 1_000_000))
    uin = UserInput.none()
    lstate, spec, cfg, consts = tearing_cloth_lattice(
        n_particles=n_target, fall_speed=2.5, slits=7,
        strain_limit=0.22, yield_strain=0.18,
    )
    w_, _h = lstate.shape
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

    hot, _obs = state
    immut = backend._immut
    w, h = padded_dims(spec.width, spec.height, 64)
    pl_ = 0 if backend._pad_hl == 0 else 128  # lanecut default

    def interior(p):
        return jax.lax.slice(p, (PAD_W, pl_), (PAD_W + w, pl_ + h))

    alive_int = interior(immut[ALIVE] > 0.0)
    planes5 = jnp.stack([interior(hot[PX]), interior(hot[PY]),
                         interior(hot[VX]), interior(hot[VY]),
                         alive_int.astype(jnp.float32)])

    N = 64
    eps = jnp.float32(1e-30)
    kw = dict(s=spec.collision_stencil, ff=ff,
              radius=cfg.particle_radius)

    def scan_time(label, body, init, iters=2):
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

    band = os.environ.get("PROBE_BAND", "xla")

    def rbody(c):
        fl_ = rebuild_far_list_planes(
            c[0], c[1], c[4] > 0, vx=c[2], vy=c[3], dt=cfg.dt,
            band_impl=band, **kw)
        return c + eps * fl_.n_pairs.astype(jnp.float32)

    scan_time(f"rebuild[{band}]", rbody, planes5)

    def dbody(c):
        cp = _chunk_detection(c[0], c[1], c[4] > 0, vxu=c[2], vyu=c[3],
                              dt=cfg.dt, **kw)
        return c + eps * cp.iminx[0, 0]

    scan_time("cdet", dbody, planes5)

    def rawbody(c):
        raw, cany, _com = raw_chunk_planes(
            c[0], c[1], c[4] > 0, vxu=c[2], vyu=c[3],
            T_band=float(ff.horizon * cfg.dt), vbar=(c[2][0, 0],
                                                     c[3][0, 0]), **kw)
        return c + eps * (raw.minx[0, 0]
                          + cany.astype(jnp.float32)[0, 0])

    scan_time("rawcp", rawbody, planes5)

    cp0 = jax.jit(lambda p: _chunk_detection(
        p[0], p[1], p[4] > 0, vxu=p[2], vyu=p[3], dt=cfg.dt, **kw
    ))(planes5)

    def fcbody(c, cp=cp0):
        cpp = cp._replace(iminx=cp.iminx + c[0, 0, 0] * eps)
        fl_ = rebuild_far_list_from_chunks(cpp, c[0], c[1], c[2], c[3],
                                           ff=ff)
        return c + eps * fl_.n_pairs.astype(jnp.float32)

    scan_time("fromchunks", fcbody, planes5)
    return 0


if __name__ == "__main__":
    sys.exit(main())
