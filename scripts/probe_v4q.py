"""True chunk-pair demand of the bench scene (Q section of probe_v4,
standalone so it can run with the package on sys.path)."""

from __future__ import annotations

import json
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
    rng = np.random.default_rng(0)

    # ---- Q: true demand on the bench scene ---------------------------
    from softbody_tpu import PhysicsConstants, UserInput
    from softbody_tpu.models import tearing_cloth_lattice
    from softbody_tpu.ops.farfield import (
        FarFieldSpec, rebuild_far_list_planes,
    )
    from softbody_tpu.ops.pallas.fused_substep2 import (
        PX, PY, VX, VY, ALIVE,
    )
    from softbody_tpu.engine.backends import FusedLatticeBackend

    lstate, spec, cfg, consts = tearing_cloth_lattice(
        n_particles=1_000_000, fall_speed=2.5, slits=7,
        strain_limit=0.22, yield_strain=0.18,
    )
    uin = UserInput.none()
    w, h = lstate.shape
    spacing = 980.0 / (w - 1)
    nsub = cfg.subticks

    ffq = FarFieldSpec(max_pairs=8192, max_tile_pairs=256,
                       skin=0.5 * spacing, horizon=16)
    ff_huge_pos = FarFieldSpec(max_pairs=262144, max_tile_pairs=256,
                               skin=0.5 * spacing, horizon=16)
    backend = FusedLatticeBackend(spec, cfg, farfield=ffq, tile_w=64)
    state = backend.pack_state(lstate)
    immut = backend._immut
    alive = immut[ALIVE] > 0.0

    def huge_rebuild(m, extruded):
        kw = dict(vx=m[VX], vy=m[VY], dt=cfg.dt) if extruded else {}
        return rebuild_far_list_planes(
            m[PX], m[PY], alive, s=spec.collision_stencil,
            ff=ff_huge_pos, radius=cfg.particle_radius, **kw)
    jit_huge_pos = jax.jit(lambda m: huge_rebuild(m, False))
    jit_huge_ext = jax.jit(lambda m: huge_rebuild(m, True))

    t0 = time.time()
    state = backend.step(state, consts, uin)
    jax.block_until_ready(state[0])
    log(f"Q compile+first frame {time.time() - t0:.1f}s")
    for f in range(12):
        t0 = time.time()
        state = backend.step(state, consts, uin)
        _ = jax.device_get(state[0][0, 8, 128])
        dt_f = time.time() - t0
        hot = state[0]
        row = dict(frame=f + 1, s=round(nsub / dt_f, 1))
        for name, fn in (("pos", jit_huge_pos), ("ext", jit_huge_ext)):
            fl = fn(hot)
            npair, over, cav, cbv, vv = jax.device_get(
                (fl.n_pairs, fl.overflow, fl.ca, fl.cb, fl.valid))
            cav, cbv = cav[vv], cbv[vv]
            sides = np.concatenate([cav, cbv])
            cnt = np.bincount(sides, minlength=1)
            act = int((cnt > 0).sum())
            row[name] = dict(
                pairs=int(npair), over=int(over), active_chunks=act,
                partners_max=int(cnt.max(initial=0)),
                partners_p99=float(np.percentile(cnt[cnt > 0], 99))
                if act else 0.0,
                partners_mean=float(cnt[cnt > 0].mean()) if act else 0.0,
            )
        log(json.dumps(row))
    finite = bool(np.isfinite(
        np.asarray(jax.device_get(state[0][:2]))).all())
    log(f"Q finite={finite}")




if __name__ == "__main__":
    main()
