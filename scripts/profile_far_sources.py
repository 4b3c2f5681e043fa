"""Trajectory profile of far-field candidate work on the 1M tearing
scene: per-source candidate counts (band / annulus / far-tile) and
motion bounds at checkpoints along the fall-impact-settle arc.

The 2D sheet is a solid elastic block; far pairs should only appear at
tear lines, shards, and in-plane buckling.  This probe answers: how much
far work does each phase REALLY need, and which detection source floods.

Run: python scripts/profile_far_sources.py [n_frames=40]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main() -> int:
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 40

    t0 = time.time()
    np.asarray(jax.block_until_ready(jnp.zeros(8)))
    print(f"warmup {time.time() - t0:.1f}s", flush=True)

    from softbody_tpu import PhysicsConstants, UserInput
    from softbody_tpu.models import tearing_cloth_lattice
    from softbody_tpu.ops import farfield as FF
    from softbody_tpu.ops.farfield import FarFieldSpec, _detection
    from softbody_tpu.ops.pallas.fused_substep2 import (
        ALIVE, PX, PY, VX, VY, fused_frame2, pack_lattice2,
    )

    consts, uin = PhysicsConstants.default(), UserInput.none()
    lstate, spec, cfg, consts = tearing_cloth_lattice(
        n_particles=1_000_000, fall_speed=4.0
    )
    w, h = lstate.shape
    spacing = 980.0 / (w - 1)
    ff = FarFieldSpec(max_pairs=2048, max_tile_pairs=256, skin=0.5 * spacing)
    hot, obs, immut, ec = pack_lattice2(lstate, tile_w=64)
    alive = immut[ALIVE] > 0.0

    frame = jax.jit(
        lambda m, o: fused_frame2(m, o, immut, ec, consts, uin, spec, cfg,
                                  tile_w=64)
    )

    @functools.partial(jax.jit, static_argnames=("s", "ffs"))
    def source_counts(m, *, s, ffs):
        pos = jnp.stack([m[PX], m[PY]], axis=-1)
        (band_stack, ann_stack, ref_ov, _ca, _cb, tile_over,
         _adj, _ann, _cwy, _com) = _detection(
             pos, alive, s=s, ff=ffs, radius=cfg.particle_radius)
        vel2 = jnp.where(alive, m[VX] ** 2 + m[VY] ** 2, 0.0)
        n_al = jnp.maximum(jnp.sum(alive.astype(jnp.float32)), 1.0)
        vmx = jnp.sum(jnp.where(alive, m[VX], 0.0)) / n_al
        vmy = jnp.sum(jnp.where(alive, m[VY], 0.0)) / n_al
        dvx = m[VX] - vmx
        dvy = m[VY] - vmy
        rel2 = jnp.where(alive, dvx * dvx + dvy * dvy, 0.0)
        ea_alive = [m[6 + c * 3 + 2] for c in range(4)]
        n_edges = sum(jnp.sum((e > 0.0).astype(jnp.int32)) for e in ea_alive)
        return (
            jnp.sum(band_stack.astype(jnp.int32)),
            jnp.sum(ann_stack.astype(jnp.int32)),
            jnp.sum(ref_ov.astype(jnp.int32)),
            tile_over,
            jnp.sqrt(jnp.max(vel2)),
            jnp.sqrt(jnp.max(rel2)),
            n_edges,
        )

    sc = functools.partial(source_counts, s=spec.collision_stencil, ffs=ff)
    print(f"frame  band  annulus  far_ref  tile_over  vmax  vrel  edges",
          flush=True)
    for f in range(n_frames + 1):
        if f % 2 == 0:
            b, a, fr, to, vmax, vrel, ne = jax.device_get(sc(hot))
            print(
                f"{f:5d} {int(b):6d} {int(a):8d} {int(fr):8d} {int(to):8d}"
                f" {float(vmax):7.2f} {float(vrel):6.2f} {int(ne):8d}",
                flush=True,
            )
        if f < n_frames:
            hot, obs = frame(hot, obs)
    return 0


if __name__ == "__main__":
    sys.exit(main())
