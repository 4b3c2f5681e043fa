"""Bisect the planified config-3 frame cost on the real TPU.

The measured planified figure (76.5 substeps/s at 101k plane cells,
/tmp/bench_config3.log, r3) is ~6x slower per cell than the 1M XLA
stencil path — something scale-independent dominates.  Suspects, each
timed in isolation here:

  A. full frame, far armed        (the benched configuration)
  B. full frame, far off          (far rebuild + far apply cost)
  C. far off, exceptions stubbed  (the 4 element scatter-adds/substep,
                                   cost-model red flag: element scatters
                                   are ms-class, docs/PERF.md)
  D. C with collision_stencil=2   (stencil radius 3 -> 2: 49 -> 25
                                   offsets in the collision pass)
  E. micro: the exception scatter alone, 64x under scan
  F. micro: one far rebuild at this plane

Run:  python - < scripts/probe_config3b.py   (TPU, one process)
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

t0 = time.time()
np.asarray(jax.block_until_ready(jnp.zeros(8)))
print(f"warmup readback {time.time() - t0:.1f}s; devices={jax.devices()}",
      flush=True)

from softbody_tpu import PhysicsConstants, UserInput
from softbody_tpu.models import self_colliding_cloth
from softbody_tpu.ops.farfield import FarFieldSpec, rebuild_far_list_planes
from softbody_tpu.ops import planify as P

n_target = int(os.environ.get("BENCH3_N", 100_000))
state, cfg0 = self_colliding_cloth(n_particles=n_target)
consts, uin = PhysicsConstants.default(), UserInput.none()
cfg = dataclasses.replace(cfg0, collision_mode="allpairs")

FRAMES = 8


def timeit(label, fn, s0, n_frames=FRAMES):
    s = fn(s0)          # compile + first
    jax.block_until_ready(jax.tree_util.tree_leaves(s)[0])
    t1 = time.time()
    for _ in range(n_frames):
        s = fn(s)
    jax.block_until_ready(jax.tree_util.tree_leaves(s)[0])
    el = time.time() - t1
    sps = n_frames * cfg.subticks / el
    print(f"[{label}] {n_frames} frames in {el:.2f}s -> {sps:.1f} "
          f"substeps/s ({el / n_frames / cfg.subticks * 1e3:.3f} "
          f"ms/substep)", flush=True)
    return s


def embed(stencil):
    ps, pspec, aux = P.planify(state, collision_stencil=stencil,
                               chunk_multiple=16)
    return ps, pspec, aux


ps3, spec3, aux3 = embed(3)
print(f"plane {spec3.width}x{spec3.height}, "
      f"{len(spec3.edge_offsets)} classes, {aux3.n_exceptions} exceptions",
      flush=True)
ff = FarFieldSpec(max_pairs=16384, max_tile_pairs=256,
                  skin=3.0 * cfg0.particle_radius, horizon=8)

# A: far armed
timeit("A far-on stencil3",
       lambda s: P.planified_frame_far(s, consts, uin, spec3, cfg, ff)[0],
       ps3)

# B: far off
ps3b, _, _ = embed(3)
timeit("B far-off stencil3",
       lambda s: P.planified_frame(s, consts, uin, spec3, cfg), ps3b)

# C: far off, exception pass stubbed out
_real_xpass = P._exception_pass


def _stub(lat, x, cfg_):
    return None, x


P._exception_pass = _stub
ps3c, _, _ = embed(3)
timeit("C far-off no-exceptions stencil3",
       lambda s: P.planified_frame(s, consts, uin, spec3, cfg,
                                   n_sub=cfg.subticks), ps3c)

# D: C with stencil 2
ps2, spec2, aux2 = embed(2)
timeit("D far-off no-exceptions stencil2",
       lambda s: P.planified_frame(s, consts, uin, spec2, cfg,
                                   n_sub=cfg.subticks), ps2)
P._exception_pass = _real_xpass

# E: micro — the exception scatter alone, 64 per call (fresh embed:
# earlier states were donated into the frame jits above)
ps3e, _, _ = embed(3)
wh = spec3.width * spec3.height
ia = jnp.asarray(np.asarray(ps3e.x.ia))
ib = jnp.asarray(np.asarray(ps3e.x.ib))
n_x = int(ia.shape[0])


@jax.jit
def scat64(q):
    def body(acc, _):
        zf = jnp.zeros(wh, jnp.int32)
        fx = zf.at[ia].add(-q).at[ib].add(q)
        fy = zf.at[ia].add(q).at[ib].add(-q)
        return acc + fx[0] + fy[1], None

    acc, _ = jax.lax.scan(body, jnp.int32(0), None, length=64)
    return acc


q = jnp.ones((n_x,), jnp.int32)
_ = jax.block_until_ready(scat64(q))
t1 = time.time()
for _ in range(8):
    _ = jax.block_until_ready(scat64(q))
el = (time.time() - t1) / 8 / 64
print(f"[E exception scatter x4] {el * 1e3:.3f} ms/substep "
      f"({n_x} exception beams, plane {wh})", flush=True)

# F: micro — one far rebuild at this plane
lat = ps3e.lat


@jax.jit
def reb():
    return rebuild_far_list_planes(
        lat.pos[..., 0], lat.pos[..., 1], lat.alive,
        s=spec3.collision_stencil, ff=ff, radius=cfg.particle_radius,
        vx=lat.vel[..., 0], vy=lat.vel[..., 1], dt=cfg.dt)


fl = jax.block_until_ready(reb())
t1 = time.time()
for _ in range(16):
    fl = jax.block_until_ready(reb())
el = (time.time() - t1) / 16
print(f"[F far rebuild] {el * 1e3:.3f} ms/rebuild "
      f"(/8 cadence = {el / 8 * 1e3:.3f} ms/substep)", flush=True)
print("done", flush=True)
