"""Far-field cost bisection with full-frame (single-jit) variants at 1M.

Per-dispatch overhead through the axon transport is ~2 ms, so per-op
timings lie; every variant here is a full 64-substep scan in ONE jit and
costs are read off frame-to-frame differences.

  V0  hot frame (no far)                        -> base
  V1  V0 + per-substep chunk-table relayout     -> relayout cost
  V2  V1 + pair gather + pair math (no scatter) -> gather+math cost
  V3  full far frame (current implementation)   -> scatter cost = V3-V2
  V4  far frame, scatter via flat .at[].add     -> alt scatter
  V5  far frame, gather via windowed indexing   -> alt gather (no relayout)

Rebuild bisect (per-call, minus measured dispatch overhead):
  T0  dispatch overhead (trivial jit)
  T1  far_candidate_count (detection only)
  T2  rebuild_far_list (detection + compaction)

Run: python scripts/profile_far2.py
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


def timeit(label, fn, *args, n=10, per_substep=None, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = jax.device_get(leaf.reshape(-1)[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args, **kw)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = jax.device_get(leaf.reshape(-1)[0])
    el = (time.time() - t0) / n * 1e3
    extra = f"  ({el / per_substep:.3f} ms/substep)" if per_substep else ""
    print(f"{label:52s} {el:9.3f} ms{extra}", flush=True)
    return el


def main():
    t0 = time.time()
    np.asarray(jax.block_until_ready(jnp.zeros(8)))
    print(f"warmup {time.time()-t0:.1f}s {jax.devices()}", flush=True)

    from softbody_tpu import PhysicsConstants, UserInput
    from softbody_tpu.models import tearing_cloth_lattice
    from softbody_tpu.ops.farfield import (
        FarFieldSpec, far_candidate_count, rebuild_far_list, crop_far_list,
        _chunk_dims,
    )
    from softbody_tpu.ops import farfield as FF
    from softbody_tpu.ops.pallas.fused_substep2 import (
        PX, PY, VX, VY,
        fused_frame2, fused_frame2_far, fused_substep2_call, pack_lattice2,
    )
    from softbody_tpu.ops.pallas.fused_substep import (
        _consts_vector, padded_dims, PAD_H,
    )

    consts, uin = PhysicsConstants.default(), UserInput.none()
    lstate, spec, cfg, consts = tearing_cloth_lattice(
        n_particles=1_000_000, fall_speed=4.0)
    w, h = lstate.shape
    spacing = 980.0 / (w - 1)
    ff = FarFieldSpec(max_pairs=2048, max_tile_pairs=256, skin=0.5 * spacing)
    hot, obs, immut, ec = pack_lattice2(lstate, tile_w=64)
    wpad, hpad = padded_dims(spec.width, spec.height, 64)
    cvec = jnp.concatenate([_consts_vector(consts, uin, cfg, spec.height), ec])
    alive = immut[0] > 0.0
    S = cfg.subticks
    kw = dict(w=wpad, h=hpad, stencil=spec.collision_stencil,
              quantized=cfg.force_mode == "quantized", tile_w=64)

    frames = jax.jit(lambda m, o: fused_frame2(m, o, immut, ec, consts, uin,
                                               spec, cfg, tile_w=64))
    print("advancing 12 frames...", flush=True)
    for _ in range(12):
        hot, obs = frames(jnp.copy(hot), jnp.copy(obs))
    jax.block_until_ready(hot)

    pos = jnp.stack([hot[PX], hot[PY]], axis=-1)
    fl = rebuild_far_list(pos, alive, s=spec.collision_stencil, ff=ff,
                          radius=cfg.particle_radius)
    print(f"far pairs {int(fl.n_pairs)} overflow {int(fl.overflow)}",
          flush=True)
    flk = crop_far_list(fl, 512)
    k = 512

    pw, ph = hot.shape[1], hot.shape[2]   # padded plane dims
    cwx, cwy, wp, hp = _chunk_dims(pw, ph, ff)
    c = ff.chunk
    cc = c * c
    ht = hpad + 2 * PAD_H
    fkw = dict(s=spec.collision_stencil, ff=ff, radius=cfg.particle_radius,
               dt=cfg.dt, ecoeff=(consts.elasticity + 1.0) * 0.5,
               friction=consts.friction, world_h=ht)

    ids = jnp.concatenate([flk.ca, flk.cb])
    exs = (ids // cwy).astype(jnp.int32)
    eys = (ids % cwy).astype(jnp.int32)

    def relayout(m):
        stack = jnp.stack([m[PX], m[PY], m[VX], m[VY],
                           alive.astype(jnp.float32)])
        stack = jnp.pad(stack, ((0, 0), (0, wp - pw), (0, hp - ph)))
        return (stack.reshape(5, cwx, c, cwy, c)
                .transpose(1, 3, 0, 2, 4)
                .reshape(cwx * cwy, 5 * cc))

    def far_planes_of(m):
        return jnp.stack(FF.far_collision_terms(
            m[PX], m[PY], m[VX], m[VY], alive, flk, **fkw))

    def pair_math(g):
        """[2k, 5cc] records -> [2k, 5cc] contributions (shape mimic of the
        real pair math; ~same flop count)."""
        g_px = g[:, 0 * cc:1 * cc]
        g_py = g[:, 1 * cc:2 * cc]
        g_vx = g[:, 2 * cc:3 * cc]
        g_vy = g[:, 3 * cc:4 * cc]
        A = lambda x: x[:k, :, None]
        B = lambda x: x[k:, None, :]
        ddx = B(g_px) - A(g_px)
        ddy = B(g_py) - A(g_py)
        dist = jnp.sqrt(ddx * ddx + ddy * ddy)
        ov = (dist > 0.0) & (dist < 0.7)
        inv = jnp.where(ov, 1.0 / jnp.where(ov, dist, 1.0), 0.0)
        nx_, ny_ = ddx * inv, ddy * inv
        rvx = A(g_vx) - B(g_vx)
        rvy = A(g_vy) - B(g_vy)
        imp = 0.9 * (rvx * nx_ + rvy * ny_)
        impt = jnp.minimum(jnp.maximum(rvx * -ny_ + rvy * nx_, -imp), imp)
        t1 = jnp.where(ov, imp * nx_ + impt * -ny_, 0.0)
        t2 = jnp.where(ov, imp * ny_ + impt * nx_, 0.0)
        t3 = nx_ * (0.7 - dist)
        t4 = ny_ * (0.7 - dist)
        t5 = jnp.where(dist == 0.0, 1.0, 0.0)
        terms = (t1, t2, t3, t4, t5)
        return jnp.concatenate(
            [jnp.stack([t.sum(axis=2) for t in terms], axis=1),
             jnp.stack([-t.sum(axis=1) for t in terms], axis=1)],
            axis=0).reshape(2 * k, 5 * cc)

    # ---- frame variants ---------------------------------------------------
    def make_frame(far_of):
        @jax.jit
        def f(m):
            def body(mm, _):
                return fused_substep2_call(mm, immut, cvec,
                                           far=far_of(mm), **kw), None
            out, _ = jax.lax.scan(body, m, None, length=S)
            return out
        return f

    zero_planes = jnp.zeros((5, pw, ph), jnp.float32)

    @jax.jit
    def v0(m):
        def body(mm, _):
            return fused_substep2_call(mm, immut, cvec, **kw), None
        out, _ = jax.lax.scan(body, m, None, length=S)
        return out

    def far_v1(mm):  # relayout only
        tbl = relayout(mm)
        return zero_planes + 1e-30 * jnp.mean(tbl)

    def far_v2(mm):  # + gather + math, scatter stubbed
        tbl = relayout(mm)
        g = tbl[ids]
        contrib = pair_math(g)
        return zero_planes + 1e-30 * jnp.mean(contrib)

    def far_v4(mm):  # flat element scatter instead of one-hot
        tbl = relayout(mm)
        g = tbl[ids]
        contrib = pair_math(g)  # [2k, 5cc]
        kk = jnp.arange(cc, dtype=jnp.int32)
        linp = ((exs[:, None] * c + kk[None, :] // c) * hp
                + (eys[:, None] * c + kk[None, :] % c))  # [2k, cc]
        vals = contrib.reshape(2 * k, 5, cc).transpose(1, 0, 2).reshape(5, -1)
        out = jnp.zeros((5, wp * hp), jnp.float32)
        out = jax.vmap(lambda o, v: o.at[linp.reshape(-1)].add(v))(out, vals)
        return out.reshape(5, wp, hp)[:, :pw, :ph]

    def far_v5(mm):  # windowed advanced-index gather, one-hot scatter
        stack = jnp.stack([mm[PX], mm[PY], mm[VX], mm[VY],
                           alive.astype(jnp.float32)])
        xi = exs[:, None, None] * c + jnp.arange(c)[None, :, None]
        yj = eys[:, None, None] * c + jnp.arange(c)[None, None, :]
        gw = stack[:, xi, yj]  # [5, 2k, c, c]
        g = gw.transpose(1, 0, 2, 3).reshape(2 * k, 5 * cc)
        contrib = pair_math(g)
        return zero_planes + 1e-30 * jnp.mean(contrib)

    t_v0 = timeit("V0 hot frame", v0, jnp.copy(hot), per_substep=S)
    t_v1 = timeit("V1 +relayout", make_frame(far_v1), jnp.copy(hot),
                  per_substep=S)
    t_v2 = timeit("V2 +gather+math", make_frame(far_v2), jnp.copy(hot),
                  per_substep=S)
    far_frame = jax.jit(lambda m, o: fused_frame2_far(
        m, o, immut, ec, flk, consts, uin, spec, cfg, ff, tile_w=64)[0])
    t_v3 = timeit("V3 full far frame (current)", far_frame, jnp.copy(hot),
                  jnp.copy(obs), per_substep=S)
    t_v4 = timeit("V4 far frame, flat scatter", make_frame(far_v4),
                  jnp.copy(hot), per_substep=S)
    t_v5 = timeit("V5 windowed gather (no scatter)", make_frame(far_v5),
                  jnp.copy(hot), per_substep=S)

    print(f"\nstage deltas/substep: relayout {(t_v1-t_v0)/S:.3f}  "
          f"gather+math {(t_v2-t_v1)/S:.3f}  scatter {(t_v3-t_v2)/S:.3f}  "
          f"flat-scatter {(t_v4-t_v2)/S:.3f}  "
          f"win-gather-total {(t_v5-t_v0)/S:.3f}", flush=True)

    # ---- rebuild bisect ---------------------------------------------------
    triv = jax.jit(lambda x: x + 1.0)
    t_disp = timeit("T0 dispatch overhead", triv, jnp.zeros(8), n=30)
    cnt = jax.jit(functools.partial(far_candidate_count,
                                    s=spec.collision_stencil, ff=ff,
                                    radius=cfg.particle_radius))
    t_cnt = timeit("T1 far_candidate_count", cnt, pos, alive, n=10)
    reb = jax.jit(functools.partial(rebuild_far_list,
                                    s=spec.collision_stencil, ff=ff,
                                    radius=cfg.particle_radius))
    t_reb = timeit("T2 rebuild_far_list", reb, pos, alive, n=10)
    print(f"\nrebuild: detection {t_cnt - t_disp:.1f} ms, "
          f"compaction {t_reb - t_cnt:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
