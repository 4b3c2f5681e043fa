"""Headline benchmark (driver contract): particle-substeps/sec on the
BASELINE north-star config — 1M particles / ~4M springs tearing cloth
with grid self-collision — on one TPU chip.

Prints exactly ONE JSON line to stdout:
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}``
(baseline: 500 substeps/s at 1M particles, BASELINE.md).

Env knobs: ``BENCH_N`` (particle count, default 1_000_000),
``BENCH_FRAMES`` (timed frames, default 8), ``BENCH_SCENE``.
"""

from __future__ import annotations

import json
import os
import sys
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> int:
    import numpy as np
    import jax
    import jax.numpy as jnp

    # one-time D2H warm-up (first readback through the axon transport is
    # minutes-slow; see .claude/skills/verify/SKILL.md)
    t0 = time.time()
    np.asarray(jax.block_until_ready(jnp.zeros(8)))
    log(f"warmup readback {time.time() - t0:.1f}s; devices={jax.devices()}")

    from softbody_tpu import PhysicsConstants, UserInput

    n_target = int(os.environ.get("BENCH_N", 1_000_000))
    frames = int(os.environ.get("BENCH_FRAMES", 8))
    scene_name = os.environ.get("BENCH_SCENE", "tearing_cloth")
    path = os.environ.get("BENCH_PATH", "fused")
    far_enabled = os.environ.get("BENCH_FARFIELD", "1") != "0"
    far_k = int(os.environ.get("BENCH_FAR_K", 512))
    fall_speed = float(os.environ.get("BENCH_FALL_SPEED", 4.0))

    consts, uin = PhysicsConstants.default(), UserInput.none()
    t0 = time.time()
    far_stats = {}
    if path == "fused" and scene_name == "tearing_cloth":
        # fused Pallas kernel v2 (18-plane hot carry, scalar edge params,
        # pre-rotated lane copies), far-field self-collision armed with a
        # Verlet candidate list (ops/farfield.py) rebuilt adaptively.
        import jax.numpy as jnp

        from softbody_tpu.models import tearing_cloth_lattice
        from softbody_tpu.ops.farfield import (
            FarFieldSpec,
            crop_far_list,
            empty_far_list_at,
            far_candidate_count,
            rebuild_far_list,
        )
        from softbody_tpu.ops.pallas.fused_substep2 import (
            fused_frame2,
            fused_frame2_far,
            pack_lattice2,
            packed_far_motion2,
            unpack_lattice2,
        )

        lstate, spec, cfg, consts = tearing_cloth_lattice(
            n_particles=n_target, fall_speed=fall_speed,
        )
        w, h = lstate.shape
        n = w * h
        m = sum(int(np.asarray(e.alive).sum()) for e in lstate.edges)
        spacing = 980.0 / (w - 1)
        ff = FarFieldSpec(max_pairs=2048, max_tile_pairs=256,
                          skin=0.5 * spacing)
        log(f"scene {scene_name} (fused v2, lattice {w}x{h}): {n} "
            f"particles, {m} springs, stencil r={spec.collision_stencil}, "
            f"subticks={cfg.subticks}, fall={fall_speed}, "
            f"farfield={'armed' if far_enabled else 'off'} "
            f"(K={far_k}, skin={ff.skin:.2f}) "
            f"(built in {time.time() - t0:.1f}s)")
        hot0, obs0, immut, ec = pack_lattice2(lstate, tile_w=64)
        template = lstate

        class _Packed:
            def __init__(self, hot, obs):
                self.hot, self.obs = hot, obs
                self.pos = hot  # for block_until_ready/finite plumbing

        state = _Packed(hot0, obs0)
        far = {"list": None, "active": None, "rebuilds": 0, "full": 0,
               "pairs": 0, "overflow": 0, "dropped": 0, "far_frames": 0}
        kw = dict(s=spec.collision_stencil, ff=ff,
                  radius=cfg.particle_radius)

        def far_rebuild(hot):
            pos = jnp.stack([hot[0], hot[1]], axis=-1)
            alive = immut[0] > 0.0
            far["rebuilds"] += 1
            # hysteresis: only run the count-only pre-pass while empty
            if far["pairs"] == 0:
                total, com = far_candidate_count(pos, alive, **kw)
                if int(total) == 0:
                    far["list"] = empty_far_list_at(pos, com, ff)
                    far["active"] = None
                    return
            far["full"] += 1
            fl = rebuild_far_list(pos, alive, **kw)
            far["list"] = fl
            far["pairs"] = int(fl.n_pairs)
            far["overflow"] = max(far["overflow"], int(fl.overflow))
            far["dropped"] = max(far["dropped"],
                                 max(far["pairs"] - far_k, 0))
            far["active"] = (crop_far_list(fl, far_k)
                             if far["pairs"] > 0 else None)

        def step(s):
            if far_enabled:
                if far["list"] is None:
                    far_rebuild(s.hot)
                else:
                    disp, vrel = packed_far_motion2(s.hot, immut, far["list"])
                    if float(disp) + 2.0 * float(vrel) > ff.skin * 0.5:
                        far_rebuild(s.hot)
                if far["active"] is not None:
                    far["far_frames"] += 1
                    return _Packed(*fused_frame2_far(
                        s.hot, s.obs, immut, ec, far["active"], consts,
                        uin, spec, cfg, ff, tile_w=64))
            return _Packed(*fused_frame2(s.hot, s.obs, immut, ec, consts,
                                         uin, spec, cfg, tile_w=64))

        def alive_beams(s):
            got = unpack_lattice2(s.hot, s.obs, template)
            return sum(int(np.asarray(e.alive).sum()) for e in got.edges)

        def warm_extra(s):
            # precompile EVERY variant the timed loop may touch so a
            # mid-bench first-use never lands in the timing
            if far_enabled:
                pos = jnp.stack([s.hot[0], s.hot[1]], axis=-1)
                alive = immut[0] > 0.0
                total, com = far_candidate_count(pos, alive, **kw)
                fl = rebuild_far_list(pos, alive, **kw)
                _ = packed_far_motion2(s.hot, immut, fl)
                out = fused_frame2_far(
                    jnp.copy(s.hot), jnp.copy(s.obs), immut, ec,
                    crop_far_list(fl, far_k), consts, uin, spec, cfg, ff,
                    tile_w=64)
                jax.block_until_ready(out[0])

        far_stats = far
    elif path == "fused_v1" and scene_name == "tearing_cloth":
        # round-1 kernel kept for comparison (BENCH_PATH=fused_v1)
        from softbody_tpu.models import tearing_cloth_lattice
        from softbody_tpu.ops.pallas.fused_substep import (
            fused_frame,
            pack_lattice,
            unpack_lattice,
        )

        lstate, spec, cfg, consts = tearing_cloth_lattice(n_particles=n_target)
        w, h = lstate.shape
        n = w * h
        m = sum(int(np.asarray(e.alive).sum()) for e in lstate.edges)
        log(f"scene {scene_name} (fused v1, lattice {w}x{h}): {n} "
            f"particles, {m} springs, stencil r={spec.collision_stencil}, "
            f"subticks={cfg.subticks} (built in {time.time() - t0:.1f}s)")
        mut0, immut = pack_lattice(lstate, tile_w=64)

        class _Packed:
            def __init__(self, mut):
                self.mut = mut
                self.pos = mut  # for block_until_ready/finite plumbing

        state = _Packed(mut0)
        template = lstate

        def step(s):
            return _Packed(fused_frame(s.mut, immut, consts, uin, spec, cfg,
                                       tile_w=64))

        def alive_beams(s):
            got = unpack_lattice(s.mut, immut, template)
            return sum(int(np.asarray(e.alive).sum()) for e in got.edges)
    elif path == "lattice" and scene_name == "tearing_cloth":
        # dense stencil engine — the TPU-native fast path for lattices
        from softbody_tpu.models import tearing_cloth_lattice
        from softbody_tpu.ops.stencil import lattice_frame_jit

        state, spec, cfg, consts = tearing_cloth_lattice(n_particles=n_target)
        w, h = state.shape
        n = w * h
        m = sum(int(np.asarray(e.alive).sum()) for e in state.edges)
        log(f"scene {scene_name} (dense lattice {w}x{h}): {n} particles, "
            f"{m} springs, collision stencil r={spec.collision_stencil}, "
            f"subticks={cfg.subticks} (built in {time.time() - t0:.1f}s)")

        def step(s):
            return lattice_frame_jit(s, consts, uin, spec, cfg)

        def alive_beams(s):
            return sum(int(np.asarray(e.alive).sum()) for e in s.edges)
    else:
        from softbody_tpu.models import SCENES
        from softbody_tpu.ops.step import frame_jit

        state, cfg = SCENES[scene_name](n_particles=n_target)
        n = int(np.asarray(state.particle_alive).sum())
        m = int(np.asarray(state.beam_alive).sum())
        log(f"scene {scene_name}: {n} particles, {m} beams, "
            f"collision={cfg.collision_mode}, subticks={cfg.subticks} "
            f"(built in {time.time() - t0:.1f}s)")

        def step(s):
            return frame_jit(s, consts, uin, cfg)

        def alive_beams(s):
            return int(np.asarray(s.beam_alive).sum())

    m_initial = alive_beams(state)

    t0 = time.time()
    state = step(state)
    jax.block_until_ready(state.pos)
    log(f"compile+first frame {time.time() - t0:.1f}s")

    def sync(s):
        # scalar readback: block_until_ready alone can return early
        # through the axon transport on donated output chains
        return jax.device_get(s.pos[(0,) * s.pos.ndim])

    # warm steady state AND the sync op itself (its first use triggers a
    # remote compile costing seconds — must not land in the timed loop);
    # warm_extra precompiles the far-field variants
    if "warm_extra" in dir():
        t0 = time.time()
        warm_extra(state)
        log(f"far-field variants compiled in {time.time() - t0:.1f}s")
    state = step(state)
    _ = sync(state)

    t0 = time.time()
    for _ in range(frames):
        state = step(state)
    _ = sync(state)
    elapsed = time.time() - t0

    substeps = frames * cfg.subticks
    substeps_per_sec = substeps / elapsed
    particle_substeps_per_sec = substeps_per_sec * n
    pos = np.asarray(state.pos)
    finite = bool(np.isfinite(pos).all())
    log(f"{frames} frames ({substeps} substeps) in {elapsed:.2f}s → "
        f"{substeps_per_sec:.1f} substeps/s, "
        f"{particle_substeps_per_sec:.3g} particle-substeps/s, finite={finite}")

    far_desc = ""
    if far_stats:
        far_desc = (", far-field armed" if far_enabled else
                    ", far-field off")
    result = {
        "metric": f"substeps/sec @ {n} particles / {m} springs "
                  f"({scene_name}, {path} path, self-collision, "
                  f"breakage{far_desc})",
        "value": round(substeps_per_sec, 2),
        "unit": "substeps/s",
        "vs_baseline": round(substeps_per_sec / 500.0, 3),
        "particle_substeps_per_sec": round(particle_substeps_per_sec, 1),
        "particles": n,
        "beams_initial": m_initial,
        "beams_final": alive_beams(state),
        "finite": finite,
    }
    if far_stats:
        result.update(
            far_rebuilds=far_stats["rebuilds"],
            far_full_rebuilds=far_stats["full"],
            far_frames=far_stats["far_frames"],
            far_pairs=far_stats["pairs"],
            far_overflow=far_stats["overflow"],
            far_dropped=far_stats["dropped"],
        )
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
