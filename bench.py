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
    # persistent compilation cache: the 1M frame program compiles in
    # ~60-90 s; cache hits cut repeat runs (same code, same shapes) to
    # seconds.  Set BENCH_NO_CACHE=1 to measure cold compiles.
    if os.environ.get("BENCH_NO_CACHE", "") != "1":
        os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                              "/root/.cache/jax_comp_cache")

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
    far_mode = os.environ.get("BENCH_FAR_MODE", "v4")
    far_k = int(os.environ.get("BENCH_FAR_K",
                               16384 if far_mode == "v4" else 512))
    far_cadence = int(os.environ.get("BENCH_FAR_CADENCE", 8))
    far_skin = float(os.environ.get("BENCH_FAR_SKIN", 0.75))
    fall_speed = float(os.environ.get("BENCH_FALL_SPEED", 2.5))
    slits = int(os.environ.get("BENCH_SLITS", 7))

    consts, uin = PhysicsConstants.default(), UserInput.none()
    t0 = time.time()
    far_stats = {}
    if path == "fused" and scene_name == "tearing_cloth":
        # fused Pallas kernel v2 (18-plane hot carry, scalar edge params,
        # pre-rotated lane copies) driven through the real engine backend
        # (FusedLatticeBackend).  Far-field self-collision rides the
        # substep scan ON DEVICE (fused_frame2_auto): Verlet candidate
        # list in the scan carry, lax.cond rebuild on the displacement
        # trigger, far apply only when the list is non-empty — one
        # compiled frame covers every phase, no rehearsal needed.
        from softbody_tpu.engine.backends import FusedLatticeBackend
        from softbody_tpu.models import tearing_cloth_lattice
        from softbody_tpu.ops.farfield import FarFieldSpec

        # fragile fabric (limit 0.22 / yield 0.18): impact strain at this
        # fall speed is ~v/c ≈ 0.18, so tearing propagates from the slit
        # bridges under gentle dynamics — with the default 0.5 limit only
        # a shock-speed crush (fall ≥ 4) tears, which is a harsher
        # regime than "cloth tearing" (and every snap then re-fires the
        # Verlet trigger, making the whole window rebuild-bound)
        lstate, spec, cfg, consts = tearing_cloth_lattice(
            n_particles=n_target, fall_speed=fall_speed, slits=slits,
            strain_limit=0.22, yield_strain=0.18,
        )
        # BENCH_STENCIL: kernel near-field chebyshev radius (default from
        # the scene, r=2).  A wider stencil absorbs tear-front band pairs
        # (index distance ≤ r) into dense in-kernel compute, shrinking
        # the far pair list.
        st_env = os.environ.get("BENCH_STENCIL", "")
        if st_env:
            import dataclasses as _dc

            spec = _dc.replace(spec, collision_stencil=int(st_env))
        w, h = lstate.shape
        n = w * h
        m = sum(int(np.asarray(e.alive).sum()) for e in lstate.edges)
        spacing = 980.0 / (w - 1)
        ff = None
        if far_enabled:
            if far_mode == "v4":
                # v4 (ops/farfield4.py): fixed-cadence rebuilds — horizon
                # doubles as the cadence, skin only buys contact margin
                # within a cadence window, capacity sized for zero
                # overflow at the crumple (~25k candidate chunk pairs
                # measured; bucketed apply keeps light frames cheap)
                ff = FarFieldSpec(max_pairs=max(far_k, 1024),
                                  max_tile_pairs=256,
                                  skin=far_skin * spacing,
                                  horizon=far_cadence)
            else:
                # round-2 triggered mode: skin 1.5·spacing + horizon 32
                ff = FarFieldSpec(max_pairs=max(far_k, 512),
                                  max_tile_pairs=256, skin=1.5 * spacing,
                                  horizon=32)
        log(f"scene {scene_name} (fused v2 backend, lattice {w}x{h}): {n} "
            f"particles, {m} springs, stencil r={spec.collision_stencil}, "
            f"subticks={cfg.subticks}, fall={fall_speed}, slits={slits}, "
            f"farfield={f'armed ({far_mode}, on-device)' if far_enabled else 'off'} "
            f"(K={far_k}, skin={ff.skin if ff else 0:.2f}, "
            f"cadence/horizon={ff.horizon if ff else 0}) "
            f"(built in {time.time() - t0:.1f}s)")
        tile_w = int(os.environ.get("BENCH_TILE_W", 64))
        # apply-capacity buckets, e.g. BENCH_FAR_BUCKETS=2048,4096
        # (empty/unset = frame default)
        bk_env = os.environ.get("BENCH_FAR_BUCKETS", "")
        far_buckets = (tuple(int(x) for x in bk_env.split(","))
                       if bk_env else None)
        far_act = os.environ.get("BENCH_FAR_ACTIVATION", "0") != "0"
        far_mb = int(os.environ.get("BENCH_FAR_MB", 32))
        far_detect = os.environ.get("BENCH_FAR_DETECT", "xla")
        # band-pass impl in the rebuild: "kernel" (default, Pallas —
        # bit-identical flags, ~0.08 ms/substep cheaper at the 1M tear)
        # or "xla" (the shifted-compare loop)
        far_band = os.environ.get("BENCH_FAR_BAND", "kernel")
        # kernel-variant flags (fused_substep2 kvar), e.g.
        # BENCH_KVAR=rollgroup,dexp2 ("rollgroup" = batched
        # partner-shift lane rolls; "rsqrt" = sqrt+div → rsqrt+mul;
        # "dexp2" = drag pow → square, auto-dropped by the backend when
        # the concrete drag exponent isn't 2.0).  Default = the backend
        # default (measured-best set); BENCH_KVAR=none for the strict
        # oracle-exact kernel.
        kv_env = os.environ.get("BENCH_KVAR",
                                "rollgroup,rsqrt,dexp2,lanecut,krec,ealpack")
        kvar = tuple(x for x in kv_env.split(",") if x and x != "none")
        backend = FusedLatticeBackend(spec, cfg, farfield=ff,
                                      tile_w=tile_w, far_mode=far_mode,
                                      far_buckets=far_buckets,
                                      far_activation=far_act,
                                      far_mb=far_mb,
                                      far_detect=far_detect,
                                      far_band=far_band,
                                      kernel_variants=kvar)
        packed = backend.pack_state(lstate)

        class _Packed:
            def __init__(self, st):
                self.st = st
                self.pos = st[0]  # for block_until_ready/finite plumbing

        state = _Packed(packed)

        def step(s):
            return _Packed(backend.step(s.st, consts, uin))

        def alive_beams(s):
            return backend.counts(s.st)[1]

        far_stats = backend.far_stats
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
    compile_first_s = time.time() - t0
    log(f"compile+first frame {compile_first_s:.1f}s")

    def sync(s):
        # scalar readback: block_until_ready alone can return early
        # through the axon transport on donated output chains
        return jax.device_get(s.pos[(0,) * s.pos.ndim])

    # warm steady state AND the sync op itself (its first use triggers a
    # remote compile costing seconds — must not land in the timed loop)
    warm = int(os.environ.get("BENCH_WARM", 1))
    for _ in range(warm):
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

    far_vals = far_stats() if far_stats else {}
    far_desc = ""
    if far_stats:
        if not far_enabled:
            far_desc = ", far-field off"
        elif far_vals.get("far_overflow", 0) == 0:
            far_desc = ", far-field armed untruncated"
        else:
            far_desc = (", far-field armed (OVERFLOWED "
                        f"{far_vals['far_overflow']} candidates)")
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
        "compile_first_s": round(compile_first_s, 1),
    }
    result.update(far_vals)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
