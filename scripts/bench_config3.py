"""Config-3 (100k self-colliding cloth, general path) perf probe.

Times the full frame step plus isolated pieces (beams-only, collisions-only)
for each collision mode so the bottleneck is visible.  Run on the real TPU:

    python scripts/bench_config3.py [grid window none]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    modes = sys.argv[1:] or ["grid", "window", "none"]

    t0 = time.time()
    np.asarray(jax.block_until_ready(jnp.zeros(8)))
    print(f"warmup readback {time.time() - t0:.1f}s; devices={jax.devices()}",
          flush=True)

    import dataclasses

    from softbody_tpu import PhysicsConstants, UserInput
    from softbody_tpu.models import self_colliding_cloth
    from softbody_tpu.ops.step import frame

    n_target = int(os.environ.get("BENCH3_N", 100_000))
    state, cfg0 = self_colliding_cloth(n_particles=n_target)
    n = int(np.asarray(state.particle_alive).sum())
    m = int(np.asarray(state.beam_alive).sum())
    print(f"{n} particles, {m} beams, radius={cfg0.particle_radius:.3f}, "
          f"D={state.inc_beam.shape[1]}", flush=True)
    consts, uin = PhysicsConstants.default(), UserInput.none()

    def sync(s):
        return jax.device_get(s.pos[0, 0])

    # settle the cloth a few frames first so the fold actually happens
    settle = jax.jit(lambda s: frame(s, consts, uin, cfg0))
    for _ in range(4):
        state = settle(state)
    _ = sync(state)

    for mode in modes:
        if mode == "planified":
            # the TPU-native general-topology route (ops/planify.py):
            # spatially embed the arbitrary graph onto the dense stencil
            # path; beams bit-exact vs flat (quantized), collisions via
            # the dense index-space stencil + far-field for fold contacts
            # that develop after the embedding (planified_frame_far;
            # BENCH3_FARFIELD=0 to measure the stencil-only frame)
            from softbody_tpu.ops.farfield import FarFieldSpec
            from softbody_tpu.ops.planify import (
                planified_frame, planified_frame_far, planify,
            )

            far_on = os.environ.get("BENCH3_FARFIELD", "1") != "0"
            t0 = time.time()
            # far-armed embeddings need chunk-grid-aligned plane dims
            # (chunk * tile_chunks = 16; see farfield4 id encode/decode)
            ps, pspec, aux = planify(state, collision_stencil=3,
                                     chunk_multiple=16 if far_on else 1)
            print(f"[planified] embed {time.time() - t0:.1f}s: plane "
                  f"{pspec.width}x{pspec.height}, "
                  f"{len(pspec.edge_offsets)} offset classes, "
                  f"{aux.n_exceptions} exception beams, "
                  f"farfield={'armed' if far_on else 'off'}", flush=True)
            # the dense path does index-stencil collisions whenever the
            # mode isn't "none" (lattice_substep → _stencil_collisions)
            cfg = dataclasses.replace(cfg0, collision_mode="allpairs")
            ff = FarFieldSpec(max_pairs=16384, max_tile_pairs=256,
                              skin=3.0 * cfg0.particle_radius, horizon=8)

            def pstep(s):
                if far_on:
                    return planified_frame_far(s, consts, uin, pspec,
                                               cfg, ff)
                return planified_frame(s, consts, uin, pspec, cfg), None

            t0 = time.time()
            ps, st = pstep(ps)
            _ = jax.device_get(ps.lat.pos[0, 0])
            print(f"[planified] compile+first {time.time() - t0:.1f}s",
                  flush=True)
            frames = 8
            t0 = time.time()
            for _ in range(frames):
                ps, st = pstep(ps)
            _ = jax.device_get(ps.lat.pos[0, 0])
            el = time.time() - t0
            sps = frames * cfg.subticks / el
            far_desc = ""
            if far_on:
                st = np.asarray(st)
                far_desc = (f" [far: rebuilds/frame={int(st[0])} "
                            f"max_pairs={int(st[1])} "
                            f"overflow={int(st[2])}]")
            print(f"[planified] {frames} frames in {el:.2f}s -> "
                  f"{sps:.1f} substeps/s "
                  f"({sps * n:.3g} particle-substeps/s){far_desc}",
                  flush=True)
            continue
        if mode == "directed":
            from softbody_tpu.ops.directed import (
                build_directed, directed_frame,
            )

            t0 = time.time()
            ds, _se = build_directed(state)
            print(f"[directed] build {time.time() - t0:.1f}s: D="
                  f"{ds.degree}", flush=True)
            cfg = dataclasses.replace(cfg0, collision_mode="window")
            t0 = time.time()
            ds = directed_frame(ds, consts, uin, cfg)
            _ = jax.device_get(ds.pos[0, 0])
            print(f"[directed] compile+first {time.time() - t0:.1f}s",
                  flush=True)
            frames = 4
            t0 = time.time()
            for _ in range(frames):
                ds = directed_frame(ds, consts, uin, cfg)
            _ = jax.device_get(ds.pos[0, 0])
            el = time.time() - t0
            sps = frames * cfg.subticks / el
            print(f"[directed] {frames} frames in {el:.2f}s -> "
                  f"{sps:.1f} substeps/s "
                  f"({sps * n:.3g} particle-substeps/s)", flush=True)
            continue
        cfg = dataclasses.replace(cfg0, collision_mode=mode)
        step = jax.jit(lambda s, _cfg=cfg: frame(s, consts, uin, _cfg))
        t0 = time.time()
        s = step(state)
        _ = sync(s)
        print(f"[{mode}] compile+first {time.time() - t0:.1f}s", flush=True)
        frames = 4
        t0 = time.time()
        for _ in range(frames):
            s = step(s)
        _ = sync(s)
        el = time.time() - t0
        sps = frames * cfg.subticks / el
        print(f"[{mode}] {frames} frames in {el:.2f}s -> {sps:.1f} substeps/s "
              f"({sps * n:.3g} particle-substeps/s)", flush=True)

    return 0


if __name__ == "__main__":
    sys.exit(main())
