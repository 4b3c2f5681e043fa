"""One-process bench sweep over fused-path variants.

The axon transport's first D2H costs 1-15 min PER PROCESS, so sweeping
configs inside one process (one warmup, then compile+measure per
config) is far cheaper than N bench.py invocations.  Each config
prints one JSON line (same fields as bench.py plus "label").

Usage: python scripts/bench_sweep.py [label ...]
(no args = all configs; labels select a subset)

Env: SWEEP_N (default 1_000_000), SWEEP_FRAMES (default 8).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


# (label, overrides) — overrides: tile_w, buckets, far (bool), cadence,
# far_k.  Baseline mirrors bench.py defaults (tile_w 64, v4, K 16384,
# cadence 8, skin 0.75·spacing, fragile fabric, 7 slits).
CONFIGS = [
    ("base", {}),       # = bench.py defaults (no activation, mb 32)
    ("act", {"activation": True}),
    ("act_fine", {"activation": True,
                  "buckets": (64, 256, 1024, 2048, 4096)}),
    # measured 08-18 (bench_sweep3): base 568.0, tile128 544.1,
    # mb128 484.6, mb128_tile128 468.3 — tile 128 and 128-lane records
    # are both dead ends at 1M; defaults stay tile_w=64 / mb=32
    ("tile128", {"tile_w": 128}),
    ("tile32", {"tile_w": 32}),
    ("mb128", {"far_mb": 128}),
    ("mb128_tile128", {"far_mb": 128, "tile_w": 128}),
    # hybrid: gather from 32-lane records, scatter delta at 128-lane
    # (coarse unmirror) — decouples the two relayouts
    ("mbout128", {"far_mb_out": 128}),
    # kernel-side detection at cadence boundaries (fused_frame4
    # detect_mode="kernel"): XLA detection is 1.84 of the 3.38 ms
    # rebuild (probe_r6) and the kernel owns every plane in VMEM
    ("kdetect", {"far_detect": "kernel"}),
    # schedule-parameter A/Bs around the 567.96 base
    ("cadence6", {"cadence": 6}),
    ("cadence12", {"cadence": 12}),
    ("cadence16", {"cadence": 16}),
    ("k8192", {"far_k": 8192}),
    ("skin06", {"skin_mult": 0.6}),
    ("skin05", {"skin_mult": 0.5}),
    ("buckets1280", {"buckets": (1280, 2048, 4096)}),  # fits the ~1062
    ("buckets2048", {"buckets": (2048,)}),
    ("buckets4096", {"buckets": (4096,)}),  # mirror path at benched load
    # v3 head-to-head: triggered rebuilds + in-kernel detection, its
    # round-2 tuning (skin 1.5·spacing, horizon 32) but v4's capacity
    ("v3", {"far_mode": "v3", "skin_mult": 1.5, "cadence": 32}),
    ("nearfield", {"far": False}),
    # ---- round-4 kernel-variant A/Bs (kvar flags, fused_substep2) ----
    # attribution: nearfield isolates the kernel; nocollide drops the
    # collision pass + its rotations (stencil 0); nospring drops the
    # spring pass (NOT physics — attribution only)
    ("nf_nocollide", {"far": False, "stencil": 0}),
    ("nf_nospring", {"far": False, "kvar": ("nospring",)}),
    # optimization variants, kernel-only (nearfield) and full physics
    ("nf_rollgroup", {"far": False, "kvar": ("rollgroup",)}),
    ("nf_dexp2", {"far": False, "kvar": ("dexp2",)}),
    ("nf_rgdx", {"far": False, "kvar": ("rollgroup", "dexp2")}),
    ("rgdx", {"kvar": ("rollgroup", "dexp2")}),
    ("rgdx_b1280", {"kvar": ("rollgroup", "dexp2"),
                    "buckets": (1280, 2048, 4096)}),
    # residual bisect: stencil 0 + nospring = integrate + DMA + overhead
    ("nf_void", {"far": False, "stencil": 0, "kvar": ("nospring",)}),
    # "rsqrt": sqrt+div → rsqrt+mul in spring/collision/integrate
    ("nf_rsqrt", {"far": False, "kvar": ("rsqrt",)}),
    ("nf_rgrs", {"far": False, "kvar": ("rollgroup", "rsqrt", "dexp2")}),
    ("rg", {"kvar": ("rollgroup",)}),
    ("rgrs", {"kvar": ("rollgroup", "rsqrt", "dexp2")}),
    # bare slab pipeline (input DMA → VMEM copies → output DMA, all
    # math DCE'd): the kernel's structural floor, by tile width
    ("nf_pipe", {"far": False, "stencil": 0,
                 "kvar": ("nospring", "noint")}),
    ("nf_pipe32", {"far": False, "stencil": 0, "tile_w": 32,
                   "kvar": ("nospring", "noint")}),
    ("nf_pipe128", {"far": False, "stencil": 0, "tile_w": 128,
                    "kvar": ("nospring", "noint")}),
    ("nf_void32", {"far": False, "stencil": 0, "tile_w": 32,
                   "kvar": ("nospring",)}),
    ("nf_rgrs32", {"far": False, "tile_w": 32,
                   "kvar": ("rollgroup", "rsqrt", "dexp2")}),
    # "outfull": full-lane-row output DMA (one contiguous ~294 KB run
    # per plane per slab instead of 64 strided 4 KB chunks), +12%
    # written bytes.  nf_pipe_of isolates its effect on the bare pipe.
    ("nf_of", {"far": False,
               "kvar": ("rollgroup", "rsqrt", "dexp2", "outfull")}),
    ("of", {"kvar": ("rollgroup", "rsqrt", "dexp2", "outfull")}),
    ("nf_pipe_of", {"far": False, "stencil": 0,
                    "kvar": ("nospring", "noint", "outfull")}),
    # "lanecut": pack without the bottom lane pad (pad_hl=0) — at 1M
    # the lane dim drops 1152 → 1024 (−11% input DMA / rotations /
    # VMEM) and outputs become full rows.  Bit-exact (zero-filled
    # rotation halos).
    ("nf_lc", {"far": False,
               "kvar": ("rollgroup", "rsqrt", "dexp2", "lanecut")}),
    ("lc", {"kvar": ("rollgroup", "rsqrt", "dexp2", "lanecut")}),
    ("nf_pipe_lc", {"far": False, "stencil": 0,
                    "kvar": ("nospring", "noint", "lanecut")}),
    # "inbuf3": 3-deep input buffering (slabs i+1 AND i+2 in flight)
    ("nf_ib3", {"far": False,
                "kvar": ("rollgroup", "rsqrt", "dexp2", "inbuf3")}),
    ("nf_lcib", {"far": False, "kvar": ("rollgroup", "rsqrt", "dexp2",
                                        "lanecut", "inbuf3")}),
    ("lcib", {"kvar": ("rollgroup", "rsqrt", "dexp2",
                       "lanecut", "inbuf3")}),
    ("nf_pipe_ib3", {"far": False, "stencil": 0,
                     "kvar": ("nospring", "noint", "inbuf3")}),
    ("nf_pipe_lcib", {"far": False, "stencil": 0,
                      "kvar": ("nospring", "noint", "lanecut",
                               "inbuf3")}),
    # ("padw4", a 4-column sublane halo, measured UNLOWEABLE 08-20:
    # Mosaic pins HBM sublane DMA offsets to multiples of 8 — "Failed
    # to prove that a tile index in dimension 1 is divisible by the
    # tiling (8)".  The same bytes are instead chased by wider tiles:)
    # tile_w=128 under lanecut (the r3 tile128 dead-end verdict
    # predates lanecut's −11% VMEM/byte cut; halo fraction halves)
    ("nf_pipe_lc128", {"far": False, "stencil": 0, "tile_w": 128,
                       "kvar": ("nospring", "noint", "lanecut")}),
    ("nf_lc128", {"far": False, "tile_w": 128,
                  "kvar": ("rollgroup", "rsqrt", "dexp2", "lanecut")}),
    ("lc128", {"tile_w": 128,
               "kvar": ("rollgroup", "rsqrt", "dexp2", "lanecut")}),
    # "kmirror": the kernel emits each substep's far-apply mirror
    # records as a side output riding the scan carry — the apply's
    # granularity-bound [5,w,h]→records relayout (~0.185 ms/substep)
    # runs once per frame instead of per substep
    ("lckm", {"kvar": ("rollgroup", "rsqrt", "dexp2",
                       "lanecut", "kmirror")}),
    ("km", {"kvar": ("rollgroup", "rsqrt", "dexp2", "kmirror")}),
    # "krec": the apply returns delta RECORDS and the kernel consumes
    # them (implies the kmirror carry) — both far relayouts gone
    ("lckr", {"kvar": ("rollgroup", "rsqrt", "dexp2",
                       "lanecut", "krec")}),
    # cadence re-sweep under krec: with the apply's fixed relayouts
    # gone, the rebuild÷cadence term (~0.42 at 8) is relatively bigger
    # and the cost of a longer extrusion horizon relatively smaller
    ("lckr_c12", {"cadence": 12,
                  "kvar": ("rollgroup", "rsqrt", "dexp2",
                           "lanecut", "krec")}),
    ("lckr_c16", {"cadence": 16,
                  "kvar": ("rollgroup", "rsqrt", "dexp2",
                           "lanecut", "krec")}),
    # "ealpack": the four edge-alive planes ride as bits of ONE packed
    # plane — hot stack 18 → 15 planes (−1/6 of the pipeline-bound slab
    # DMA), bit-exact (alive is boolean)
    ("lckrep", {"far_band": "xla",   # pinned: the pre-band-kernel A/B
                "kvar": ("rollgroup", "rsqrt", "dexp2",
                         "lanecut", "krec", "ealpack")}),
    ("nf_ep", {"far": False,
               "kvar": ("rollgroup", "rsqrt", "dexp2",
                        "lanecut", "ealpack")}),
    ("nf_pipe_ep", {"far": False, "stencil": 0,
                    "kvar": ("nospring", "noint", "lanecut",
                             "ealpack")}),
    # Pallas band-detection kernel inside the rebuild (far_band):
    # bit-identical flags, reads the planes once per slab instead of
    # once per ~100 offsets (probe_r7: the band is ~1.45 of the 3.18 ms
    # rebuild)
    ("lckrep_bk", {"far_band": "kernel",
                   "kvar": ("rollgroup", "rsqrt", "dexp2",
                            "lanecut", "krec", "ealpack")}),
    # tighter apply crop: the benched tear runs 1165 pairs — a 1280
    # bucket cuts the krec mirror gather ~37% vs cropping to 2048
    ("bk1280", {"far_band": "kernel",
                "buckets": (1280, 2048, 4096),
                "kvar": ("rollgroup", "rsqrt", "dexp2",
                         "lanecut", "krec", "ealpack")}),
]


def main() -> int:
    import numpy as np
    import jax
    import jax.numpy as jnp

    want = set(sys.argv[1:])
    configs = [c for c in CONFIGS if not want or c[0] in want]

    t0 = time.time()
    np.asarray(jax.block_until_ready(jnp.zeros(8)))
    log(f"warmup readback {time.time() - t0:.1f}s; devices={jax.devices()}")

    from softbody_tpu import PhysicsConstants, UserInput
    from softbody_tpu.engine.backends import FusedLatticeBackend
    from softbody_tpu.models import tearing_cloth_lattice
    from softbody_tpu.ops.farfield import FarFieldSpec

    n_target = int(os.environ.get("SWEEP_N", 1_000_000))
    frames = int(os.environ.get("SWEEP_FRAMES", 8))
    uin = UserInput.none()

    t0 = time.time()
    lstate, spec, cfg, consts = tearing_cloth_lattice(
        n_particles=n_target, fall_speed=2.5, slits=7,
        strain_limit=0.22, yield_strain=0.18,
    )
    w, h = lstate.shape
    spacing = 980.0 / (w - 1)
    log(f"scene {w}x{h} built in {time.time() - t0:.1f}s")

    for label, ov in configs:
        tile_w = ov.get("tile_w", 64)
        far = ov.get("far", True)
        cadence = ov.get("cadence", 8)
        far_k = ov.get("far_k", 16384)
        buckets = ov.get("buckets")
        ff = None
        if far:
            ff = FarFieldSpec(max_pairs=far_k, max_tile_pairs=256,
                              skin=ov.get("skin_mult", 0.75) * spacing,
                              horizon=cadence)
        log(f"== {label}: tile_w={tile_w} far={far} cadence={cadence} "
            f"K={far_k} buckets={buckets}")
        sp = spec
        if "stencil" in ov:
            import dataclasses as _dc
            sp = _dc.replace(spec, collision_stencil=ov["stencil"])
            if ov["stencil"] == 0:
                import dataclasses as _dc2
                cfg_run = _dc2.replace(cfg, collision_mode="none")
            else:
                cfg_run = cfg
        else:
            cfg_run = cfg
        try:
            backend = FusedLatticeBackend(
                sp, cfg_run, farfield=ff, tile_w=tile_w,
                far_mode=ov.get("far_mode", "v4"), far_buckets=buckets,
                far_activation=ov.get("activation", False),
                far_mb=ov.get("far_mb", 32),
                far_mb_out=ov.get("far_mb_out"),
                far_detect=ov.get("far_detect", "xla"),
                # None = backend platform default (kernel on TPU)
                far_band=ov.get("far_band"),
                kernel_variants=ov.get("kvar", ()))
            state = backend.pack_state(lstate)

            t0 = time.time()
            state = backend.step(state, consts, uin)
            jax.block_until_ready(state[0])
            compile_s = time.time() - t0

            state = backend.step(state, consts, uin)   # warm
            jax.device_get(state[0][(0,) * state[0].ndim])

            t0 = time.time()
            for _ in range(frames):
                state = backend.step(state, consts, uin)
            jax.device_get(state[0][(0,) * state[0].ndim])
            elapsed = time.time() - t0

            sps = frames * cfg.subticks / elapsed
            out = {
                "label": label,
                "value": round(sps, 2),
                "unit": "substeps/s",
                "vs_baseline": round(sps / 500.0, 3),
                "compile_first_s": round(compile_s, 1),
                "ms_per_substep": round(1000.0 * elapsed
                                        / (frames * cfg.subticks), 3),
            }
            out.update(backend.far_stats())
            print(json.dumps(out), flush=True)
        except Exception as e:  # noqa: BLE001 — sweep survives one bad cfg
            print(json.dumps({"label": label, "error": repr(e)[:300]}),
                  flush=True)
            log(f"{label} FAILED: {e!r}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
