"""Round-3 probe: far-field pair DEMAND and cost structure vs skin/K on
the real bench scene (1M tearing cloth, bench.py constants).

For each (skin_mult, K, horizon) config: build the FusedLatticeBackend,
run FRAMES frames, and per frame read back wall time + far list state
(n_pairs, overflow, rebuilds).  One process, one D2H warmup; configs run
sequentially so numbers are comparable (machine throughput varies ±30%
between processes — ROADMAP.md).

Usage: python scripts/probe_r3.py '[{"skin":1.5,"k":8192},...]'
(defaults below if no argv).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    t0 = time.time()
    np.asarray(jax.block_until_ready(jnp.zeros(8)))
    log(f"warmup readback {time.time() - t0:.1f}s; devices={jax.devices()}")

    from softbody_tpu import PhysicsConstants, UserInput
    from softbody_tpu.engine.backends import FusedLatticeBackend
    from softbody_tpu.models import tearing_cloth_lattice
    from softbody_tpu.ops.farfield import FarFieldSpec

    configs = json.loads(sys.argv[1]) if len(sys.argv) > 1 else [
        {"skin": 1.5, "k": 8192, "horizon": 32},
        {"skin": 0.75, "k": 8192, "horizon": 32},
        {"skin": 0.4, "k": 8192, "horizon": 16},
        {"skin": 0.5, "k": 512, "horizon": 32},
    ]
    frames = int(configs[0].get("frames", 12)) if configs else 12

    uin = UserInput.none()
    t0 = time.time()
    lstate, spec, cfg, consts = tearing_cloth_lattice(
        n_particles=1_000_000, fall_speed=2.5, slits=7,
        strain_limit=0.22, yield_strain=0.18,
    )
    w, h = lstate.shape
    spacing = 980.0 / (w - 1)
    log(f"scene {w}x{h} built in {time.time() - t0:.1f}s; spacing={spacing:.3f}")

    for cfgd in configs:
        skin_m = float(cfgd["skin"])
        k = int(cfgd["k"])
        horizon = int(cfgd.get("horizon", 32))
        nfr = int(cfgd.get("frames", frames))
        ff = FarFieldSpec(max_pairs=k, max_tile_pairs=256,
                          skin=skin_m * spacing, horizon=horizon)
        backend = FusedLatticeBackend(spec, cfg, farfield=ff, tile_w=64)
        t0 = time.time()
        state = backend.pack_state(lstate)
        log(f"--- config skin={skin_m}sp K={k} hor={horizon} "
            f"(packed {time.time() - t0:.1f}s)")
        t0 = time.time()
        state = backend.step(state, consts, uin)
        jax.block_until_ready(state[0])
        log(f"compile+first frame {time.time() - t0:.1f}s")
        rows = []
        for f in range(nfr):
            t0 = time.time()
            state = backend.step(state, consts, uin)
            _ = jax.device_get(state[0][0, 8, 128])
            dt_f = time.time() - t0
            fl = backend._far_list
            npair, over, age = jax.device_get(
                (fl.n_pairs, fl.overflow, fl.age))
            st = backend.far_stats()
            rows.append(dict(frame=f + 1, s=round(cfg.subticks / dt_f, 1),
                             pairs=int(npair), over=int(over),
                             age=int(age), reb=st["far_rebuilds"],
                             max_pairs=st["far_pairs"],
                             max_over=st["far_overflow"]))
            log(json.dumps(rows[-1]))
        finite = bool(np.isfinite(np.asarray(
            jax.device_get(state[0][:2]))).all())
        log(f"config done; finite={finite}; "
            f"mean substeps/s={np.mean([r['s'] for r in rows]):.1f}")
        del backend, state


if __name__ == "__main__":
    main()
