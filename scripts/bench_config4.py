"""BASELINE config 4 benchmark: 64 soft blobs with blob–blob contact,
friction and restitution (models/scenes.py::multi_blob), on the general
gather path with the spatial-hash grid broad phase.

Prints one JSON line: substeps/s plus scene facts.  Reference analog:
the same physics the O(N²) loop applies between blob particles
(compute.wgsl:144-170); the reference cannot host 64 blobs at this
particle count interactively (u16 cap aside, its collision loop is
quadratic), so the figure stands on BASELINE.json config 4 rather than
a reference number.

Env: BENCH4_BLOBS (default 64), BENCH4_FRAMES (default 12).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    np.asarray(jax.block_until_ready(jnp.zeros(8)))
    log(f"warmup readback {time.time() - t0:.1f}s; devices={jax.devices()}")

    from softbody_tpu import PhysicsConstants, UserInput
    from softbody_tpu.models import multi_blob
    from softbody_tpu.ops.step import frame_jit

    n_blobs = int(os.environ.get("BENCH4_BLOBS", 64))
    frames = int(os.environ.get("BENCH4_FRAMES", 12))

    t0 = time.time()
    state, cfg = multi_blob(n_blobs=n_blobs)
    n = int(np.asarray(state.particle_alive).sum())
    m = int(np.asarray(state.beam_alive).sum())
    consts, uin = PhysicsConstants.default(), UserInput.none()
    log(f"multi_blob: {n_blobs} blobs, {n} particles, {m} beams, "
        f"grid broad phase, subticks={cfg.subticks} "
        f"(built {time.time() - t0:.1f}s)")

    t0 = time.time()
    state = frame_jit(state, consts, uin, cfg)
    jax.block_until_ready(state.pos)
    log(f"compile+first frame {time.time() - t0:.1f}s")

    state = frame_jit(state, consts, uin, cfg)
    _ = jax.device_get(state.pos[0, 0])

    t0 = time.time()
    for _ in range(frames):
        state = frame_jit(state, consts, uin, cfg)
    _ = jax.device_get(state.pos[0, 0])
    elapsed = time.time() - t0

    substeps = frames * cfg.subticks
    sps = substeps / elapsed
    pos = np.asarray(state.pos)
    finite = bool(np.isfinite(pos[np.asarray(state.particle_alive)]).all())
    print(json.dumps({
        "metric": f"substeps/sec @ {n} particles / {m} beams "
                  f"(multi_blob config 4, general path, grid collision)",
        "value": round(sps, 1),
        "unit": "substeps/s",
        "particles": n,
        "beams": m,
        "blobs": n_blobs,
        "particle_substeps_per_sec": round(sps * n, 1),
        "finite": finite,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
