"""Decoupled-readback proof (BASELINE.md row 3): stepping throughput of
the live engine with and without a 60 Hz render_packet() consumer.

The worker's frame loop snapshots device refs per frame (cheap device
copies under a lock); the D2H transfer happens on the CALLING thread in
``render_packet()`` (engine/worker.py::host_packet).  If decoupling
works, frames/sec with a 60 Hz poller matches the free-running rate to
within a few percent.

Run on the real TPU: python scripts/bench_readback.py [n=1000000] [secs=20]
"""

from __future__ import annotations

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main() -> int:
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    secs = float(sys.argv[2]) if len(sys.argv) > 2 else 20.0

    t0 = time.time()
    np.asarray(jax.block_until_ready(jnp.zeros(8)))
    print(f"warmup {time.time() - t0:.1f}s", flush=True)

    from softbody_tpu.engine.engine import LatticeEngine
    from softbody_tpu.engine.protocol import EngineOptions
    from softbody_tpu.models import tearing_cloth_lattice

    lstate, spec, cfg, consts = tearing_cloth_lattice(
        n_particles=n_target, fall_speed=4.0
    )
    opts = EngineOptions(
        subticks=cfg.subticks,
        particle_radius=cfg.particle_radius,
        collision_mode=cfg.collision_mode,
    )

    def run_phase(eng, label, poll_hz, secs):
        # let compile finish: wait for the first frame
        while eng.stats().frame_index < 1:
            time.sleep(0.2)
        stop = threading.Event()
        packets = [0]
        bytes_read = [0]

        def poller():
            period = 1.0 / poll_hz
            while not stop.is_set():
                t = time.monotonic()
                pkt = eng.render_packet()
                if pkt is not None:
                    packets[0] += 1
                    bytes_read[0] += pkt.pos.nbytes
                dt_ = period - (time.monotonic() - t)
                if dt_ > 0:
                    stop.wait(dt_)

        th = None
        if poll_hz:
            th = threading.Thread(target=poller, daemon=True)
            th.start()
        f0 = eng.stats().frame_index
        t0 = time.monotonic()
        time.sleep(secs)
        f1 = eng.stats().frame_index
        el = time.monotonic() - t0
        stop.set()
        if th:
            th.join(timeout=5)
        fps = (f1 - f0) / el
        print(
            f"{label}: {f1 - f0} frames in {el:.1f}s -> {fps:.2f} fps "
            f"({fps * opts.subticks:.1f} substeps/s); packets={packets[0]} "
            f"({bytes_read[0] / 1e6:.0f} MB read)",
            flush=True,
        )
        return fps

    with LatticeEngine(lstate, spec, consts=consts, options=opts,
                       fused=True, tile_w=64) as eng:
        free = run_phase(eng, "free-running (no readback)", 0, secs)
        polled = run_phase(eng, "with 60 Hz readback", 60.0, secs)
        # packet consumers realistically want ~30-60 Hz; also try flat-out
        flat = run_phase(eng, "with flat-out readback", 1000.0, secs)

    print(
        f"overhead: 60Hz {100 * (1 - polled / free):.1f}%  "
        f"flat-out {100 * (1 - flat / free):.1f}%",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
