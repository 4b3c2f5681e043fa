"""Feasibility probe: Pallas-produced (4,32) mirror records.

docs/PERF.md open lever #1: if the fused kernel (or a tiny standalone
kernel reading the same planes) can emit the far-field mirror table
directly, the apply's XLA relayout (~0.34 ms) and the narrow path's
40-rows/pair gather disappear.  The blocker risk is Mosaic lowering:
probe_cm's 4-lane-granularity reshape failed ("unsupported shape
cast"); records are 32-lane so the casts here might lower.

Stages (each prints PASS/FAIL + time):
1. Mosaic lowering of the core cast: [rows, 128] -> [rows*4, 32]
   (slice a 128-lane field block, split lanes 4x32, merge the 4 into
   sublanes — the record->plane direction), and its inverse.
2. A standalone mirror kernel: planes [5, W, H] -> records
   [(H/32)*(W/4), 640] matching ops.farfield4.mirror_table bit-exactly.
3. Timing vs the XLA mirror_table at 1M-scene shape.

Run on the real chip (Mosaic compiles via the tunnel):
    python scripts/probe_recmirror.py
"""

from __future__ import annotations

import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t0 = time.time()
    np.asarray(jax.block_until_ready(jnp.zeros(8)))
    log(f"warmup {time.time() - t0:.1f}s devices={jax.devices()}")

    sys.path.insert(0, "/root/repo")
    from softbody_tpu.ops.farfield4 import MB, NF, RX, mirror_table

    # ---- stage 1: the core reshape casts --------------------------------
    def cast_kernel(x_ref, o_ref):
        x = x_ref[...]                       # [rows, 128]
        r = x.shape[0]
        o_ref[...] = x.reshape(r * 4, 32)    # lane split + sublane merge

    rows = 64
    x = jnp.asarray(np.random.default_rng(0)
                    .normal(size=(rows, 128)).astype(np.float32))
    try:
        out = pl.pallas_call(
            cast_kernel,
            out_shape=jax.ShapeDtypeStruct((rows * 4, 32), jnp.float32),
        )(x)
        ok = np.array_equal(np.asarray(out),
                            np.asarray(x).reshape(rows * 4, 32))
        print(f"stage1 [rows,128]->[4rows,32] cast: "
              f"{'PASS' if ok else 'VALUE-FAIL'}", flush=True)
    except Exception as e:
        print(f"stage1 cast: LOWERING-FAIL {str(e)[:200]}", flush=True)

    def inv_kernel(x_ref, o_ref):
        x = x_ref[...]                       # [4rows, 32]
        r = x.shape[0] // 4
        o_ref[...] = x.reshape(r, 128)
    try:
        y = jnp.asarray(np.random.default_rng(1)
                        .normal(size=(rows * 4, 32)).astype(np.float32))
        out = pl.pallas_call(
            inv_kernel,
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        )(y)
        ok = np.array_equal(np.asarray(out), np.asarray(y).reshape(rows, 128))
        print(f"stage1 inverse cast: {'PASS' if ok else 'VALUE-FAIL'}",
              flush=True)
    except Exception as e:
        print(f"stage1 inverse: LOWERING-FAIL {str(e)[:200]}", flush=True)

    # ---- stage 2: standalone mirror kernel ------------------------------
    # grid over lane blocks b; each step reads planes[:, :, b*32:(b+1)*32]
    # = [5, W, 32] and writes record rows [b*(W/4) : (b+1)*(W/4), 640].
    # Record row cx lanes [f*128 + ix*32 + l] = plane[f, cx*4+ix, 32b+l]:
    # per f, [W, 32] -> [W/4, 4, 32] (sublane split, free) -> needs the
    # (4, 32) to land in LANES: [W/4, 4*32] via sublane->lane merge, the
    # transposed direction of stage 1.
    def mirror_kernel(p_ref, o_ref):
        p = p_ref[...]                       # [5, W, 32]
        five, w, _ = p.shape
        parts = []
        for f in range(five):
            pf = p[f]                        # [W, 32]
            parts.append(pf.reshape(w // 4, 4 * 32))  # sublane->lane merge
        o_ref[...] = jnp.concatenate(parts, axis=1)   # [W/4, 640]

    W, H = 256, 256
    planes = jnp.asarray(np.random.default_rng(2)
                         .normal(size=(NF, W, H)).astype(np.float32))
    nb, cw = H // MB, W // RX
    try:
        got = pl.pallas_call(
            mirror_kernel,
            grid=(nb,),
            in_specs=[pl.BlockSpec((NF, W, MB), lambda b: (0, 0, b))],
            out_specs=pl.BlockSpec((cw, NF * RX * MB), lambda b: (b, 0)),
            out_shape=jax.ShapeDtypeStruct((nb * cw, NF * RX * MB),
                                           jnp.float32),
        )(planes)
        ref = mirror_table(planes)
        ok = np.array_equal(np.asarray(got), np.asarray(ref))
        print(f"stage2 mirror kernel vs mirror_table: "
              f"{'PASS' if ok else 'VALUE-FAIL'}", flush=True)
    except Exception as e:
        print(f"stage2 mirror kernel: LOWERING-FAIL {str(e)[:250]}",
              flush=True)
        return 0

    # ---- stage 3: timing at 1M shape ------------------------------------
    W, H = 1000, 1000
    Wp = 1000  # mirror_table pads H itself; W must be /4
    planes = jnp.asarray(np.random.default_rng(3)
                         .normal(size=(NF, Wp, 1024)).astype(np.float32))
    nb, cw = 1024 // MB, Wp // RX

    try:
        pk = pl.pallas_call(
            mirror_kernel,
            grid=(nb,),
            in_specs=[pl.BlockSpec((NF, Wp, MB), lambda b: (0, 0, b))],
            out_specs=pl.BlockSpec((cw, NF * RX * MB), lambda b: (b, 0)),
            out_shape=jax.ShapeDtypeStruct((nb * cw, NF * RX * MB),
                                           jnp.float32),
        )
        jf = jax.jit(pk)
        xf = jax.jit(mirror_table)
        for name, fn in (("pallas", jf), ("xla", xf)):
            out = jax.block_until_ready(fn(planes))
            t0 = time.time()
            for _ in range(20):
                out = fn(planes)
            jax.block_until_ready(out)
            print(f"stage3 {name} mirror @1M: "
                  f"{(time.time()-t0)/20*1e3:.3f} ms", flush=True)
        ok = np.array_equal(np.asarray(jf(planes)), np.asarray(xf(planes)))
        print(f"stage3 parity: {'PASS' if ok else 'FAIL'}", flush=True)
    except Exception as e:
        print(f"stage3 @1M (cw=250 sublane block): FAIL {str(e)[:250]}",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
