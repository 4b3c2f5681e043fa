"""Measure the primitives for the v4 chunk-slot far-field design and the
TRUE chunk-pair demand of the bench scene (r3).

Sections:
  P  primitives: chunkify transpose, row gather/scatter-add throughput
     vs index count / row width / sortedness, sorts
  R  v4 apply prototype end-to-end: chunkify -> 2 row gathers ->
     dense 16x16 pair math -> slot reduce -> row scatter-add
  Q  bench-scene frames at K=8192 via the backend; per frame a huge-K
     rebuild (no truncation) reports true demand + per-chunk partner
     histogram (sizes the slot count D)
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(m):
    print(m, file=sys.stderr, flush=True)


def timeit(label, fn, n=20):
    out = fn()
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    log(f"{label:52s} {(time.time() - t0) / n * 1e3:9.3f} ms")
    return out


def main():
    t0 = time.time()
    np.asarray(jax.block_until_ready(jnp.zeros(8)))
    log(f"warmup {time.time() - t0:.1f}s devices={jax.devices()}")

    rng = np.random.default_rng(0)
    C = 65536            # chunks at 1M, chunk=4 (4x4=16 particles)

    # ---- P: primitives ------------------------------------------------
    planes = jnp.asarray(rng.standard_normal((5, 1024, 1024)),
                         jnp.float32)

    @jax.jit
    def chunkify(p):
        # [5, W, H] -> [C, 16*5]
        z = p.reshape(5, 256, 4, 256, 4).transpose(1, 3, 2, 4, 0)
        return z.reshape(C, 16 * 5)

    @jax.jit
    def unchunkify(z):
        p = z.reshape(256, 256, 4, 4, 5).transpose(4, 0, 2, 1, 3)
        return p.reshape(5, 1024, 1024)

    z0 = timeit("P chunkify [5,1024,1024]->[65536,80]", lambda: chunkify(planes))
    timeit("P unchunkify", lambda: unchunkify(z0))

    for width in (16, 64, 80, 128):
        Z = jnp.asarray(rng.standard_normal((C, width)), jnp.float32)
        for k in (8192, 32768, 65536):
            idx = jnp.asarray(rng.integers(0, C, k), jnp.int32)
            f = jax.jit(lambda zz, ii: jnp.take(zz, ii, axis=0))
            timeit(f"P take rows w={width} k={k}", lambda: f(Z, idx))

    Z = jnp.asarray(rng.standard_normal((C, 32)), jnp.float32)
    for k in (8192, 32768):
        for sorted_ in (False, True):
            ii = rng.integers(0, C, k)
            if sorted_:
                ii = np.sort(ii)
            idx = jnp.asarray(ii, jnp.int32)
            vals = jnp.asarray(rng.standard_normal((k, 32)), jnp.float32)
            f = jax.jit(lambda ii_, vv: jnp.zeros((C, 32), jnp.float32)
                        .at[ii_].add(vv))
            timeit(f"P scatter-add rows w=32 k={k} sorted={sorted_}",
                   lambda: f(idx, vals))

    # unique-index scatter (slot-table layout: one row per active chunk)
    iu = np.sort(rng.choice(C, 32768, replace=False))
    idx = jnp.asarray(iu, jnp.int32)
    vals = jnp.asarray(rng.standard_normal((32768, 32)), jnp.float32)
    f = jax.jit(lambda ii_, vv: jnp.zeros((C, 32), jnp.float32)
                .at[ii_].set(vv))
    timeit("P scatter-SET rows w=32 k=32768 unique-sorted",
           lambda: f(idx, vals))

    for n in (65536, 65536 * 8):
        keys = jnp.asarray(rng.integers(0, 1 << 30, n), jnp.int32)
        f = jax.jit(lambda kk: jnp.sort(kk))
        timeit(f"P sort int32 n={n}", lambda: f(keys))

    # top-D slot insertion over a dense annulus sweep (rebuild core):
    # 108 offsets x [256,256] chunk grid, D=8 insertion
    D = 8
    amin = jnp.asarray(rng.standard_normal((4, 256, 256)), jnp.float32)

    @jax.jit
    def slot_sweep(a):
        mnx, mxx, mny, mxy = a
        slots = [jnp.full((256, 256), -1, jnp.int32) for _ in range(D)]
        cnt = jnp.zeros((256, 256), jnp.int32)
        for (dx, dy) in [(x, y) for x in range(0, 8)
                         for y in range(-7, 8)
                         if (x > 0 or y > 0) and max(abs(x), abs(y)) >= 2][:54]:
            pmnx = jnp.roll(mnx, (-dx, -dy), (0, 1))
            pmxx = jnp.roll(mxx, (-dx, -dy), (0, 1))
            pmny = jnp.roll(mny, (-dx, -dy), (0, 1))
            pmxy = jnp.roll(mxy, (-dx, -dy), (0, 1))
            hit = ((mnx <= pmxx) & (pmnx <= mxx)
                   & (mny <= pmxy) & (pmny <= mxy))
            pid = jnp.int32(dx * 256 + dy)
            ins = hit
            for d in range(D):
                put = ins & (slots[d] < 0)
                slots[d] = jnp.where(put, pid, slots[d])
                ins = ins & ~put
            cnt = cnt + hit.astype(jnp.int32)
        return slots[0], cnt
    timeit("P slot-sweep 54 offsets D=8 [256,256]", lambda: slot_sweep(amin))

    # ---- R: v4 apply prototype ---------------------------------------
    for K in (8192, 32768):
        ca = jnp.asarray(np.sort(rng.integers(0, C, K)), jnp.int32)
        cb = jnp.asarray(rng.integers(0, C, K), jnp.int32)

        @jax.jit
        def v4_apply(p, ca_, cb_):
            z = chunkify(p)                      # [C, 80]
            ga = jnp.take(z, ca_, axis=0).reshape(K, 16, 5)
            gb = jnp.take(z, cb_, axis=0).reshape(K, 16, 5)
            dx = ga[:, :, None, 0] - gb[:, None, :, 0]
            dy = ga[:, :, None, 1] - gb[:, None, :, 1]
            d2 = dx * dx + dy * dy
            ok = (d2 < 1.0) & (ga[:, :, None, 4] > 0) & (gb[:, None, :, 4] > 0)
            inv = jax.lax.rsqrt(jnp.maximum(d2, 1e-12))
            dvx = ga[:, :, None, 2] - gb[:, None, :, 2]
            dvy = ga[:, :, None, 3] - gb[:, None, :, 3]
            j = jnp.where(ok, (dvx * dx + dvy * dy) * inv, 0.0)
            ix = jnp.sum(j * dx * inv, axis=2)   # [K, 16]
            iy = jnp.sum(j * dy * inv, axis=2)
            imp = jnp.concatenate([ix, iy], axis=1)          # [K, 32]
            out = jnp.zeros((C, 32), jnp.float32).at[ca_].add(imp)
            # back to planes
            q = out.reshape(256, 256, 4, 4, 2).transpose(4, 0, 2, 1, 3)
            return q.reshape(2, 1024, 1024)
        timeit(f"R v4 apply proto K={K} (chunkify+2gather+math+scatter)",
               lambda: v4_apply(planes, ca, cb))

    # ---- Q: true demand on the bench scene ---------------------------
    from softbody_tpu import PhysicsConstants, UserInput
    from softbody_tpu.models import tearing_cloth_lattice
    from softbody_tpu.ops.farfield import (
        FarFieldSpec, rebuild_far_list_planes,
    )
    from softbody_tpu.ops.pallas.fused_substep2 import (
        PX, PY, VX, VY, ALIVE,
    )
    from softbody_tpu.engine.backends import FusedLatticeBackend

    lstate, spec, cfg, consts = tearing_cloth_lattice(
        n_particles=1_000_000, fall_speed=2.5, slits=7,
        strain_limit=0.22, yield_strain=0.18,
    )
    uin = UserInput.none()
    w, h = lstate.shape
    spacing = 980.0 / (w - 1)
    nsub = cfg.subticks

    ffq = FarFieldSpec(max_pairs=8192, max_tile_pairs=256,
                       skin=0.5 * spacing, horizon=16)
    ff_huge_pos = FarFieldSpec(max_pairs=262144, max_tile_pairs=256,
                               skin=0.5 * spacing, horizon=16)
    backend = FusedLatticeBackend(spec, cfg, farfield=ffq, tile_w=64)
    state = backend.pack_state(lstate)
    immut = backend._immut
    alive = immut[ALIVE] > 0.0

    def huge_rebuild(m, extruded):
        kw = dict(vx=m[VX], vy=m[VY], dt=cfg.dt) if extruded else {}
        return rebuild_far_list_planes(
            m[PX], m[PY], alive, s=spec.collision_stencil,
            ff=ff_huge_pos, radius=cfg.particle_radius, **kw)
    jit_huge_pos = jax.jit(lambda m: huge_rebuild(m, False))
    jit_huge_ext = jax.jit(lambda m: huge_rebuild(m, True))

    t0 = time.time()
    state = backend.step(state, consts, uin)
    jax.block_until_ready(state[0])
    log(f"Q compile+first frame {time.time() - t0:.1f}s")
    for f in range(12):
        t0 = time.time()
        state = backend.step(state, consts, uin)
        _ = jax.device_get(state[0][0, 8, 128])
        dt_f = time.time() - t0
        hot = state[0]
        row = dict(frame=f + 1, s=round(nsub / dt_f, 1))
        for name, fn in (("pos", jit_huge_pos), ("ext", jit_huge_ext)):
            fl = fn(hot)
            npair, over, cav, cbv, vv = jax.device_get(
                (fl.n_pairs, fl.overflow, fl.ca, fl.cb, fl.valid))
            cav, cbv = cav[vv], cbv[vv]
            sides = np.concatenate([cav, cbv])
            cnt = np.bincount(sides, minlength=1)
            act = int((cnt > 0).sum())
            row[name] = dict(
                pairs=int(npair), over=int(over), active_chunks=act,
                partners_max=int(cnt.max(initial=0)),
                partners_p99=float(np.percentile(cnt[cnt > 0], 99))
                if act else 0.0,
                partners_mean=float(cnt[cnt > 0].mean()) if act else 0.0,
            )
        log(json.dumps(row))
    finite = bool(np.isfinite(
        np.asarray(jax.device_get(state[0][:2]))).all())
    log(f"Q finite={finite}")


if __name__ == "__main__":
    main()
