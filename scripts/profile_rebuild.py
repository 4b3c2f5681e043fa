"""Bisect rebuild_far_list cost at 1M: detection stages and compaction
primitives.  All timings subtract nothing — compare labels to the T0
dispatch overhead line (~2 ms through the axon transport).

Run: python scripts/profile_rebuild.py
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


def timeit(label, fn, *args, n=10, **kw):
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
    print(f"{label:56s} {el:9.3f} ms", flush=True)
    return el


def main():
    t0 = time.time()
    np.asarray(jax.block_until_ready(jnp.zeros(8)))
    print(f"warmup {time.time()-t0:.1f}s {jax.devices()}", flush=True)

    from softbody_tpu import PhysicsConstants, UserInput
    from softbody_tpu.models import tearing_cloth_lattice
    from softbody_tpu.ops import farfield as FF
    from softbody_tpu.ops.farfield import FarFieldSpec, _chunk_dims
    from softbody_tpu.ops.pallas.fused_substep2 import (
        PX, PY, fused_frame2, pack_lattice2,
    )

    consts, uin = PhysicsConstants.default(), UserInput.none()
    lstate, spec, cfg, consts = tearing_cloth_lattice(
        n_particles=1_000_000, fall_speed=4.0)
    w, h = lstate.shape
    spacing = 980.0 / (w - 1)
    ff = FarFieldSpec(max_pairs=2048, max_tile_pairs=256, skin=0.5 * spacing)
    hot, obs, immut, ec = pack_lattice2(lstate, tile_w=64)
    alive = immut[0] > 0.0

    frames = jax.jit(lambda m, o: fused_frame2(m, o, immut, ec, consts, uin,
                                               spec, cfg, tile_w=64))
    print("advancing 12 frames...", flush=True)
    for _ in range(12):
        hot, obs = frames(jnp.copy(hot), jnp.copy(obs))
    jax.block_until_ready(hot)
    pos = jnp.stack([hot[PX], hot[PY]], axis=-1)

    s = spec.collision_stencil
    radius = cfg.particle_radius
    pw, ph = hot.shape[1], hot.shape[2]
    cwx, cwy, wp, hp = _chunk_dims(pw, ph, ff)
    c = ff.chunk
    tc = ff.tile_chunks

    triv = jax.jit(lambda x: x + 1.0)
    timeit("T0 dispatch overhead", triv, jnp.zeros(8), n=30)

    # ---- detection stages ----
    reach = 2.0 * radius + ff.skin
    m = jnp.float32(radius + 0.5 * ff.skin)
    _BIG = jnp.float32(3.0e38)

    def aabbs(pos, alive):
        px = FF._pad_plane(pos[..., 0], wp, hp, 0.0)
        py = FF._pad_plane(pos[..., 1], wp, hp, 0.0)
        alv = FF._pad_plane(alive, wp, hp, False)

        def creduce(plane, op, fill):
            v = jnp.where(alv, plane, fill)
            return op(v.reshape(cwx, c, cwy, c), axis=(1, 3))

        cminx = creduce(px, jnp.min, _BIG)
        cmaxx = creduce(px, jnp.max, -_BIG)
        cminy = creduce(py, jnp.min, _BIG)
        cmaxy = creduce(py, jnp.max, -_BIG)
        cany = jnp.any(alv.reshape(cwx, c, cwy, c), axis=(1, 3))
        return px, py, alv, cminx, cmaxx, cminy, cmaxy, cany

    timeit("D1 pad + chunk AABB reductions", jax.jit(aabbs), pos, alive)

    @jax.jit
    def band_only(pos, alive):
        px, py, alv, *_ = aabbs(pos, alive)
        reach2 = jnp.float32(reach * reach)
        br = 2 * c - 1
        px_b = jnp.pad(px, ((0, br), (br, br)), constant_values=_BIG)
        py_b = jnp.pad(py, ((0, br), (br, br)), constant_values=_BIG)
        alv_b = jnp.pad(alv, ((0, br), (br, br)), constant_values=False)

        def shifted(plane_b, dx, dy):
            return plane_b[dx:dx + wp, br + dy:br + dy + hp]

        flag = jnp.zeros((wp, hp), bool)
        for dx, dy in ff.band_half_offsets(s):
            d2 = (shifted(px_b, dx, dy) - px) ** 2 + (
                shifted(py_b, dx, dy) - py) ** 2
            flag = flag | (alv & shifted(alv_b, dx, dy) & (d2 < reach2))
        return jnp.any(flag.reshape(cwx, c, cwy, c), axis=(1, 3))
    timeit("D2 AABB + particle band stencil", band_only, pos, alive)

    @jax.jit
    def ann_only(pos, alive):
        _, _, _, cminx, cmaxx, cminy, cmaxy, cany = aabbs(pos, alive)
        ar = 2 * tc - 1
        mb = lambda a, fill: jnp.pad(a, ((0, ar), (ar, ar)),
                                     constant_values=fill)
        cminx_b, cmaxx_b = mb(cminx, _BIG), mb(cmaxx, -_BIG)
        cminy_b, cmaxy_b = mb(cminy, _BIG), mb(cmaxy, -_BIG)
        cany_b = mb(cany, False)

        def csh(p, dx, dy):
            return p[dx:dx + cwx, ar + dy:ar + dy + cwy]

        acc = jnp.zeros((cwx, cwy), jnp.int32)
        for dx, dy in ff.annulus_half_offsets():
            ovl = (cany & csh(cany_b, dx, dy)
                   & (cminx - m <= csh(cmaxx_b, dx, dy) + m)
                   & (csh(cminx_b, dx, dy) - m <= cmaxx + m)
                   & (cminy - m <= csh(cmaxy_b, dx, dy) + m)
                   & (csh(cminy_b, dx, dy) - m <= cmaxy + m))
            acc = acc + ovl.astype(jnp.int32)
        return acc
    timeit("D3 AABB + annulus stack (479 offsets)", ann_only, pos, alive)

    cnt = jax.jit(functools.partial(FF.far_candidate_count, s=s, ff=ff,
                                    radius=radius))
    timeit("D4 far_candidate_count (full detection)", cnt, pos, alive)

    reb = jax.jit(functools.partial(FF.rebuild_far_list, s=s, ff=ff,
                                    radius=radius))
    timeit("D5 rebuild_far_list (det + compaction)", reb, pos, alive)

    # ---- compaction primitives on a 1M bool vector, K=2048 ----
    rng = np.random.default_rng(0)
    n = 1_100_000
    K = 2048
    flags = np.zeros(n, bool)
    flags[rng.choice(n, 1500, replace=False)] = True
    fl = jnp.asarray(flags)

    @jax.jit
    def p_nonzero(fl):
        return jnp.nonzero(fl, size=K, fill_value=0)[0]
    timeit("P1 jnp.nonzero(size=2048) on 1.1M", p_nonzero, fl)

    @jax.jit
    def p_topk(fl):
        keys = jnp.where(fl, n - jnp.arange(n, dtype=jnp.int32),
                         jnp.int32(0))
        v, i = jax.lax.top_k(keys, K)
        return i
    timeit("P2 lax.top_k(2048) on 1.1M", p_topk, fl)

    @jax.jit
    def p_argsort(fl):
        keys = jnp.where(fl, jnp.arange(n, dtype=jnp.int32),
                         jnp.int32(n))
        return jnp.sort(keys)[:K]
    timeit("P3 full sort take-2048 on 1.1M", p_argsort, fl)

    # 2-stage: row-any reduce [1072 rows x 1024] then nonzero rows,
    # gather rows, nonzero strip
    fl2 = jnp.asarray(flags[: 1072 * 1024].reshape(1072, 1024))

    @jax.jit
    def p_twostage(fl2):
        rows = jnp.any(fl2, axis=1)
        r = jnp.nonzero(rows, size=64, fill_value=0)[0]
        strip = fl2[r]  # [64, 1024]
        e_r, e_c = jnp.nonzero(strip, size=K, fill_value=0)
        return r[e_r] * 1024 + e_c
    timeit("P4 two-stage row-reduce nonzero", p_twostage, fl2)

    # ---- the stack row gather used by compact_offset_stack ----
    stack = jnp.asarray(rng.random((479, cwx, cwy)) < 0.001)
    hx = jnp.asarray(rng.integers(0, cwx, 2048), jnp.int32)
    hy = jnp.asarray(rng.integers(0, cwy, 2048), jnp.int32)

    @jax.jit
    def p_stackgather(stack, hx, hy):
        return stack[:, hx, hy].T
    timeit("P5 stack[:, hx, hy] gather [479 x 2048]", p_stackgather,
           stack, hx, hy)

    @jax.jit
    def p_stackgather2(stack, hx, hy):
        flats = stack.reshape(479, cwx * cwy)
        return flats[:, hx * cwy + hy].T
    timeit("P6 same via flat index", p_stackgather2, stack, hx, hy)


if __name__ == "__main__":
    main()
