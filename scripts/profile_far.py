"""Microbenchmark the far-field-armed fused path piece by piece at 1M.

Identifies where the ~10 ms/substep far overhead lives:
  A. hot fused substep (baseline)
  B. fused substep consuming constant far planes (kernel far-DMA cost)
  C. far_collision_terms end to end
  D. the chunk-major table relayout alone
  E. the one-hot scatter-accumulate alone
  F. rebuild_far_list

Run: python scripts/profile_far.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(label, fn, *args, n=20, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    # force a real readback once to make sure the pipeline is drained
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = jax.device_get(leaf.reshape(-1)[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args, **kw)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = jax.device_get(leaf.reshape(-1)[0])
    el = (time.time() - t0) / n * 1e3
    print(f"{label:55s} {el:8.3f} ms", flush=True)
    return el


def main():
    t0 = time.time()
    np.asarray(jax.block_until_ready(jnp.zeros(8)))
    print(f"warmup {time.time()-t0:.1f}s {jax.devices()}", flush=True)

    from softbody_tpu import PhysicsConstants, UserInput
    from softbody_tpu.models import tearing_cloth_lattice
    from softbody_tpu.ops.farfield import (
        FarFieldSpec, far_collision_terms, rebuild_far_list, crop_far_list,
        _chunk_dims,
    )
    from softbody_tpu.ops.pallas.fused_substep2 import (
        PX, PY, VX, VY, ALIVE,
        fused_frame2, fused_frame2_far, fused_substep2_call, pack_lattice2,
    )
    from softbody_tpu.ops.pallas.fused_substep import _consts_vector, padded_dims, PAD_H

    consts, uin = PhysicsConstants.default(), UserInput.none()
    lstate, spec, cfg, consts = tearing_cloth_lattice(
        n_particles=1_000_000, fall_speed=4.0)
    w, h = lstate.shape
    spacing = 980.0 / (w - 1)
    ff = FarFieldSpec(max_pairs=2048, max_tile_pairs=256, skin=0.5 * spacing)
    hot, obs, immut, ec = pack_lattice2(lstate, tile_w=64)
    wpad, hpad = padded_dims(spec.width, spec.height, 64)
    cvec = jnp.concatenate([_consts_vector(consts, uin, cfg, spec.height), ec])
    alive = immut[0] > 0.0
    kw = dict(w=wpad, h=hpad, stencil=spec.collision_stencil,
              quantized=cfg.force_mode == "quantized", tile_w=64)

    # run some frames so the sheet is crumpling and far pairs are real
    frames = jax.jit(lambda m, o: fused_frame2(m, o, immut, ec, consts, uin,
                                               spec, cfg, tile_w=64))
    print("advancing 12 frames to reach contact...", flush=True)
    for _ in range(12):
        hot, obs = frames(jnp.copy(hot), jnp.copy(obs))
    jax.block_until_ready(hot)

    pos = jnp.stack([hot[PX], hot[PY]], axis=-1)
    fl = rebuild_far_list(pos, alive, s=spec.collision_stencil, ff=ff,
                          radius=cfg.particle_radius)
    print(f"far pairs: {int(fl.n_pairs)}, overflow {int(fl.overflow)}",
          flush=True)

    ht = hpad + 2 * PAD_H
    fkw = dict(s=spec.collision_stencil, ff=ff, radius=cfg.particle_radius,
               dt=cfg.dt, ecoeff=(consts.elasticity + 1.0) * 0.5,
               friction=consts.friction, world_h=ht)

    far_terms = jax.jit(lambda px, py, vx, vy, f: jnp.stack(
        far_collision_terms(px, py, vx, vy, alive, f, **fkw)))
    far_planes = far_terms(hot[PX], hot[PY], hot[VX], hot[VY],
                           crop_far_list(fl, 512))

    # A. hot substep
    sub_hot = jax.jit(lambda m: fused_substep2_call(m, immut, cvec, **kw))
    timeit("A hot fused substep", sub_hot, hot)

    # B. substep with constant far planes
    sub_far = jax.jit(
        lambda m, f: fused_substep2_call(m, immut, cvec, far=f, **kw))
    timeit("B fused substep + const far planes", sub_far, hot, far_planes)

    # C. far_collision_terms at two capacities
    for kcap in (512, 2048):
        flk = crop_far_list(fl, kcap)
        e = timeit(f"C far_collision_terms k={kcap}", far_terms,
                   hot[PX], hot[PY], hot[VX], hot[VY], flk)

    # D. table relayout alone
    cwx, cwy, wp, hp = _chunk_dims(wpad + 2, ht, ff)
    c = ff.chunk
    cc = c * c

    @jax.jit
    def tbl_only(px, py, vx, vy):
        stack = jnp.stack([px, py, vx, vy, alive.astype(jnp.float32)])
        stack = jnp.pad(stack, ((0, 0), (0, wp - px.shape[0]),
                                (0, hp - px.shape[1])))
        return (stack.reshape(5, cwx, c, cwy, c)
                .transpose(1, 3, 0, 2, 4)
                .reshape(cwx * cwy, 5 * cc))
    timeit("D chunk-major table relayout (5 planes)", tbl_only,
           hot[PX], hot[PY], hot[VX], hot[VY])

    # E. one-hot scatter alone (k=512): contribution scatter to planes
    k = 512
    flk = crop_far_list(fl, k)
    ids = jnp.concatenate([flk.ca, flk.cb])
    contrib = jnp.ones((2 * k, 5 * cc), jnp.float32)

    @jax.jit
    def onehot_scatter(contrib, ids):
        exs = (ids // cwy).astype(jnp.int32)
        eys = (ids % cwy).astype(jnp.int32)
        xs_iota = jnp.arange(cwx, dtype=jnp.int32)
        ys_iota = jnp.arange(cwy, dtype=jnp.int32)
        blk = min(2 * k, 512)
        out_flat = jnp.zeros((cwx, cwy * 5 * cc), jnp.float32)
        for b0 in range(0, 2 * k, blk):
            ex = exs[b0:b0 + blk]
            ey = eys[b0:b0 + blk]
            cb_ = contrib[b0:b0 + blk]
            bl = ex.shape[0]
            ohx = (xs_iota[:, None] == ex[None, :]).astype(jnp.float32)
            ohy = (ey[:, None] == ys_iota[None, :]).astype(jnp.float32)
            d = (ohy[:, :, None] * cb_[:, None, :]).reshape(bl, cwy * 5 * cc)
            out_flat = out_flat + jnp.dot(ohx, d,
                                          preferred_element_type=jnp.float32)
        return out_flat
    timeit("E one-hot scatter to chunk-flat (k=512)", onehot_scatter,
           contrib, ids)

    # E2. XLA scatter-add alternative
    @jax.jit
    def xla_scatter(contrib, ids):
        out = jnp.zeros((cwx * cwy, 5 * cc), jnp.float32)
        return out.at[ids].add(contrib)
    timeit("E2 XLA row scatter-add (2k rows)", xla_scatter, contrib, ids)

    # E3. output transpose chunk-flat -> planes
    flat = jnp.ones((cwx, cwy * 5 * cc), jnp.float32)

    @jax.jit
    def out_transpose(out_flat):
        return (out_flat.reshape(cwx, cwy, 5, c, c)
                .transpose(2, 0, 3, 1, 4)
                .reshape(5, wp, hp)[:, :wpad + 2, :ht])
    timeit("E3 output transpose to planes", out_transpose, flat)

    # F. rebuild
    reb = jax.jit(lambda p: rebuild_far_list(
        p, alive, s=spec.collision_stencil, ff=ff, radius=cfg.particle_radius))
    timeit("F rebuild_far_list", reb, pos, n=5)

    # G. full far frame (64 substeps) for reference
    far_frame = jax.jit(lambda m, o, f: fused_frame2_far(
        m, o, immut, ec, f, consts, uin, spec, cfg, ff, tile_w=64))
    e = timeit("G fused_frame2_far (64 substeps, k=2048)", far_frame,
               jnp.copy(hot), jnp.copy(obs), fl, n=3)
    print(f"   -> {e / cfg.subticks:.3f} ms/substep", flush=True)


if __name__ == "__main__":
    main()
