"""Pallas TPU kernel: fused dense collision stencil.

The XLA version of the lattice collision pass (ops/stencil.py
``_stencil_collisions``) materializes shifted copies of the particle
planes for each neighbor offset — ~12 full-plane HBM passes per substep.
This kernel streams each input plane once: the grid tiles the [W, H]
world, each tile DMAs a halo block (tile + stencil ring) of the six
input planes HBM→VMEM, then computes *all* neighbor offsets out of VMEM
and writes the five output planes.  Memory traffic drops to ~1 read +
1 write pass; the kernel is VPU-compute-bound.

Unlike the XLA path there is no half-plane trick (a pair straddling a
tile boundary could not scatter its mirrored half into the neighboring
tile), so every particle evaluates its full offset set — 2× the pair
math, but all from on-chip memory.

Pair math is the exact reference collision semantics
(compute.wgsl:150-168): elastic normal impulse with (elasticity+1)/2,
clamped tangential friction (WGSL clamp = min(max(x, lo), hi) even for
inverted bounds), penetration through acceleration ``clip/dt²``, and the
coincident-particle nudge ``sign(lin_i − lin_j)``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Halo sizes: one (sublane, lane) native tile — keeps every DMA window
# (8, 128)-aligned, the Mosaic requirement for VMEM memref slices.
HALO_W = 8
HALO_H = 128


def _kernel(
    consts_ref,  # SMEM [6]: radius, dt, ecoeff, friction, W, H
    px_ref, py_ref, vx_ref, vy_ref, al_ref, lin_ref,  # HBM planes (padded)
    dvx_ref, dvy_ref, dax_ref, day_ref, dyn_ref,  # VMEM out tiles
    scratch, sems,
    *, tile_w: int, tile_h: int, stencil: int, offsets: Tuple[Tuple[int, int], ...],
):
    s = stencil
    i = pl.program_id(0)
    j = pl.program_id(1)
    bw, bh = tile_w + 2 * HALO_W, tile_h + 2 * HALO_H

    # halo-block DMA of the six planes into VMEM scratch
    copies = []
    for k, ref in enumerate((px_ref, py_ref, vx_ref, vy_ref, al_ref, lin_ref)):
        c = pltpu.make_async_copy(
            ref.at[pl.ds(i * tile_w, bw), pl.ds(j * tile_h, bh)],
            scratch.at[k],
            sems.at[k],
        )
        c.start()
        copies.append(c)
    for c in copies:
        c.wait()

    radius = consts_ref[0]
    dt = consts_ref[1]
    ecoeff = consts_ref[2]
    friction = consts_ref[3]

    ctr = (slice(HALO_W, HALO_W + tile_w), slice(HALO_H, HALO_H + tile_h))
    c_px = scratch[0][ctr]
    c_py = scratch[1][ctr]
    c_vx = scratch[2][ctr]
    c_vy = scratch[3][ctr]
    c_al = scratch[4][ctr]
    c_lin = scratch[5][ctr]

    dvx = jnp.zeros((tile_w, tile_h), jnp.float32)
    dvy = jnp.zeros((tile_w, tile_h), jnp.float32)
    dax = jnp.zeros((tile_w, tile_h), jnp.float32)
    day = jnp.zeros((tile_w, tile_h), jnp.float32)
    dyn = jnp.zeros((tile_w, tile_h), jnp.float32)

    two_r = 2.0 * radius
    inv_dt2 = 1.0 / (dt * dt)

    for dx, dy in offsets:
        off = (
            slice(HALO_W + dx, HALO_W + dx + tile_w),
            slice(HALO_H + dy, HALO_H + dy + tile_h),
        )
        o_px = scratch[0][off]
        o_py = scratch[1][off]
        o_vx = scratch[2][off]
        o_vy = scratch[3][off]
        o_al = scratch[4][off]
        o_lin = scratch[5][off]

        valid = (c_al * o_al) > 0.0
        ddx = o_px - c_px
        ddy = o_py - c_py
        dist2 = ddx * ddx + ddy * ddy
        dist = jnp.sqrt(dist2)
        coincident = valid & (dist == 0.0)
        overlap = valid & (dist > 0.0) & (dist < two_r)

        dyn = dyn + jnp.where(coincident, jnp.sign(c_lin - o_lin), 0.0)

        inv = jnp.where(overlap, 1.0 / jnp.where(overlap, dist, 1.0), 0.0)
        nx_ = ddx * inv
        ny_ = ddy * inv
        rvx = c_vx - o_vx
        rvy = c_vy - o_vy
        imp_n = ecoeff * (rvx * nx_ + rvy * ny_)
        max_fric = imp_n * friction
        imp_t = jnp.minimum(
            jnp.maximum(rvx * -ny_ + rvy * nx_, -max_fric), max_fric
        )
        ovf = jnp.where(overlap, 1.0, 0.0)
        dvx = dvx - (imp_n * nx_ + imp_t * -ny_) * ovf
        dvy = dvy - (imp_n * ny_ + imp_t * nx_) * ovf
        clip = (two_r - dist) * 0.5 * inv_dt2
        dax = dax - nx_ * clip * ovf
        day = day - ny_ * clip * ovf

    dvx_ref[:] = dvx
    dvy_ref[:] = dvy
    dax_ref[:] = dax
    day_ref[:] = day
    dyn_ref[:] = dyn


@functools.partial(
    jax.jit,
    static_argnames=("w", "h", "stencil", "tile_w", "tile_h", "interpret"),
)
def stencil_collisions_pallas(
    px: jax.Array,  # [W, H] component planes (unpadded)
    py: jax.Array,
    vx: jax.Array,
    vy: jax.Array,
    alive: jax.Array,  # bool [W, H]
    radius,
    dt,
    ecoeff,
    friction,
    *,
    w: int,
    h: int,
    stencil: int,
    tile_w: int = 128,
    tile_h: int = 256,
    interpret: bool = False,
):
    """Returns (dvx, dvy, dax, day, dyn) [W, H] f32."""
    s = stencil
    if s > HALO_W:
        raise ValueError(f"stencil {s} exceeds halo {HALO_W}")
    if not interpret and (tile_w % 8 or tile_h % 128):
        raise ValueError(
            f"tile ({tile_w},{tile_h}) must be (8,128)-aligned on TPU"
        )
    gw = -(-w // tile_w)
    gh = -(-h // tile_h)
    pw, ph = gw * tile_w, gh * tile_h

    def pad_plane(arr, fill=0.0):
        return jnp.pad(
            arr.astype(jnp.float32),
            ((HALO_W, pw - w + HALO_W), (HALO_H, ph - h + HALO_H)),
            constant_values=fill,
        )

    lin = (
        jnp.arange(w, dtype=jnp.float32)[:, None] * h
        + jnp.arange(h, dtype=jnp.float32)[None, :]
    )
    planes = (
        pad_plane(px),
        pad_plane(py),
        pad_plane(vx),
        pad_plane(vy),
        pad_plane(alive.astype(jnp.float32)),
        pad_plane(lin),
    )
    consts = jnp.asarray(
        [radius, dt, ecoeff, friction, w, h], jnp.float32
    )

    offsets = tuple(
        (dx, dy)
        for dx in range(-s, s + 1)
        for dy in range(-s, s + 1)
        if (dx, dy) != (0, 0)
    )
    bw, bh = tile_w + 2 * HALO_W, tile_h + 2 * HALO_H

    kernel = functools.partial(
        _kernel, tile_w=tile_w, tile_h=tile_h, stencil=s, offsets=offsets
    )
    out_shape = [jax.ShapeDtypeStruct((pw, ph), jnp.float32)] * 5
    out_spec = pl.BlockSpec(
        # index_map also receives the scalar-prefetch ref (unused)
        (tile_w, tile_h), lambda i, j, _c: (i, j), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(gw, gh),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 6,
        out_specs=[out_spec] * 5,
        scratch_shapes=[
            pltpu.VMEM((6, bw, bh), jnp.float32),
            pltpu.SemaphoreType.DMA((6,)),
        ],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        # the unrolled offset loop keeps several tile-sized temporaries
        # live; allow Mosaic to use more of the 128 MiB physical VMEM
        # than its conservative 16 MiB scoped default
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(consts, *planes)
    return tuple(o[:w, :h] for o in outs)
