"""Pallas TPU kernel for the far-field BAND detection pass.

The band source of the far-field rebuild (ops/farfield.py::
raw_chunk_planes) tests every particle against ~100 half-plane index
offsets (chebyshev in [stencil+1, 2·chunk−1]) for "index-far but
space-near" pairs — the tear-front curls the reference's O(N²) loop
sees (compute.wgsl:144-170) but a near stencil misses.  As XLA code the
pass re-reads the padded position/deviation planes from HBM once per
shifted compare: ~100 offsets × 3 planes × ~4.7 MB ≈ 1.4 GB per
rebuild ≈ 1.45 ms at 1M (scripts/probe_r7.py, after DCE accounting —
the dominant slice of the 3.18 ms rebuild).  This kernel reads each
plane ONCE into VMEM per slab, materializes one lane rotation per
(plane, Δy) — the same pre-rotation trick as the fused substep kernel
(fused_substep2.py) — and evaluates all offsets from registers.

Bit-exactness: the per-offset test evaluates the identical f32
expression on identical operands — ``d2 = ddx·ddx + ddy·ddy`` and
``reach = (base + dev_i) + dev_j`` (the caller passes ``base + dev``
as a precomputed center plane, preserving the XLA loop's left-assoc
rounding) — so the emitted flag plane equals the XLA loop's
bit-for-bit (tests/test_band_detect.py).  Out-of-world cells are dead
(``alive=0``) in both implementations, so zero-filled rotation halos
and the XLA path's ±BIG pads gate identically.

The kernel covers the BAND only; the chunk AABB reductions (measured
0.22 ms — not worth a kernel) and everything downstream stay in XLA.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# input plane indices of the stacked [5, Wk+8, Hk] array
BPX, BPY, BDEV, BALV, BBDEV = range(5)


def _dys_of(offsets: Tuple[Tuple[int, int], ...]) -> Tuple[int, ...]:
    return tuple(sorted({dy for _dx, dy in offsets if dy}))


def _band_kernel(*refs, tw: int, hp: int,
                 offsets: Tuple[Tuple[int, int], ...]):
    in_ref, out_ref, iscr2, rotscr, sems = refs
    i = pl.program_id(0)
    n_slabs = pl.num_programs(0)
    islot = jax.lax.rem(i, 2)
    bw = tw + 8  # +8 sublane halo on the + side only (dx ∈ [0, 2c−1])

    def start_in(slot, slab):
        pltpu.make_async_copy(
            in_ref.at[:, pl.ds(slab * tw, bw), :],
            iscr2.at[slot], sems.at[slot],
        ).start()

    @pl.when(i == 0)
    def _():
        start_in(islot, i)

    @pl.when(i + 1 < n_slabs)
    def _():
        start_in(jax.lax.rem(i + 1, 2), i + 1)

    pltpu.make_async_copy(
        in_ref.at[:, pl.ds(i * tw, bw), :], iscr2.at[islot],
        sems.at[islot],
    ).wait()
    iscr = iscr2.at[islot]

    # one lane rotation per (plane, Δy); zero fill — out-of-range lanes
    # are out-of-world cells, dead (alive=0) in both implementations.
    # shifted(x, dy)[l] = x[l + dy] → roll by −dy.
    dys = _dys_of(offsets)
    rot_slots = {}
    lanes = jax.lax.broadcasted_iota(jnp.int32, (bw, hp), 1)
    for p in (BPX, BPY, BDEV, BALV):
        for dy in dys:
            sl = len(rot_slots)
            rot_slots[(p, dy)] = sl
            rolled = pltpu.roll(iscr[p], shift=(-dy) % hp, axis=1)
            # shifted[l] = x[l+dy]: dead below −dy (dy<0) / above
            # hp−dy (dy>0); the masked lanes also kill the mod-wrap
            # aliasing of the circular roll
            dead = lanes < -dy if dy < 0 else lanes >= hp - dy
            rotscr[sl] = jnp.where(dead, jnp.float32(0.0), rolled)

    def rd(p, dx, dy):
        src = iscr[p] if dy == 0 else rotscr[rot_slots[(p, dy)]]
        return src[dx : dx + tw, :]

    px_c = rd(BPX, 0, 0)
    py_c = rd(BPY, 0, 0)
    bdev_c = rd(BBDEV, 0, 0)   # base_reach + dev, precomputed (XLA assoc)
    alv_c = rd(BALV, 0, 0) > 0.0

    flag = jnp.zeros((tw, hp), jnp.bool_)
    for dx, dy in offsets:
        ddx = rd(BPX, dx, dy) - px_c
        ddy = rd(BPY, dx, dy) - py_c
        d2 = ddx * ddx + ddy * ddy
        reach = bdev_c + rd(BDEV, dx, dy)
        flag = flag | (
            alv_c & (rd(BALV, dx, dy) > 0.0) & (d2 < reach * reach)
        )
    out_ref[...] = jnp.where(flag, jnp.float32(1.0), jnp.float32(0.0))


def band_flag_call(px, py, dev, bdev, alive, *,
                   offsets: Tuple[Tuple[int, int], ...],
                   tw: int = 64, interpret: bool = False):
    """Band hit flags ``[W, H]`` (bool) for the half-plane ``offsets``.

    ``dev`` is the per-particle deviation allowance (zero where dead);
    ``bdev`` is the precomputed ``base_reach + dev`` center operand —
    passing it as a plane preserves the XLA loop's
    ``(base + dev_i) + dev_j`` left-association bit-for-bit."""
    w, h = px.shape
    wk = -(-w // tw) * tw
    hk = -(-h // 128) * 128

    def prep(x):
        return jnp.pad(x.astype(jnp.float32),
                       ((0, wk + 8 - w), (0, hk - h)))

    stacked = jnp.stack([prep(px), prep(py), prep(dev),
                         prep(alive.astype(jnp.float32)), prep(bdev)])
    kernel = functools.partial(_band_kernel, tw=tw, hp=hk,
                               offsets=tuple(offsets))
    n_rot = 4 * len(_dys_of(offsets))
    flag = pl.pallas_call(
        kernel,
        grid=(wk // tw,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((tw, hk), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((wk, hk), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 5, tw + 8, hk), jnp.float32),
            pltpu.VMEM((n_rot, tw + 8, hk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            # rotation scratch (~17 MB at 1M) + offset-chain temporaries
            # exceed the 16 MB default scoped-vmem limit; v5e has
            # 128 MiB (same override as fused_substep2)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(stacked)
    return flag[:w, :h] > 0.0
