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
plane ONCE into VMEM per slab and evaluates all offsets from registers.

Two structural choices (v2 of this kernel; the first version rotated
4 planes × 14 Δy values = 56 lane rotations per slab, which dominated
its ~1.0 ms cost):

1. **Transposed layout** — the kernel runs on ``[H, W]`` planes, so
   the 15-value Δy offset direction becomes SUBLANE slicing (free) and
   only the 8-value Δx direction needs lane rotations: 7 rotations ×
   3 planes = 21, a ~60% cut of the rotation traffic.  The input
   transpose happens once in XLA (~40 MB per rebuild, ~0.05 ms).
2. **BIG-encoded liveness** — dead cells carry ``px = 3e8`` (the same
   ±BIG idea as the XLA loop's pads), which makes ``d2`` astronomically
   larger than any physical ``reach²`` — no alive plane is read or
   rotated at all, and the center mask is one compare
   (``px < 1e8``).  Contract: flags equal the XLA loop's exactly while
   ``reach < ~1e8`` (true for any physical velocity scale; beyond it —
   e.g. corrupt-state velocities — the kernel errs CONSERVATIVE, which
   only adds candidate pairs and never changes physics: the apply
   re-masks by real liveness).

Bit-exactness: the per-offset test evaluates the identical f32
expression on identical operands — ``d2 = ddx·ddx + ddy·ddy`` and
``reach = (base + dev_i) + dev_j`` (the caller passes ``base + dev``
as a precomputed center plane, preserving the XLA loop's left-assoc
rounding) — so the emitted flag plane equals the XLA loop's
bit-for-bit (tests/test_band_detect.py, incl. a cross-slab case).

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

# input plane indices of the transposed [4, Hk+16, Wk] array
TPX, TPY, TDEV, TBDEV = range(4)

_BIGP = 3.0e8    # dead-cell position encoding
_BIGCUT = 1.0e8  # alive ⟺ px < _BIGCUT


def _dxs_of(offsets: Tuple[Tuple[int, int], ...]) -> Tuple[int, ...]:
    return tuple(sorted({dx for dx, _dy in offsets if dx}))


def _band_kernel(*refs, tw: int, wl: int,
                 offsets: Tuple[Tuple[int, int], ...]):
    in_ref, out_ref, iscr2, rotscr, sems = refs
    i = pl.program_id(0)
    n_slabs = pl.num_programs(0)
    islot = jax.lax.rem(i, 2)
    bw = tw + 16  # ±8 sublane halo (Δy ∈ [−(2c−1), 2c−1])

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

    # one lane rotation per (plane, Δx≠0); px fills with BIG (an
    # out-of-world partner must read DEAD — a zero fill would be a
    # phantom particle at x=0), py/dev fill is irrelevant once px is
    # BIG.  The fill also kills the circular roll's mod-wrap aliasing.
    dxs = _dxs_of(offsets)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (bw, wl), 1)
    rot_slots = {}
    for p in (TPX, TPY, TDEV):
        for dx in dxs:
            sl = len(rot_slots)
            rot_slots[(p, dx)] = sl
            rolled = pltpu.roll(iscr[p], shift=(-dx) % wl, axis=1)
            dead = lanes >= wl - dx
            fill = jnp.float32(_BIGP if p == TPX else 0.0)
            rotscr[sl] = jnp.where(dead, fill, rolled)

    def rd(p, dx, dy):
        """Partner read at offset (dx, dy): Δx via the rotated copies
        (lane-aligned), Δy via sublane slicing inside the ±8 halo."""
        src = iscr[p] if dx == 0 else rotscr[rot_slots[(p, dx)]]
        return src[8 + dy : 8 + dy + tw, :]

    px_c = rd(TPX, 0, 0)
    py_c = rd(TPY, 0, 0)
    bdev_c = rd(TBDEV, 0, 0)   # base_reach + dev, precomputed (XLA assoc)
    alv_c = px_c < _BIGCUT

    hit = jnp.zeros((tw, wl), jnp.bool_)
    for dx, dy in offsets:
        ddx = rd(TPX, dx, dy) - px_c
        ddy = rd(TPY, dx, dy) - py_c
        d2 = ddx * ddx + ddy * ddy
        reach = bdev_c + rd(TDEV, dx, dy)
        hit = hit | (d2 < reach * reach)
    flag = alv_c & hit
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
    # transposed geometry: sublanes = H (Δy, sliced), lanes = W (Δx,
    # rotated); Δx ∈ [0, 2c−1] half-plane, Δy ∈ [−(2c−1), 2c−1]
    hk = -(-h // tw) * tw
    wl = -(-w // 128) * 128
    pxe = jnp.where(alive, px, jnp.float32(_BIGP))

    def prep(x, fill=0.0):
        return jnp.pad(x.astype(jnp.float32).T,
                       ((8, 8 + hk - h), (0, wl - w)),
                       constant_values=fill)

    stacked = jnp.stack([prep(pxe, _BIGP), prep(py), prep(dev),
                         prep(bdev)])
    kernel = functools.partial(_band_kernel, tw=tw, wl=wl,
                               offsets=tuple(offsets))
    n_rot = 3 * len(_dxs_of(offsets))
    flag_t = pl.pallas_call(
        kernel,
        grid=(hk // tw,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((tw, wl), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hk, wl), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 4, tw + 16, wl), jnp.float32),
            pltpu.VMEM((n_rot, tw + 16, wl), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            # rotation scratch + offset-chain temporaries exceed the
            # 16 MB default scoped-vmem limit at 1M; v5e has 128 MiB
            # (same override as fused_substep2)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(stacked)
    return flag_t[:h, :w].T > 0.0
