"""Far-field self-collision for the dense lattice path.

The lattice stencil (ops/stencil.py) applies the reference pair math
(compute.wgsl:144-170) only between index-space neighbors within
Chebyshev radius ``s``.  When cloth folds or torn pieces fly, regions
that are *index-distant* come into *spatial* contact — pairs the
reference's O(N²) loop handles but the stencil misses.  This module
supplies those pairs with TPU-native machinery: no sort, no spatial
hash — dense reductions, a Verlet-style candidate list rebuilt
occasionally, and fixed-capacity gathers in the per-substep hot path.

Decomposition (complete and double-count-free).  Index space is split
into ``chunk × chunk`` blocks (default 4×4) and tiles of
``tile_chunks × tile_chunks`` chunks (default 8×8 chunks = 32×32
particles).  Every particle pair with index-Chebyshev distance > s falls
in exactly one bucket by *chunk*-Chebyshev distance:

1. **band** (chunk-chebyshev ≤ 1, i.e. same or adjacent chunk; particle
   index distance in [s+1, 2·chunk−1]): a dense particle-level stencil
   over that offset band tests ``dist < 2r + skin`` directly; a flagged
   chunk contributes its self-pair and its four half-plane adjacent
   pairs.
2. **annulus** (chunk-chebyshev in [2, 2·tile_chunks−1]): a dense
   chunk-level stencil over AABB planes — two chunks are candidates if
   their axis-aligned bounding boxes, each expanded by ``r + skin/2``,
   overlap.
3. **far** (chunk-chebyshev ≥ 2·tile_chunks, which implies
   tile-chebyshev ≥ 2): tile AABBs are tested all-pairs (dense [T, T]
   boolean), overlapping far tile pairs are refined chunk-against-chunk
   with the same AABB test, masked to chunk-chebyshev ≥ 2·tile_chunks.

The three sources are disjoint in chunk distance, so concatenating them
never duplicates a pair.  Candidate compaction uses sort-based index
extraction (``_nz``) at static capacities; dropped candidates are
counted in ``overflow`` (graceful degradation, like the collision grid's
overflow counter).

Per-substep, the candidate chunk pairs are processed with the *exact*
reference pair math (identical to ops/stencil.py::_stencil_collisions,
compute.wgsl:150-168) over the full 16×16 particle cross product of each
pair, masked to index-chebyshev > s and alive endpoints; unordered pairs
are evaluated once and applied antisymmetrically to both chunks.  The
contact distance is the true ``2r`` — the skin only widens *detection*.

Validity (Verlet list): the list built at positions ``pos_ref`` covers
every pair that can reach contact while no particle's displacement
*relative to the center of mass* exceeds ``skin/2`` (for any pair,
|Δ(x_i − x_j)| ≤ |Δ(x_i − com)| + |Δ(x_j − com)| ≤ skin).  The COM
correction makes rigid translation (free fall) cost nothing.  The engine
(engine/backends.py LatticeBackend) checks the displacement bound every
frame and rebuilds when it, plus a velocity-based prediction for the
coming frame, exceeds the budget.

Single-device only: under spatial sharding (parallel/lattice_spatial.py)
far-field pairs may span device slabs; the sharded path keeps near-field
stencil semantics (documented limitation).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

_BIG = jnp.float32(3.0e38)
_BIG_F = 3.0e38  # python-float twin (lax.reduce_window needs a concrete init)


def _nz(flags: jax.Array, size: int) -> jax.Array:
    """First ``size`` indices of true elements (ascending, flattened).

    ``jnp.nonzero(size=)`` lowers through bincount — a scatter over EVERY
    input element (measured 13 ms on a 1.1M-bool plane,
    scripts/profile_rebuild.py).  One int32 sort produces the same
    ascending index list 2.6× faster.  Out-of-range slots (beyond the
    true count) clamp to the last element; callers mask them via counts.
    """
    n = int(np.prod(flags.shape))
    flat = flags.reshape(-1)
    keys = jnp.where(flat, jnp.arange(n, dtype=jnp.int32), jnp.int32(n))
    idx = jax.lax.sort(keys, is_stable=False)[: min(size, n)]
    if n < size:
        idx = jnp.pad(idx, (0, size - n), constant_values=n - 1)
    return jnp.minimum(idx, n - 1)


class ChunkPlanes(NamedTuple):
    """Chunk-level detection state: what the particle-plane front-end
    (:func:`_chunk_detection`) produces and the chunk-level core
    (:func:`_candidates_from_chunks`) consumes.  All planes are
    ``[cwx, cwy]`` on the padded chunk grid.

    The split exists because two other producers can supply the same
    planes far cheaper than a full particle-plane pass: the fused
    kernel's detection side-outputs (ops/pallas/fused_substep2.py) and
    the sharded engine's all-gather of per-slab chunk planes
    (parallel/fused_spatial2.py)."""

    iminx: jax.Array   # inflated (+velocity-extruded) chunk AABBs
    imaxx: jax.Array
    iminy: jax.Array
    imaxy: jax.Array
    cany: jax.Array    # bool: chunk has any alive particle
    cband: jax.Array   # bool: chunk has a band-source hit (at base index)
    com: jax.Array     # [2] alive-mean position (FarList.com_ref)


@dataclasses.dataclass(frozen=True)
class FarFieldSpec:
    """Static far-field configuration (hashable jit argument).

    ``skin`` is the detection margin in world units: pairs are candidates
    when within ``2r + skin`` at rebuild, and the list stays valid until
    some particle's COM-relative displacement exceeds ``skin/2``.
    """

    chunk: int = 4
    # 4 chunks/tile (16-particle tiles): the annulus half-offset set is
    # chebyshev [2, 2·tc−1] = 108 offsets vs 480 at tc=8 — a 4.4× cut of
    # both the rebuild's dominant chunk-stencil cost and its compile
    # size, for a [T, T] far-tile test that stays tiny (~5k tiles at 1M)
    tile_chunks: int = 4
    max_pairs: int = 512        # chunk-pair capacity (per-substep work)
    max_tile_pairs: int = 256   # far tile-pair capacity (rebuild refine)
    skin: float = 2.0
    # velocity-EXTRUDED detection (used when the rebuild is given
    # velocities): each chunk's AABB is swept along its own velocity
    # span for ``horizon`` substeps (directional extrusion, not
    # isotropic inflation — uniform motion extrudes every box
    # identically and adds NO candidates), and the list stays valid
    # while every particle's deviation from linear motion
    # ``p_ref + v_ref·τ`` stays within skin/2 and τ < horizon.  Fast
    # debris thus collects its flight-path candidates up front instead
    # of forcing a global rebuild every couple of substeps.
    # ``speed_safety`` scales the one-substep deviation-growth margin in
    # the trigger (covers in-substep impulses changing the velocity).
    horizon: int = 16
    speed_safety: float = 2.0
    # cap on hit-CHUNK strip rows in the rebuild compaction (the sort
    # cost driver: strips are [rows, n_offsets] and ``_nz`` sorts the
    # whole strip — [32768, 108] costs ~2 ms where [4096, 108] costs
    # 0.14 ms, probe_r4).  Overflow accounting stays exact: dropped
    # rows' pairs land in ``overflow`` via the total-minus-taken count.
    max_hit_chunks: int = 4096

    @property
    def tile(self) -> int:
        return self.chunk * self.tile_chunks

    def band_half_offsets(self, s: int) -> Tuple[Tuple[int, int], ...]:
        """Particle-offset half-plane band: chebyshev in [s+1, 2*chunk-1]."""
        r = 2 * self.chunk - 1
        return tuple(
            (dx, dy)
            for dx in range(0, r + 1)
            for dy in range(-r, r + 1)
            if (dx > 0 or dy > 0) and max(abs(dx), abs(dy)) > s
        )

    def annulus_half_offsets(self) -> Tuple[Tuple[int, int], ...]:
        """Chunk-offset half-plane annulus: chebyshev in [2, 2*tile_chunks-1].

        Strict half-plane (``dx > 0`` or ``dx == 0, dy > 0``): a vertical
        pair (A, A+(0,3)) must be emitted only at A — emitting its mirror
        (0,−3) at the partner too would duplicate the pair after
        canonicalization and double its collision impulse."""
        r = 2 * self.tile_chunks - 1
        return tuple(
            (dx, dy)
            for dx in range(0, r + 1)
            for dy in range(-r, r + 1)
            if max(abs(dx), abs(dy)) >= 2
            and (dx > 0 or dy > 0)
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FarList:
    """Candidate chunk-pair list (fixed capacity, valid-prefix packed).

    Reference positions are stored as separate x/y planes (not an
    interleaved ``[W, H, 2]``) so the displacement trigger — which runs
    every substep inside the on-device frame — reads the engine's packed
    plane layout with zero relayout."""

    ca: jax.Array        # [K] int32 linear chunk id (cx * cwy + cy)
    cb: jax.Array        # [K] int32; ca <= cb
    valid: jax.Array     # [K] bool
    n_pairs: jax.Array   # [] int32 — number of valid pairs
    overflow: jax.Array  # [] int32 — candidates dropped at any capacity
    px_ref: jax.Array    # [W, H] x positions at rebuild (trigger baseline)
    py_ref: jax.Array    # [W, H] y positions at rebuild
    com_ref: jax.Array   # [2] alive-mean position at rebuild
    vx_ref: jax.Array    # [W, H] x velocities at rebuild (linear-motion
    vy_ref: jax.Array    # [W, H] y velocities     reference for the
    #   deviation trigger; zeros for position-only rebuilds)
    age: jax.Array       # [] int32 substeps since rebuild (extruded
    #   lists expire at the spec's horizon)

    @property
    def capacity(self) -> int:
        return self.ca.shape[0]


def _chunk_dims(w: int, h: int, ff: FarFieldSpec) -> Tuple[int, int, int, int]:
    """(cwx, cwy, wp, hp): chunk-grid dims and padded particle dims."""
    c = ff.chunk
    # pad the chunk grid itself to a tile multiple so tile reductions are
    # pure reshapes
    cwx = -(-w // c)
    cwy = -(-h // c)
    cwx = -(-cwx // ff.tile_chunks) * ff.tile_chunks
    cwy = -(-cwy // ff.tile_chunks) * ff.tile_chunks
    return cwx, cwy, cwx * c, cwy * c


def _pad_plane(x: jax.Array, wp: int, hp: int, fill) -> jax.Array:
    w, h = x.shape
    return jnp.pad(x, ((0, wp - w), (0, hp - h)), constant_values=fill)


def chunk_view(x: jax.Array, ff: FarFieldSpec) -> jax.Array:
    """Padded [Wp, Hp] plane → chunk-major [Cn, chunk*chunk]."""
    c = ff.chunk
    wp, hp = x.shape
    return (
        x.reshape(wp // c, c, hp // c, c)
        .transpose(0, 2, 1, 3)
        .reshape((wp // c) * (hp // c), c * c)
    )


def unchunk_view(x: jax.Array, wp: int, hp: int, ff: FarFieldSpec) -> jax.Array:
    """Chunk-major [Cn, chunk*chunk] → padded [Wp, Hp] plane."""
    c = ff.chunk
    return (
        x.reshape(wp // c, hp // c, c, c)
        .transpose(0, 2, 1, 3)
        .reshape(wp, hp)
    )


# ---------------------------------------------------------------------------
# rebuild


def _chunk_detection(pxu, pyu, alive, *, s: int, ff: FarFieldSpec,
                     radius: float, vxu=None, vyu=None, dt: float = 0.0,
                     horizon_pad: int = 0, return_raw: bool = False,
                     band_impl: str = "xla"):
    """Particle-plane detection front-end: reduce the ``[W, H]`` x/y
    position planes to chunk-level state (:class:`ChunkPlanes`).

    With velocity planes, detection is VELOCITY-INFLATED: chunk AABBs are
    expanded by ``radius + allow_c`` where
    ``allow_c = skin/2 + speed_safety · chunk_max_speed · horizon · dt``
    is that chunk's displacement allowance (the trigger budget).  A
    non-candidate pair (i∈A, j∈B) then has reference gap
    > 2r + allow_A + allow_B, so the list stays exact while every chunk's
    max displacement stays within its own allowance — one fast debris
    chunk no longer invalidates the whole list every substep.

    ``horizon_pad`` extends the extrusion window by that many substeps —
    used when the detection state is older than the list's reference
    state (kernel side-output paths)."""
    if vxu is not None:
        wp_, hp_ = _chunk_dims(pxu.shape[0], pxu.shape[1], ff)[2:]
        alv_ = _pad_plane(alive, wp_, hp_, False)
        vx_ = _pad_plane(vxu, wp_, hp_, 0.0)
        vy_ = _pad_plane(vyu, wp_, hp_, 0.0)
        n_alive_v = jnp.maximum(jnp.sum(alv_.astype(jnp.float32)), 1.0)
        vbar = (jnp.sum(jnp.where(alv_, vx_, 0.0)) / n_alive_v,
                jnp.sum(jnp.where(alv_, vy_, 0.0)) / n_alive_v)
        T = float((ff.horizon + horizon_pad) * dt)
    else:
        vbar = None
        T = 0.0
    raw, cany, com = raw_chunk_planes(
        pxu, pyu, alive, s=s, ff=ff, radius=radius,
        vxu=vxu, vyu=vyu, T_band=T, vbar=vbar, band_impl=band_impl,
    )
    iminx, imaxx, iminy, imaxy = extrude_chunk_planes(
        raw, cany, ff=ff, radius=radius, T=T,
        extruded=vxu is not None,
    )
    cp = ChunkPlanes(iminx, imaxx, iminy, imaxy, cany, raw.band, com)
    if return_raw:
        return cp, raw
    return cp


class RawChunkPlanes(NamedTuple):
    """Pre-extrusion chunk detection planes ``[cwx, cwy]``: alive-masked
    position/velocity AABBs (±BIG fill for empty chunks) and the band
    hit flag.  This is exactly what the fused kernel's detection
    side-outputs carry (ops/pallas/fused_substep2.py); the XLA producer
    is :func:`raw_chunk_planes` — the two are parity-tested."""

    minx: jax.Array
    maxx: jax.Array
    miny: jax.Array
    maxy: jax.Array
    vminx: jax.Array
    vmaxx: jax.Array
    vminy: jax.Array
    vmaxy: jax.Array
    band: jax.Array   # bool


def raw_chunk_planes(pxu, pyu, alive, *, s: int, ff: FarFieldSpec,
                     radius: float, vxu=None, vyu=None,
                     T_band: float = 0.0, vbar=None,
                     band_impl: str = "xla"):
    """Particle planes → (RawChunkPlanes, cany, com).

    Band reach per pair is ``2r + skin + (dev_i + dev_j)`` with
    ``dev = |v − v̄|·T_band`` (a closing-speed bound via mean-relative
    deviation speeds: |v_i − v_j| ≤ dev_i + dev_j for any common v̄ —
    tight for uniform motion).  With ``vxu=None`` the reach is
    position-only.

    ``band_impl="kernel"`` runs the ~100-offset band pass as one Pallas
    kernel (ops/pallas/band_detect.py) instead of the XLA shifted-
    compare loop — bit-identical flags; the XLA loop re-reads the
    padded planes per offset (~1.4 GB HBM per rebuild at 1M) while the
    kernel reads them once per slab.  Velocity mode only (the
    position-only branch has no measured workload)."""
    w, h = pxu.shape[0], pxu.shape[1]
    cwx, cwy, wp, hp = _chunk_dims(w, h, ff)
    c = ff.chunk

    px = _pad_plane(pxu, wp, hp, 0.0)
    py = _pad_plane(pyu, wp, hp, 0.0)
    alv = _pad_plane(alive, wp, hp, False)

    # ---- chunk AABBs (masked reductions; empty chunks never overlap) ----
    # sublane groups via a strided-slice min/max tree, lane groups via
    # lax.reduce_window (the pooling path) — fastest of four measured
    # variants (scripts/profile_aabb.py; a stacked all-planes-one-pass
    # variant measured 5× WORSE: the [S, Wp, Hp] strided slices relayout)
    def creduce(plane, lop, fill):
        v = jnp.where(alv, plane, np.float32(fill))
        if c == 4:
            v = lop(lop(v[0::4], v[1::4]), lop(v[2::4], v[3::4]))
            win = (1, c)
        else:
            win = (c, c)
        return jax.lax.reduce_window(
            v, np.float32(fill), lop, win, win, "VALID"
        )

    cminx = creduce(px, jax.lax.min, _BIG_F)
    cmaxx = creduce(px, jax.lax.max, -_BIG_F)
    cminy = creduce(py, jax.lax.min, _BIG_F)
    cmaxy = creduce(py, jax.lax.max, -_BIG_F)
    cany = creduce(alv.astype(jnp.float32), jax.lax.max, 0.0) > 0.0
    if vxu is not None:
        vx = _pad_plane(vxu, wp, hp, 0.0)
        vy = _pad_plane(vyu, wp, hp, 0.0)
        vminx = creduce(vx, jax.lax.min, _BIG_F)
        vmaxx = creduce(vx, jax.lax.max, -_BIG_F)
        vminy = creduce(vy, jax.lax.min, _BIG_F)
        vmaxy = creduce(vy, jax.lax.max, -_BIG_F)
    else:
        vminx = vmaxx = vminy = vmaxy = jnp.zeros((cwx, cwy), jnp.float32)

    # ---- particle band (same / adjacent chunk pairs) --------------------
    # pad ONCE to the band's full reach and slice per offset — a per-offset
    # jnp.pad materializes a fresh plane each time (measured 40×+ slower)
    br = 2 * c - 1
    px_b = jnp.pad(px, ((0, br), (br, br)), constant_values=_BIG)
    py_b = jnp.pad(py, ((0, br), (br, br)), constant_values=_BIG)
    alv_b = jnp.pad(alv, ((0, br), (br, br)), constant_values=False)

    def shifted(plane_b, dx, dy):
        return plane_b[dx : dx + wp, br + dy : br + dy + hp]

    base_reach = jnp.float32(2.0 * radius + ff.skin)
    if vxu is not None:
        vbx, vby = vbar
        dev = jnp.sqrt((vx - vbx) ** 2 + (vy - vby) ** 2) * jnp.float32(
            T_band
        )
        dev = jnp.where(alv, dev, 0.0)
        dev_b = jnp.pad(dev, ((0, br), (br, br)), constant_values=0.0)
    else:
        reach2 = base_reach * base_reach
    if band_impl == "kernel" and vxu is not None:
        from .pallas.band_detect import band_flag_call

        flag = band_flag_call(
            px, py, dev, base_reach + dev, alv,
            offsets=ff.band_half_offsets(s),
            interpret=jax.default_backend() != "tpu",
        )
    else:
        flag = jnp.zeros((wp, hp), bool)
        for dx, dy in ff.band_half_offsets(s):
            d2 = (shifted(px_b, dx, dy) - px) ** 2 + (
                shifted(py_b, dx, dy) - py
            ) ** 2
            if vxu is not None:
                reach = base_reach + dev + shifted(dev_b, dx, dy)
                reach2 = reach * reach
            flag = flag | (alv & shifted(alv_b, dx, dy) & (d2 < reach2))
    cflag = jnp.any(flag.reshape(cwx, c, cwy, c), axis=(1, 3))

    n_alive = jnp.maximum(jnp.sum(alive.astype(jnp.float32)), 1.0)
    com = jnp.stack([
        jnp.sum(jnp.where(alive, pxu, 0.0)) / n_alive,
        jnp.sum(jnp.where(alive, pyu, 0.0)) / n_alive,
    ])
    raw = RawChunkPlanes(cminx, cmaxx, cminy, cmaxy,
                         vminx, vmaxx, vminy, vmaxy, cflag)
    return raw, cany, com


def extrude_chunk_planes(raw: RawChunkPlanes, cany, *, ff: FarFieldSpec,
                         radius: float, T: float, extruded: bool):
    """Velocity-extrude + margin-inflate raw chunk AABBs → the
    ``(iminx, imaxx, iminy, imaxy)`` planes of :class:`ChunkPlanes`.

    Swept box: each chunk's AABB extended along its own velocity span
    for ``T`` seconds, then inflated by ``r + skin/2``.  Uniform motion
    extrudes every box identically → no extra candidates; only
    differential motion (approaching fronts, debris) widens the
    candidate set — and exactly in the approach direction."""
    m0 = jnp.float32(radius + 0.5 * ff.skin)
    if not extruded:
        return (raw.minx - m0, raw.maxx + m0, raw.miny - m0,
                raw.maxy + m0)
    # empty chunks reduce to ±BIG; zero them so ±BIG·T stays finite
    # (cany gates every test anyway)
    z = jnp.float32(0.0)
    Tf = jnp.float32(T)
    vminx = jnp.where(cany, raw.vminx, z)
    vmaxx = jnp.where(cany, raw.vmaxx, z)
    vminy = jnp.where(cany, raw.vminy, z)
    vmaxy = jnp.where(cany, raw.vmaxy, z)
    return (
        raw.minx + jnp.minimum(vminx * Tf, 0.0) - m0,
        raw.maxx + jnp.maximum(vmaxx * Tf, 0.0) + m0,
        raw.miny + jnp.minimum(vminy * Tf, 0.0) - m0,
        raw.maxy + jnp.maximum(vmaxy * Tf, 0.0) + m0,
    )


def _candidates_from_chunks(cp: ChunkPlanes, *, ff: FarFieldSpec):
    """Chunk-level detection core: candidate masks + tile-refinement
    tables from :class:`ChunkPlanes` (everything before compaction).
    All work here is on ``[cwx, cwy]`` chunk planes — ~256× smaller than
    the particle planes."""
    iminx, imaxx, iminy, imaxy = cp.iminx, cp.imaxx, cp.iminy, cp.imaxy
    cany, cflag = cp.cany, cp.cband
    cwx, cwy = cany.shape
    tc = ff.tile_chunks

    # A flagged chunk's band pair may land in any of the 9 neighbor
    # chunks (band reach 2*chunk−1 crosses at most one chunk boundary per
    # axis; anything further is the annulus source's bucket).  Each
    # unordered (base, base+o) pair is emitted once, for o in the
    # half-plane neighbor set, when EITHER endpoint chunk is flagged —
    # the hit is only recorded at the pair's lower (half-offset) end, so
    # the OR over both endpoints is what makes reversed pairs reachable.
    # chunk-plane padded views, shared by the band-adjacency and annulus
    # stencils (single pad, sliced per offset)
    ar = 2 * tc - 1
    cminx_b = jnp.pad(iminx, ((0, ar), (ar, ar)), constant_values=_BIG)
    cmaxx_b = jnp.pad(imaxx, ((0, ar), (ar, ar)), constant_values=-_BIG)
    cminy_b = jnp.pad(iminy, ((0, ar), (ar, ar)), constant_values=_BIG)
    cmaxy_b = jnp.pad(imaxy, ((0, ar), (ar, ar)), constant_values=-_BIG)
    cany_b = jnp.pad(cany, ((0, ar), (ar, ar)), constant_values=False)
    cflag_b = jnp.pad(cflag, ((0, ar), (ar, ar)), constant_values=False)

    def csh(plane_b, dx, dy):
        return plane_b[dx : dx + cwx, ar + dy : ar + dy + cwy]

    adj_offsets = ((0, 0), (0, 1), (1, -1), (1, 0), (1, 1))
    band_masks = []
    for dx, dy in adj_offsets:
        f = (cflag | csh(cflag_b, dx, dy)) & cany & csh(cany_b, dx, dy)
        band_masks.append(f)
    band_stack = jnp.stack(band_masks)  # [5, cwx, cwy]

    # ---- source 2: chunk annulus (chebyshev in [2, 2*tc-1]) -------------
    # accumulated any-mask + count only: materializing the full
    # [~480, cwx, cwy] offset stack (40 MB at 1M) and compacting it was
    # the dominant rebuild cost; the per-offset hit bits are recomputed
    # later on a [K, window] strip of just the hit chunks.
    ann_offsets = ff.annulus_half_offsets()

    def aabb_overlap_shift(dx, dy):
        # inflated-AABB overlap: each side carries its own r + allowance
        return (
            cany & csh(cany_b, dx, dy)
            & (iminx <= csh(cmaxx_b, dx, dy))
            & (csh(cminx_b, dx, dy) <= imaxx)
            & (iminy <= csh(cmaxy_b, dx, dy))
            & (csh(cminy_b, dx, dy) <= imaxy)
        )

    # per-chunk offset BITMASK: word w bit b records whether annulus
    # offset 32w+b hit — compaction later just row-gathers these words
    # for the hit chunks and expands bits, instead of re-running (or
    # having stored) the per-offset tests
    n_words = -(-len(ann_offsets) // 32)
    ann_any = jnp.zeros((cwx, cwy), bool)
    ann_count = jnp.zeros((cwx, cwy), jnp.int32)
    ann_words = [jnp.zeros((cwx, cwy), jnp.uint32) for _ in range(n_words)]
    for i, (dx, dy) in enumerate(ann_offsets):
        hit_o = aabb_overlap_shift(dx, dy)
        ann_any = ann_any | hit_o
        ann_count = ann_count + hit_o.astype(jnp.int32)
        ann_words[i // 32] = ann_words[i // 32] | (
            hit_o.astype(jnp.uint32) << jnp.uint32(i % 32)
        )
    ann_words = jnp.stack(ann_words)  # [n_words, cwx, cwy]

    # ---- source 3: far tile pairs + chunk refinement ---------------------
    tx, ty = cwx // tc, cwy // tc
    tn = tx * ty

    def treduce(plane, op):
        return op(plane.reshape(tx, tc, ty, tc), axis=(1, 3))

    # tile AABBs reduce the INFLATED chunk planes, so per-chunk speed
    # allowances carry through to the tile test
    tminx = treduce(iminx, jnp.min).reshape(tn)
    tmaxx = treduce(imaxx, jnp.max).reshape(tn)
    tminy = treduce(iminy, jnp.min).reshape(tn)
    tmaxy = treduce(imaxy, jnp.max).reshape(tn)
    tany = treduce(cany, jnp.any).reshape(tn)
    tix = jnp.arange(tn, dtype=jnp.int32) // ty
    tiy = jnp.arange(tn, dtype=jnp.int32) % ty

    ov = (
        (tminx[:, None] <= tmaxx[None, :])
        & (tminx[None, :] <= tmaxx[:, None])
        & (tminy[:, None] <= tmaxy[None, :])
        & (tminy[None, :] <= tmaxy[:, None])
        & tany[:, None] & tany[None, :]
    )
    tcheb = jnp.maximum(
        jnp.abs(tix[:, None] - tix[None, :]), jnp.abs(tiy[:, None] - tiy[None, :])
    )
    lin_t = jnp.arange(tn, dtype=jnp.int32)
    far_tile = ov & (tcheb >= 2) & (lin_t[:, None] < lin_t[None, :])

    k1 = ff.max_tile_pairs
    # two-stage compaction: rows with any pair first (every flagged row
    # holds ≥1 pair so k1 rows suffice for k1 pairs), then the pairs of
    # those rows — keeps the big _nz on [k1, tn] instead of [tn, tn]
    row_any = jnp.any(far_tile, axis=1)
    n_rows = jnp.sum(row_any.astype(jnp.int32))
    r_idx = _nz(row_any, k1)
    row_ok = jnp.arange(k1) < jnp.minimum(n_rows, k1)
    strip = far_tile[r_idx] & row_ok[:, None]  # [k1, tn]
    total_tiles = jnp.sum(far_tile.astype(jnp.int32))
    taken = jnp.minimum(jnp.sum(strip.astype(jnp.int32)), k1)
    e3 = _nz(strip, k1)
    ti_a = r_idx[e3 // tn]
    ti_b = (e3 % tn).astype(jnp.int32)
    tile_valid = jnp.arange(k1) < taken
    tile_overflow = total_tiles - taken

    # gather each far tile pair's chunk AABBs.  One TILE-MAJOR relayout
    # of the five chunk planes + the linear-id plane (a [tn, 6·tc²]
    # stack, ~2 MB at 1M — free) turns the former per-tile windowed
    # element gathers (the slow class of the gather cost model:
    # element/windowed ≫ row) into TWO row gathers of k1 rows.
    # Values are identical — chunk ids < 2²⁴ are exact in f32.
    lin_ids = (
        jnp.arange(cwx, dtype=jnp.int32)[:, None] * cwy
        + jnp.arange(cwy, dtype=jnp.int32)[None, :]
    )

    def tile_major(plane):
        return (
            plane.astype(jnp.float32)
            .reshape(tx, tc, ty, tc)
            .transpose(0, 2, 1, 3)
            .reshape(tn, tc * tc)
        )

    tile_tab = jnp.concatenate(
        [tile_major(p) for p in
         (iminx, imaxx, iminy, imaxy, cany, lin_ids)], axis=1,
    )  # [tn, 6·tc²]
    rows_a = tile_tab[ti_a]  # [k1, 6·tc²]
    rows_b = tile_tab[ti_b]
    tcc_ = tc * tc

    def field(rows, j):
        return rows[:, j * tcc_ : (j + 1) * tcc_]

    aminx, bminx = field(rows_a, 0), field(rows_b, 0)
    amaxx, bmaxx = field(rows_a, 1), field(rows_b, 1)
    aminy, bminy = field(rows_a, 2), field(rows_b, 2)
    amaxy, bmaxy = field(rows_a, 3), field(rows_b, 3)
    aany = field(rows_a, 4) > 0.0
    bany = field(rows_b, 4) > 0.0
    ca_ids = field(rows_a, 5).astype(jnp.int32)  # [k1, tc*tc]
    cb_ids = field(rows_b, 5).astype(jnp.int32)
    acx, bcx = ca_ids // cwy, cb_ids // cwy
    acy, bcy = ca_ids % cwy, cb_ids % cwy

    ref_ov = (
        (aminx[:, :, None] <= bmaxx[:, None, :])
        & (bminx[:, None, :] <= amaxx[:, :, None])
        & (aminy[:, :, None] <= bmaxy[:, None, :])
        & (bminy[:, None, :] <= amaxy[:, :, None])
        & aany[:, :, None] & bany[:, None, :]
        & tile_valid[:, None, None]
    )
    ccheb = jnp.maximum(
        jnp.abs(acx[:, :, None] - bcx[:, None, :]),
        jnp.abs(acy[:, :, None] - bcy[:, None, :]),
    )
    ref_ov = ref_ov & (ccheb >= 2 * tc)

    return (band_stack, ann_any, ann_count, ann_words, ref_ov, ca_ids,
            cb_ids, tile_overflow, adj_offsets, ann_offsets, cwy)


def chunk_any_alive(alive, ff: FarFieldSpec) -> jax.Array:
    """Per-chunk any-alive plane ``[cwx, cwy]`` (static per frame for the
    fused path, whose particle alive mask is immutable)."""
    w, h = alive.shape
    cwx, cwy, wp, hp = _chunk_dims(w, h, ff)
    c = ff.chunk
    alv = _pad_plane(alive, wp, hp, False)
    return jnp.any(alv.reshape(cwx, c, cwy, c), axis=(1, 3))


def raw_planes_from_side(side, plane_w: int, plane_h: int,
                         interior_off: Tuple[int, int],
                         ff: FarFieldSpec) -> RawChunkPlanes:
    """Kernel detection side-outputs → :class:`RawChunkPlanes` on the
    full padded chunk grid.

    ``side [N_SIDE, wi/4, hi]`` carries sublane-4-group-reduced
    partials over the kernel's interior ``(wi, hi)`` (row ``j`` = the
    reduce of interior rows ``[4j, 4j+4)``; the kernel extracts the
    rows with an exact one-hot MXU row-select because Mosaic cannot
    lower a strided sublane slice).  This finishes the lane-group
    reduce (window 4 along y) and embeds the result at the interior's
    chunk offset inside the ``_chunk_dims(plane_w, plane_h)`` grid
    (pad chunks filled with empty values)."""
    c = ff.chunk
    cwx, cwy, _, _ = _chunk_dims(plane_w, plane_h, ff)
    ox, oy = interior_off
    if ox % c or oy % c:
        raise ValueError("interior offset must be chunk-aligned")

    def lred(plane, lop, fill):
        red = jax.lax.reduce_window(
            plane, np.float32(fill), lop, (1, c), (1, c), "VALID"
        )
        out = jnp.full((cwx, cwy), np.float32(fill), jnp.float32)
        return jax.lax.dynamic_update_slice(out, red, (ox // c, oy // c))

    return RawChunkPlanes(
        minx=lred(side[0], jax.lax.min, _BIG_F),
        maxx=lred(side[1], jax.lax.max, -_BIG_F),
        miny=lred(side[2], jax.lax.min, _BIG_F),
        maxy=lred(side[3], jax.lax.max, -_BIG_F),
        vminx=lred(side[4], jax.lax.min, _BIG_F),
        vmaxx=lred(side[5], jax.lax.max, -_BIG_F),
        vminy=lred(side[6], jax.lax.min, _BIG_F),
        vmaxy=lred(side[7], jax.lax.max, -_BIG_F),
        band=lred(side[8], jax.lax.max, 0.0) > 0.0,
    )


def kernel_side_from_planes(pxu, pyu, alive, vxu, vyu, *, s: int,
                            ff: FarFieldSpec, radius: float,
                            T_band: float, vbar,
                            interior_off: Tuple[int, int],
                            interior_shape: Tuple[int, int]) -> jax.Array:
    """XLA producer of the fused kernel's detection side-output array
    ``[N_SIDE, wi/4, hi]`` (ops/pallas/fused_substep2.py) — used to
    initialise the cross-frame side carry before the kernel has ever
    run with the detect flag on.  Row ``j`` holds the sublane-4-group
    reduce of interior rows ``[4j, 4j+4)``; lanes carry the chunk value
    repeated ×4 (the kernel's lane reduce is finished downstream by
    :func:`raw_planes_from_side` either way, so repeats are exact).

    Satisfies ``raw_planes_from_side(kernel_side_from_planes(...)) ==
    raw_chunk_planes(...)`` on alive chunks (parity-tested in
    tests/test_fused3.py)."""
    raw, _cany, _com = raw_chunk_planes(
        pxu, pyu, alive, s=s, ff=ff, radius=radius,
        vxu=vxu, vyu=vyu, T_band=T_band, vbar=vbar,
    )
    c = ff.chunk
    ox, oy = interior_off
    wi, hi = interior_shape
    if ox % c or oy % c or wi % c or hi % c:
        raise ValueError("interior must be chunk-aligned")

    def emb(plane):
        sl = plane[ox // c : (ox + wi) // c, oy // c : (oy + hi) // c]
        return jnp.repeat(sl.astype(jnp.float32), c, axis=1)

    return jnp.stack([
        emb(raw.minx), emb(raw.maxx), emb(raw.miny), emb(raw.maxy),
        emb(raw.vminx), emb(raw.vmaxx), emb(raw.vminy), emb(raw.vmaxy),
        emb(raw.band),
    ])


def _detection(pxu, pyu, alive, *, s: int, ff: FarFieldSpec, radius: float,
               vxu=None, vyu=None, dt: float = 0.0):
    """Full dense detection = particle front-end + chunk core; returns
    the legacy tuple (core outputs + com)."""
    cp = _chunk_detection(pxu, pyu, alive, s=s, ff=ff, radius=radius,
                          vxu=vxu, vyu=vyu, dt=dt)
    return _candidates_from_chunks(cp, ff=ff) + (cp.com,)


@functools.partial(jax.jit, static_argnames=("s", "ff", "radius"))
def far_candidate_count(pos, alive, *, s: int, ff: FarFieldSpec,
                        radius: float):
    """Cheap detection-only pass: (total candidate pairs incl. dropped
    tile pairs, COM) — lets the engine skip the compaction machinery
    entirely on the common no-fold frame."""
    (band_stack, _ann_any, ann_count, _ann_words, ref_ov, _ca, _cb,
     tile_overflow, _adj, _ann, _cwy, com) = _detection(
         pos[..., 0], pos[..., 1], alive, s=s, ff=ff, radius=radius)
    total = (
        jnp.sum(band_stack.astype(jnp.int32))
        + jnp.sum(ann_count)
        + jnp.sum(ref_ov.astype(jnp.int32))
        + tile_overflow
    )
    return total, com


def rebuild_far_list_planes(
    px: jax.Array,
    py: jax.Array,
    alive: jax.Array,
    *,
    s: int,
    ff: FarFieldSpec,
    radius: float,
    vx=None,
    vy=None,
    dt: float = 0.0,
    band_impl: str = "xla",
) -> FarList:
    """Build the candidate chunk-pair list from current positions (plane
    inputs; traceable — used both standalone and inside the on-device
    frame's ``lax.cond`` rebuild branch).  With ``vx``/``vy``/``dt`` the
    detection is velocity-extruded (see :func:`_detection`) and the list
    records the velocity reference for :func:`list_invalid`.

    All work is dense (reductions, shifted compares, one [T, T] tile
    test) plus three fixed-capacity sort-based compactions (``_nz``).
    ``band_impl="kernel"`` runs the band pass as a Pallas kernel
    (bit-identical flags; see :func:`raw_chunk_planes`).
    """
    cp = _chunk_detection(px, py, alive, s=s, ff=ff, radius=radius,
                          vxu=vx, vyu=vy, dt=dt, band_impl=band_impl)
    return rebuild_far_list_from_chunks(
        cp, px, py,
        jnp.zeros_like(px) if vx is None else vx,
        jnp.zeros_like(py) if vy is None else vy,
        ff=ff,
    )


def pair_activation(fl: FarList, raw: RawChunkPlanes, *, ff: FarFieldSpec,
                    radius: float, dt: float, R: int):
    """Per-pair conservative activation schedule for one cadence block.

    The candidate list covers every pair that can touch within the
    extrusion horizon — but most listed pairs are *not yet* in contact
    range at the start of the block, so the per-substep apply wastes
    capacity on pairs that contribute exactly zero.  This computes, for
    each listed pair, a LOWER BOUND ``s0`` on the first substep index at
    which any particle contact is possible, reorders the list by ``s0``
    (stable; invalid entries last), and returns per-substep active-
    prefix counts ``n_active[R]`` — the apply at substep ``s`` then
    crops to ``n_active[s]`` pairs and prices by pairs that can
    actually matter (the bucket ladder does the cropping).

    Soundness (same contract as the v4 fixed-cadence detection,
    :func:`extrude_chunk_planes`): per axis, the AABB gap between two
    chunks shrinks at most at the difference of their velocity extremes
    per substep, plus a ``skin/2`` per-side allowance for deviation from
    linear motion over the block.  Contact (``dist < 2r``) additionally
    requires BOTH axis gaps ≤ 2r simultaneously, so
    ``s0 = ceil(max(tx, ty))`` with per-axis first-possible times is a
    true lower bound under the contract.  Gated pairs contribute zero to
    the reference pair math (compute.wgsl:150-168 applies impulses only
    below 2r), so gating changes no physics — only f32 summation order
    (the scatter-add sees a reordered list).

    Returns ``(fl_sorted, n_active)`` with ``n_active`` int32 ``[R]``.
    """
    k = fl.capacity
    # per-chunk field table [cwx*cwy, 8]: raw AABB + velocity extremes
    # (one small relayout; the pair gathers are then ROW gathers)
    tab = jnp.stack([
        raw.minx, raw.maxx, raw.miny, raw.maxy,
        raw.vminx, raw.vmaxx, raw.vminy, raw.vmaxy,
    ], axis=-1).reshape(-1, 8)
    a = tab[fl.ca]                     # [k, 8]
    b = tab[fl.cb]
    thr = jnp.float32(2.0 * radius + ff.skin)
    dtf = jnp.float32(dt)

    def axis_time(amin, amax, bmin, bmax, avmin, avmax, bvmin, bvmax):
        # first substep count at which the axis gap can reach ``thr``;
        # at most one direction has positive gap, the other term is 0
        def t_dir(gap, rate):
            return jnp.where(
                gap > thr,
                (gap - thr) / jnp.maximum(rate * dtf, jnp.float32(1e-30)),
                jnp.float32(0.0),
            )

        g1 = bmin - amax                      # b to the right of a
        r1 = jnp.maximum(avmax - bvmin, 0.0)  # fastest closing of g1
        g2 = amin - bmax
        r2 = jnp.maximum(bvmax - avmin, 0.0)
        return jnp.maximum(t_dir(g1, r1), t_dir(g2, r2))

    tx = axis_time(a[:, 0], a[:, 1], b[:, 0], b[:, 1],
                   a[:, 4], a[:, 5], b[:, 4], b[:, 5])
    ty = axis_time(a[:, 2], a[:, 3], b[:, 2], b[:, 3],
                   a[:, 6], a[:, 7], b[:, 6], b[:, 7])
    t = jnp.maximum(tx, ty)                  # contact needs both axes
    s0 = jnp.ceil(jnp.minimum(t, jnp.float32(R))).astype(jnp.int32)
    # invalid entries sort last (key R+1 > any valid key ≤ R)
    key = jnp.where(fl.valid, s0, jnp.int32(R + 1))
    order = jnp.argsort(key, stable=True)
    key_s = key[order]
    valid_s = fl.valid[order]
    n_active = jnp.sum(
        (key_s[None, :] <= jnp.arange(R, dtype=jnp.int32)[:, None])
        & valid_s[None, :],
        axis=1,
        dtype=jnp.int32,
    )
    fl_sorted = dataclasses.replace(
        fl, ca=fl.ca[order], cb=fl.cb[order], valid=valid_s
    )
    return fl_sorted, n_active


def rebuild_far_list_planes_active(
    px: jax.Array,
    py: jax.Array,
    alive: jax.Array,
    *,
    s: int,
    ff: FarFieldSpec,
    radius: float,
    vx: jax.Array,
    vy: jax.Array,
    dt: float,
    R: int,
    band_impl: str = "xla",
):
    """:func:`rebuild_far_list_planes` + :func:`pair_activation` in one
    pass (shares the chunk detection): returns ``(fl, n_active[R])``
    with the list sorted by activation substep."""
    cp, raw = _chunk_detection(px, py, alive, s=s, ff=ff, radius=radius,
                               vxu=vx, vyu=vy, dt=dt, return_raw=True,
                               band_impl=band_impl)
    fl = rebuild_far_list_from_chunks(cp, px, py, vx, vy, ff=ff)
    return pair_activation(fl, raw, ff=ff, radius=radius, dt=dt, R=R)


def rebuild_far_list_from_chunks(
    cp: ChunkPlanes,
    px_ref: jax.Array,
    py_ref: jax.Array,
    vx_ref: jax.Array,
    vy_ref: jax.Array,
    *,
    ff: FarFieldSpec,
) -> FarList:
    """Candidate-list build from pre-computed :class:`ChunkPlanes` — the
    entry point for producers that already have chunk-level detection
    state (fused-kernel side outputs, sharded all-gathered planes).  The
    reference planes stored in the list are passed explicitly; they may
    be (slightly) newer than the detection state, in which case the
    detection must have been run with a matching ``horizon_pad``."""
    (band_stack, ann_any, ann_count, ann_words, ref_ov, ca_ids, cb_ids,
     tile_overflow, adj_offsets, ann_offsets, cwy) = \
        _candidates_from_chunks(cp, ff=ff)

    # ---- compact the three sources --------------------------------------
    # Hit chunks first (every flagged chunk holds ≥1 pair, so K rows
    # suffice for K pairs), then that strip's (chunk, offset) bits.  All
    # index extraction is the sort-based ``_nz``; all gathers are ROW
    # gathers or windowed gathers — a column gather on the minor (lane)
    # dim lowers near-serially on TPU (measured: the former
    # ``stack[:, h_idx]`` dominated the 80 ms rebuild).
    k2 = ff.max_pairs
    # hit-chunk strip row cap — the _nz sort cost driver (strips are
    # [rows, n_off]; see FarFieldSpec.max_hit_chunks)
    mc = min(ff.max_hit_chunks, k2)

    def strip_extract(rows, h_idx, offs_arr, total):
        """rows [mc, n_off] bool (already masked) → (ca, cb, valid, n,
        overflow).  Entry (r, o): pair (h_idx[r], h_idx[r] + offset o).
        Output length is min(k2, rows.size) — sources are concatenated
        and re-compacted to k2 by the caller."""
        n_off = rows.shape[1]
        kk = min(k2, rows.size)
        e_flat = _nz(rows, kk)
        e_r = e_flat // n_off
        e_o = e_flat % n_off
        n = jnp.minimum(jnp.sum(rows.astype(jnp.int32)), kk)
        hx_ = h_idx[e_r] // cwy
        hy_ = h_idx[e_r] % cwy
        ca = hx_ * cwy + hy_
        cb = (hx_ + offs_arr[e_o, 0]) * cwy + (hy_ + offs_arr[e_o, 1])
        valid = jnp.arange(kk) < n
        return ca, cb, valid, n, total - n

    # band + annulus share ONE hit-chunk compaction (they flag largely
    # the same chunks at a fold): a single 65k-plane ``_nz`` and a
    # single merged strip [mc, 5 + n_off_a] replace the former
    # per-source pair of plane sorts + strip sorts — measured 3.47 ms
    # rebuild at 1M was part-bound by exactly these (probe_r5b)
    n_off_a = len(ann_offsets)
    n_words = ann_words.shape[0]
    band_any = jnp.any(band_stack, axis=0)
    hit_any = band_any | ann_any
    h_nchunks = jnp.sum(hit_any.astype(jnp.int32))
    h_idx = _nz(hit_any, mc)
    h_ok = jnp.arange(mc) < jnp.minimum(h_nchunks, mc)
    # ONE row gather for all band flags + annulus words: row gathers
    # price by row count (~width-independent), so a [Cn, 5 + n_words]
    # stacked table gathered once beats 5 + n_words separate plane
    # gathers at the same mc rows.  uint32 words ride as exact f32
    # halves (16-bit pieces < 2²⁴).
    src_cols = [band_stack[i].reshape(-1).astype(jnp.float32)
                for i in range(band_stack.shape[0])]
    for i in range(n_words):
        wi = ann_words[i].reshape(-1)
        src_cols.append((wi & jnp.uint32(0xFFFF)).astype(jnp.float32))
        src_cols.append((wi >> jnp.uint32(16)).astype(jnp.float32))
    hit_tab = jnp.stack(src_cols, axis=1)  # [Cn, 5 + 2·n_words]
    hit_rows = hit_tab[h_idx]              # one row gather
    b_rows = hit_rows[:, :5] > 0.0         # [mc, 5]
    words = (
        hit_rows[:, 5::2].astype(jnp.uint32)
        | (hit_rows[:, 6::2].astype(jnp.uint32) << jnp.uint32(16))
    )  # [mc, n_words]
    bits = (
        (words[:, :, None] >> jnp.arange(32, dtype=jnp.uint32)[None, None, :])
        & jnp.uint32(1)
    ).reshape(mc, n_words * 32)[:, :n_off_a]
    ba_rows = jnp.concatenate([b_rows, bits > 0], axis=1) & h_ok[:, None]
    ba_offs = jnp.concatenate([
        jnp.asarray(adj_offsets, jnp.int32),
        jnp.asarray(ann_offsets, jnp.int32),
    ])
    ban_ca, ban_cb, ban_valid, ba_n, ba_over = strip_extract(
        ba_rows, h_idx, ba_offs,
        jnp.sum(band_stack.astype(jnp.int32)) + jnp.sum(ann_count),
    )

    # far: entry (pair, i, j) → (ca_ids[pair, i], cb_ids[pair, j]);
    # reduce over j first so the big compaction runs on [k1, tc²] not
    # [k1, tc², tc²]
    k1, tcc = ref_ov.shape[0], ref_ov.shape[1]
    any_j = jnp.any(ref_ov, axis=2)  # [k1, tc*tc]
    p_i_n = jnp.sum(any_j.astype(jnp.int32))
    mcf = min(mc, k1 * tcc)
    ri_flat = _nz(any_j, mcf)
    r_p = ri_flat // tcc
    r_i = ri_flat % tcc
    row_ok = jnp.arange(mcf) < jnp.minimum(p_i_n, mcf)
    jrows = ref_ov[r_p, r_i, :] & row_ok[:, None]  # [mcf, tc*tc]
    f_total = jnp.sum(ref_ov.astype(jnp.int32))
    kkf = min(k2, mcf * tcc)
    ej_flat = _nz(jrows, kkf)
    e_r2 = ej_flat // tcc
    f_j = ej_flat % tcc
    f_n = jnp.minimum(jnp.sum(jrows.astype(jnp.int32)), kkf)
    far_ca = ca_ids[r_p[e_r2], r_i[e_r2]]
    far_cb = cb_ids[r_p[e_r2], f_j]
    far_valid = jnp.arange(kkf) < f_n
    f_over = f_total - f_n

    # pack the two sources (each already valid-prefix packed by its
    # ``_nz``) with two dynamic-slice writes instead of sorting the
    # whole concat: write band+ann's full strip at 0, then far's at
    # offset ba_n — far's live prefix lands right after band+ann's and
    # overwrites its dead tail.  (The former stable argsort over the
    # ~49k concat was a measurable slice of the 3.47 ms rebuild.)
    kb = ban_ca.shape[0]
    kf = far_ca.shape[0]
    buf = kb + kf

    def pack(a_src, b_src):
        out = jnp.zeros((buf,), a_src.dtype)
        out = jax.lax.dynamic_update_slice(out, a_src, (0,))
        return jax.lax.dynamic_update_slice(out, b_src, (ba_n,))

    ca = pack(ban_ca, far_ca)
    cb = pack(ban_cb, far_cb)
    # canonical order ca <= cb
    lo = jnp.minimum(ca, cb)[:k2]
    hi = jnp.maximum(ca, cb)[:k2]
    total = ba_n + f_n
    n_pairs = jnp.minimum(total, k2)
    valid = jnp.arange(k2) < n_pairs
    short = k2 - lo.shape[0]
    if short > 0:
        lo = jnp.pad(lo, (0, short))
        hi = jnp.pad(hi, (0, short))
        valid = jnp.pad(valid, (0, short)) if valid.shape[0] < k2 else valid
    overflow = (
        ba_over + f_over
        + jnp.maximum(total - k2, 0) + tile_overflow
    )

    return FarList(
        ca=lo.astype(jnp.int32),
        cb=hi.astype(jnp.int32),
        valid=valid & (jnp.arange(k2) < n_pairs),
        n_pairs=n_pairs.astype(jnp.int32),
        overflow=overflow.astype(jnp.int32),
        px_ref=px_ref,
        py_ref=py_ref,
        com_ref=cp.com,
        vx_ref=vx_ref,
        vy_ref=vy_ref,
        age=jnp.int32(0),
    )


@functools.partial(jax.jit, static_argnames=("s", "ff", "radius"))
def rebuild_far_list(
    pos: jax.Array,
    alive: jax.Array,
    vel: Optional[jax.Array] = None,
    *,
    s: int,
    ff: FarFieldSpec,
    radius: float,
    dt: float = 0.0,
) -> FarList:
    """:func:`rebuild_far_list_planes` on interleaved ``[W, H, 2]``
    position (and optional velocity) arrays (engine/test convenience)."""
    kw = {}
    if vel is not None:
        kw = dict(vx=vel[..., 0], vy=vel[..., 1], dt=dt)
    return rebuild_far_list_planes(
        pos[..., 0], pos[..., 1], alive, s=s, ff=ff, radius=radius, **kw
    )


def list_invalid(px, py, vx, vy, alive, fl: FarList, dt,
                 ff: FarFieldSpec):
    """True when the extruded list no longer covers the next substep:
    some particle's deviation from its linear reference motion
    ``p_ref + v_ref·τ`` (plus a margin for this substep's deviation
    growth ``speed_safety·|v − v_ref|·dt``) exceeds skin/2, or the list
    reaches its extrusion horizon.  One fused elementwise pass + full
    reduce (runs every substep inside the on-device frame).

    NOTE on the margin: the ``speed_safety·|v − v_ref|·dt`` term bounds
    this substep's deviation growth from the *pre-substep* velocity.  An
    impulsive in-substep velocity change (the penetration resolver can
    impart dv ~ r/dt) can breach skin/2 mid-substep, so the Verlet
    guarantee is heuristic under shock contacts — the next substep's
    trigger catches it one substep late.  In that window a contact can
    act at up to ``2r + skin`` separation error once; the skin (≥ r in
    every shipped config) absorbs it.  A hard bound would add an r-sized
    constant margin and roughly double the rebuild rate for no observed
    trajectory difference (oracle fold tests pass with the heuristic)."""
    tau = fl.age.astype(jnp.float32) * jnp.float32(dt)
    ddx = px - (fl.px_ref + fl.vx_ref * tau)
    ddy = py - (fl.py_ref + fl.vy_ref * tau)
    dev = jnp.sqrt(ddx * ddx + ddy * ddy)
    dvx = vx - fl.vx_ref
    dvy = vy - fl.vy_ref
    margin = (
        jnp.float32(ff.speed_safety * dt) * jnp.sqrt(dvx * dvx + dvy * dvy)
    )
    slack = jnp.where(alive, dev + margin, 0.0)
    return (jnp.max(slack) > jnp.float32(0.5 * ff.skin)) | (
        fl.age >= ff.horizon
    )


def crop_far_list(fl: FarList, k: int) -> FarList:
    """Slice a rebuilt list down to a smaller capacity bucket (valid
    entries are prefix-packed, so a plain slice keeps them all when
    ``k >= n_pairs``)."""
    return dataclasses.replace(
        fl, ca=fl.ca[:k], cb=fl.cb[:k], valid=fl.valid[:k]
    )


@jax.jit
def displacement_check(pos, alive, fl: FarList):
    """Max COM-relative displacement since rebuild — the engine's rebuild
    trigger (list valid while this stays ≤ skin/2)."""
    amask = alive[..., None]
    n_alive = jnp.maximum(jnp.sum(alive.astype(jnp.float32)), 1.0)
    com = jnp.sum(jnp.where(amask, pos, 0.0), axis=(0, 1)) / n_alive
    ddx = (pos[..., 0] - fl.px_ref) - (com[0] - fl.com_ref[0])
    ddy = (pos[..., 1] - fl.py_ref) - (com[1] - fl.com_ref[1])
    d2 = jnp.where(alive, ddx * ddx + ddy * ddy, 0.0)
    return jnp.sqrt(jnp.max(d2))


@jax.jit
def max_relative_speed(vel, alive):
    amask = alive[..., None]
    n_alive = jnp.maximum(jnp.sum(alive.astype(jnp.float32)), 1.0)
    vmean = jnp.sum(jnp.where(amask, vel, 0.0), axis=(0, 1)) / n_alive
    dv = vel - vmean
    v2 = jnp.where(alive, dv[..., 0] ** 2 + dv[..., 1] ** 2, 0.0)
    return jnp.sqrt(jnp.max(v2))


# ---------------------------------------------------------------------------
# per-substep pair processing


def far_gather_windows(
    stack: jax.Array,
    cx_ids: jax.Array,
    cy_ids: jax.Array,
    *,
    c: int,
    w: int,
    h: int,
):
    """Window-gather the 5 state planes for the given chunk coordinates:
    ``stack [5, W, H]`` → ``g [n, 5·c²]`` (field-major rows).

    Chunk-record fetch as a WINDOWED gather straight off the plane
    layout: advanced indexing with [n, c, c] coordinate grids lowers
    to one XLA gather.  Measured (single-jit frame bisection,
    scripts/profile_far2.py): 0.43 ms/substep at 1M incl. the pair math,
    vs 2.6 ms for the former chunk-major table relayout + row gather.
    (A lax.gather of [5, c, c] window SLICES measured 10.9 ms at k=512 —
    TPU lowers slice-mode gather/scatter near-serially.)

    When w or h is not a chunk multiple, a VALID edge chunk's window
    reaches past the plane and XLA's clip-mode gather duplicates the
    last real row/col as live phantom particles whose one-sided
    impulses inject momentum (the antisymmetric reaction scatters into
    the pad and is sliced off).  The in-bounds mask zeroes the gathered
    alive value outside the real extent — phantoms then mask out of the
    pair validity."""
    cc = c * c
    n = cx_ids.shape[0]
    ii = jnp.arange(c, dtype=jnp.int32)
    xi = (cx_ids[:, None] * c + ii[None, :])[:, :, None]  # [n, c, 1]
    yj = (cy_ids[:, None] * c + ii[None, :])[:, None, :]  # [n, 1, c]
    gw = stack[:, xi, yj]  # [5, n, c, c]
    g = gw.transpose(1, 0, 2, 3).reshape(n, 5 * cc)
    in_bounds = ((xi < w) & (yj < h)).reshape(n, cc)
    al = g[:, 4 * cc : 5 * cc] * in_bounds.astype(jnp.float32)
    return jnp.concatenate([g[:, : 4 * cc], al], axis=1)


def far_pair_contributions(
    g: jax.Array,
    fl: FarList,
    cx_ids: jax.Array,
    cy_ids: jax.Array,
    *,
    s: int,
    ff: FarFieldSpec,
    radius,
    dt,
    ecoeff,
    friction,
    world_h: int,
):
    """Exact reference pair math (compute.wgsl:150-168) on a gathered
    window table ``g [2k, 5·c²]`` (rows: k A-side then k B-side chunks).
    Returns per-chunk-window contributions ``[2k, 5, c²]`` (dvx, dvy,
    dax, day, dyn) — A-side rows carry the term, B-side rows its exact
    negation.  Shared by the single-device path and the sharded path
    (parallel/fused_spatial2.py), whose table arrives via psum."""
    c = ff.chunk
    cc = c * c
    k = fl.capacity
    g_px = g[:, 0 * cc : 1 * cc]
    g_py = g[:, 1 * cc : 2 * cc]
    g_vx = g[:, 2 * cc : 3 * cc]
    g_vy = g[:, 3 * cc : 4 * cc]
    g_al = g[:, 4 * cc : 5 * cc]

    # global index planes derived from chunk id (no gather needed);
    # int32 linear index: exact at any lattice size (f32 would lose unit
    # differences past 2^24 elements)
    kk = jnp.arange(cc, dtype=jnp.int32)[None, :]
    g_ix = cx_ids[:, None] * c + kk // c
    g_iy = cy_ids[:, None] * c + kk % c
    g_lin = g_ix * world_h + g_iy

    def halves(x):
        return x[:k], x[k:]

    A = {}
    B = {}
    for name, val in (("px", g_px), ("py", g_py), ("vx", g_vx),
                      ("vy", g_vy), ("al", g_al), ("ix", g_ix),
                      ("iy", g_iy), ("lin", g_lin)):
        A[name], B[name] = halves(val)

    def ax_(x):  # [k, cc] → [k, cc, 1]
        return x[:, :, None]

    def bx_(x):  # [k, cc] → [k, 1, cc]
        return x[:, None, :]

    cheb = jnp.maximum(
        jnp.abs(ax_(A["ix"]) - bx_(B["ix"])),
        jnp.abs(ax_(A["iy"]) - bx_(B["iy"])),
    )
    self_pair = (fl.ca == fl.cb)[:, None, None]
    valid = (
        fl.valid[:, None, None]
        & (ax_(A["al"]) > 0.0) & (bx_(B["al"]) > 0.0)
        & (cheb > s)
        & (~self_pair | (ax_(A["lin"]) < bx_(B["lin"])))
    )

    ddx = bx_(B["px"]) - ax_(A["px"])
    ddy = bx_(B["py"]) - ax_(A["py"])
    dist = jnp.sqrt(ddx * ddx + ddy * ddy)
    r = jnp.float32(radius)
    coincident = valid & (dist == 0.0)
    overlap = valid & (dist > 0.0) & (dist < 2.0 * r)

    co = jnp.where(
        coincident,
        jnp.sign(ax_(A["lin"]) - bx_(B["lin"])).astype(jnp.float32),
        0.0,
    )

    inv = jnp.where(overlap, 1.0 / jnp.where(overlap, dist, 1.0), 0.0)
    nx_, ny_ = ddx * inv, ddy * inv
    rvx = ax_(A["vx"]) - bx_(B["vx"])
    rvy = ax_(A["vy"]) - bx_(B["vy"])
    imp_n = ecoeff * (rvx * nx_ + rvy * ny_)
    max_fric = imp_n * friction
    imp_t = jnp.minimum(jnp.maximum(rvx * -ny_ + rvy * nx_, -max_fric), max_fric)
    pdvx = jnp.where(overlap, -(imp_n * nx_ + imp_t * -ny_), 0.0)
    pdvy = jnp.where(overlap, -(imp_n * ny_ + imp_t * nx_), 0.0)
    clip = (2.0 * r - dist) * 0.5 / (jnp.float32(dt) * jnp.float32(dt))
    pdax = jnp.where(overlap, -nx_ * clip, 0.0)
    pday = jnp.where(overlap, -ny_ * clip, 0.0)

    terms = (pdvx, pdvy, pdax, pday, co)
    # a-side receives the term; b-side the exact negation (antisymmetry)
    return jnp.concatenate(
        [jnp.stack([t.sum(axis=2) for t in terms], axis=1),    # [k, 5, cc]
         jnp.stack([-t.sum(axis=1) for t in terms], axis=1)],  # [k, 5, cc]
        axis=0,
    )


def far_scatter_contributions(
    contrib: jax.Array,
    cx_ids: jax.Array,
    cy_ids: jax.Array,
    *,
    c: int,
    wp: int,
    hp: int,
):
    """Scatter ``contrib [n, 5, c²]`` back to ``[5, wp, hp]`` planes.

    A FLAT element scatter-add: n·c² linear indices per plane
    (slice-mode lax.scatter_add measured ~10× slower — see the gather
    note).  Duplicate chunk ids sum naturally; invalid entries carry
    zero contributions, so their chunk-0 target indices are harmless."""
    cc = c * c
    n = contrib.shape[0]
    kk2 = jnp.arange(cc, dtype=jnp.int32)
    lin_scatter = (
        (cx_ids[:, None] * c + kk2[None, :] // c) * hp
        + (cy_ids[:, None] * c + kk2[None, :] % c)
    ).reshape(-1)  # [n*cc]
    vals = contrib.transpose(1, 0, 2).reshape(5, -1)
    out = jnp.zeros((5, wp * hp), jnp.float32)
    out = jax.vmap(lambda o, v: o.at[lin_scatter].add(v))(out, vals)
    return out.reshape(5, wp, hp)


def far_collision_terms(
    px: jax.Array,
    py: jax.Array,
    vx: jax.Array,
    vy: jax.Array,
    alive: jax.Array,
    fl: FarList,
    *,
    s: int,
    ff: FarFieldSpec,
    radius,
    dt,
    ecoeff,
    friction,
    world_h: int,
):
    """Exact reference pair math (compute.wgsl:150-168) over the candidate
    chunk pairs; returns dense (dvx, dvy, dax, day, dyn) delta planes of
    the *unpadded* [W, H] shape, to be added to the near-field stencil's.

    Pairs are masked to index-chebyshev > ``s`` (near-field's territory)
    and, for self-pairs, to the lower triangle — each unordered pair is
    evaluated once and applied antisymmetrically, the same trick as
    ops/stencil.py::_stencil_collisions.  Composition of
    :func:`far_gather_windows` → :func:`far_pair_contributions` →
    :func:`far_scatter_contributions`."""
    w, h = px.shape
    cwx, cwy, wp, hp = _chunk_dims(w, h, ff)
    c = ff.chunk
    ids = jnp.concatenate([fl.ca, fl.cb])  # [2k]
    cx_ids = (ids // cwy).astype(jnp.int32)
    cy_ids = (ids % cwy).astype(jnp.int32)
    stack = jnp.stack([px, py, vx, vy, alive.astype(jnp.float32)])
    g = far_gather_windows(stack, cx_ids, cy_ids, c=c, w=w, h=h)
    contrib = far_pair_contributions(
        g, fl, cx_ids, cy_ids, s=s, ff=ff, radius=radius, dt=dt,
        ecoeff=ecoeff, friction=friction, world_h=world_h,
    )
    planes = far_scatter_contributions(
        contrib, cx_ids, cy_ids, c=c, wp=wp, hp=hp
    )[:, :w, :h]
    return tuple(planes[i] for i in range(5))


def empty_far_list_at(pos, com, ff: FarFieldSpec) -> FarList:
    """An all-invalid list anchored at the given reference positions —
    what a full rebuild would return when detection found nothing."""
    k = ff.max_pairs
    w, h = pos.shape[0], pos.shape[1]
    return FarList(
        ca=jnp.zeros((k,), jnp.int32),
        cb=jnp.zeros((k,), jnp.int32),
        valid=jnp.zeros((k,), bool),
        n_pairs=jnp.int32(0),
        overflow=jnp.int32(0),
        px_ref=pos[..., 0],
        py_ref=pos[..., 1],
        com_ref=com,
        vx_ref=jnp.zeros((w, h), jnp.float32),
        vy_ref=jnp.zeros((w, h), jnp.float32),
        age=jnp.int32(0),
    )


def empty_far_list(w: int, h: int, ff: FarFieldSpec) -> FarList:
    """An all-invalid list of the spec's capacity, anchored far outside
    the world so the first displacement check always triggers a rebuild
    (self-initialization for the on-device frame)."""
    k = ff.max_pairs
    return FarList(
        ca=jnp.zeros((k,), jnp.int32),
        cb=jnp.zeros((k,), jnp.int32),
        valid=jnp.zeros((k,), bool),
        n_pairs=jnp.int32(0),
        overflow=jnp.int32(0),
        px_ref=jnp.full((w, h), -1.0e9, jnp.float32),
        py_ref=jnp.full((w, h), -1.0e9, jnp.float32),
        com_ref=jnp.zeros((2,), jnp.float32),
        vx_ref=jnp.zeros((w, h), jnp.float32),
        vy_ref=jnp.zeros((w, h), jnp.float32),
        age=jnp.int32(0),
    )
