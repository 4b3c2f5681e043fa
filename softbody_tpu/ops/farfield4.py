"""Far-field v4: fixed-cadence rebuilds + mirror-table pair apply.

Round-3 redesign of the far-field *schedule* and *apply* around measured
facts (scripts/probe_r4*.py, probe_v4g.py — TPU v5e at 1M):

1. **Row gathers/scatters on an interleaved table are nearly free**
   (0.2-0.35 ms for 8-32k wide rows), while the round-2 apply's
   windowed element gather/scatter costs 2-12 ms at the same load.
2. **The [5, W, H] → record relayout is granularity-bound** in XLA:
   2.2 ms at 4-lane granularity, 0.33-0.52 ms at 32-lane granularity.
3. **Small-granularity transposes must not appear per-pair**: the first
   mirror draft's 8-offset select used a (…, 5, 4, 4) transpose and
   cost 2.1 ms at K=4096 (probe_v4g) — the select here is per-field
   slice+reshape only.
4. **The per-particle deviation trigger re-fires every substep at a
   tear front** (probe_fixed: 64/64 rebuilds): any global deviation
   metric is structurally wrong in contact zones, so v4 rebuilds on a
   fixed cadence instead (the Verlet-list contract: extrusion covers
   ``cadence`` substeps of motion; soundness = speed-bound assumption).

Layout: **(4, 32) records, b-major**.  Record row ``b·(W/4) + cx``
holds plane rows ``4cx..4cx+3``, lanes ``[32b, 32b+32)``, as
``[5 fields × 4 rows × 32 lanes]`` = 640 floats.  A (4, 4) candidate
chunk's window always sits in ONE record (4·cy mod 32 ∈ {0,4,…,28}), so
the apply is: one row gather per pair side → one of EIGHT static lane
offsets per field (dense masked selects) → the round-2 pair math
(``ops.farfield.far_pair_contributions``, exact compute.wgsl:150-168
semantics) → inverse placement → one row scatter-add.  B-major row
order makes a fused-kernel producer possible later (each kernel x-slab
writes contiguous row runs per lane block).

Reference anchor: these mirrors stand in for the WebGPU storage buffer
the reference's O(N²) loop reads particles from directly
(/root/reference/src/shaders/compute.wgsl:144-170) — same data, shaped
for the TPU's (8,128) memory system instead of GPU warps.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .farfield import (
    FarFieldSpec,
    FarList,
    crop_far_list,
    far_pair_contributions,
)

MB = 32          # lanes per record block (default; see ``mb=`` params)
RX = 4           # plane rows per record (== FarFieldSpec.chunk)
NF = 5           # px py vx vy alive
REC = NF * RX * MB   # 640 floats per record row (at the default mb)


def _mh(h: int, mb: int = MB) -> int:
    return -(-h // mb) * mb


def mirror_table(planes: jax.Array, *, mb: int = MB) -> jax.Array:
    """``[5, W, H]`` (px, py, vx, vy, alive) → ``[(Hm/mb)·(W/4),
    5·4·mb]`` record table, b-major (row = b·(W/4) + cx).

    ``mb`` is the record lane-block width: 32 is the smallest
    granularity XLA relayouts handle fast (probe_v4g).  Wider blocks
    were measured and REJECTED at 1M (bench_sweep3: far_mb=128 runs
    484.6 vs 568.0 substeps/s) — the 4× wider gather rows and
    two-stage selects cost more than the coarser relayout saves.  The
    knob stays for measurement; default 32."""
    five, w, h = planes.shape
    hm = _mh(h, mb)
    if hm != h:
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, hm - h)))
    nb = hm // mb
    cw = w // RX
    # (f, cx, ix, b, iy) → (b, cx, f, ix, iy)
    t = planes.reshape(NF, cw, RX, nb, mb).transpose(3, 1, 0, 2, 4)
    return t.reshape(nb * cw, NF * RX * mb)


def unmirror_table(table: jax.Array, *, w: int, h: int,
                   mb: int = MB) -> jax.Array:
    """Inverse of :func:`mirror_table` (delta tables → delta planes)."""
    hm = _mh(h, mb)
    nb = hm // mb
    cw = w // RX
    t = table.reshape(nb, cw, NF, RX, mb).transpose(2, 1, 3, 0, 4)
    planes = t.reshape(NF, w, hm)
    return planes[:, :, :h]


def far_terms_from_mirror(
    table: jax.Array,
    fl: FarList,
    *,
    s: int,
    ff: FarFieldSpec,
    radius,
    dt,
    ecoeff,
    friction,
    w: int,
    h: int,
    mb: int = MB,
    mb_out: Optional[int] = None,
):
    """Pair apply against a (4,mb)-record mirror: returns a
    ``[Cm', 5·4·mb_out]`` DELTA table (``dvx dvy dax day dyn`` in the
    record layout, lane-block ``mb_out``, default ``mb``).  One
    gathered row per pair side; per-field offset selects
    (slice+reshape only — no small-granularity transpose).  For
    ``mb > 32`` the selects run in two stages — coarse 32-lane
    sub-block (mb/32 cases), then the fine 8-case chunk offset — so a
    128-lane record costs 4+8 selects per side, not 32.

    ``mb_out`` decouples the scatter/unmirror side from the gather
    side.  Measured verdict (probe_r5e, 1M tear): ``mb_out=128`` LOSES
    — 1.589 vs 0.795 ms at K=2048 — the 4× wider scatter rows and
    placement selects cost ~3× what the coarser unmirror saves
    (unmirror alone is 0.28 ms of the 0.795).  Kept as a measurement
    knob; both defaults stay 32."""
    c = ff.chunk
    assert c == RX, "v4 mirror assumes 4x4 chunks"
    assert mb % 32 == 0, "record lane block must be a multiple of 32"
    cc = c * c
    k = fl.capacity
    hm = _mh(h, mb)
    nb = hm // mb
    cw = w // RX
    cwy = h // c                      # 4x4 chunk grid minor dim
    rec = NF * RX * mb

    ids = jnp.concatenate([fl.ca, fl.cb])          # [2k] 4x4 chunk ids
    cx = ids // cwy
    cy = ids % cwy
    lane0 = cy * c
    blk = lane0 // mb
    off = lane0 % mb                                # ∈ {0,4,...,mb-4}
    o32 = off % 32                                  # fine: chunk in sub-block
    b32 = off - o32                                 # coarse: 32-lane sub-block

    row_ids = blk * cw + cx                         # [2k] — ONE row/side
    gathered = table[row_ids]                       # [2k, rec]
    n2k = ids.shape[0]
    g4 = gathered.reshape(n2k, NF, RX, mb)

    # ---- coarse select (mb > 32 only): [.., mb] → [.., 32] ----
    if mb > 32:
        g32 = jnp.zeros((n2k, NF, RX, 32), jnp.float32)
        for o in range(0, mb, 32):
            g32 = g32 + jnp.where((b32 == o)[:, None, None, None],
                                  g4[:, :, :, o : o + 32], 0.0)
    else:
        g32 = g4

    # ---- per-field static 8-offset select → g fields [2k, cc] each ----
    fields = []
    for f in range(NF):
        acc = jnp.zeros((n2k, cc), jnp.float32)
        for o in range(0, 32, c):
            v = g32[:, f, :, o : o + c].reshape(n2k, cc)
            acc = acc + jnp.where((o32 == o)[:, None], v, 0.0)
        fields.append(acc)
    g = jnp.concatenate(fields, axis=1)             # [2k, 5*cc]

    contrib = far_pair_contributions(
        g, fl, cx, cy, s=s, ff=ff, radius=radius, dt=dt,
        ecoeff=ecoeff, friction=friction, world_h=hm,
    )                                               # [2k, 5, cc]

    # ---- inverse placement: [2k, 5, cc] → [2k, rec_out] rows ----
    mo = mb if mb_out is None else mb_out
    assert mo % 32 == 0, "output lane block must be a multiple of 32"
    rec_out = NF * RX * mo
    off_o = lane0 % mo
    o32_o = off_o % 32
    b32_o = off_o - o32_o
    blk_o = lane0 // mo
    row_ids_o = blk_o * cw + cx

    cb4 = contrib.reshape(n2k, NF, c, c)
    d32 = jnp.zeros((n2k, NF, RX, 32), jnp.float32)
    for o in range(0, 32, c):
        placed = jnp.pad(cb4, ((0, 0), (0, 0), (0, 0),
                               (o, 32 - c - o)))
        d32 = d32 + jnp.where((o32_o == o)[:, None, None, None],
                              placed, 0.0)
    if mo > 32:
        drows = jnp.zeros((n2k, NF, RX, mo), jnp.float32)
        for o in range(0, mo, 32):
            placed = jnp.pad(d32, ((0, 0), (0, 0), (0, 0),
                                   (o, mo - 32 - o)))
            drows = drows + jnp.where((b32_o == o)[:, None, None, None],
                                      placed, 0.0)
    else:
        drows = d32

    cm_o = (_mh(h, mo) // mo) * cw
    dtab = jnp.zeros((cm_o, rec_out), jnp.float32)
    dtab = dtab.at[row_ids_o].add(drows.reshape(n2k, rec_out))
    return dtab


def bucketed_far_delta_from_fn(
    planes5_fn,
    fl: FarList,
    *,
    s: int,
    ff: FarFieldSpec,
    radius,
    dt,
    ecoeff,
    friction,
    w: int,
    h: int,
    buckets: Tuple[int, ...] = (1024, 4096),
    mb: int = MB,
    mb_out: Optional[int] = None,
    table: Optional[jax.Array] = None,
    as_table: bool = False,
):
    """Core bucketed apply over a DEFERRED plane source: crop the pair
    list to the smallest capacity bucket ≥ n_pairs so light frames
    don't pay full-capacity cost; returns dense delta planes
    ``[5, w, h]`` (zero when no pairs).  ``planes5_fn() -> [5, w, h]``
    (px, py, vx, vy, alive) is called INSIDE the non-empty branches, so
    whatever stacking/slicing it does costs nothing on pair-free
    substeps.

    ``table``: a pre-built ``[Cm, 640]`` mirror of the SAME state the
    planes describe (the fused kernel's "kmirror" side output) — the
    mirror buckets then skip their ``mirror_table`` relayout
    (~0.185 ms/substep at 1M, probe_r5e) and gather straight from it.
    The narrow small-bucket path keeps reading planes: its win is
    skipping the fixed unmirror, which a pre-built gather table does
    not remove.

    ``as_table`` (kvar "krec"; requires ``table``): return the DELTA
    record table ``[Cm, 640]`` instead of planes — the fused kernel
    consumes it directly and the unmirror disappears.  With both
    relayouts free, the mirror path is cheapest at EVERY bucket (cost
    ∝ gathered rows), so the narrow small-bucket variant is skipped;
    when a custom ladder has buckets ≤ 256 this changes the f32
    scatter-add order vs the planes mode (same set of contributions)."""
    # explicit raises (not asserts): these contract checks must survive
    # ``python -O`` — a caller passing mb!=32 with a pre-built table
    # would otherwise silently gather from a mislaid table
    if table is not None and mb != MB:
        raise ValueError("pre-built mirror tables are mb=32 layout")
    if as_table:
        if table is None:
            raise ValueError("as_table needs a pre-built mirror")
        if mb_out not in (None, MB):
            raise ValueError("as_table emits mb=32 delta records")
    # chunk-id decode (cx = id // (h // chunk)) matches the rebuild's
    # TILE-PADDED chunk-grid encoding only under these alignments
    if h % (ff.chunk * ff.tile_chunks) != 0:
        raise ValueError(
            f"far apply needs h ({h}) % chunk*tile_chunks "
            f"({ff.chunk * ff.tile_chunks}) == 0 (chunk-id encode/decode)")
    if w % ff.chunk != 0:
        raise ValueError(f"far apply needs w ({w}) % chunk == 0")
    all_buckets = tuple(b for b in buckets if b < ff.max_pairs) + (
        ff.max_pairs,
    )

    def apply_k(k, _):
        flk = crop_far_list(fl, k)
        kwargs = dict(s=s, ff=ff, radius=radius, dt=dt, ecoeff=ecoeff,
                      friction=friction, w=w, h=h)
        if k <= 256 and not as_table:
            # narrow-row variant: traffic ∝ K (40 rows/pair), no
            # relayout.  Scan-amortized 1M measurements (probe_r5b;
            # earlier per-call timings were dispatch-bound): narrow
            # 1.24 ms @1024 / 1.92 @2048 vs mirror 0.57 @2048 /
            # 0.74 @4096 — the mirror's fixed relayout (~0.5 ms)
            # beats narrow's row traffic well below 1k pairs, so
            # narrow only pays for near-empty buckets
            return far_delta_planes_narrow(planes5_fn(), flk, **kwargs)
        t = (mirror_table(planes5_fn(), mb=mb) if table is None
             else table)
        dtab = far_terms_from_mirror(t, flk, mb=mb, mb_out=mb_out,
                                     **kwargs)
        if as_table:
            return dtab
        return unmirror_table(dtab, w=w, h=h,
                              mb=mb if mb_out is None else mb_out)

    bidx = sum(
        (fl.n_pairs > jnp.int32(b)).astype(jnp.int32)
        for b in all_buckets[:-1]
    )
    if as_table:
        cm = (_mh(h, MB) // MB) * (w // RX)
        branches = [lambda _: jnp.zeros((cm, REC), jnp.float32)]
    else:
        branches = [lambda _: jnp.zeros((NF, w, h), jnp.float32)]
    for b in all_buckets:
        branches.append(functools.partial(apply_k, b))
    return jax.lax.switch(
        (fl.n_pairs > 0).astype(jnp.int32) * (bidx + 1), branches, None
    )


def bucketed_far_delta_planes(
    hot: jax.Array,
    alive_f: jax.Array,
    fl: FarList,
    *,
    s: int,
    ff: FarFieldSpec,
    radius,
    dt,
    ecoeff,
    friction,
    w: int,
    h: int,
    plane_idx: Tuple[int, int, int, int] = (0, 1, 2, 3),
    pad: Tuple[int, int] = (0, 0),
    buckets: Tuple[int, ...] = (1024, 4096),
    mb: int = MB,
    mb_out: Optional[int] = None,
    table: Optional[jax.Array] = None,
    as_table: bool = False,
):
    """Bucketed apply over the PACKED hot stack (``plane_idx`` = the
    px/py/vx/vy rows, ``pad`` = the stack's interior offset) plus the
    interior alive plane — interior slicing and the 20 MB planes5 stack
    both run inside the non-empty branches
    (:func:`bucketed_far_delta_from_fn`).  ``table``: optional
    pre-built mirror of the same state (kernel "kmirror" output);
    ``as_table``: return delta records instead of planes (krec)."""
    ipx, ipy, ivx, ivy = plane_idx
    pw, ph = pad

    def planes5_fn():
        def interior(p):
            return jax.lax.slice(p, (pw, ph), (pw + w, ph + h))

        return jnp.stack([
            interior(hot[ipx]), interior(hot[ipy]),
            interior(hot[ivx]), interior(hot[ivy]), alive_f,
        ])

    return bucketed_far_delta_from_fn(
        planes5_fn, fl, s=s, ff=ff, radius=radius, dt=dt, ecoeff=ecoeff,
        friction=friction, w=w, h=h, buckets=buckets, mb=mb,
        mb_out=mb_out, table=table, as_table=as_table,
    )


def far_delta_planes_narrow(
    planes5: jax.Array,
    fl: FarList,
    *,
    s: int,
    ff: FarFieldSpec,
    radius,
    dt,
    ecoeff,
    friction,
    w: int,
    h: int,
):
    """Mirror-free apply variant for SMALL pair buckets: gathers each
    pair side's window as 20 narrow rows (5 fields × 4 plane rows × 32
    lanes) straight from a reshaped plane view, and scatter-adds the
    delta segments back the same way — no relayout at either end.

    Cost model (probe_r4/probe_v4h): narrow-row traffic scales with K
    (20 rows/side), the mirror path pays a fixed ~0.7 ms
    relayout+unrelayout — so narrow wins below ~2k pairs and loses
    above; :func:`bucketed_far_delta_planes` picks per bucket.
    Returns dense delta planes ``[5, w, h]``."""
    c = ff.chunk
    cc = c * c
    k = fl.capacity
    hm = _mh(h)
    nb = hm // MB
    cwy = h // c

    pv = planes5
    if hm != h:
        pv = jnp.pad(pv, ((0, 0), (0, 0), (0, hm - h)))
    view = pv.reshape(NF * w * nb, MB)

    ids = jnp.concatenate([fl.ca, fl.cb])
    n2k = ids.shape[0]
    cx = ids // cwy
    cy = ids % cwy
    lane0 = cy * c
    blk = lane0 // MB
    off = lane0 % MB

    fidx = jnp.arange(NF, dtype=jnp.int32)[None, :, None]
    ridx = (cx[:, None, None] * c
            + jnp.arange(c, dtype=jnp.int32)[None, None, :])
    rows = (fidx * w + ridx) * nb + blk[:, None, None]   # [2k, 5, 4]
    seg = view[rows.reshape(-1)].reshape(n2k, NF, c, MB)

    # 8-offset static select → window fields [2k, 5, 4, 4]
    win = jnp.zeros((n2k, NF, c, c), jnp.float32)
    for o in range(0, MB, c):
        v = seg[:, :, :, o : o + c]
        win = win + jnp.where((off == o)[:, None, None, None], v, 0.0)
    g = win.reshape(n2k, NF * cc)

    contrib = far_pair_contributions(
        g, fl, cx, cy, s=s, ff=ff, radius=radius, dt=dt,
        ecoeff=ecoeff, friction=friction, world_h=hm,
    )

    cb4 = contrib.reshape(n2k, NF, c, c)
    dseg = jnp.zeros((n2k, NF, c, MB), jnp.float32)
    for o in range(0, MB, c):
        placed = jnp.pad(cb4, ((0, 0), (0, 0), (0, 0),
                               (o, MB - c - o)))
        dseg = dseg + jnp.where((off == o)[:, None, None, None],
                                placed, 0.0)

    out = jnp.zeros((NF * w * nb, MB), jnp.float32)
    out = out.at[rows.reshape(-1)].add(dseg.reshape(-1, MB))
    return out.reshape(NF, w, hm)[:, :, :h]
