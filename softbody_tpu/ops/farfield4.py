"""Far-field v4: fixed-cadence rebuilds + mirror-table pair apply.

Round-3 redesign of the far-field *schedule* and *apply* around three
measured facts (scripts/probe_r4*.py, TPU v5e at 1M):

1. **Row gathers/scatters on an interleaved table are nearly free**
   (0.21 ms for 32k 80-wide row gathers; 0.33 ms for 16k row
   scatter-adds), while the round-2 apply's windowed element
   gather/scatter costs 2-12 ms at the same load.
2. **The [5, W, H] → chunk-record relayout is granularity-bound** in
   XLA: 2.2 ms at 4-lane granularity but **0.33 ms at (1, 32)** — one
   plane row × 32 lanes per record block.
3. **The per-particle deviation trigger re-fires every substep at a
   tear front** (64/64 rebuilds, probe_fixed section I): any global
   deviation metric is structurally wrong in contact zones, where
   resolver impulses perturb velocities every substep.

So v4:

- **mirror tables** ``[Cm, 160]`` at (1, 32) granularity (5 fields ×
  32 lanes: ``px py vx vy alive``), rebuilt per substep by a pure-XLA
  relayout (measured 0.33 ms each way);
- **pairs stay (4, 4) chunks** (pair-test economics: a 4×4 window pair
  is 256 tests; detection, annulus, tiles, and compaction are the
  round-2 machinery in ops/farfield.py, unchanged);  the granularity
  bridge: a 4×4 window's 4 lanes always sit inside ONE 32-lane mirror
  block (4·cy mod 32 ∈ {0,4,…,28}), so the apply gathers 4 mirror rows
  per side and selects one of EIGHT static lane offsets — dense masked
  selects, no dynamic slicing;
- **no trigger**: the frame rebuilds the candidate list every
  ``cadence`` substeps unconditionally (lax.scan over
  [rebuild → cadence × substep] blocks), with the detection's
  velocity extrusion covering ``cadence`` substeps of motion plus an
  isotropic safety term for impulse-induced velocity changes.  This is
  the standard Verlet-list contract (soundness = speed-bound
  assumption, stated in FarFieldSpec): no per-substep trigger cost, no
  lax.cond graph duplication, and rebuild cost is amortized by
  construction instead of hoped-for.

Reference semantics anchor: the pair math itself is
``ops.farfield.far_pair_contributions`` — the exact compute.wgsl:150-168
impulse/friction/declip terms — applied antisymmetrically per unordered
pair, every substep, like the reference's O(N²) loop
(/root/reference/src/shaders/compute.wgsl:144-170).
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

MB = 32          # mirror block: lanes per (1, 32) record block
NF = 5           # px py vx vy alive
REC = NF * MB    # 160 floats per mirror row


def _mh(h: int) -> int:
    """Mirror lane dimension: h rounded up to a 32-lane multiple."""
    return -(-h // MB) * MB


def mirror_table(planes: jax.Array) -> jax.Array:
    """``[5, W, H]`` (px, py, vx, vy, alive) → ``[W·(Hm/32), 160]``
    mirror table; row ``x·(Hm/32) + b`` holds plane row ``x``, lanes
    ``[32b, 32b+32)``, fields interleaved per block.  Pure XLA — the
    (…, 32)-granular transpose runs at ~0.33 ms for 1M (probe_r4c)."""
    five, w, h = planes.shape
    hm = _mh(h)
    if hm != h:
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, hm - h)))
    nb = hm // MB
    t = planes.reshape(NF, w, nb, MB).transpose(1, 2, 0, 3)
    return t.reshape(w * nb, REC)


def unmirror_table(table: jax.Array, *, w: int, h: int) -> jax.Array:
    """Inverse of :func:`mirror_table` (delta tables → delta planes)."""
    hm = _mh(h)
    nb = hm // MB
    t = table.reshape(w, nb, NF, MB).transpose(2, 0, 1, 3)
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
):
    """Pair apply against a mirror table: returns a ``[Cm, 160]`` DELTA
    table (fields ``dvx dvy dax day dyn`` in the mirror block layout).

    Pipeline (all dense / row-granular — measured costs at 1M in the
    docstring above): gather 4 mirror rows per pair side → static
    8-offset lane select → :func:`~.farfield.far_pair_contributions`
    (unchanged round-2 pair math) → inverse placement → one row
    scatter-add."""
    c = ff.chunk
    assert c == 4, "v4 mirror bridge assumes 4x4 chunks"
    cc = c * c
    k = fl.capacity
    hm = _mh(h)
    nb = hm // MB
    cwy = h // c                      # 4x4 chunk grid minor dim

    ids = jnp.concatenate([fl.ca, fl.cb])          # [2k] 4x4 chunk ids
    cx = ids // cwy
    cy = ids % cwy
    lane0 = cy * c                                  # 0..h-4
    blk = lane0 // MB                               # mirror block
    off = lane0 % MB                                # ∈ {0,4,...,28}

    # ---- gather: 4 mirror rows per side ----
    rows = (cx[:, None] * c + jnp.arange(c, dtype=jnp.int32)[None, :])
    row_ids = rows * nb + blk[:, None]              # [2k, 4]
    gathered = table[row_ids.reshape(-1)].reshape(-1, c, REC)  # [2k,4,160]

    # ---- static 8-offset lane select → window g [2k, 5*cc] ----
    # variant o: lanes [o, o+4) of each 32-block, all 5 fields
    n2k = ids.shape[0]
    sel = jnp.zeros((n2k, NF, c, c), jnp.float32)
    for o in range(0, MB, c):
        # [2k, 4(ix), 5, 4(iy)] → [2k, 5, 4, 4]
        v = gathered.reshape(n2k, c, NF, MB)[:, :, :, o : o + c]
        v = v.transpose(0, 2, 1, 3)
        sel = sel + jnp.where((off == o)[:, None, None, None], v, 0.0)
    g = sel.reshape(n2k, NF * cc)

    contrib = far_pair_contributions(
        g, fl, cx, cy, s=s, ff=ff, radius=radius, dt=dt,
        ecoeff=ecoeff, friction=friction, world_h=hm,
    )                                               # [2k, 5, cc]

    # ---- inverse placement: [2k, 5, 4, 4] → [2k, 4, 160] rows ----
    cb = contrib.reshape(n2k, NF, c, c).transpose(0, 2, 1, 3)
    # pad iy (4) → MB (32) at each offset variant, masked-summed
    drows = jnp.zeros((n2k, c, NF, MB), jnp.float32)
    for o in range(0, MB, c):
        placed = jnp.pad(cb, ((0, 0), (0, 0), (0, 0), (o, MB - c - o)))
        drows = drows + jnp.where(
            (off == o)[:, None, None, None], placed, 0.0
        )
    drows = drows.reshape(n2k, c, REC)

    cm = table.shape[0]
    dtab = jnp.zeros((cm, REC), jnp.float32)
    dtab = dtab.at[row_ids.reshape(-1)].add(drows.reshape(-1, REC))
    return dtab


def bucketed_far_delta_planes(
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
    buckets: Tuple[int, ...] = (1024, 4096),
):
    """Bucketed apply: crop the pair list to the smallest capacity
    bucket ≥ n_pairs so light frames don't pay full-capacity cost;
    returns dense delta planes ``[5, w, h]`` (zero when no pairs)."""
    all_buckets = tuple(b for b in buckets if b < ff.max_pairs) + (
        ff.max_pairs,
    )

    def apply_k(k, _):
        flk = crop_far_list(fl, k)
        dtab = far_terms_from_mirror(
            table, flk, s=s, ff=ff, radius=radius, dt=dt,
            ecoeff=ecoeff, friction=friction, w=w, h=h,
        )
        return unmirror_table(dtab, w=w, h=h)

    bidx = sum(
        (fl.n_pairs > jnp.int32(b)).astype(jnp.int32)
        for b in all_buckets[:-1]
    )
    branches = [lambda _: jnp.zeros((NF, w, h), jnp.float32)]
    for b in all_buckets:
        branches.append(functools.partial(apply_k, b))
    return jax.lax.switch(
        (fl.n_pairs > 0).astype(jnp.int32) * (bidx + 1), branches, None
    )
