"""Particle–particle collision pass — TPU equivalents of the collision loop
in ``compute_update`` (/root/reference/src/shaders/compute.wgsl:142-170).

Reference pair math, per live pair ``(i, j)``, reading const prev-substep
state:

- coincident particles (``dist == 0``): ``p.y += sign(i − j)``
  (compute.wgsl:151-153)
- overlap (``dist < 2r``): elastic impulse along the normal with
  coefficient ``(elasticity+1)/2``, tangential friction clamped to
  ``±impulse_normal·friction`` (155-162), and penetration resolved through
  acceleration: ``a −= clip_shift / dt²`` (164-168).

Because the reference reads only const per-pair state, the loop is a pure
sum over partners — exactly vectorizable.  Two broad phases are provided:

- ``allpairs``: the reference's O(N²), tiled with ``lax.scan`` over
  partner blocks so memory stays O(N·tile).  Correctness oracle and
  small-scene path.
- ``grid``: spatial-hash broad phase (counting-sort into fixed-capacity
  cell buckets, 3×3 neighborhood gather) with identical pair math —
  the scalable TPU path (required by BASELINE configs 3-5).

WGSL ``clamp(e, lo, hi)`` is ``min(max(e, lo), hi)`` even when ``lo > hi``
(negative ``impulse_normal``); we reproduce that exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import PhysicsConstants, StaticConfig


def collision_terms(
    pos: jax.Array,
    vel: jax.Array,
    alive: jax.Array,
    consts: PhysicsConstants,
    cfg: StaticConfig,
    *,
    query=None,
):
    """Dispatch on ``cfg.collision_mode``.

    Returns ``(dv [Q,2], da [Q,2], dy [Q])`` — velocity impulse sum,
    acceleration (penetration) sum, and coincident-shift sum for ``p.y``.

    ``query``: optional ``(pos_q, vel_q, alive_q, idx_q)`` — compute terms
    only for these particles (``idx_q`` are their global indices into the
    full arrays).  Used by spatial sharding, where each device evaluates
    its own slab against the gathered world.  Defaults to all particles.
    """
    if query is None:
        n = pos.shape[0]
        query = (pos, vel, alive, jnp.arange(n, dtype=jnp.int32))
    if cfg.collision_mode == "none":
        z2 = jnp.zeros_like(query[0])
        return z2, z2, jnp.zeros(query[0].shape[:1], pos.dtype)
    if cfg.collision_mode == "allpairs":
        return _allpairs(pos, vel, alive, consts, cfg, query)
    if cfg.collision_mode == "grid":
        return _grid(pos, vel, alive, consts, cfg, query)
    if cfg.collision_mode == "window":
        return _window(pos, vel, alive, consts, cfg, query)
    raise ValueError(cfg.collision_mode)


def _pair_terms(
    p_i, v_i, p_j, v_j, valid, consts: PhysicsConstants, cfg: StaticConfig, idx_i, idx_j
):
    """Vectorized compute.wgsl:150-168 for a batch of candidate pairs.

    Shapes: ``p_i/v_i [..., 2]`` broadcast against ``p_j/v_j [..., K, 2]``;
    ``valid [..., K]`` masks partners.  Returns per-pair (dv, da, dy)
    *contributions* (not yet summed over K).
    """
    r = jnp.float32(cfg.particle_radius)
    dt = jnp.float32(cfg.dt)
    d = p_j - p_i[..., None, :]
    dist = jnp.sqrt(jnp.sum(d * d, axis=-1))

    coincident = valid & (dist == 0.0)
    overlap = valid & (dist > 0.0) & (dist < 2.0 * r)

    # compute.wgsl:151-153 — deterministic nudge by index order.
    dy = jnp.where(
        coincident,
        jnp.sign(idx_i[..., None].astype(jnp.float32) - idx_j.astype(jnp.float32)),
        0.0,
    )

    safe_dist = jnp.where(overlap, dist, 1.0)
    normal = d / safe_dist[..., None]
    tangent = jnp.stack([-normal[..., 1], normal[..., 0]], axis=-1)
    rel_v = v_i[..., None, :] - v_j
    ecoeff = (consts.elasticity + 1.0) * 0.5
    imp_n = ecoeff * jnp.sum(rel_v * normal, axis=-1)
    max_fric = imp_n * consts.friction
    # WGSL clamp = min(max(x, lo), hi) — NOT symmetric when lo > hi.
    imp_t = jnp.minimum(jnp.maximum(jnp.sum(rel_v * tangent, axis=-1), -max_fric), max_fric)

    dv = -(imp_n[..., None] * normal + imp_t[..., None] * tangent)
    clip_shift = normal * ((2.0 * r - dist) * 0.5)[..., None]
    da = -clip_shift / (dt * dt)

    ov = overlap[..., None]
    return jnp.where(ov, dv, 0.0), jnp.where(ov, da, 0.0), dy


def _allpairs(pos, vel, alive, consts, cfg, query):
    pos_q, vel_q, alive_q, idx_q = query
    n = pos.shape[0]
    q = pos_q.shape[0]
    tile = min(cfg.collision_tile, n)
    num_tiles = -(-n // tile)
    pad = num_tiles * tile - n
    pos_p = jnp.pad(pos, ((0, pad), (0, 0)))
    vel_p = jnp.pad(vel, ((0, pad), (0, 0)))
    alive_p = jnp.pad(alive, (0, pad))
    idx_p = jnp.arange(num_tiles * tile, dtype=jnp.int32)

    def body(carry, tile_idx):
        dv, da, dy = carry
        sl = tile_idx * tile
        p_j = jax.lax.dynamic_slice_in_dim(pos_p, sl, tile)
        v_j = jax.lax.dynamic_slice_in_dim(vel_p, sl, tile)
        a_j = jax.lax.dynamic_slice_in_dim(alive_p, sl, tile)
        j_idx = jax.lax.dynamic_slice_in_dim(idx_p, sl, tile)
        valid = (
            alive_q[:, None]
            & a_j[None, :]
            & (idx_q[:, None] != j_idx[None, :])
        )
        pdv, pda, pdy = _pair_terms(
            pos_q, vel_q,
            jnp.broadcast_to(p_j[None], (q, tile, 2)),
            jnp.broadcast_to(v_j[None], (q, tile, 2)),
            valid, consts, cfg, idx_q,
            jnp.broadcast_to(j_idx[None], (q, tile)),
        )
        return (dv + pdv.sum(1), da + pda.sum(1), dy + pdy.sum(1)), None

    init = (jnp.zeros_like(pos_q), jnp.zeros_like(pos_q),
            jnp.zeros((q,), pos.dtype))
    (dv, da, dy), _ = jax.lax.scan(
        body, init, jnp.arange(num_tiles, dtype=jnp.int32)
    )
    return dv, da, dy


@functools.lru_cache(maxsize=None)
def _grid_geometry(bounds: float, radius: float):
    cell = 2.0 * radius
    g = max(1, int(-(-bounds // cell)))
    return cell, g


def build_grid(pos, alive, cfg: StaticConfig):
    """Scatter-free cell list: counting-sort particles by cell id, keep
    only the *sorted order* and per-cell start offsets.

    TPU note: XLA lowers scatter poorly (near-serial), while sorts and
    gathers are fast — so the classic "scatter into buckets" step is
    replaced by ``bucket[c, k] = order[starts[c] + k]`` computed lazily by
    the neighbor search as pure gathers.

    Returns ``(order [N] int32 — particle indices sorted by cell,
    starts [G²+2] int32 — per-cell offsets into order, overflow int32)``.
    Cells with more than ``cfg.grid_cell_capacity`` live particles drop
    the excess from candidate lists; the overflow counter is surfaced for
    observability (SURVEY.md §5 metrics).
    """
    k = cfg.grid_cell_capacity
    cell, g = _grid_geometry(cfg.bounds_size, cfg.particle_radius)
    ncells = g * g
    cx = jnp.clip((pos[:, 0] / cell).astype(jnp.int32), 0, g - 1)
    cy = jnp.clip((pos[:, 1] / cell).astype(jnp.int32), 0, g - 1)
    cid = jnp.where(alive, cx * g + cy, jnp.int32(ncells))  # dead → pad cell
    order = jnp.argsort(cid).astype(jnp.int32)
    sorted_cid = cid[order]
    # method='sort' turns the dense-query binary search into one extra
    # sort — ~10x faster than the gather-heavy 'scan' method on TPU
    starts = jnp.searchsorted(
        sorted_cid, jnp.arange(ncells + 2, dtype=jnp.int32), method="sort"
    ).astype(jnp.int32)
    counts = starts[1:-1] - starts[:-2]
    overflow = jnp.sum(jnp.maximum(counts - k, 0))
    return order, starts, overflow


def _grid(pos, vel, alive, consts, cfg, query):
    pos_q, vel_q, alive_q, idx_q = query
    n = pos.shape[0]
    q = pos_q.shape[0]
    k = cfg.grid_cell_capacity
    cell, g = _grid_geometry(cfg.bounds_size, cfg.particle_radius)
    ncells = g * g
    order, starts, _ = build_grid(pos, alive, cfg)

    cx = jnp.clip((pos_q[:, 0] / cell).astype(jnp.int32), 0, g - 1)
    cy = jnp.clip((pos_q[:, 1] / cell).astype(jnp.int32), 0, g - 1)
    offs = jnp.array(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)], jnp.int32
    )
    nx = cx[:, None] + offs[None, :, 0]
    ny = cy[:, None] + offs[None, :, 1]
    in_range = (nx >= 0) & (nx < g) & (ny >= 0) & (ny < g)
    ncell_idx = jnp.where(in_range, nx * g + ny, ncells)  # empty pad cell

    # Packed candidate rows: TPU gather cost is per ROW (~90 M rows/s)
    # and nearly free in row width, so everything a pair needs —
    # pos, vel, alive, original index — travels in ONE [N, 8] gather
    # from the cell-sorted table instead of four separate gathers.
    table = jnp.concatenate(
        [
            pos,
            vel,
            alive.astype(jnp.float32)[:, None],
            jnp.arange(n, dtype=jnp.float32)[:, None],
            jnp.zeros((n, 2), jnp.float32),
        ],
        axis=1,
    )
    table_sorted = table[order]  # one N-row gather

    # candidate slot k of neighbor cell c lives at sorted position
    # starts[c] + k
    c_start = starts[ncell_idx]  # [Q, 9]
    c_count = jnp.minimum(starts[ncell_idx + 1] - c_start, k)
    slot = jnp.arange(k, dtype=jnp.int32)
    cand_pos = c_start[..., None] + slot[None, None, :]  # [Q, 9, K]
    in_cell = slot[None, None, :] < c_count[..., None]
    rows = table_sorted[jnp.clip(cand_pos.reshape(q, 9 * k), 0, n - 1)]
    p_j = rows[..., 0:2]
    v_j = rows[..., 2:4]
    cand_idx = rows[..., 5].astype(jnp.int32)
    valid = (
        in_cell.reshape(q, 9 * k)
        & (rows[..., 4] > 0.0)
        & (cand_idx != idx_q[:, None])
        & alive_q[:, None]
    )
    dv, da, dy = _pair_terms(
        pos_q, vel_q, p_j, v_j, valid, consts, cfg, idx_q, cand_idx
    )
    return dv.sum(1), da.sum(1), dy.sum(1)


def _window(pos, vel, alive, consts, cfg, query):
    """Sliding-window broad phase: the TPU-shaped successor of ``grid``.

    The per-query candidate gather of ``_grid`` costs Q×9×K gather ROWS
    (the TPU gather is priced per row) — the dominant term at 100k.  This
    path exploits the cell sort's spatial coherence instead: particles
    sorted by cell id (row-major cells) have all their true neighbors
    inside ONE contiguous run of sorted positions — the cells between
    rows cx−1 and cx+1.  Blocks of consecutive sorted particles share a
    window, fetched as a single dense dynamic-slice (no gather), and the
    pair math runs block × window with the exact reference semantics
    masked by true distance.  Windows are capped at ``cfg.window_rows``
    sorted rows; truncation is counted (overflow observability) like the
    grid's cell-capacity clipping.

    Sharded queries aren't supported (the spatial-sharding path uses the
    grid); semantics otherwise identical to ``grid``/``allpairs``.
    """
    pos_q, vel_q, alive_q, idx_q = query
    n = pos.shape[0]
    if pos_q.shape[0] != n:
        raise NotImplementedError("window mode supports full-set queries")
    cell, g = _grid_geometry(cfg.bounds_size, cfg.particle_radius)
    ncells = g * g
    bsz = 256
    wrows = cfg.window_rows

    cx = jnp.clip((pos[:, 0] / cell).astype(jnp.int32), 0, g - 1)
    cy = jnp.clip((pos[:, 1] / cell).astype(jnp.int32), 0, g - 1)
    cid = jnp.where(alive, cx * g + cy, jnp.int32(ncells))
    order = jnp.argsort(cid).astype(jnp.int32)
    sorted_cid = cid[order]
    # run boundaries only needed per cell ROW (g+2 queries, not g²)
    row_starts = jnp.searchsorted(
        sorted_cid, jnp.arange(g + 2, dtype=jnp.int32) * g, method="sort"
    ).astype(jnp.int32)

    table = jnp.concatenate(
        [pos, vel, alive.astype(jnp.float32)[:, None],
         jnp.arange(n, dtype=jnp.float32)[:, None],
         jnp.zeros((n, 2), jnp.float32)],
        axis=1,
    )
    table_sorted = table[order]  # one N-row gather

    nb = -(-n // bsz)
    npad = nb * bsz
    table_blocks = jnp.pad(table_sorted, ((0, npad - n), (0, 0)))
    scx = jnp.pad(jnp.clip(sorted_cid // g, 0, g - 1), (0, npad - n))
    # dead/pad rows sort last; give them the last real row's cell so the
    # block bounds stay tight
    scx = jnp.where(jnp.arange(npad) < n, scx, scx[n - 1] if n else 0)
    cx_min = jnp.min(scx.reshape(nb, bsz), axis=1)
    cx_max = jnp.max(scx.reshape(nb, bsz), axis=1)
    win_lo = row_starts[jnp.maximum(cx_min - 1, 0)]
    win_hi = row_starts[jnp.minimum(cx_max + 2, g + 1)]
    overflow = jnp.sum(jnp.maximum(win_hi - win_lo - wrows, 0))

    table_win = jnp.pad(table_blocks, ((0, wrows), (0, 0)))

    def block_terms(b):
        blk = jax.lax.dynamic_slice_in_dim(table_blocks, b * bsz, bsz)
        lo = win_lo[b]
        win = jax.lax.dynamic_slice_in_dim(table_win, lo, wrows)
        in_win = (jnp.arange(wrows, dtype=jnp.int32) + lo) < win_hi[b]
        p_i = blk[:, 0:2]
        v_i = blk[:, 2:4]
        a_i = blk[:, 4] > 0.0
        i_idx = blk[:, 5].astype(jnp.int32)
        p_j = jnp.broadcast_to(win[None, :, 0:2], (bsz, wrows, 2))
        v_j = jnp.broadcast_to(win[None, :, 2:4], (bsz, wrows, 2))
        j_idx = jnp.broadcast_to(
            win[None, :, 5].astype(jnp.int32), (bsz, wrows)
        )
        valid = (
            a_i[:, None]
            & (win[None, :, 4] > 0.0)
            & in_win[None, :]
            & (i_idx[:, None] != j_idx)
        )
        dv, da, dy = _pair_terms(
            p_i, v_i, p_j, v_j, valid, consts, cfg, i_idx, j_idx
        )
        return dv.sum(1), da.sum(1), dy.sum(1)

    dv_s, da_s, dy_s = jax.lax.map(
        block_terms, jnp.arange(nb, dtype=jnp.int32)
    )
    dv_s = dv_s.reshape(npad, 2)[:n]
    da_s = da_s.reshape(npad, 2)[:n]
    dy_s = dy_s.reshape(npad)[:n]
    inv = jnp.argsort(order).astype(jnp.int32)
    return dv_s[inv], da_s[inv], dy_s[inv]


@functools.partial(jax.jit, static_argnames=("cfg",))
def broad_phase_overflow(pos, alive, cfg: StaticConfig):
    """Current broad-phase truncation count for the active collision
    mode (int32 scalar on device).

    - ``grid``: live particles beyond ``grid_cell_capacity`` in their
      cell (those fall out of candidate lists — ``build_grid``'s
      counter);
    - ``window``: sorted-window rows beyond ``window_rows`` across the
      256-particle blocks (the ``_window`` truncation);
    - other modes: 0 (``allpairs`` is exhaustive; ``none`` has no broad
      phase).

    This is the SURVEY §5 metrics hook: the engine surfaces it on
    demand (``Engine.broad_phase_overflow``) rather than threading a
    counter through the hot frame loop — same point-in-time semantics
    as the far-field ``last rebuild`` stats."""
    if cfg.collision_mode == "grid":
        _, _, overflow = build_grid(pos, alive, cfg)
        return overflow
    if cfg.collision_mode != "window":
        return jnp.int32(0)
    # mirror _window's block geometry (kept in lockstep — see there)
    n = pos.shape[0]
    cell, g = _grid_geometry(cfg.bounds_size, cfg.particle_radius)
    ncells = g * g
    bsz = 256
    cx = jnp.clip((pos[:, 0] / cell).astype(jnp.int32), 0, g - 1)
    cy = jnp.clip((pos[:, 1] / cell).astype(jnp.int32), 0, g - 1)
    cid = jnp.where(alive, cx * g + cy, jnp.int32(ncells))
    order = jnp.argsort(cid).astype(jnp.int32)
    sorted_cid = cid[order]
    row_starts = jnp.searchsorted(
        sorted_cid, jnp.arange(g + 2, dtype=jnp.int32) * g, method="sort"
    ).astype(jnp.int32)
    nb = -(-n // bsz)
    npad = nb * bsz
    scx = jnp.pad(jnp.clip(sorted_cid // g, 0, g - 1), (0, npad - n))
    scx = jnp.where(jnp.arange(npad) < n, scx, scx[n - 1] if n else 0)
    cx_min = jnp.min(scx.reshape(nb, bsz), axis=1)
    cx_max = jnp.max(scx.reshape(nb, bsz), axis=1)
    win_lo = row_starts[jnp.maximum(cx_min - 1, 0)]
    win_hi = row_starts[jnp.minimum(cx_max + 2, g + 1)]
    return jnp.sum(jnp.maximum(win_hi - win_lo - cfg.window_rows, 0))
