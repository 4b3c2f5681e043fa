"""Planified general-topology engine: arbitrary beam graphs on the
dense stencil path — the TPU-native answer to BASELINE config 3's
"arbitrary topology" capability (reference: the kernel treats any beam
graph uniformly, compute.wgsl:96-131; editor scenes, editor.ts:4-884).

The problem with list-shaped topology on TPU: XLA gathers sustain only
~90M rows/s, so a flat beam pass at 100k particles / 400k beams costs
milliseconds per substep no matter how it is arranged (measured history
in ROADMAP.md: 20.6 → 36.5 substeps/s).  The dense lattice engine
(ops/stencil.py) is two orders of magnitude faster because its edges
are CONSTANT INDEX OFFSETS — rolls instead of gathers.

So the general path makes arbitrary graphs lattice-shaped: **embed the
particles into a [W, H] plane by spatial position**.  Physical beams
connect spatially-near particles (they were built by an editor or a
mesh generator over 2D geometry), so after a geometry-preserving
embedding almost every beam becomes a SMALL index offset.  Beams then
split into:

- **dense classes**: one :class:`~.stencil.EdgeClass` plane set per
  distinct offset ``(dx, dy)`` within ``dense_reach`` — evaluated by
  the generalized ``lattice_substep`` stencil loop (pure VPU rolls);
- **exception beams**: the tail that didn't embed locally (long beams,
  slot conflicts) — a tiny flat list evaluated with 2 gathers + 2
  int32 scatter-adds and merged into the SAME fixed-point accumulator,
  so the total force stays one commutative integer sum, bit-identical
  to the reference's atomic accumulation (compute.wgsl:68-70,127-130).

The embedding (host-side, one-time per scene):

1. equal-count column partition: sort by x, split into W columns;
2. within each column, sort by y and assign rows monotonically,
   pulling each particle toward its proportional y-position — row
   order equals y order, so y-neighbors land in nearby rows;
3. classify beam offsets; the frequent local ones become dense
   classes, the rest exceptions.

Collisions ride the existing dense collision stencil unchanged: the
embedding preserves spatial adjacency, so contact partners sit within
a small Chebyshev radius of plane cells (``collision_stencil`` sized
from the embedding's measured dilation); index-distant fold contacts
use the far-field machinery (ops/farfield.py), which is layout-
agnostic.  Integration/border semantics come from the shared
``_integrate_components`` — byte-identical behavior to the flat path.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import (
    BEAM_STRESS_SCALE,
    PARTICLE_FORCE_SCALE,
    PhysicsConstants,
    StaticConfig,
    UserInput,
)
from ..state import SimState
from .stencil import EdgeClass, LatticeSpec, LatticeState, lattice_substep


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ExceptionBeams:
    """Flat residual beams the embedding could not make local.
    ``ia``/``ib`` are linear plane cell ids; arrays are padded to a
    static capacity with ``alive=False`` tails."""

    ia: jax.Array            # [E] i32 linear cell of endpoint a
    ib: jax.Array            # [E] i32 linear cell of endpoint b
    length: jax.Array        # [E] f32
    target_length: jax.Array
    last_length: jax.Array
    spring: jax.Array
    damp: jax.Array
    yield_strain: jax.Array
    strain_limit: jax.Array
    strain: jax.Array
    stress: jax.Array
    alive: jax.Array         # [E] bool

    @property
    def capacity(self) -> int:
        return self.ia.shape[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PlanifiedState:
    """Plane-embedded world: the dense lattice state plus the exception
    beam list."""

    lat: LatticeState
    x: ExceptionBeams

    @property
    def pos(self):
        """Plane-shaped positions (CLI/profiling sync hook parity with
        SimState/LatticeState)."""
        return self.lat.pos


@dataclasses.dataclass(frozen=True)
class PlanifyAux:
    """Host-side extraction maps (NOT a jit argument).

    ``cell_of[p]`` = linear plane cell of particle p;
    ``beam_class[m]``/``beam_cell[m]`` = (dense class index, anchor
    cell) per original beam, or class −1 and an exception-slot index in
    ``beam_cell`` for exception beams."""

    width: int
    height: int
    cell_of: np.ndarray
    beam_class: np.ndarray
    beam_cell: np.ndarray
    n_exceptions: int


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _assign_cells(pos: np.ndarray, w: int, h: int) -> np.ndarray:
    """Equal-count column partition + globally-aligned monotone rows.

    Rows target a GLOBAL y→row map (same scale in every column) so that
    y-neighbors in adjacent columns land on nearby rows — per-column
    scaling would misalign columns with different occupancy and turn
    horizontal beams into large-dy offsets."""
    n = pos.shape[0]
    order_x = np.argsort(pos[:, 0], kind="stable")
    cell_of = np.full(n, -1, np.int64)
    per_col = -(-n // w)
    if per_col > h:
        raise ValueError(f"plane {w}x{h} too small for {n} particles")
    ymin = float(pos[:, 1].min())
    yspan = max(float(pos[:, 1].max()) - ymin, 1e-6)
    for cx in range(w):
        col = order_x[cx * per_col : (cx + 1) * per_col]
        if col.size == 0:
            continue
        col = col[np.argsort(pos[col, 1], kind="stable")]
        desired = ((pos[col, 1] - ymin) / yspan * (h - 1)).astype(np.int64)
        ar = np.arange(col.size, dtype=np.int64)
        # strictly-increasing rows ≥ desired: subtract rank, running
        # max, add rank back (max.accumulate alone would duplicate rows
        # and silently overwrite plane cells)
        rows = np.maximum.accumulate(desired - ar) + ar
        if int(rows[-1]) > h - 1:
            rows = np.minimum(rows, h - col.size + ar)
        cell_of[col] = cx * h + rows
    return cell_of


def _classify(cell_of: np.ndarray, ba: np.ndarray, bb: np.ndarray,
              h: int, dense_reach: int):
    """Vectorized beam classification for a given embedding.

    Returns ``(is_exc, odx, ody, anchor)`` where ``is_exc`` marks beams
    that are non-local OR lose a dense-slot conflict (two beams on the
    same (offset, anchor) cell — only one can live in a plane slot)."""
    ca, cb = cell_of[ba], cell_of[bb]
    dx = ca // h - cb // h
    dy = ca % h - cb % h
    flip = (dx > 0) | ((dx == 0) & (dy > 0))
    anchor = np.where(flip, cb, ca)
    odx = np.where(flip, dx, -dx)
    ody = np.where(flip, dy, -dy)
    local = ((np.abs(odx) <= dense_reach) & (np.abs(ody) <= dense_reach)
             & ((odx != 0) | (ody != 0)))
    # slot-conflict: first beam (in input order) keeps the slot
    r = dense_reach
    kid = (odx + r) * (2 * r + 1) + (ody + r)
    sid = kid.astype(np.int64) * np.int64(cell_of.size + h) + anchor
    is_exc = ~local
    li = np.where(local)[0]
    if li.size:
        _, first = np.unique(sid[li], return_index=True)
        keep = np.zeros(li.size, bool)
        keep[first] = True
        is_exc[li[~keep]] = True
    return is_exc, odx, ody, anchor


def planify(state: SimState, *, dense_reach: int = 3,
            slack: float = 1.35, lane_multiple: int = 8,
            exception_pad: int = 32, collision_stencil: int = 2,
            width: Optional[int] = None, chunk_multiple: int = 1):
    """Embed a SimState into a plane layout.

    Returns ``(PlanifiedState, LatticeSpec, PlanifyAux)``.  Host-side
    (NumPy) — runs once per scene/snapshot load, like the reference's
    buffer (re)build on SNAPSHOT_LOAD (engineWorker.ts:532-538).
    Candidate plane widths around the aspect-matched square are scored
    by exception count and the best embedding wins (mesh scenes with a
    natural lattice width then recover it near-exactly).
    """
    pos = np.asarray(state.pos, np.float64)
    alive = np.asarray(state.particle_alive)
    n = pos.shape[0]

    # ---- plane dims: near-square in world aspect, with cell slack ----
    live = np.where(alive)[0]
    span = (pos[live].max(axis=0) - pos[live].min(axis=0)) if live.size \
        else np.ones(2)
    aspect = max(float(span[0]) / max(float(span[1]), 1e-6), 1e-3)
    ba = np.asarray(state.beam_a, np.int64)
    bb = np.asarray(state.beam_b, np.int64)
    balive = np.asarray(state.beam_alive)

    # ``chunk_multiple``: far-armed embeddings need chunk-grid-aligned
    # dims for the v4 apply's chunk-id decode (farfield4): the LANE dim
    # must be a multiple of chunk·tile_chunks (the decode's cwy = h//4
    # must equal the rebuild's tile-padded chunk grid), while the width
    # only needs the 4-row record alignment — rounding w any harder
    # shifts the cell mapping and explodes the exception-beam count
    # (measured: w 636→848 cost 1.8k→23k exceptions on config 3)
    cm = max(1, chunk_multiple)
    w0 = max(4, int(round(np.sqrt(n * aspect))))
    cands = [w0, _round_up(w0, 4)] if width is None else [width]
    for f in (0.85, 1.0, 1.15):
        cands.append(max(4, _round_up(int(w0 * f * np.sqrt(slack)), 4)))
    if cm > 1:
        cands = [_round_up(c, 4) for c in cands]
    lane_multiple = max(lane_multiple, cm)
    best = None
    wh = []
    for w in sorted(set(cands)):
        h_slack = max(lane_multiple,
                      _round_up(max(-(-int(n * slack) // w), -(-n // w)),
                                lane_multiple))
        h_exact = max(lane_multiple, _round_up(-(-n // w), lane_multiple))
        # exact fit first: lattice-like scenes embed perfectly there
        # (slack-stretched rows truncate unevenly → dense-slot conflicts)
        wh += [(w, h_exact)] + ([(w, h_slack)] if h_slack != h_exact
                                else [])
    for w, h in wh:
        try:
            cell_of = _assign_cells(pos, w, h)
        except ValueError:
            continue
        is_exc, *_ = _classify(cell_of, ba[balive], bb[balive], h,
                               dense_reach)
        # stretch = empty rows inserted inside occupied column spans;
        # row dilation shrinks the collision stencil's PHYSICAL reach
        # (index-radius is fixed), so compactness is worth trading a
        # few exception beams for
        cols, rows = cell_of // h, cell_of % h
        stretch = 0
        for cx in range(w):
            r = rows[cols == cx]
            if r.size:
                stretch += int(r.max() - r.min() + 1 - r.size)
        score = float(is_exc.sum()) + 0.25 * stretch
        if best is None or score < best[0]:
            best = (score, w, h, cell_of)
        if score == 0:
            break
    if best is None:
        raise ValueError("no feasible plane embedding")
    _, w, h, cell_of = best

    # ---- plane-shaped particle state ----
    def plane_f(vals, fill=0.0):
        out = np.full(w * h, fill, np.float32)
        out[cell_of] = np.asarray(vals, np.float32)
        return jnp.asarray(out.reshape(w, h))

    def plane_b(vals):
        out = np.zeros(w * h, bool)
        out[cell_of] = np.asarray(vals)
        return jnp.asarray(out.reshape(w, h))

    pos_np = np.asarray(state.pos, np.float32)
    vel_np = np.asarray(state.vel, np.float32)
    acc_np = np.asarray(state.acc, np.float32)
    ppos = jnp.stack([plane_f(pos_np[:, 0]), plane_f(pos_np[:, 1])], -1)
    pvel = jnp.stack([plane_f(vel_np[:, 0]), plane_f(vel_np[:, 1])], -1)
    pacc = jnp.stack([plane_f(acc_np[:, 0]), plane_f(acc_np[:, 1])], -1)
    palive = plane_b(alive)
    ppin = plane_b(np.asarray(state.particle_pinned))

    # ---- beam classification (all beams incl. dead: their state must
    # survive round-trips; first-come wins dense-slot conflicts) ----
    m = ba.shape[0]
    ca, cb = cell_of[ba], cell_of[bb]
    is_exc, odx, ody, anchor = _classify(cell_of, ba, bb, h, dense_reach)
    beam_class = np.full(m, -1, np.int64)
    beam_cell = np.full(m, -1, np.int64)
    di = np.where(~is_exc)[0]
    r = dense_reach
    kid = (odx + r) * (2 * r + 1) + (ody + r)
    ukids, inv = (np.unique(kid[di], return_inverse=True)
                  if di.size else (np.zeros(0, np.int64),
                                   np.zeros(0, np.int64)))
    beam_class[di] = inv
    beam_cell[di] = anchor[di]
    exceptions = list(np.where(is_exc)[0])

    edge_offsets = tuple(
        (int(k) // (2 * r + 1) - r, int(k) % (2 * r + 1) - r)
        for k in ukids
    )
    offsets = {k: ci for ci, k in enumerate(edge_offsets)}
    class_order = {k: ci for ci, k in enumerate(edge_offsets)}

    def cls_planes(sel, vals, fill=0.0):
        out = np.full(w * h, fill, np.float32)
        out[beam_cell[sel]] = np.asarray(vals, np.float32)[sel]
        return jnp.asarray(out.reshape(w, h))

    edges = []
    for key in edge_offsets:
        ci = class_order[key]
        sel = beam_class == offsets[key]
        al = np.zeros(w * h, bool)
        al[beam_cell[sel]] = balive[sel]
        edges.append(EdgeClass(
            length=cls_planes(sel, state.beam_length, 1.0),
            target_length=cls_planes(sel, state.beam_target_length, 1.0),
            last_length=cls_planes(sel, state.beam_last_length, 1.0),
            spring=cls_planes(sel, state.beam_spring),
            damp=cls_planes(sel, state.beam_damp),
            yield_strain=cls_planes(sel, state.beam_yield_strain, np.inf),
            strain_limit=cls_planes(sel, state.beam_strain_limit, np.inf),
            strain=cls_planes(sel, state.beam_strain),
            stress=cls_planes(sel, state.beam_stress),
            alive=jnp.asarray(al.reshape(w, h)),
        ))

    # ---- exception list (padded) ----
    ex = np.asarray(exceptions, np.int64)
    e_cap = max(_round_up(max(len(ex), 1), exception_pad), exception_pad)

    def xf(vals, fill=0.0):
        out = np.full(e_cap, fill, np.float32)
        out[: len(ex)] = np.asarray(vals, np.float32)[ex]
        return jnp.asarray(out)

    xia = np.zeros(e_cap, np.int32)
    xib = np.zeros(e_cap, np.int32)
    xal = np.zeros(e_cap, bool)
    xia[: len(ex)] = ca[ex]
    xib[: len(ex)] = cb[ex]
    xal[: len(ex)] = balive[ex]
    beam_cell[ex] = np.arange(len(ex))
    xb = ExceptionBeams(
        ia=jnp.asarray(xia), ib=jnp.asarray(xib),
        length=xf(state.beam_length, 1.0),
        target_length=xf(state.beam_target_length, 1.0),
        last_length=xf(state.beam_last_length, 1.0),
        spring=xf(state.beam_spring), damp=xf(state.beam_damp),
        yield_strain=xf(state.beam_yield_strain, np.inf),
        strain_limit=xf(state.beam_strain_limit, np.inf),
        strain=xf(state.beam_strain), stress=xf(state.beam_stress),
        alive=jnp.asarray(xal),
    )

    lat = LatticeState(pos=ppos, vel=pvel, acc=pacc, alive=palive,
                       pinned=ppin, edges=tuple(edges))
    spec = LatticeSpec(w, h, collision_stencil=collision_stencil,
                       edge_offsets=edge_offsets)
    aux = PlanifyAux(width=w, height=h, cell_of=cell_of.copy(),
                     beam_class=beam_class, beam_cell=beam_cell,
                     n_exceptions=len(ex))
    return PlanifiedState(lat=lat, x=xb), spec, aux


def _exception_pass(lat: LatticeState, x: ExceptionBeams,
                    cfg: StaticConfig):
    """Flat beam pass over the exception list (reference semantics,
    compute.wgsl:96-131) producing fixed-point force planes for the
    dense accumulator plus the updated exception state."""
    w, h = lat.shape
    fpx = lat.pos[..., 0].reshape(-1)
    fpy = lat.pos[..., 1].reshape(-1)
    fal = lat.alive.reshape(-1)
    pax, pay = fpx[x.ia], fpy[x.ia]
    pbx, pby = fpx[x.ib], fpy[x.ib]
    active = x.alive & fal[x.ia] & fal[x.ib]

    ddx = pbx - pax
    ddy = pby - pay
    raw_len = jnp.sqrt(ddx * ddx + ddy * ddy)
    zero = raw_len == 0.0
    ddx = jnp.where(zero, 0.0, ddx)
    ddy = jnp.where(zero, jnp.float32(-1.0e-10), ddy)
    length_now = jnp.where(zero, jnp.float32(1.0e-10), raw_len)

    fmag = ((x.target_length - length_now) * x.spring
            + (x.last_length - length_now) * x.damp)
    inv_len = 1.0 / length_now
    fvx = jnp.where(active, fmag * ddx * inv_len, 0.0)
    fvy = jnp.where(active, fmag * ddy * inv_len, 0.0)

    strain = (length_now - x.target_length) / x.length
    yielded = jnp.abs(strain) > x.yield_strain
    new_target = jnp.where(
        yielded,
        length_now - x.yield_strain * x.length * jnp.sign(strain),
        x.target_length,
    )
    breaks = jnp.abs(length_now - x.length) > x.length * x.strain_limit

    x2 = dataclasses.replace(
        x,
        target_length=jnp.where(active, new_target, x.target_length),
        last_length=jnp.where(active, length_now, x.last_length),
        strain=jnp.where(active, jnp.abs(strain) / x.yield_strain,
                         x.strain),
        stress=jnp.where(active, fmag * jnp.float32(BEAM_STRESS_SCALE),
                         x.stress),
        alive=x.alive & ~(active & breaks),
    )

    if cfg.force_mode == "quantized":
        qx = jnp.trunc(fvx * jnp.float32(PARTICLE_FORCE_SCALE)).astype(
            jnp.int32)
        qy = jnp.trunc(fvy * jnp.float32(PARTICLE_FORCE_SCALE)).astype(
            jnp.int32)
        zf = jnp.zeros(w * h, jnp.int32)
        fx = zf.at[x.ia].add(-qx).at[x.ib].add(qx)
        fy = zf.at[x.ia].add(-qy).at[x.ib].add(qy)
    else:
        zf = jnp.zeros(w * h, jnp.float32)
        fx = zf.at[x.ia].add(-fvx).at[x.ib].add(fvx)
        fy = zf.at[x.ia].add(-fvy).at[x.ib].add(fvy)
    return (fx.reshape(w, h), fy.reshape(w, h)), x2


def planified_substep(ps: PlanifiedState, consts: PhysicsConstants,
                      uin: UserInput, spec: LatticeSpec,
                      cfg: StaticConfig,
                      update_observability: bool = True,
                      far=None, ffspec=None,
                      far_delta=None) -> PlanifiedState:
    """One substep: exception pass (tiny gathers/scatters) merged into
    the dense stencil substep's fixed-point accumulator."""
    extra, x2 = _exception_pass(ps.lat, ps.x, cfg)
    lat2 = lattice_substep(
        ps.lat, consts, uin, spec, cfg,
        update_observability=update_observability,
        far=far, ffspec=ffspec, extra_force=extra,
        far_delta=far_delta,
    )
    return PlanifiedState(lat=lat2, x=x2)


@functools.partial(jax.jit, static_argnames=("spec", "cfg", "n_sub"),
                   donate_argnames=("ps",))
def planified_frame(ps: PlanifiedState, consts: PhysicsConstants,
                    uin: UserInput, spec: LatticeSpec,
                    cfg: StaticConfig,
                    n_sub: Optional[int] = None) -> PlanifiedState:
    """One frame = subticks substeps under lax.scan (≙ the 64 dispatches
    per command encoder, engineWorker.ts:655-661); observability
    channels written on the last substep only."""
    n = cfg.subticks if n_sub is None else n_sub

    def body(s, _):
        return planified_substep(s, consts, uin, spec, cfg,
                                 update_observability=False), None

    ps, _ = jax.lax.scan(body, ps, None, length=n - 1)
    return planified_substep(ps, consts, uin, spec, cfg,
                             update_observability=True)


@functools.partial(jax.jit,
                   static_argnames=("spec", "cfg", "ffspec", "n_sub"),
                   donate_argnames=("ps",))
def planified_frame_far(ps: PlanifiedState, consts: PhysicsConstants,
                        uin: UserInput, spec: LatticeSpec,
                        cfg: StaticConfig, ffspec,
                        n_sub: Optional[int] = None):
    """One frame with far-field self-collision, fixed-cadence schedule
    (the v4 design, ops/farfield4.py rationale): ``n/R`` blocks of
    [rebuild → R substeps] with ``R = ffspec.horizon``, entirely on
    device.

    This closes the planified path's physics gap: the spatial embedding
    is computed at pack time, so contacts that DEVELOP afterwards (a
    cloth folding onto itself) can be index-distant in the embedded
    plane — exactly the pairs the reference's O(N²) loop sees
    (/root/reference/src/shaders/compute.wgsl:144-170) and a stencil
    alone misses.  Near-field stays on the dense stencil; candidate
    chunk pairs come from the layout-agnostic far-field machinery over
    the embedded planes.

    Returns ``(ps', stats)`` with ``stats = int32[3]``: (rebuilds,
    max n_pairs, max overflow) over the frame."""
    from .farfield import rebuild_far_list_planes_active
    from .farfield4 import bucketed_far_delta_from_fn

    n = cfg.subticks if n_sub is None else n_sub
    R = min(ffspec.horizon, n)
    n_outer = n // R
    rem = n % R

    def rebuild(s):
        # activation schedule (pair_activation): list sorted by first-
        # possible-contact substep + per-substep active prefix counts
        return rebuild_far_list_planes_active(
            s.lat.pos[..., 0], s.lat.pos[..., 1], s.lat.alive,
            s=spec.collision_stencil, ff=ffspec,
            radius=cfg.particle_radius,
            vx=s.lat.vel[..., 0], vy=s.lat.vel[..., 1], dt=cfg.dt, R=R,
        )

    def substep(s, fl, n_act_s, update_obs):
        # v4 bucketed apply (ops/farfield4.py): the old per-substep
        # far_collision_terms apply at full K cost ~12 ms/substep at the
        # config-3 plane (windowed element gathers, probe_config3b);
        # the bucketed narrow/mirror apply prices by live pairs instead,
        # cropped to the substep's active prefix
        fl_s = dataclasses.replace(
            fl, n_pairs=n_act_s,
            valid=fl.valid
            & (jnp.arange(fl.capacity, dtype=jnp.int32) < n_act_s),
        )
        delta = bucketed_far_delta_from_fn(
            lambda: jnp.stack([
                s.lat.pos[..., 0], s.lat.pos[..., 1],
                s.lat.vel[..., 0], s.lat.vel[..., 1],
                s.lat.alive.astype(jnp.float32),
            ]),
            fl_s, s=spec.collision_stencil, ff=ffspec,
            radius=cfg.particle_radius, dt=cfg.dt,
            ecoeff=(consts.elasticity + 1.0) * 0.5,
            friction=consts.friction,
            w=spec.width, h=spec.height,
        )
        return planified_substep(s, consts, uin, spec, cfg,
                                 update_observability=update_obs,
                                 far_delta=delta, ffspec=ffspec)

    def block(s, n_inner):
        fl, n_act = rebuild(s)

        def inner(ss, s_idx):
            return substep(ss, fl, n_act[s_idx], False), None

        s, _ = jax.lax.scan(inner, s,
                            jnp.arange(n_inner, dtype=jnp.int32))
        return s, fl, n_act[n_inner - 1]

    # stats int32[4]: rebuilds, max n_pairs, max overflow, max active
    def merge_st(st_, fl, na):
        return jnp.stack([
            st_[0] + 1,
            jnp.maximum(st_[1], fl.n_pairs),
            jnp.maximum(st_[2], fl.overflow),
            jnp.maximum(st_[3], na),
        ])

    st = jnp.zeros((4,), jnp.int32)

    def outer(carry, _):
        s, st_ = carry
        s, fl, na = block(s, R)
        return (s, merge_st(st_, fl, na)), None

    # last block ends with the observing substep; full blocks before it
    # ride the outer scan (mirrors fused_frame4's structure)
    last = rem if rem else R
    n_full_before = n_outer if rem else n_outer - 1
    if n_full_before > 0:
        (ps, st), _ = jax.lax.scan(outer, (ps, st), None,
                                   length=n_full_before)
    fl, n_act = rebuild(ps)
    if last > 1:
        def inner(ss, s_idx):
            return substep(ss, fl, n_act[s_idx], False), None

        ps, _ = jax.lax.scan(inner, ps,
                             jnp.arange(last - 1, dtype=jnp.int32))
    ps = substep(ps, fl, n_act[last - 1], True)
    st = merge_st(st, fl, n_act[last - 1])
    return ps, st


def unplanify(ps: PlanifiedState, template: SimState,
              aux: PlanifyAux) -> SimState:
    """Plane-embedded state → flat SimState (host-side extraction for
    snapshots/tests; ≙ BufferMapper.loadState, engineMapping.ts:521)."""
    w, h = aux.width, aux.height
    cell = aux.cell_of
    pos = np.asarray(ps.lat.pos).reshape(-1, 2)[cell]
    vel = np.asarray(ps.lat.vel).reshape(-1, 2)[cell]
    acc = np.asarray(ps.lat.acc).reshape(-1, 2)[cell]
    palive = np.asarray(ps.lat.alive).reshape(-1)[cell]
    ppin = np.asarray(ps.lat.pinned).reshape(-1)[cell]

    tl = np.asarray(template.beam_target_length).copy()
    ll = np.asarray(template.beam_last_length).copy()
    stn = np.asarray(template.beam_strain).copy()
    sts = np.asarray(template.beam_stress).copy()
    bal = np.asarray(template.beam_alive).copy()

    for ci, e in enumerate(ps.lat.edges):
        sel = aux.beam_class == ci
        cells = aux.beam_cell[sel]
        for dst, pl in ((tl, e.target_length), (ll, e.last_length),
                        (stn, e.strain), (sts, e.stress),
                        (bal, e.alive)):
            dst[sel] = np.asarray(pl).reshape(-1)[cells]
    xsel = (aux.beam_class < 0) & (aux.beam_cell >= 0)
    slots = aux.beam_cell[xsel]
    for dst, arr in ((tl, ps.x.target_length), (ll, ps.x.last_length),
                     (stn, ps.x.strain), (sts, ps.x.stress),
                     (bal, ps.x.alive)):
        dst[xsel] = np.asarray(arr)[slots]
    return dataclasses.replace(
        template,
        pos=jnp.asarray(pos), vel=jnp.asarray(vel), acc=jnp.asarray(acc),
        particle_alive=jnp.asarray(palive),
        particle_pinned=jnp.asarray(ppin),
        beam_target_length=jnp.asarray(tl),
        beam_last_length=jnp.asarray(ll),
        beam_strain=jnp.asarray(stn),
        beam_stress=jnp.asarray(sts),
        beam_alive=jnp.asarray(bal),
    )
