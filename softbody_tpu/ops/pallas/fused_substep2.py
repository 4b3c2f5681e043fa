"""Pallas TPU kernel v2: fused lattice substep, restructured for the
memory system (successor of fused_substep.py's kernel; same physics,
compute.wgsl:90-203 semantics).

What changed vs v1 and why (each a measured cost in v1):

1. **18-plane hot carry** — per-edge ``strain``/``stress`` exist only for
   visualization (compute.wgsl:122-124; only the frame's final values are
   ever rendered).  v1 carried them through every substep: 8 of 26 mut
   planes of pure observability traffic.  v2's hot carry is
   ``[18, Wp, Hp]`` (particle planes + per-class target/last/alive); the
   frame runs ``subticks−1`` hot substeps and one final *observing*
   substep that additionally writes the ``[8, Wp, Hp]`` obs stack.
   (Retention nuance: an edge that breaks mid-frame keeps its previous
   frame's strain/stress — it is dead, so nothing renders it.)

2. **Scalar edge parameters** — spring/damp/yield/limit/rest-length are
   uniform per edge class in every scene family (make_lattice writes
   constants), yet v1 streamed them as 20 HBM planes per substep.  v2
   passes them in the scalar-prefetch vector (20 extra lanes) and drops
   the whole immutable plane stack to [2] (alive, pinned).  Scenes with
   spatially-varying edge parameters keep using the v1 kernel
   (pack_lattice2 refuses them).

3. **Pre-rotated lane copies + halved pair passes** — v1 mirrored
   *computed* arrays to the partner at ±1/±2 lane offsets: Mosaic turns
   every misaligned read into a lane rotation (v1's dominant cost).  v2
   materializes each needed (plane, Δy) rotation ONCE into VMEM scratch
   so every read is lane-ALIGNED (sublane offsets only), and evaluates
   each unordered pair ONCE:
   - springs: owner (lower-endpoint) evaluation on a 1-row-extended
     base region; the partner's +f is the shifted copy of the SAME
     quantized value — with int32 accumulation the halved pass is
     BIT-identical to a both-endpoint evaluation;
   - collisions: half offsets, reaction applied as a shifted negation
     (the impulse terms are exactly antisymmetric under f32 — every
     operand transform between the two sides is a sign flip, which
     rounds identically).
   Half the pair arithmetic AND ~6× fewer lane rotations than v1.

4. **Double-buffered output DMA** — v1 waited on each slab's output copy
   before computing the next slab; v2 ping-pongs two output buffers and
   waits one slab later.

Parity: tested against the XLA stencil path and the v1 kernel in
interpret mode (tests/test_fused2.py).  Collision sums accumulate in a
different (full-offset) order than v1's half-trick, so f32 trajectories
agree to tolerance, not bitwise; quantized spring sums stay bit-exact.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import (
    BEAM_STRESS_SCALE,
    PARTICLE_FORCE_SCALE,
    PhysicsConstants,
    StaticConfig,
    UserInput,
)
from .fused_substep import (
    EDGE_OFFSETS,
    N_CONSTS,
    PAD_H,
    PAD_W,
    _consts_vector,
    padded_dims,
)

# hot mut plane indices (v2)
PX, PY, VX, VY, AX, AY = range(6)
TGT, LST, EAL = range(3)     # + 6 + c*3
N_HOT = 18
# kvar "ealpack" layout: per-class planes are (TGT, LST) at 6 + c*2 and
# the four edge-alive flags live as BITS of one small-integer f32 plane
# (values 0..15, exactly representable) — hot drops 18 → 15 planes,
# −1/6 of the pipeline-bound slab DMA, losslessly (alive is boolean)
EALP = 14
N_HOT_EALPACK = 15


def _n_hot(kvar) -> int:
    return N_HOT_EALPACK if "ealpack" in kvar else N_HOT
# obs plane indices
STR, STS = 0, 1              # + c*2
N_OBS = 8
# immut planes
ALIVE, PINNED = 0, 1
N_IMM = 2
# per-class scalar params appended to the consts vector
EC_SPR, EC_DMP, EC_YLD, EC_LIM, EC_LEN = range(5)

# ---- v3 far-field machinery (trigger + detection side-outputs) ----------
# extra traced scalars appended to the consts vector after the 20 edge
# consts: [τ (substeps-since-rebuild+1 · dt, the linear-motion reference
# time for the OUTPUT state), detect flag, mean alive velocity v̄ (band
# dev reference, one substep stale), T_band (dev scale = (horizon+pad)·dt),
# band base reach (2r + skin), speed_safety·dt (trigger margin)]
X_TAU, X_DET, X_VBX, X_VBY, X_TBAND, X_REACH, X_SAFDT, X_SPARE = range(8)
N_EXTRA = 8
N_EDGEC = 20

# detection side-output planes (computed on the kernel's INPUT state —
# output-state band flags would need neighbour-slab output halos that a
# single grid pass cannot provide; the one-substep lag is covered by the
# extrusion's horizon_pad=1):
# alive-masked chunk AABB partials (±BIG fill) + band hit flag.
(S_MINX, S_MAXX, S_MINY, S_MAXY,
 S_VMINX, S_VMAXX, S_VMINY, S_VMAXY, S_BAND) = range(9)
N_SIDE = 9
FF_CHUNK = 4  # kernel-side chunk size (must match FarFieldSpec.chunk)
_SIDE_BIG = 3.0e38
# stats output lanes (per slab, SMEM): max SQUARED position/velocity
# trigger deviations over the OUTPUT state (the glue takes scalar
# sqrts — cheaper than per-particle sqrt planes in-kernel), and alive
# velocity sums for the next substep's v̄
ST_MAXDD2, ST_MAXDV2, ST_SUMVX, ST_SUMVY = range(4)
N_STATS = 8


def _ec(consts, c, which):
    return consts[N_CONSTS + c * 5 + which]


# max +Δy lane offset any in-kernel read uses: collision stencil ≤ 2,
# far band sources ≤ 2·FF_CHUNK − 1 = 7 (_band_offsets)
LANE_REACH = 8


def lane_pad_hr(h_real: int, hr: int) -> int:
    """RIGHT lane pad for the packed plane stacks.  The interior is
    rounded up to ``hr`` (128-lane tiles); when the rounding slack
    ``hr − h_real`` already covers every +Δy read (LANE_REACH), those
    dead lanes double as the top halo and the right pad drops to 0 —
    at the 1M bench (h 1000 → hr 1024) that is lane dim 1280 → 1152,
    ~10% off every input DMA, rotation copy, and VMEM scratch plane.
    Otherwise a full 128-lane tile keeps the stack tile-aligned."""
    return 0 if hr - h_real >= LANE_REACH else 128


def _band_offsets(stencil: int, chunk: int = FF_CHUNK):
    """Half-plane particle offsets of the far-field band source
    (index-chebyshev in [stencil+1, 2·chunk−1]); mirrors
    FarFieldSpec.band_half_offsets."""
    r = 2 * chunk - 1
    return tuple(
        (dx, dy)
        for dx in range(0, r + 1)
        for dy in range(-r, r + 1)
        if (dx > 0 or dy > 0) and max(abs(dx), abs(dy)) > stencil
    )


def _rotation_specs(stencil: int, detect: bool = False):
    """Ordered (kind, plane, Δy) list of the lane rotations one substep
    needs; shared by the kernel and the scratch-shape computation.
    ``detect`` adds the band-source rotations: PX/PY at the band's wider
    Δy reach plus the dev plane (kind "d")."""
    s = stencil
    ys = tuple(dy for dy in range(-max(s, 1), max(s, 1) + 1) if dy)
    specs = []
    for p in (PX, PY, VX, VY):
        if p in (VX, VY) and not s:
            continue
        for dy in (ys if s else (-1, 1)):
            specs.append(("m", p, dy))
    for dy in (ys if s else (-1, 1)):
        specs.append(("i", ALIVE, dy))
    # (edge-state planes need no rotations since the spring pass went
    # owner-eval + shifted reaction: TGT/LST/EAL are read at Δy=0 only)
    if detect:
        band_ys = sorted({dy for _dx, dy in _band_offsets(s) if dy})
        for dy in band_ys:
            specs.append(("m", PX, dy))
            specs.append(("m", PY, dy))
            specs.append(("i", ALIVE, dy))
            specs.append(("d", 0, dy))
    out = []
    for sp in specs:
        if sp not in out:
            out.append(sp)
    return out


def _kernel2(consts, *refs, tile_w: int, world_h: int, stencil: int,
             quantized: bool, has_far: bool, obs: bool,
             trig: bool = False, detect: bool = False,
             far_interior: bool = False, pad_hr: int = PAD_H,
             pad_hl: int = PAD_H, pad_w: int = PAD_W,
             emit_mirror: bool = False, far_records: bool = False,
             kvar: Tuple[str, ...] = ()):
    idx = 0
    mut_ref = refs[idx]; idx += 1
    immut_ref = refs[idx]; idx += 1
    far_ref = obs_in_ref = refs_ref = None
    if has_far:
        far_ref = refs[idx]; idx += 1
    if obs:
        obs_in_ref = refs[idx]; idx += 1
    if trig:
        refs_ref = refs[idx]; idx += 1
    out_ref = refs[idx]; idx += 1
    obs_ref = stats_ref = side_ref = mir_ref = None
    if obs:
        obs_ref = refs[idx]; idx += 1
    if trig:
        stats_ref = refs[idx]; idx += 1
    if detect:
        side_ref = refs[idx]; idx += 1
    if emit_mirror:
        mir_ref = refs[idx]; idx += 1
    mscr2 = refs[idx]; idx += 1
    iscr2 = refs[idx]; idx += 1
    fscr2 = rscr2 = None
    if has_far and not far_records:
        # (in far_records mode the far input is a Pallas-pipelined VMEM
        # block — no manual DMA scratch)
        fscr2 = refs[idx]; idx += 1
    if trig:
        rscr2 = refs[idx]; idx += 1
    oscr2 = refs[idx]; idx += 1
    obscr = None
    if obs:
        obscr = refs[idx]; idx += 1
    prscr = refs[idx]; idx += 1
    sems = refs[idx]; idx += 1

    i = pl.program_id(0)
    n_slabs = pl.num_programs(0)
    # pad_w is pinned to multiples of 8 (Mosaic sublane-tile DMA
    # alignment — see _kvar_pads for the measured pad_w=4 dead end)
    bw = tile_w + 2 * pad_w
    # kvar "lanecut" (applied via pad_hl=0): the packed stacks carry NO
    # bottom lane pad — −dy reads go through the rotated copies' bottom
    # zero-fill exactly like the pad_hr=0 top trick.  At the 1M bench
    # (pad_hl=0, pad_hr=0) the lane dim is 1152 → 1024: −11% on every
    # input DMA / rotation copy / VMEM plane, and output rows become
    # full-width (contiguous writes) for free.
    bh = world_h + pad_hl + pad_hr
    th = world_h
    s = stencil

    # kvar "inbuf3": 3-deep input buffering — inputs for slabs i+1 AND
    # i+2 are in flight while slab i computes (the default double
    # buffer only hides one slab of DMA issue latency).  Output stays
    # double-buffered (its drain is already two slabs deep).
    depth = 3 if "inbuf3" in kvar else 2
    islot = jax.lax.rem(i, depth)
    oslot = jax.lax.rem(i, 2)
    onxt = jax.lax.rem(i + 1, 2)
    # DMA semaphore layout (depth-parametric; depth=2 reproduces the
    # classic indices): mut s, immut depth+s, far 2·depth+s,
    # out 3·depth+os, obs-out 3·depth+2, obs-in 3·depth+3,
    # trig 3·depth+4+s
    sem_out = 3 * depth
    sem_obs = 3 * depth + 2
    sem_obs_in = 3 * depth + 3
    sem_trig = 3 * depth + 4

    # ---------------- input pipeline ------------------------------------
    def start_in(dst_slot, slab):
        pltpu.make_async_copy(
            mut_ref.at[:, pl.ds(slab * tile_w, bw), :],
            mscr2.at[dst_slot], sems.at[dst_slot],
        ).start()
        pltpu.make_async_copy(
            immut_ref.at[:, pl.ds(slab * tile_w, bw), :],
            iscr2.at[dst_slot], sems.at[depth + dst_slot],
        ).start()
        if has_far and not far_records:
            if far_interior:
                far_src = far_ref.at[:, pl.ds(slab * tile_w, tile_w), :]
            else:
                far_src = far_ref.at[
                    :, pl.ds(pad_w + slab * tile_w, tile_w),
                    pl.ds(pad_hl, th)]
            pltpu.make_async_copy(
                far_src, fscr2.at[dst_slot], sems.at[2 * depth + dst_slot],
            ).start()
        if trig:
            pltpu.make_async_copy(
                refs_ref.at[:, pl.ds(pad_w + slab * tile_w, tile_w),
                            pl.ds(pad_hl, th)],
                rscr2.at[dst_slot], sems.at[sem_trig + dst_slot],
            ).start()

    @pl.when(i == 0)
    def _():
        start_in(islot, i)

    for k in range(1, depth - 1):
        # depth-3 prologue: prefetch slab k at grid step 0
        @pl.when((i == 0) & (k < n_slabs))
        def _(k=k):
            start_in(k % depth, k)

    @pl.when(i + depth - 1 < n_slabs)
    def _():
        start_in(jax.lax.rem(i + depth - 1, depth), i + depth - 1)

    if obs:
        # previous obs values (retention for inactive edges): own slab's
        # center window, single-buffered — the observing call runs once
        # per frame
        obs_in_cp = pltpu.make_async_copy(
            obs_in_ref.at[:, pl.ds(pad_w + i * tile_w, tile_w),
                          pl.ds(pad_hl, th)],
            obscr, sems.at[sem_obs_in],
        )
        obs_in_cp.start()

    pltpu.make_async_copy(
        mut_ref.at[:, pl.ds(i * tile_w, bw), :], mscr2.at[islot],
        sems.at[islot],
    ).wait()
    pltpu.make_async_copy(
        immut_ref.at[:, pl.ds(i * tile_w, bw), :], iscr2.at[islot],
        sems.at[depth + islot],
    ).wait()
    if has_far and not far_records:
        if far_interior:
            far_src0 = far_ref.at[:, pl.ds(i * tile_w, tile_w), :]
        else:
            far_src0 = far_ref.at[:, pl.ds(pad_w + i * tile_w, tile_w),
                                  pl.ds(pad_hl, th)]
        pltpu.make_async_copy(
            far_src0, fscr2.at[islot], sems.at[2 * depth + islot],
        ).wait()
    if trig:
        pltpu.make_async_copy(
            refs_ref.at[:, pl.ds(pad_w + i * tile_w, tile_w),
                        pl.ds(pad_hl, th)],
            rscr2.at[islot], sems.at[sem_trig + islot],
        ).wait()
    mscr = mscr2.at[islot]
    iscr = iscr2.at[islot]

    if obs:
        obs_in_cp.wait()

    # ---------------- pre-rotated lane copies ----------------------------
    # one lane rotation per (plane, Δy); every later read is lane-aligned.
    # Slots are indexed over the FULL spec list (incl. detect extras);
    # the base rotations are written unconditionally, the detect ones
    # only when the runtime detect flag is on (they feed the band loop).
    rot_slots = {sp: j for j, sp in enumerate(_rotation_specs(s, detect))}
    base_specs = set(_rotation_specs(s, False))

    def write_rot(sl_, src, dy):
        if dy > 0:
            prscr[sl_, :, : bh - dy] = src[:, dy:]
            if dy > pad_hr:
                # with the rounding-slack right pad the top dy lanes of
                # the read window are this unwritten tail; they are
                # dead-interior lanes (alive=0 in the base planes), but
                # uninitialized VMEM can be inf/nan — write inert zeros
                prscr[sl_, :, bh - dy :] = jnp.zeros((bw, dy), src.dtype)
        else:
            prscr[sl_, :, -dy:] = src[:, : bh + dy]
            if -dy > pad_hl:
                # no (or thin) bottom lane pad: the first |dy| lanes of
                # the rotated copy fall inside the read window — same
                # inert-zero fill as the top (they represent below-world
                # cells, dead by construction)
                prscr[sl_, :, : -dy] = jnp.zeros((bw, -dy), src.dtype)

    for (kind, p, dy), sl_ in rot_slots.items():
        if (kind, p, dy) not in base_specs:
            continue
        write_rot(sl_, mscr[p] if kind == "m" else iscr[p], dy)

    def rd(kind, p, ox, oy):
        """Center-tile read of plane ``p`` at offset (ox, oy): lane-aligned
        (rotated copies absorb oy)."""
        if oy == 0:
            src = mscr[p] if kind == "m" else iscr[p]
        else:
            src = prscr[rot_slots[(kind, p, oy)]]
        return src[pad_w + ox : pad_w + ox + tile_w, pad_hl : pad_hl + th]

    radius = consts[0]
    dt = consts[1]
    two_r = 2.0 * radius
    inv_dt2 = 1.0 / (dt * dt)

    al_c = rd("i", ALIVE, 0, 0) > 0.0
    pin_c = rd("i", PINNED, 0, 0) > 0.0

    # ---------------- far-field detection side-outputs -------------------
    # Computed on the INPUT state (halo available for the band's ±7
    # reach); consumed by the on-device rebuild one substep later with
    # horizon_pad=1 covering the lag.  Runtime-gated: when the detect
    # flag is off the side block is zero/empty and the XLA glue keeps
    # its previously carried side planes.
    if detect:
        xb = N_CONSTS + N_EDGEC
        det_on = consts[xb + X_DET] > 0.0
        cch = FF_CHUNK

        # one-hot row-select matrix (rows 4j): Mosaic cannot lower a
        # strided sublane slice, but an MXU matmul with a one-hot f32
        # matrix at HIGHEST precision is an exact row pick
        _sel = (
            jax.lax.broadcasted_iota(jnp.int32, (tile_w // 4, tile_w), 1)
            == 4 * jax.lax.broadcasted_iota(
                jnp.int32, (tile_w // 4, tile_w), 0
            )
        ).astype(jnp.float32)

        def sub4(v, lop):
            """Sublane 4-group reduce → ``[tile_w//4, th]``: row j holds
            the reduce of input rows [4j, 4j+4) (circular roll wrap only
            touches rows that won't be selected; pltpu.roll wants
            non-negative shifts, so shift up by size−k)."""
            nrow = v.shape[0]
            v = lop(v, pltpu.roll(v, shift=nrow - 1, axis=0))
            v = lop(v, pltpu.roll(v, shift=nrow - 2, axis=0))
            return jax.lax.dot_general(
                _sel, v, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )

        @pl.when(det_on)
        def _():
            big = jnp.float32(_SIDE_BIG)
            pxc = rd("m", PX, 0, 0)
            pyc = rd("m", PY, 0, 0)
            side_ref[S_MINX] = sub4(jnp.where(al_c, pxc, big), jnp.minimum)
            side_ref[S_MAXX] = sub4(jnp.where(al_c, pxc, -big), jnp.maximum)
            side_ref[S_MINY] = sub4(jnp.where(al_c, pyc, big), jnp.minimum)
            side_ref[S_MAXY] = sub4(jnp.where(al_c, pyc, -big), jnp.maximum)
            vxc = rd("m", VX, 0, 0)
            vyc = rd("m", VY, 0, 0)
            side_ref[S_VMINX] = sub4(jnp.where(al_c, vxc, big), jnp.minimum)
            side_ref[S_VMAXX] = sub4(jnp.where(al_c, vxc, -big), jnp.maximum)
            side_ref[S_VMINY] = sub4(jnp.where(al_c, vyc, big), jnp.minimum)
            side_ref[S_VMAXY] = sub4(jnp.where(al_c, vyc, -big), jnp.maximum)

            # dev plane over the FULL block (halo included) + its band
            # rotations; |v − v̄|·T_band bounds per-pair closing speed
            alive_full = iscr[ALIVE] > 0.0
            dev_full = jnp.sqrt(
                (mscr[VX] - consts[xb + X_VBX]) ** 2
                + (mscr[VY] - consts[xb + X_VBY]) ** 2
            ) * consts[xb + X_TBAND]
            dev_full = jnp.where(alive_full, dev_full, 0.0)
            for (kind, p, dy), sl_ in rot_slots.items():
                if (kind, p, dy) in base_specs:
                    continue
                src = dev_full if kind == "d" else (
                    mscr[p] if kind == "m" else iscr[p]
                )
                write_rot(sl_, src, dy)

            def rd_dev(ox, oy):
                src = dev_full if oy == 0 else prscr[rot_slots[("d", 0, oy)]]
                return src[pad_w + ox : pad_w + ox + tile_w,
                           pad_hl : pad_hl + th]

            dev_c = rd_dev(0, 0)
            base_reach = consts[xb + X_REACH]
            hit = jnp.zeros((tile_w, th), bool)
            for bdx, bdy in _band_offsets(s, cch):
                # partner-alive matters: pad cells carry 0 (or, mid-scan,
                # garbage) positions that would otherwise flag spuriously
                ok = rd("i", ALIVE, bdx, bdy) > 0.0
                ddx = rd("m", PX, bdx, bdy) - pxc
                ddy = rd("m", PY, bdx, bdy) - pyc
                reach = base_reach + dev_c + rd_dev(bdx, bdy)
                hit = hit | (ok & (ddx * ddx + ddy * ddy < reach * reach))
            side_ref[S_BAND] = sub4(
                jnp.where(al_c & hit, 1.0, 0.0), jnp.maximum
            )

        # det off: side_ref is left unwritten — the copied-out block is
        # garbage, discarded by the XLA glue's where(det, ...) gate
        # (writing zeros here would cost N_SIDE plane-writes per calm
        # substep for data nobody reads)

    # ---------------- spring pass (owner eval + shifted reaction) ---------
    # Each edge is evaluated ONCE at its owner (lower endpoint) on a
    # 1-row-extended base region; the upper endpoint's +f is the shifted
    # copy of the SAME (quantized) value.  The former mirror evaluation
    # produced bit-identical floats by construction ("same sequence on
    # the same operands"), so with int32 quantized accumulation the
    # halved pass is BIT-identical to it; in float mode only the f32
    # addition order changes.  Extension bases live in the slab halo, so
    # a cross-slab edge's upper force comes from the slab that owns the
    # lower endpoint's row in ITS extension — applied exactly once.
    acc_t = jnp.int32 if quantized else jnp.float32
    fx_c = jnp.zeros((tile_w, th), acc_t)
    fy_c = jnp.zeros((tile_w, th), acc_t)
    hot_updates = []
    obs_updates = []
    wsp = tile_w + 1   # spring bases cover rows [−1, tile_w)

    def rds(kind, p, ox, oy):
        """Spring-extended read: rows cover bases [−1, tile_w) + ox."""
        if oy == 0:
            src = mscr[p] if kind == "m" else iscr[p]
        else:
            src = prscr[rot_slots[(kind, p, oy)]]
        return src[pad_w - 1 + ox : pad_w - 1 + ox + wsp,
                   pad_hl : pad_hl + th]

    def lane_shift(a, dy):
        """out[:, y] = a[:, y−dy], zero-filled (out-of-range partners
        are pad cells whose contributions are zero).  Circular
        pltpu.roll + lane mask — Mosaic lowers lane rotates natively,
        while the concat-of-slices formulation hits the unimplemented
        offset-mismatch case of tpu.concatenate (r3 bench log)."""
        if dy == 0:
            return a
        rolled = pltpu.roll(a, shift=dy % th, axis=1)
        lanes = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
        dead = lanes < dy if dy > 0 else lanes >= th + dy
        return jnp.where(dead, jnp.zeros((), a.dtype), rolled)

    # kvar "rollgroup": batch the partner-shift lane rolls by Δy — the
    # per-class/per-offset rolls are each a full-plane lane rotation +
    # mask; summing the unshifted terms first and rolling ONE stacked
    # plane per distinct Δy cuts the roll count ~6× in the spring pass
    # and ~12× in the collision pass.  Quantized spring sums stay
    # BIT-identical (int32 addition is associative); float-mode springs
    # and f32 collision sums change only in addition order (same
    # tolerance class as the v1→v2 half-pass change).
    rollgroup = "rollgroup" in kvar
    # kvar "rsqrt": replace sqrt+divide pairs (both multi-slot VPU ops;
    # the kernel is VPU compute-bound) with rsqrt+multiply in the
    # spring, collision, and integrate blocks.  Predicates move to the
    # squared domain (exact for ==0/>0; the <two_r contact boundary can
    # flip at 1-ulp rounding edges — variant tolerance class).
    rsqrt_kv = "rsqrt" in kvar
    # kvar "ealpack" (bit-exact layout variant): the four edge-alive
    # planes are one packed small-integer plane (bit c = class c alive);
    # per-class TGT/LST move to 6 + c*2.  Unpack once per region here —
    # the bits are exact, so every downstream predicate sees the same
    # booleans as the classic 4-plane layout
    ealpack = "ealpack" in kvar

    def mb_of(c):
        return 6 + c * (2 if ealpack else 3)

    if ealpack:
        ealp_ext_i = rds("m", EALP, 0, 0).astype(jnp.int32)
        ealp_c_i = ealp_ext_i[1 : 1 + tile_w]
    spring_parts: dict = {}

    al_e = rds("i", ALIVE, 0, 0) > 0.0
    if "nospring" in kvar:
        # attribution-only knob (bench_sweep): skip the spring pass and
        # pass edge state / obs planes through unchanged — NOT physics
        for c in range(4):
            mb = mb_of(c)
            hot_updates.append((rd("m", mb + TGT, 0, 0),
                                rd("m", mb + LST, 0, 0),
                                ((ealp_c_i >> c) & 1) if ealpack
                                else rd("m", mb + EAL, 0, 0)))
            if obs:
                obs_updates.append((obscr[c * 2 + STR],
                                    obscr[c * 2 + STS]))
    spring_classes = (tuple(enumerate(EDGE_OFFSETS))
                      if "nospring" not in kvar else ())
    for c, (dx, dy) in spring_classes:
        mb = mb_of(c)
        e_len = _ec(consts, c, EC_LEN)
        e_yld = _ec(consts, c, EC_YLD)
        e_lim = _ec(consts, c, EC_LIM)

        # owner evaluation over extended bases [−1, tile_w)
        ea = (((ealp_ext_i >> c) & 1) > 0) if ealpack else (
            rds("m", mb + EAL, 0, 0) > 0.0)
        active = ea & al_e & (rds("i", ALIVE, dx, dy) > 0.0)
        ddx = rds("m", PX, dx, dy) - rds("m", PX, 0, 0)
        ddy = rds("m", PY, dx, dy) - rds("m", PY, 0, 0)
        tgt = rds("m", mb + TGT, 0, 0)
        lst = rds("m", mb + LST, 0, 0)
        d2 = ddx * ddx + ddy * ddy
        zero = d2 == 0.0
        ddx = jnp.where(zero, 0.0, ddx)
        ddy = jnp.where(zero, jnp.float32(-1.0e-10), ddy)
        if rsqrt_kv:
            # kvar "rsqrt": sqrt + divide (two multi-slot VPU ops) →
            # rsqrt + multiplies.  ln = d2·rsqrt(d2) is within 1-2 ulp
            # of sqrt(d2); strain/plasticity/break decisions shift only
            # at exact rounding boundaries (variant tolerance class).
            inv_ln = jnp.where(zero, jnp.float32(1.0e10),
                               jax.lax.rsqrt(d2))
            ln = jnp.where(zero, jnp.float32(1.0e-10), d2 * inv_ln)
            fmag = (tgt - ln) * _ec(consts, c, EC_SPR) + (lst - ln) * _ec(
                consts, c, EC_DMP
            )
        else:
            ln = jnp.where(zero, jnp.float32(1.0e-10), jnp.sqrt(d2))
            fmag = (tgt - ln) * _ec(consts, c, EC_SPR) + (lst - ln) * _ec(
                consts, c, EC_DMP
            )
            inv_ln = 1.0 / ln
        fvx = jnp.where(active, fmag * ddx * inv_ln, 0.0)
        fvy = jnp.where(active, fmag * ddy * inv_ln, 0.0)

        # edge-state updates from the center slice of the owner eval
        ce = slice(1, 1 + tile_w)
        a_c, ln_c, tgt_c, lst_c, fmag_c = (active[ce], ln[ce], tgt[ce],
                                           lst[ce], fmag[ce])
        strain = (ln_c - tgt_c) / e_len
        yielded = jnp.abs(strain) > e_yld
        new_tgt = jnp.where(
            yielded, ln_c - e_yld * e_len * jnp.sign(strain), tgt_c
        )
        breaks = jnp.abs(ln_c - e_len) > e_len * e_lim
        hot_updates.append((
            jnp.where(a_c, new_tgt, tgt_c),
            jnp.where(a_c, ln_c, lst_c),
            (jnp.where(a_c & breaks, 0, (ealp_c_i >> c) & 1) if ealpack
             else jnp.where(a_c & breaks, 0.0, rd("m", mb + EAL, 0, 0))),
        ))
        if obs:
            obs_updates.append((
                jnp.where(a_c, jnp.abs(strain) / e_yld,
                          obscr[c * 2 + STR]),
                jnp.where(a_c, fmag_c * jnp.float32(BEAM_STRESS_SCALE),
                          obscr[c * 2 + STS]),
            ))

        if quantized:
            fs = jnp.float32(PARTICLE_FORCE_SCALE)
            fvx = jnp.trunc(fvx * fs).astype(jnp.int32)
            fvy = jnp.trunc(fvy * fs).astype(jnp.int32)
        # owner gets −f; the partner's +f is the same value shifted by
        # the class offset (base rows [−dx, tile_w−dx), lanes +dy)
        up = slice(1 - dx, 1 - dx + tile_w)
        fx_c = fx_c - fvx[ce]
        fy_c = fy_c - fvy[ce]
        if rollgroup and dy != 0:
            spring_parts.setdefault(dy, []).extend((fvx[up], fvy[up]))
        else:
            fx_c = fx_c + lane_shift(fvx[up], dy)
            fy_c = fy_c + lane_shift(fvy[up], dy)

    for sdy, parts in spring_parts.items():
        # one stacked roll per distinct Δy: [n·tile_w, th] concat along
        # sublanes, single lane roll + mask, then slice-add back.  The
        # parts alternate (fx, fy) per contributing class.
        stacked = lane_shift(jnp.concatenate(parts, axis=0), sdy)
        for j in range(0, len(parts), 2):
            fx_c = fx_c + stacked[j * tile_w : (j + 1) * tile_w]
            fy_c = fy_c + stacked[(j + 1) * tile_w : (j + 2) * tile_w]

    if quantized:
        bfx = fx_c.astype(jnp.float32) / jnp.float32(PARTICLE_FORCE_SCALE)
        bfy = fy_c.astype(jnp.float32) / jnp.float32(PARTICLE_FORCE_SCALE)
    else:
        bfx, bfy = fx_c, fy_c

    # ---------------- collision pass (half offsets, antisymmetric) -------
    # The reference evaluates every ordered pair (compute.wgsl:144-170),
    # but its impulse terms are EXACTLY antisymmetric under f32 (every
    # operand transform between the two sides is a sign flip, which
    # rounds identically), so each unordered pair is evaluated ONCE on a
    # row-extended region and the reaction applied as a shifted
    # negation — the same trick as ops/stencil.py::_stencil_collisions,
    # halving the dominant VPU block of the kernel.  Per-particle sums
    # differ from the full-set order only in f32 addition order.
    if s == 0:
        z = jnp.zeros((tile_w, th), jnp.float32)
        dvx = dvy = dax = day = dyn = z
    else:
        ecoeff = consts[7]
        friction = consts[8]
        dvx = jnp.zeros((tile_w, th), jnp.float32)
        dvy = jnp.zeros((tile_w, th), jnp.float32)
        dax = jnp.zeros((tile_w, th), jnp.float32)
        day = jnp.zeros((tile_w, th), jnp.float32)
        dyn = jnp.zeros((tile_w, th), jnp.float32)
        # term planes cover bases [−s, tile_w): the center slice uses
        # [0, tile_w), the reaction slice [−ox, tile_w−ox) — bases above
        # tile_w−1 are never read (their pairs belong to the next slab)
        wext = tile_w + s

        def rde(kind, p, ox, oy):
            """Row-extended read at offset (ox, oy): rows cover the
            term region's base + ox, lanes absorbed by rotated copies."""
            if oy == 0:
                src = mscr[p] if kind == "m" else iscr[p]
            else:
                src = prscr[rot_slots[(kind, p, oy)]]
            return src[pad_w - s + ox : pad_w - s + ox + wext,
                       pad_hl : pad_hl + th]

        def lshift(a, dy):
            """out[:, y] = a[:, y−dy] (zero fill): the reaction's lane
            displacement; out-of-range partners are pad/dead cells whose
            terms are zero anyway.  Roll + mask for the same Mosaic
            reason as lane_shift above."""
            if dy == 0:
                return a
            rolled = pltpu.roll(a, shift=dy % th, axis=1)
            lanes = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
            dead = lanes < dy if dy > 0 else lanes >= th + dy
            return jnp.where(dead, 0.0, rolled)

        coll_parts: dict = {}
        e_al = rde("i", ALIVE, 0, 0) > 0.0
        e_px = rde("m", PX, 0, 0)
        e_py = rde("m", PY, 0, 0)
        e_vx = rde("m", VX, 0, 0)
        e_vy = rde("m", VY, 0, 0)
        half_offsets = [
            (ox, oy)
            for ox in range(0, s + 1)
            for oy in range(-s, s + 1)
            if (ox, oy) != (0, 0) and (ox > 0 or oy > 0)
        ]
        for ox, oy in half_offsets:
            o_al = rde("i", ALIVE, ox, oy) > 0.0
            valid = e_al & o_al
            ddx = rde("m", PX, ox, oy) - e_px
            ddy = rde("m", PY, ox, oy) - e_py
            d2 = ddx * ddx + ddy * ddy
            # sign(lin_i − lin_j) = −sign(ox·H + oy): per-offset constant
            co_sign = jnp.float32(-np.sign(ox * world_h + oy))
            coincident = valid & (d2 == 0.0)
            t_dyn = jnp.where(coincident, co_sign, 0.0)
            if rsqrt_kv:
                overlap = valid & (d2 > 0.0) & (d2 < two_r * two_r)
                inv = jnp.where(overlap, jax.lax.rsqrt(
                    jnp.where(overlap, d2, 1.0)), 0.0)
                dist = d2 * inv
            else:
                dist = jnp.sqrt(d2)
                overlap = valid & (dist > 0.0) & (dist < two_r)
                inv = jnp.where(
                    overlap, 1.0 / jnp.where(overlap, dist, 1.0), 0.0)
            nx_ = ddx * inv
            ny_ = ddy * inv
            rvx = e_vx - rde("m", VX, ox, oy)
            rvy = e_vy - rde("m", VY, ox, oy)
            imp_n = ecoeff * (rvx * nx_ + rvy * ny_)
            max_fric = imp_n * friction
            imp_t = jnp.minimum(
                jnp.maximum(rvx * -ny_ + rvy * nx_, -max_fric), max_fric
            )
            t_dvx = jnp.where(overlap, -(imp_n * nx_ + imp_t * -ny_), 0.0)
            t_dvy = jnp.where(overlap, -(imp_n * ny_ + imp_t * nx_), 0.0)
            clip = (two_r - dist) * 0.5 * inv_dt2
            t_dax = jnp.where(overlap, -nx_ * clip, 0.0)
            t_day = jnp.where(overlap, -ny_ * clip, 0.0)
            # center slice gets +t; the partner (rows −ox, lanes −oy in
            # term coordinates) gets the exact negation
            terms = (t_dvx, t_dvy, t_dax, t_day, t_dyn)
            accs = [dvx, dvy, dax, day, dyn]
            if rollgroup and oy != 0:
                # defer the shift: sum the unshifted reaction slices per
                # Δy (lshift distributes over addition exactly — roll is
                # a permutation, the zero-fill mask is elementwise), one
                # stacked roll per Δy after the offset loop
                rsl = [t_[s - ox : s - ox + tile_w] for t_ in terms]
                if oy in coll_parts:
                    coll_parts[oy] = [a + b for a, b in
                                      zip(coll_parts[oy], rsl)]
                else:
                    coll_parts[oy] = rsl
                for acc_i, t_ in enumerate(terms):
                    accs[acc_i] = accs[acc_i] + t_[s : s + tile_w]
            else:
                for acc_i, t_ in enumerate(terms):
                    cterm = t_[s : s + tile_w]
                    rterm = lshift(t_[s - ox : s - ox + tile_w], oy)
                    accs[acc_i] = accs[acc_i] + cterm - rterm
            dvx, dvy, dax, day, dyn = accs
        for cdy, parts in coll_parts.items():
            stacked = lshift(jnp.concatenate(parts, axis=0), cdy)
            accs = [dvx, dvy, dax, day, dyn]
            for acc_i in range(5):
                accs[acc_i] = accs[acc_i] - stacked[
                    acc_i * tile_w : (acc_i + 1) * tile_w]
            dvx, dvy, dax, day, dyn = accs

    if has_far and far_records:
        # kvar "krec": the far delta arrives as the apply's record
        # TABLE (farfield4 layout, this slab's [nb, tile_w/4, 640]
        # block) instead of dense planes — the XLA side then skips its
        # granularity-bound records→planes unmirror (~0.28 ms/substep
        # at 1M, probe_r5e).  Reassembly: 32-lane static concats bring
        # each (field, ix) to [tile_w/4, th], a sublane concat stacks
        # the four ix groups, and one one-hot un-permutation MXU matmul
        # per field (exact: one nonzero product per output) restores
        # plane row order r = 4c+ix ← concat row ix·(tile_w/4)+c.
        tw4_r = tile_w // 4
        nbk = th // 32
        _rg = jax.lax.broadcasted_iota(jnp.int32, (tile_w, tile_w), 0)
        _cg = jax.lax.broadcasted_iota(jnp.int32, (tile_w, tile_w), 1)
        _G = (_cg == (_rg % 4) * tw4_r + _rg // 4).astype(jnp.float32)
        far_deltas = []
        for f_ in range(5):
            dparts = []
            for ix_ in range(4):
                off_ = f_ * 128 + ix_ * 32
                dparts.append(jnp.concatenate(
                    [far_ref[b_, :, off_ : off_ + 32]
                     for b_ in range(nbk)], axis=1))
            dcat = jnp.concatenate(dparts, axis=0)
            far_deltas.append(jax.lax.dot_general(
                _G, dcat, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            ))
        dvx = dvx + far_deltas[0]
        dvy = dvy + far_deltas[1]
        dax = dax + far_deltas[2]
        day = day + far_deltas[3]
        dyn = dyn + far_deltas[4]
    elif has_far:
        fscr = fscr2.at[islot]
        dvx = dvx + fscr[0]
        dvy = dvy + fscr[1]
        dax = dax + fscr[2]
        day = day + fscr[3]
        dyn = dyn + fscr[4]

    # ---------------- integration (≙ compute.wgsl:171-199) ---------------
    px = rd("m", PX, 0, 0)
    py = rd("m", PY, 0, 0)
    vx = rd("m", VX, 0, 0)
    vy = rd("m", VY, 0, 0)
    ax = rd("m", AX, 0, 0)
    ay = rd("m", AY, 0, 0)

    p_x = px
    p_y = py + jnp.where(al_c, dyn, 0.0)
    v_x = vx + dvx
    v_y = vy + dvy
    a_x = ax + dax + consts[3]
    a_y = ay + day + consts[4]

    s2 = v_x * v_x + v_y * v_y
    moving = s2 > 0.0
    if rsqrt_kv:
        # drag is masked by ``moving``, so the !moving lane value of
        # inv_speed is never consumed; rsqrt(s2) ≈ 1/sqrt(s2) to 1-2 ulp
        inv_speed = jax.lax.rsqrt(jnp.where(moving, s2, 1.0))
    else:
        inv_speed = 1.0 / jnp.where(moving, jnp.sqrt(s2), 1.0)
    if "dexp2" in kvar:
        # caller-guaranteed dragExp == 2.0 (checked host-side against
        # the concrete constants): |v|^2 == v·v, so the generic pow —
        # a multi-op exp/log expansion on the VPU for a traced exponent
        # — collapses to one multiply.  Matches the canonical order
        # ((c·|v|^e)·v)·(1/speed); numerically this is the correctly
        # rounded square where pow approximates it, so parity vs the
        # NumPy oracle (npy_powf also special-cases 2.0) improves.
        a_x = a_x - jnp.where(
            moving, consts[9] * (v_x * v_x) * v_x * inv_speed, 0.0
        )
        a_y = a_y - jnp.where(
            moving, consts[9] * (v_y * v_y) * v_y * inv_speed, 0.0
        )
    else:
        a_x = a_x - jnp.where(
            moving,
            consts[9] * jnp.abs(v_x) ** consts[10] * v_x * inv_speed, 0.0
        )
        a_y = a_y - jnp.where(
            moving,
            consts[9] * jnp.abs(v_y) ** consts[10] * v_y * inv_speed, 0.0
        )
    ustr = consts[11]
    a_x = a_x + consts[17] * ustr
    a_y = a_y + consts[18] * ustr
    mdx = consts[13] - p_x
    mdy = consts[14] - p_y
    if rsqrt_kv:
        grab_r = radius * 10.0
        grabbed = (consts[12] > 0.0) & (
            mdx * mdx + mdy * mdy < grab_r * grab_r
        )
    else:
        grabbed = (consts[12] > 0.0) & (
            jnp.sqrt(mdx * mdx + mdy * mdy) < radius * 10.0
        )
    a_x = a_x + jnp.where(grabbed, (consts[15] - v_x) * ustr - consts[3], 0.0)
    a_y = a_y + jnp.where(grabbed, (consts[16] - v_y) * ustr - consts[4], 0.0)
    a_x = a_x + bfx
    a_y = a_y + bfy

    v_x = v_x + a_x * dt
    v_y = v_y + a_y * dt
    p_x = p_x + v_x * dt
    p_y = p_y + v_y * dt

    lo = radius
    hi = consts[2] - radius
    cx_ = jnp.clip(p_x, lo, hi)
    cy_ = jnp.clip(p_y, lo, hi)
    hit_x = p_x != cx_
    hit_y = p_y != cy_
    be = consts[5]
    bf = consts[6]
    fric_y = jnp.sign(v_y) * bf * jnp.abs(v_x) * (1.0 + be)
    na_y = jnp.where(hit_x, 0.0 - jnp.minimum(0.0, fric_y), 0.0)
    nv_x = jnp.where(hit_x, v_x * -be, v_x)
    fric_x = jnp.sign(nv_x) * bf * jnp.abs(v_y) * (1.0 + be)
    na_x = jnp.where(hit_y, 0.0 - jnp.minimum(0.0, fric_x), 0.0)
    nv_y = jnp.where(hit_y, v_y * -be, v_y)

    keep = al_c & ~pin_c
    # kvar "outfull": emit FULL lane rows ([.., bh] incl. the PAD_H /
    # pad_hr lane pads, pre-zeroed) so the output DMA's lane window
    # covers the whole row — the 64 rows of each plane then form ONE
    # contiguous HBM run (~294 KB) instead of 64 strided 4 KB chunks.
    # Trades +PAD_H/bh (~12%) written bytes for coarse write
    # granularity; A/B'd via bench_sweep "outfull".
    outfull = "outfull" in kvar or (pad_hl == 0 and pad_hr == 0)
    oscr = oscr2.at[oslot]
    ol = pad_hl if outfull else 0
    if outfull and (pad_hl or pad_hr):
        @pl.when(i < 2)
        def _():
            # one-time zero of this slot's lane pads; later slabs only
            # rewrite the interior window so the pads stay zero (the
            # packed stacks' lane pads are zero by construction)
            if pad_hl:
                zpad = jnp.zeros((tile_w, pad_hl), jnp.float32)
                for p_ in range(_n_hot(kvar)):
                    oscr[p_, :, :pad_hl] = zpad
            if pad_hr:
                ztail = jnp.zeros((tile_w, pad_hr), jnp.float32)
                for p_ in range(_n_hot(kvar)):
                    oscr[p_, :, pad_hl + th:] = ztail
    if "noint" in kvar:
        # attribution-only knob (bench_sweep "nf_pipe"): pass the six
        # particle planes through untouched — the integrate math above
        # is then dead code (DCE'd by Mosaic), so with stencil 0 +
        # "nospring" this measures the bare slab pipeline (input DMA →
        # VMEM plane copies → output DMA).  NOT physics.
        st_px, st_py, st_vx, st_vy = px, py, vx, vy
        na_x, na_y, keep = ax, ay, jnp.ones_like(keep)
    else:
        st_px = jnp.where(keep, cx_, px)
        st_py = jnp.where(keep, cy_, py)
        st_vx = jnp.where(keep, nv_x, vx)
        st_vy = jnp.where(keep, nv_y, vy)
    oscr[PX, :, ol : ol + th] = st_px
    oscr[PY, :, ol : ol + th] = st_py
    oscr[VX, :, ol : ol + th] = st_vx
    oscr[VY, :, ol : ol + th] = st_vy
    oscr[AX, :, ol : ol + th] = jnp.where(keep, na_x, ax)
    oscr[AY, :, ol : ol + th] = jnp.where(keep, na_y, ay)

    if trig:
        # trigger partials of the OUTPUT state vs the far list's linear
        # reference motion p_ref + v_ref·τ (≙ farfield.list_invalid,
        # fused into the kernel: saves a full-plane XLA pass/substep).
        # Emits max SQUARED position/velocity deviations — the glue
        # forms the conservative bound sqrt(max dd²) + c·sqrt(max dv²)
        # ≥ max(|dd| + c·|dv|) with two scalar sqrts, instead of two
        # per-particle sqrt planes per substep here.
        xb2 = N_CONSTS + N_EDGEC
        rscr = rscr2.at[islot]
        tau = consts[xb2 + X_TAU]
        rddx = st_px - (rscr[0] + rscr[2] * tau)
        rddy = st_py - (rscr[1] + rscr[3] * tau)
        rdvx = st_vx - rscr[2]
        rdvy = st_vy - rscr[3]
        dd2 = jnp.where(al_c, rddx * rddx + rddy * rddy, 0.0)
        dv2 = jnp.where(al_c, rdvx * rdvx + rdvy * rdvy, 0.0)
        stats_ref[i, ST_MAXDD2] = jnp.max(dd2)
        stats_ref[i, ST_MAXDV2] = jnp.max(dv2)
        stats_ref[i, ST_SUMVX] = jnp.sum(jnp.where(al_c, st_vx, 0.0))
        stats_ref[i, ST_SUMVY] = jnp.sum(jnp.where(al_c, st_vy, 0.0))
        for _j in range(4, N_STATS):
            stats_ref[i, _j] = jnp.float32(0.0)
    for c in range(4):
        mb = mb_of(c)
        tgt, lst, eal = hot_updates[c]
        oscr[mb + TGT, :, ol : ol + th] = tgt
        oscr[mb + LST, :, ol : ol + th] = lst
        if not ealpack:
            oscr[mb + EAL, :, ol : ol + th] = eal
    if ealpack:
        # recombine the four class bits into the packed plane (int adds
        # of disjoint bits — exact; passthrough bits reproduce the input
        # value bit-for-bit)
        b0, b1, b2, b3 = (hot_updates[c][2] for c in range(4))
        oscr[EALP, :, ol : ol + th] = (
            b0 + 2 * b1 + 4 * b2 + 8 * b3
        ).astype(jnp.float32)

    if emit_mirror:
        # ---------------- far-field mirror records (kvar "kmirror") ------
        # Emit the OUTPUT state's (4, 32) far-apply records
        # (ops/farfield4.mirror_table layout: row b·(w/4)+cx holds
        # plane rows 4cx..4cx+3, lanes [32b, 32b+32), as [5 fields ×
        # 4 rows × 32 lanes]) directly from VMEM, so the XLA apply
        # skips its granularity-bound [5,w,h]→records relayout
        # (~0.185 ms/substep at 1M, probe_r5e).  The sublane→lane
        # movement Mosaic can't reshape (<128-lane granularity) is done
        # as 4 one-hot row-pick MXU matmuls per field (exact: each
        # output sums one nonzero product) + static 32-lane placements.
        # The mir block's slab window offset is (tile_w/4)·i — an
        # 8-aligned sublane slice for every tile_w ≥ 32.
        tw4 = tile_w // 4
        _mrows = jax.lax.broadcasted_iota(jnp.int32, (tw4, tile_w), 0)
        _mcols = jax.lax.broadcasted_iota(jnp.int32, (tw4, tile_w), 1)

        def pick4(v, ix_):
            """[tile_w, th] → [tile_w/4, th]: row j = input row 4j+ix."""
            sel = (_mcols == 4 * _mrows + ix_).astype(jnp.float32)
            return jax.lax.dot_general(
                sel, v, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )

        mir_fields = (st_px, st_py, st_vx, st_vy,
                      rd("i", ALIVE, 0, 0))
        for f_, v_ in enumerate(mir_fields):
            for ix_ in range(4):
                rsel = pick4(v_, ix_)
                off_ = f_ * 128 + ix_ * 32
                for b_ in range(th // 32):
                    mir_ref[b_, :, off_ : off_ + 32] = (
                        rsel[:, 32 * b_ : 32 * b_ + 32])

    # ---------------- output pipeline (double-buffered) ------------------
    def out_copy(src_slot, slab):
        if outfull:
            dst = out_ref.at[:, pl.ds(pad_w + slab * tile_w, tile_w), :]
        else:
            dst = out_ref.at[:, pl.ds(pad_w + slab * tile_w, tile_w),
                             pl.ds(pad_hl, th)]
        return pltpu.make_async_copy(
            oscr2.at[src_slot], dst, sems.at[sem_out + src_slot],
        )

    # the copy we started two slabs ago used this slot — drain it first
    @pl.when(i >= 2)
    def _():
        out_copy(oslot, i - 2).wait()

    out_copy(oslot, i).start()

    if obs:
        for c in range(4):
            strn, sts = obs_updates[c]
            obscr[c * 2 + STR, :, :] = strn
            obscr[c * 2 + STS, :, :] = sts
        cp = pltpu.make_async_copy(
            obscr,
            obs_ref.at[:, pl.ds(pad_w + i * tile_w, tile_w),
                       pl.ds(pad_hl, th)],
            sems.at[sem_obs],
        )
        cp.start()
        cp.wait()

    # drain pending output copies before the kernel retires
    @pl.when(i == n_slabs - 1)
    def _():
        out_copy(oslot, i).wait()

    @pl.when((i == n_slabs - 1) & (n_slabs > 1))
    def _():
        out_copy(onxt, i - 1).wait()


# ---------------------------------------------------------------------------
# host-side wrappers


def uniform_edge_consts(state) -> Optional[jax.Array]:
    """Per-class scalar (spring, damp, yield, limit, length) vector, or
    None if any edge plane varies spatially (→ use the v1 kernel).
    Host-side check (concrete values)."""
    vals = []
    for e in state.edges:
        for plane in (e.spring, e.damp, e.yield_strain, e.strain_limit,
                      e.length):
            a = np.asarray(plane)
            v = a.reshape(-1)[0]
            if not (a == v).all():
                return None
            vals.append(np.float32(v))
    return jnp.asarray(vals, jnp.float32)


def pack_lattice2(state, tile_w: int = 128, pad_hl: int = PAD_H,
                  pad_w: int = PAD_W, ealpack: bool = False):
    """LatticeState → (hot [18,Wp,Hp], obs [8,Wp,Hp], immut [2,Wp,Hp],
    edge_consts [20]). Raises if edge parameters vary spatially.

    ``ealpack=True`` (kvar "ealpack") packs the four edge-alive planes
    into one bit-packed small-integer plane — hot becomes
    ``[15, Wp, Hp]`` with per-class (TGT, LST) at ``6 + c*2`` and the
    packed flags at plane ``EALP`` (lossless; alive is boolean).

    ``pad_hl=0`` (the "lanecut" layout) drops the bottom lane pad —
    −dy halo reads are served by the kernel's zero-filled rotations
    instead.  At 1M (lane dim 1152 → 1024) that is ~11% off every
    input DMA / rotation copy / VMEM plane.

    ``pad_w`` is pinned to multiples of 8 by Mosaic's sublane-tile DMA
    alignment (a pad_w=4 "padw4" layout was built and rejected by the
    compiler — see ``_kvar_pads``); the default 8 is the minimum that
    covers the kernel's sublane reach."""
    ec = uniform_edge_consts(state)
    if ec is None:
        raise ValueError(
            "fused kernel v2 needs per-class-uniform edge parameters; "
            "use the v1 kernel (pack_lattice/fused_frame) instead"
        )
    w, h = state.shape
    wr, hr = padded_dims(w, h, tile_w)

    phr = lane_pad_hr(h, hr)

    def pad(stack):
        return jnp.pad(
            jnp.stack([x.astype(jnp.float32) for x in stack]),
            ((0, 0), (pad_w, pad_w + wr - w), (pad_hl, phr + hr - h)),
        )

    hot = [state.pos[..., 0], state.pos[..., 1],
           state.vel[..., 0], state.vel[..., 1],
           state.acc[..., 0], state.acc[..., 1]]
    if ealpack:
        for e in state.edges:
            hot += [e.target_length, e.last_length]
        packed = sum(
            e.alive.astype(jnp.int32) << c
            for c, e in enumerate(state.edges)
        )
        hot.append(packed.astype(jnp.float32))
    else:
        for e in state.edges:
            hot += [e.target_length, e.last_length,
                    e.alive.astype(jnp.float32)]
    obs = []
    for e in state.edges:
        obs += [e.strain, e.stress]
    imm = [state.alive.astype(jnp.float32), state.pinned.astype(jnp.float32)]
    return pad(hot), pad(obs), pad(imm), ec


def unpack_lattice2(hot, obs, template, pad_hl: int = PAD_H,
                    pad_w: int = PAD_W, ealpack: bool = False):
    import dataclasses

    w, h = template.shape
    core = hot[:, pad_w : pad_w + w, pad_hl : pad_hl + h]
    ocore = obs[:, pad_w : pad_w + w, pad_hl : pad_hl + h]
    edges = []
    if ealpack:
        ealp_i = core[EALP].astype(jnp.int32)
    for c, e in enumerate(template.edges):
        mb = 6 + c * (2 if ealpack else 3)
        edges.append(dataclasses.replace(
            e,
            target_length=core[mb + TGT],
            last_length=core[mb + LST],
            alive=(((ealp_i >> c) & 1) > 0) if ealpack
            else core[mb + EAL] > 0.0,
            strain=ocore[c * 2 + STR],
            stress=ocore[c * 2 + STS],
        ))
    return dataclasses.replace(
        template,
        pos=jnp.stack([core[PX], core[PY]], -1),
        vel=jnp.stack([core[VX], core[VY]], -1),
        acc=jnp.stack([core[AX], core[AY]], -1),
        edges=tuple(edges),
    )


def _zero_pads(stack, spec, tile_w: int, pad_hl: int = PAD_H,
               pad_w: int = PAD_W):
    """Zero every cell outside the real lattice interior.

    The kernel writes only interior slab windows; pad cells rely on the
    output buffer inheriting the donated input's (zeroed) pads.  Inside
    ``lax.cond`` branches XLA may allocate fresh output buffers, so pads
    can surface uninitialized HBM (inf/nan).  Physics never reads an
    unmasked pad (everything is alive-masked), but external readers of
    the packed planes (finite checks, debug dumps) see the garbage — one
    cheap masked pass per frame restores the invariant."""
    wr, hr = padded_dims(spec.width, spec.height, tile_w)
    wp, hp = stack.shape[-2], stack.shape[-1]
    ix = jnp.arange(wp)[:, None]
    iy = jnp.arange(hp)[None, :]
    interior = (
        (ix >= pad_w) & (ix < pad_w + spec.width)
        & (iy >= pad_hl) & (iy < pad_hl + spec.height)
    )
    return jnp.where(interior[None], stack, 0.0)


def fused_substep2_call(hot, immut, consts_vec, *, w: int, h: int,
                        stencil: int, quantized: bool, tile_w: int = 128,
                        interpret: bool = False, far=None, obs_in=None,
                        refs=None, detect: bool = False,
                        far_interior: bool = False,
                        pad_hl: int = PAD_H,
                        pad_w: int = PAD_W,
                        emit_mirror: bool = False,
                        far_records: bool = False,
                        kvar: Tuple[str, ...] = ()):
    """One v2/v3 substep.

    ``emit_mirror``: additionally return the OUTPUT state's far-apply
    mirror table ``[h/32, w/4, 640]`` (ops/farfield4.mirror_table
    layout, built in-kernel — see the kvar "kmirror" block).

    ``far_records``: ``far`` is the apply's delta record TABLE
    ``[h/32, w/4, 640]`` instead of dense planes — consumed as a
    Pallas-pipelined VMEM block per slab (see the kvar "krec" block).

    ``far_interior``: the ``far`` delta planes are the unpadded interior
    ``[5, w, h]`` (the v4 frame's shape — saves a 20 MB pad per substep)
    instead of the hot stack's padded ``[5, Wp, Hp]``.
    ``obs_in``: pass the obs stack to run the observing variant.
    ``refs`` (``[4, Wp, Hp]``: px_ref, py_ref, vx_ref, vy_ref) arms the
    in-kernel far-field trigger — the consts vector must then carry the
    ``N_EXTRA`` scalars and a ``stats [gw, N_STATS]`` output is
    appended.  ``detect=True`` additionally compiles the detection
    side-output machinery (runtime-gated by the X_DET scalar), appending
    a ``side [N_SIDE, w//4, h]`` output.

    Returns ``hot'`` plus, in order, ``obs'`` / ``stats`` / ``side``
    for each enabled feature."""
    if w % tile_w or h % 128:
        raise ValueError(f"padded interior ({w},{h}) misaligned")
    gw = w // tile_w
    # right lane pad is whatever the packed stack carries (lane_pad_hr):
    # 128 (full halo tile) or 0 (rounding slack doubles as the halo)
    pad_hr = hot.shape[-1] - h - pad_hl
    if pad_hr not in (0, PAD_H):
        raise ValueError(
            f"hot lane dim {hot.shape[-1]} inconsistent with interior "
            f"h={h}, pad_hl={pad_hl} (expected h + pad_hl + 0 or "
            f"{PAD_H})"
        )
    if hot.shape[1] != w + 2 * pad_w:
        raise ValueError(
            f"hot sublane dim {hot.shape[1]} inconsistent with interior "
            f"w={w}, pad_w={pad_w}"
        )
    if pad_w < max(stencil, 2):
        raise ValueError(f"pad_w={pad_w} < kernel sublane reach "
                         f"max(stencil={stencil}, 2)")
    if pad_w % 8:
        # Mosaic HBM memref_slice offsets in the sublane dim must be
        # divisible by the (8, 128) tile's 8; a non-multiple pad makes
        # every slab window offset pad_w + tile_w·i misaligned (the
        # measured "padw4" dead end — see _kvar_pads)
        raise ValueError(f"pad_w={pad_w} must be a multiple of 8 "
                         f"(Mosaic sublane-tile DMA alignment)")
    if detect and pad_w < 2 * FF_CHUNK - 1:
        raise ValueError(
            f"detect mode needs pad_w ≥ {2 * FF_CHUNK - 1} (band reach); "
            f"got {pad_w}"
        )
    bw, bh = tile_w + 2 * pad_w, h + pad_hl + pad_hr
    has_far = far is not None
    obs = obs_in is not None
    trig = refs is not None
    # detect and trig are independent in the kernel: the side block
    # reads only the N_EXTRA consts lanes (X_DET/X_VBX/X_VBY/X_TBAND/
    # X_REACH), never the refs planes or the stats output — so the v4
    # fixed-cadence frame can run detect-only substeps (no 19 MB refs
    # DMA, no deviation math).  The caller must still append the
    # N_EXTRA scalars to the consts vector when detect is on.
    n_rot = len(_rotation_specs(stencil, detect))

    if (emit_mirror or far_records) and (h % 32 or w % 4 or tile_w % 4):
        raise ValueError(
            f"emit_mirror/far_records need h % 32 == 0, w % 4 == 0, "
            f"tile_w % 4 == 0; got ({w}, {h}), tile_w={tile_w}")
    if (emit_mirror or far_records) and tile_w % 32 and not interpret:
        # the mirror/record table's slab window is (tile_w/4) sublanes
        # at offset (tile_w/4)·i — real-TPU Mosaic block mappings
        # require the sublane dim divisible by 8, so tile_w must be a
        # multiple of 32 there (interpret mode has no such constraint
        # and keeps small-tile kmirror/krec test coverage).
        # FusedLatticeBackend auto-drops kmirror/krec for small tiles
        # on the TPU backend.
        raise ValueError(
            f"emit_mirror/far_records need tile_w % 32 == 0 (8-aligned "
            f"record-table sublane blocks); got tile_w={tile_w}")
    kernel = functools.partial(
        _kernel2, tile_w=tile_w, world_h=h, stencil=stencil,
        quantized=quantized, has_far=has_far, obs=obs,
        trig=trig, detect=detect, far_interior=far_interior,
        pad_hr=pad_hr, pad_hl=pad_hl, pad_w=pad_w,
        emit_mirror=emit_mirror, far_records=far_records,
        kvar=tuple(kvar),
    )
    n_in = 2 + int(has_far) + int(obs) + int(trig)
    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM)] * n_in
    if has_far and far_records:
        # the far record table's slab block is Pallas-pipelined (its
        # sublane window offset (tile_w/4)·i is 8-aligned)
        in_specs[2] = pl.BlockSpec(
            (h // 32, tile_w // 4, 5 * 4 * 32), lambda i, _c: (0, i, 0),
            memory_space=pltpu.VMEM,
        )
    out_shape = [jax.ShapeDtypeStruct(hot.shape, jnp.float32)]
    out_specs = [pl.BlockSpec(memory_space=pltpu.HBM)]
    if obs:
        out_shape.append(jax.ShapeDtypeStruct(obs_in.shape, jnp.float32))
        out_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
    if trig:
        # whole-array SMEM block (Mosaic requires blocks divisible by
        # (8, 128) or equal to the array): every program writes its own
        # row; the buffer flushes once after the last grid step
        out_shape.append(jax.ShapeDtypeStruct((gw, N_STATS), jnp.float32))
        out_specs.append(pl.BlockSpec(
            (gw, N_STATS), lambda i, _c: (0, 0), memory_space=pltpu.SMEM
        ))
    if detect:
        # rows pre-selected in-kernel by the one-hot MXU pick, so the
        # block is (tile_w//4, h) — needs tile_w ≥ 32 on hardware for
        # the (8, 128) block rule (interpret-mode tests may go smaller)
        out_shape.append(jax.ShapeDtypeStruct(
            (N_SIDE, w // 4, h), jnp.float32
        ))
        out_specs.append(pl.BlockSpec(
            (N_SIDE, tile_w // 4, h), lambda i, _c: (0, i, 0),
            memory_space=pltpu.VMEM,
        ))
    if emit_mirror:
        # far-apply mirror records (farfield4.mirror_table layout seen
        # as [nb, w/4, 640]): each slab owns the 8-aligned sublane
        # window [:, (tile_w/4)·i : +tile_w/4, :]
        out_shape.append(jax.ShapeDtypeStruct(
            (h // 32, w // 4, 5 * 4 * 32), jnp.float32
        ))
        out_specs.append(pl.BlockSpec(
            (h // 32, tile_w // 4, 5 * 4 * 32), lambda i, _c: (0, i, 0),
            memory_space=pltpu.VMEM,
        ))
    depth = 3 if "inbuf3" in kvar else 2
    n_hot = _n_hot(kvar)
    if hot.shape[0] != n_hot:
        raise ValueError(
            f"hot stack has {hot.shape[0]} planes but kvar={kvar} "
            f"expects {n_hot} (pack_lattice2 ealpack mismatch?)")
    scratch = [
        pltpu.VMEM((depth, n_hot, bw, bh), jnp.float32),
        pltpu.VMEM((depth, N_IMM, bw, bh), jnp.float32),
    ]
    if has_far and not far_records:
        scratch.append(pltpu.VMEM((depth, 5, tile_w, h), jnp.float32))
    if trig:
        scratch.append(pltpu.VMEM((depth, 4, tile_w, h), jnp.float32))
    scratch.append(pltpu.VMEM(
        (2, n_hot, tile_w, bh if "outfull" in kvar else h), jnp.float32
    ))
    if obs:
        scratch.append(pltpu.VMEM((N_OBS, tile_w, h), jnp.float32))
    scratch.append(pltpu.VMEM((n_rot, bw, bh), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((3 * depth + 4 + depth,)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(gw,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    args = [consts_vec, hot, immut]
    if has_far:
        args.append(far)
    if obs:
        args.append(obs_in)
    if trig:
        args.append(refs)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            # v5e VMEM is 128 MiB; the default 120 MiB scoped limit
            # rejects tile_w=128 at 1M by 2.2 MiB (r3 sweep log), so
            # allow up to 126 and keep an env knob for experiments
            vmem_limit_bytes=int(
                os.environ.get("FUSED2_VMEM_MB", "126")
            ) * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    if len(out_shape) == 1:
        return outs[0]
    return tuple(outs)


def _kvar_pads(kvar: Tuple[str, ...]) -> dict:
    """Layout pads implied by the layout-level kvar flags: "lanecut"
    (no bottom lane pad).

    A thinner SUBLANE halo ("padw4", pad_w=4) was built and measured
    — Mosaic rejects it: HBM ``memref_slice`` offsets in the sublane
    dim must be provably divisible by the (8, 128) tile's 8, and every
    slab window offset becomes ``4 + 64·i ≡ 4 (mod 8)`` ("Failed to
    prove that a tile index in dimension 1 is divisible by the tiling
    (8)", bench_sweep r4 ``nf_pw``/``pw``/``nf_pipe_pw``).  Re-aligning
    the input window (offset ``64·i``, width 72, interior at window
    col 4) works for reads but the interior OUTPUT write at offset
    ``4 + 64·i`` stays misaligned — sublane pads are pinned to
    multiples of 8.  The remaining route to the same bytes is a wider
    tile (halo fraction ∝ 1/tile_w), re-measured under lanecut."""
    return dict(pad_hl=(0 if "lanecut" in kvar else PAD_H))


@functools.partial(
    jax.jit,
    static_argnames=("spec", "cfg", "tile_w", "interpret", "n_sub",
                     "observe", "kvar"),
    donate_argnames=("hot", "obs"),
)
def fused_frame2(hot, obs, immut, edge_consts, consts: PhysicsConstants,
                 uin: UserInput, spec, cfg: StaticConfig,
                 tile_w: int = 128, interpret: bool = False,
                 n_sub: Optional[int] = None, observe: bool = True,
                 kvar: Tuple[str, ...] = ()):
    """One frame: ``n_sub−1`` hot substeps + 1 observing substep
    (``n_sub`` defaults to ``cfg.subticks``).  ``observe=False`` runs
    ``n_sub`` hot substeps and passes ``obs`` through untouched — used by
    the engine's mid-frame chunking (far-list validity horizons) where
    only the frame's final chunk observes.  Returns (hot', obs')."""
    w, h = padded_dims(spec.width, spec.height, tile_w)
    cvec = jnp.concatenate(
        [_consts_vector(consts, uin, cfg, spec.height), edge_consts]
    )
    quantized = cfg.force_mode == "quantized"
    stencil = 0 if cfg.collision_mode == "none" else spec.collision_stencil
    kw = dict(w=w, h=h, stencil=stencil, quantized=quantized,
              tile_w=tile_w, interpret=interpret, kvar=kvar,
              **_kvar_pads(kvar))
    n = cfg.subticks if n_sub is None else n_sub

    def body(m, _):
        return fused_substep2_call(m, immut, cvec, **kw), None

    if not observe:
        hot, _ = jax.lax.scan(body, hot, None, length=n)
        return hot, obs
    hot, _ = jax.lax.scan(body, hot, None, length=n - 1)
    return fused_substep2_call(hot, immut, cvec, obs_in=obs, **kw)


@functools.partial(
    jax.jit,
    static_argnames=("spec", "cfg", "ffspec", "tile_w", "interpret",
                     "n_sub", "observe", "kvar"),
    donate_argnames=("hot", "obs"),
)
def fused_frame2_far(hot, obs, immut, edge_consts, fl,
                     consts: PhysicsConstants, uin: UserInput, spec,
                     cfg: StaticConfig, ffspec, tile_w: int = 128,
                     interpret: bool = False, n_sub: Optional[int] = None,
                     observe: bool = True, kvar: Tuple[str, ...] = ()):
    """fused_frame2 with far-field contacts: each substep computes the
    far delta planes in XLA from the carry (ops/farfield.py) and the
    kernel consumes them (same contract as v1's fused_frame_far).
    ``n_sub``/``observe`` as in :func:`fused_frame2`."""
    from ..farfield import far_collision_terms

    w, h = padded_dims(spec.width, spec.height, tile_w)
    ht = hot.shape[-1]   # pad_hl + hr + lane_pad_hr
    cvec = jnp.concatenate(
        [_consts_vector(consts, uin, cfg, spec.height), edge_consts]
    )
    quantized = cfg.force_mode == "quantized"
    stencil = 0 if cfg.collision_mode == "none" else spec.collision_stencil
    alive_plane = immut[ALIVE] > 0.0
    kw = dict(w=w, h=h, stencil=stencil, quantized=quantized,
              tile_w=tile_w, interpret=interpret, kvar=kvar,
              **_kvar_pads(kvar))
    n = cfg.subticks if n_sub is None else n_sub

    def far_of(m):
        deltas = far_collision_terms(
            m[PX], m[PY], m[VX], m[VY], alive_plane, fl,
            s=spec.collision_stencil, ff=ffspec,
            radius=cfg.particle_radius, dt=cfg.dt,
            ecoeff=(consts.elasticity + 1.0) * 0.5,
            friction=consts.friction, world_h=ht,
        )
        return jnp.stack(deltas)

    def body(m, _):
        return fused_substep2_call(m, immut, cvec, far=far_of(m), **kw), None

    if not observe:
        hot, _ = jax.lax.scan(body, hot, None, length=n)
        return hot, obs
    hot, _ = jax.lax.scan(body, hot, None, length=n - 1)
    return fused_substep2_call(hot, immut, cvec, far=far_of(hot),
                               obs_in=obs, **kw)


@functools.partial(
    jax.jit,
    static_argnames=("spec", "cfg", "ffspec", "tile_w", "interpret",
                     "n_sub", "observe"),
    donate_argnames=("hot", "obs", "fl"),
)
def fused_frame2_auto(hot, obs, immut, edge_consts, fl,
                      consts: PhysicsConstants, uin: UserInput, spec,
                      cfg: StaticConfig, ffspec, tile_w: int = 128,
                      interpret: bool = False,
                      n_sub: Optional[int] = None, observe: bool = True):
    """Far-field-autonomous frame: the :class:`FarList` rides the substep
    scan as part of the carry, entirely on device — no host round-trips.

    Per substep, BEFORE stepping:

    1. the deviation trigger runs on the carry planes
       (``list_invalid``): rebuild only when some particle's deviation
       from its linear reference motion ``p_ref + v_ref·τ`` (plus a
       one-substep growth margin) exceeds skin/2, or the list reaches
       its extrusion horizon.  Rebuilds are velocity-EXTRUDED
       (``FarFieldSpec.horizon``): uniform motion adds no candidates,
       debris sweeps out its flight path up front — so neither free
       fall nor one fast chunk forces frequent global rebuilds;
    2. a second ``lax.cond`` computes the far delta planes only when the
       list is non-empty (zeros otherwise) — the kernel itself is ONE
       executable for every substep.  Keeping the pallas_call OUTSIDE
       the conds matters twice over: branch-local pallas executables
       triggered a runtime `INVALID_ARGUMENT` TPU fault under certain
       branch patterns, and single-executable substeps avoid the cond
       buffer copies.

    This replaces the host-driven chunking loop (engine/backends.py
    history): host-side rebuild decisions cost a device sync plus Python
    dispatch per chunk, which degenerated to ~100 ms/substep mid-impact
    when the validity horizon dropped to a couple of substeps.

    Returns ``(hot', obs', fl', stats)`` with ``stats = int32[3]``
    (rebuilds this frame, max n_pairs seen, max overflow seen).
    """
    import dataclasses as _dc

    from ..farfield import (
        far_collision_terms,
        list_invalid,
        rebuild_far_list_planes,
    )

    w, h = padded_dims(spec.width, spec.height, tile_w)
    ht = hot.shape[-1]   # PAD_H + hr + lane_pad_hr
    cvec = jnp.concatenate(
        [_consts_vector(consts, uin, cfg, spec.height), edge_consts]
    )
    quantized = cfg.force_mode == "quantized"
    stencil = 0 if cfg.collision_mode == "none" else spec.collision_stencil
    alive_plane = immut[ALIVE] > 0.0
    kw = dict(w=w, h=h, stencil=stencil, quantized=quantized,
              tile_w=tile_w, interpret=interpret)
    n = cfg.subticks if n_sub is None else n_sub
    # hoisted constant for the empty-list branch (the cond still owns
    # its output buffer, but XLA can reuse one zero source instead of
    # materializing fresh zeros every substep)
    zero_far = jnp.zeros((5,) + hot.shape[1:], jnp.float32)

    def far_of(m, fl_):
        deltas = far_collision_terms(
            m[PX], m[PY], m[VX], m[VY], alive_plane, fl_,
            s=spec.collision_stencil, ff=ffspec,
            radius=cfg.particle_radius, dt=cfg.dt,
            ecoeff=(consts.elasticity + 1.0) * 0.5,
            friction=consts.friction, world_h=ht,
        )
        return jnp.stack(deltas)

    def substep(m, fl_, st, obs_in=None):
        need = list_invalid(
            m[PX], m[PY], m[VX], m[VY], alive_plane, fl_, cfg.dt, ffspec
        )
        fl_ = jax.lax.cond(
            need,
            lambda mm, old: rebuild_far_list_planes(
                mm[PX], mm[PY], alive_plane,
                s=spec.collision_stencil, ff=ffspec,
                radius=cfg.particle_radius,
                vx=mm[VX], vy=mm[VY], dt=cfg.dt,
            ),
            lambda mm, old: old,
            m, fl_,
        )
        st = jnp.stack([
            st[0] + need.astype(jnp.int32),
            jnp.maximum(st[1], fl_.n_pairs),
            jnp.maximum(st[2], fl_.overflow),
        ])
        far = jax.lax.cond(
            fl_.n_pairs > 0,
            lambda mm: far_of(mm, fl_),
            lambda mm: zero_far,
            m,
        )
        out = fused_substep2_call(m, immut, cvec, far=far,
                                  obs_in=obs_in, **kw)
        fl_ = _dc.replace(fl_, age=fl_.age + 1)  # substeps since rebuild
        return out, fl_, st

    st0 = jnp.zeros((3,), jnp.int32)

    def body(carry, _):
        m, fl_, st = carry
        m, fl_, st = substep(m, fl_, st)
        return (m, fl_, st), None

    if not observe:
        (hot, fl, st), _ = jax.lax.scan(body, (hot, fl, st0), None, length=n)
        return _zero_pads(hot, spec, tile_w), obs, fl, st
    (hot, fl, st), _ = jax.lax.scan(body, (hot, fl, st0), None, length=n - 1)
    (hot, obs), fl, st = substep(hot, fl, st, obs_in=obs)
    return (_zero_pads(hot, spec, tile_w), _zero_pads(obs, spec, tile_w),
            fl, st)


# trig carry vector lanes (f32[8], carried across substeps AND frames):
# max squared deviations of the newest state vs the far list's linear
# reference, the mean alive velocity (band-dev reference, one substep
# stale), and the side planes' age in substeps
T_MAXDD2, T_MAXDV2, T_VBX, T_VBY, T_SIDE_AGE = range(5)
N_TRIG = 8


@functools.partial(
    jax.jit,
    static_argnames=("spec", "cfg", "ffspec", "tile_w"),
)
def far3_carry_init(hot, immut, cfg: StaticConfig, spec, ffspec,
                    tile_w: int = 128):
    """Initial ``(side, trig)`` carry for :func:`fused_frame3_auto` —
    one XLA pass over the packed state (runs once per engine reset, not
    per frame).  ``trig[T_MAXDD2]`` is set huge so the first substep
    always anchors the far list with a rebuild from these side planes."""
    from ..farfield import kernel_side_from_planes

    w, h = padded_dims(spec.width, spec.height, tile_w)
    alive_plane = immut[ALIVE] > 0.0
    n_alive_f = jnp.maximum(jnp.sum(alive_plane.astype(jnp.float32)), 1.0)
    vbx = jnp.sum(jnp.where(alive_plane, hot[VX], 0.0)) / n_alive_f
    vby = jnp.sum(jnp.where(alive_plane, hot[VY], 0.0)) / n_alive_f
    side = kernel_side_from_planes(
        hot[PX], hot[PY], alive_plane, hot[VX], hot[VY],
        s=spec.collision_stencil, ff=ffspec, radius=cfg.particle_radius,
        T_band=float((ffspec.horizon + 1) * cfg.dt), vbar=(vbx, vby),
        interior_off=(PAD_W, PAD_H), interior_shape=(w, h),
    )
    trig = jnp.zeros((N_TRIG,), jnp.float32)
    trig = trig.at[T_MAXDD2].set(jnp.float32(1.0e30))
    trig = trig.at[T_VBX].set(vbx)
    trig = trig.at[T_VBY].set(vby)
    trig = trig.at[T_SIDE_AGE].set(jnp.float32(1.0))
    return side, trig


@functools.partial(
    jax.jit,
    static_argnames=("spec", "cfg", "ffspec", "tile_w", "interpret",
                     "n_sub", "observe", "buckets"),
    donate_argnames=("hot", "obs", "fl", "side", "trig"),
)
def fused_frame3_auto(hot, obs, immut, edge_consts, fl, side, trig,
                      consts: PhysicsConstants, uin: UserInput, spec,
                      cfg: StaticConfig, ffspec, tile_w: int = 128,
                      interpret: bool = False,
                      n_sub: Optional[int] = None, observe: bool = True,
                      buckets: Tuple[int, ...] = (512, 2048)):
    """v3 far-field-autonomous frame: the kernel itself produces the
    trigger metric and the detection state, both carried ACROSS frames
    (``side``/``trig`` from :func:`far3_carry_init` on the first call,
    then threaded through like the far list).

    Differences vs :func:`fused_frame2_auto` (each a measured cost
    there):

    - **trigger in-kernel, sqrt-free**: each substep's kernel emits the
      per-slab max SQUARED deviations of its OUTPUT state vs the list's
      linear reference (SMEM stats); the glue forms the conservative
      bound ``sqrt(max dd²) + c·sqrt(max dv²) ≥ max(|dd| + c·|dv|)``
      with two scalar sqrts — the XLA ``list_invalid`` full-plane pass
      (~0.3–0.5 ms/substep incl. two sqrt planes) disappears.  The
      bound can only fire EARLY (extra rebuilds), never late.
    - **detection in-kernel**: chunk AABB/velocity partials and the
      band-source hit flags are side-outputs of the kernel (computed on
      its INPUT state from VMEM — the XLA front-end re-reads ~1.2 GB of
      HBM for the same answer), runtime-gated by a predictive flag so
      calm substeps skip the extra VPU work (their side block is left
      unwritten garbage and discarded here); the rebuild branch then
      only runs chunk-plane candidate extraction + compaction.
    - **bucketed apply**: ``lax.switch`` over cropped capacities so one
      active pair no longer pays the full-K windowed gather
      (fused_frame2_auto paid K=512 always — VERDICT r2 weak #5).
    - **no per-frame anchor pass**: carrying side/trig across frames
      removes round 2's duplicated substep-0 XLA trigger + full-plane
      rebuild graphs (VERDICT r2 weak #6, compile size).

    The detection lag (side outputs describe the state ``side_age``
    substeps ago) is covered by extruding with ``horizon_pad =
    side_age + 1`` substeps.  Returns
    ``(hot', obs', fl', side', trig', stats)``, ``stats = int32[3]``
    (rebuilds this frame, max n_pairs seen, max overflow seen).
    """
    import dataclasses as _dc

    from ..farfield import (
        ChunkPlanes,
        chunk_any_alive,
        crop_far_list,
        extrude_chunk_planes,
        far_collision_terms,
        raw_planes_from_side,
        rebuild_far_list_from_chunks,
    )

    ff = ffspec
    w, h = padded_dims(spec.width, spec.height, tile_w)
    ht = hot.shape[-1]   # PAD_H + hr + lane_pad_hr
    cvec0 = jnp.concatenate(
        [_consts_vector(consts, uin, cfg, spec.height), edge_consts]
    )
    quantized = cfg.force_mode == "quantized"
    stencil = 0 if cfg.collision_mode == "none" else spec.collision_stencil
    alive_plane = immut[ALIVE] > 0.0
    kw = dict(w=w, h=h, stencil=stencil, quantized=quantized,
              tile_w=tile_w, interpret=interpret)
    n = cfg.subticks if n_sub is None else n_sub
    budget = jnp.float32(0.5 * ff.skin)
    base_reach = float(2.0 * cfg.particle_radius + ff.skin)
    safdt = float(ff.speed_safety * cfg.dt)
    t_band = float((ff.horizon + 1) * cfg.dt)
    n_alive_f = jnp.maximum(
        jnp.sum(alive_plane.astype(jnp.float32)), 1.0
    )
    cany = chunk_any_alive(alive_plane, ff)
    zero_far = jnp.zeros((5,) + hot.shape[1:], jnp.float32)
    all_buckets = tuple(b for b in buckets if b < ff.max_pairs) + (
        ff.max_pairs,
    )

    def far_of(m, fl_, k):
        flk = crop_far_list(fl_, k)
        deltas = far_collision_terms(
            m[PX], m[PY], m[VX], m[VY], alive_plane, flk,
            s=spec.collision_stencil, ff=ff,
            radius=cfg.particle_radius, dt=cfg.dt,
            ecoeff=(consts.elasticity + 1.0) * 0.5,
            friction=consts.friction, world_h=ht,
        )
        return jnp.stack(deltas)

    def bucketed_far(m, fl_):
        bidx = sum(
            (fl_.n_pairs > jnp.int32(b)).astype(jnp.int32)
            for b in all_buckets[:-1]
        )
        branches = [lambda mm: zero_far]
        for b in all_buckets:
            branches.append(
                functools.partial(lambda k, mm: far_of(mm, fl_, k), b)
            )
        return jax.lax.switch(
            (fl_.n_pairs > 0).astype(jnp.int32) * (bidx + 1),
            branches, m,
        )

    def rebuild_from_side(m, side_, side_age_f):
        raw = raw_planes_from_side(side_, hot.shape[1], hot.shape[2],
                                   (PAD_W, PAD_H), ff)
        T = (jnp.float32(ff.horizon) + side_age_f + 1.0) * jnp.float32(
            cfg.dt
        )
        iminx, imaxx, iminy, imaxy = extrude_chunk_planes(
            raw, cany, ff=ff, radius=cfg.particle_radius, T=T,
            extruded=True,
        )
        cp = ChunkPlanes(iminx, imaxx, iminy, imaxy, cany, raw.band,
                         jnp.zeros(2, jnp.float32))
        return rebuild_far_list_from_chunks(
            cp, m[PX], m[PY], m[VX], m[VY], ff=ff
        )

    def substep(carry, obs_in=None):
        m, fl_, side_, tg, st = carry
        maxdev = jnp.sqrt(tg[T_MAXDD2]) + jnp.float32(safdt) * jnp.sqrt(
            tg[T_MAXDV2]
        )
        need = (maxdev > budget) | (fl_.age >= ff.horizon)
        det = (
            need
            | (maxdev > 0.5 * budget)
            | (fl_.age >= ff.horizon - 2)
        )
        fl_ = jax.lax.cond(
            need,
            lambda mm, old: rebuild_from_side(mm, side_,
                                              tg[T_SIDE_AGE]),
            lambda mm, old: old,
            m, fl_,
        )
        st = jnp.stack([
            st[0] + need.astype(jnp.int32),
            jnp.maximum(st[1], fl_.n_pairs),
            jnp.maximum(st[2], fl_.overflow),
        ])
        far = bucketed_far(m, fl_)
        nonlocal_extras = jnp.stack([
            (fl_.age + 1).astype(jnp.float32) * jnp.float32(cfg.dt),
            det.astype(jnp.float32),
            tg[T_VBX], tg[T_VBY],
            jnp.float32(t_band), jnp.float32(base_reach),
            jnp.float32(safdt), jnp.float32(0.0),
        ])
        refs = jnp.stack([fl_.px_ref, fl_.py_ref, fl_.vx_ref,
                          fl_.vy_ref])
        outs = fused_substep2_call(
            m, immut, jnp.concatenate([cvec0, nonlocal_extras]),
            far=far, obs_in=obs_in, refs=refs, detect=True, **kw,
        )
        if obs_in is None:
            m2, stats, side_new = outs
            obs_out = None
        else:
            m2, obs_out, stats, side_new = outs
        side_ = jnp.where(det, side_new, side_)
        tg = jnp.stack([
            jnp.max(stats[:, ST_MAXDD2]),
            jnp.max(stats[:, ST_MAXDV2]),
            jnp.sum(stats[:, ST_SUMVX]) / n_alive_f,
            jnp.sum(stats[:, ST_SUMVY]) / n_alive_f,
            jnp.where(det, jnp.float32(1.0), tg[T_SIDE_AGE] + 1.0),
            jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
        ])
        fl_ = _dc.replace(fl_, age=fl_.age + 1)
        return (m2, fl_, side_, tg, st), obs_out

    st0 = jnp.zeros((3,), jnp.int32)
    carry = (hot, fl, side, trig, st0)

    def body(c_, _):
        c_, _o = substep(c_)
        return c_, None

    if not observe:
        carry, _ = jax.lax.scan(body, carry, None, length=n)
        (hot, fl, side, trig, st) = carry
        return (_zero_pads(hot, spec, tile_w), obs, fl, side, trig, st)
    carry, _ = jax.lax.scan(body, carry, None, length=n - 1)
    carry, obs = substep(carry, obs_in=obs)
    (hot, fl, side, trig, st) = carry
    return (_zero_pads(hot, spec, tile_w), _zero_pads(obs, spec, tile_w),
            fl, side, trig, st)


def rebuild_far_list_packed2(hot, immut, *, s: int, ff, radius: float):
    """Far-list rebuild from the v2 packed stacks (padded coordinates)."""
    from ..farfield import rebuild_far_list_planes

    alive = immut[ALIVE] > 0.0
    return rebuild_far_list_planes(hot[PX], hot[PY], alive, s=s, ff=ff,
                                   radius=radius)


@jax.jit
def packed_far_motion2(hot, immut, fl):
    from ..farfield import displacement_check, max_relative_speed

    pos = jnp.stack([hot[PX], hot[PY]], axis=-1)
    vel = jnp.stack([hot[VX], hot[VY]], axis=-1)
    alive = immut[ALIVE] > 0.0
    return displacement_check(pos, alive, fl), max_relative_speed(vel, alive)


@functools.partial(
    jax.jit,
    static_argnames=("spec", "cfg", "ffspec", "tile_w", "interpret",
                     "n_sub", "observe", "buckets", "activation",
                     "far_mb", "far_mb_out", "detect_mode", "band_impl",
                     "kvar"),
    donate_argnames=("hot", "obs"),
)
def fused_frame4(hot, obs, immut, edge_consts, consts: PhysicsConstants,
                 uin: UserInput, spec, cfg: StaticConfig, ffspec,
                 tile_w: int = 128, interpret: bool = False,
                 n_sub: Optional[int] = None, observe: bool = True,
                 buckets: Tuple[int, ...] = (1024, 2048, 4096),
                 activation: bool = False, far_mb: int = 32,
                 far_mb_out: Optional[int] = None,
                 detect_mode: str = "xla",
                 band_impl: str = "xla",
                 kvar: Tuple[str, ...] = ()):
    """v4 far-field frame: fixed-cadence unconditional rebuilds + the
    mirror-table pair apply (ops/farfield4.py — design and measured
    rationale there).

    ``detect_mode="kernel"`` moves the rebuild's particle-plane
    detection front-end INTO the fused kernel: each block's last
    substep runs with the v3 ``detect`` side-outputs on (no trigger
    machinery — no refs DMA, no deviation stats), and the next block's
    rebuild finishes from the chunk-level side planes
    (``raw_planes_from_side`` + ``extrude_chunk_planes`` +
    ``rebuild_far_list_from_chunks``).  Motivation: the dense XLA
    detection measures 1.84 ms of the 3.38 ms rebuild at 1M
    (scripts/probe_r6.py) while the kernel already holds every plane
    in VMEM.  Block 0's side planes come from the XLA producer
    ``kernel_side_from_planes`` (parity-exact; once per frame).  The
    side state is one substep staler than the rebuild state, covered
    by horizon_pad=1 in the extrusion window (same contract as the v3
    auto frame).  Incompatible with ``activation`` (the activation
    schedule needs the raw pre-extrusion planes at rebuild time).

    The frame is ``n/R`` blocks of [rebuild → R substeps] with
    ``R = ffspec.horizon`` (the Verlet cadence; must divide the substep
    count).  No trigger, no carried far state across frames, no
    lax.cond: rebuild cost is amortized by construction and the compile
    graph is one substep body + one rebuild (+ the bucket variants of
    the apply).

    With ``activation`` (default), the rebuild also computes each
    pair's conservative first-contact substep and per-substep active
    prefix counts (ops/farfield.py::pair_activation) — substep ``s``'s
    apply then prices by the pairs that can actually touch by ``s``,
    not the whole candidate list.  Physics is unchanged (gated pairs
    contribute exactly zero); only f32 scatter-add order differs.

    Returns ``(hot', obs', stats)`` with ``stats = int32[3]``:
    (rebuilds, max n_pairs, max overflow) over the frame.
    """
    import dataclasses as _dc

    from ..farfield import (
        rebuild_far_list_planes,
        rebuild_far_list_planes_active,
    )
    from ..farfield4 import bucketed_far_delta_planes

    ff = ffspec
    w, h = padded_dims(spec.width, spec.height, tile_w)
    cvec = jnp.concatenate(
        [_consts_vector(consts, uin, cfg, spec.height), edge_consts]
    )
    quantized = cfg.force_mode == "quantized"
    stencil = 0 if cfg.collision_mode == "none" else spec.collision_stencil
    alive_plane = immut[ALIVE] > 0.0

    # all far machinery runs on the UNPADDED interior [w, h] (the hot
    # stack's pad rings are alive=0 everywhere — slicing them off cuts
    # the mirror/pool/band work ~25% at 1M)
    pad_hl, pad_w = _kvar_pads(kvar)["pad_hl"], PAD_W

    def interior(plane):
        return jax.lax.slice(plane, (pad_w, pad_hl),
                             (pad_w + w, pad_hl + h))

    alive_int = interior(alive_plane)
    alive_int_f = alive_int.astype(jnp.float32)
    kw = dict(w=w, h=h, stencil=stencil, quantized=quantized,
              tile_w=tile_w, interpret=interpret, kvar=kvar,
              pad_hl=pad_hl, pad_w=pad_w)
    n = cfg.subticks if n_sub is None else n_sub
    # cadence: full blocks of R substeps + one remainder block (so any
    # horizon works with any substep count; the remainder block still
    # rebuilds, keeping list staleness ≤ R everywhere)
    R = min(ff.horizon, n)
    n_outer = n // R
    rem = n % R

    def rebuild(m):
        if activation:
            return rebuild_far_list_planes_active(
                interior(m[PX]), interior(m[PY]), alive_int,
                s=spec.collision_stencil, ff=ff,
                radius=cfg.particle_radius, vx=interior(m[VX]),
                vy=interior(m[VY]), dt=cfg.dt, R=R,
                band_impl=band_impl,
            )
        fl = rebuild_far_list_planes(
            interior(m[PX]), interior(m[PY]), alive_int,
            s=spec.collision_stencil, ff=ff,
            radius=cfg.particle_radius, vx=interior(m[VX]),
            vy=interior(m[VY]), dt=cfg.dt, band_impl=band_impl,
        )
        return fl, None

    # kvar "kmirror": the kernel emits each substep's far-apply mirror
    # records as a side output (see _kernel2's emit_mirror block), and
    # the mirror rides the scan carry — the apply's granularity-bound
    # [5,w,h]→records relayout (~0.185 ms/substep at 1M) then runs only
    # ONCE per frame (the XLA producer below seeds the carry).
    # kvar "krec" (implies the kmirror carry): the apply also RETURNS
    # delta records and the kernel consumes them directly (see
    # _kernel2's far_records block) — the unmirror (~0.28 ms/substep)
    # disappears too, and with both relayouts free every bucket uses
    # the mirror path (the narrow small-bucket variant is skipped).
    krec = "krec" in kvar
    kmir = "kmirror" in kvar or krec
    if kmir:
        if detect_mode == "kernel":
            raise ValueError(
                "kvar 'kmirror'/'krec' is incompatible with "
                "detect_mode='kernel' (the mirror carry is threaded "
                "through the xla-detect frame only)")
        if far_mb != 32:
            raise ValueError("kvar 'kmirror'/'krec' uses mb=32 "
                             f"records; far_mb={far_mb} unsupported")
        from ..farfield4 import mirror_table

        def mir_of(m):
            p5 = jnp.stack([
                interior(m[PX]), interior(m[PY]),
                interior(m[VX]), interior(m[VY]), alive_int_f,
            ])
            return mirror_table(p5).reshape(h // 32, w // 4, 640)

    def substep(mst, fl, n_act_s=None, obs_in=None, cvec_=None,
                detect=False):
        m, mir = mst if kmir else (mst, None)
        if n_act_s is not None:
            # active-prefix crop for this substep: the list is sorted by
            # activation substep, so the first n_act_s entries are
            # exactly the pairs that can touch by now
            fl = _dc.replace(
                fl,
                n_pairs=n_act_s,
                valid=fl.valid
                & (jnp.arange(fl.capacity, dtype=jnp.int32) < n_act_s),
            )
        far_int = bucketed_far_delta_planes(
            m, alive_int_f, fl, s=spec.collision_stencil, ff=ff,
            radius=cfg.particle_radius, dt=cfg.dt,
            ecoeff=(consts.elasticity + 1.0) * 0.5,
            friction=consts.friction, w=w, h=h,
            plane_idx=(PX, PY, VX, VY), pad=(pad_w, pad_hl),
            buckets=buckets, mb=far_mb, mb_out=far_mb_out,
            table=None if mir is None else mir.reshape(-1, 5 * 4 * 32),
            as_table=krec,
        )
        if krec:
            far_int = far_int.reshape(h // 32, w // 4, 5 * 4 * 32)
        outs = fused_substep2_call(m, immut,
                                   cvec if cvec_ is None else cvec_,
                                   far=far_int, far_interior=True,
                                   obs_in=obs_in, detect=detect,
                                   emit_mirror=kmir, far_records=krec,
                                   **kw)
        if not kmir:
            return outs
        if obs_in is not None:
            hot_, obs_, mir_ = outs
            return (hot_, mir_), obs_
        hot_, mir_ = outs
        return (hot_, mir_)

    def block(mst, n_inner):
        fl, n_act = rebuild(mst[0] if kmir else mst)

        def inner(mm, s_idx):
            return substep(mm, fl,
                           None if n_act is None else n_act[s_idx]), None

        mst, _ = jax.lax.scan(inner, mst,
                              jnp.arange(n_inner, dtype=jnp.int32))
        # max active pairs in the block (counts are monotone in s)
        na = fl.n_pairs if n_act is None else n_act[n_inner - 1]
        return mst, fl, na

    # stats int32[4]: rebuilds, max n_pairs, max overflow, max active
    st = jnp.zeros((4,), jnp.int32)

    def merge_st(st_, fl, na):
        return jnp.stack([
            st_[0] + 1,
            jnp.maximum(st_[1], fl.n_pairs),
            jnp.maximum(st_[2], fl.overflow),
            jnp.maximum(st_[3], na),
        ])

    if detect_mode == "kernel":
        if activation:
            raise ValueError(
                "detect_mode='kernel' is incompatible with the "
                "activation schedule (it needs raw pre-extrusion "
                "planes at rebuild time)")
        from ..farfield import (
            ChunkPlanes,
            chunk_any_alive,
            extrude_chunk_planes,
            kernel_side_from_planes,
            raw_planes_from_side,
            rebuild_far_list_from_chunks,
        )

        cany = chunk_any_alive(alive_int, ff)
        base_reach = float(2.0 * cfg.particle_radius + ff.skin)
        # +1 substep on both the band reach window and the extrusion
        # horizon: the side planes are computed on the INPUT state of
        # each block's last substep, one substep staler than the
        # rebuild state (same horizon_pad=1 contract as the v3 frame)
        t_band = float((R + 1) * cfg.dt)
        n_alive_f = jnp.maximum(jnp.sum(alive_int_f), 1.0)

        def vbar_of(m):
            vbx = jnp.sum(
                jnp.where(alive_int, interior(m[VX]), 0.0)) / n_alive_f
            vby = jnp.sum(
                jnp.where(alive_int, interior(m[VY]), 0.0)) / n_alive_f
            return vbx, vby

        def extras_of(m):
            vbx, vby = vbar_of(m)
            return jnp.stack([
                jnp.float32(0.0),          # X_TAU (trigger-only)
                jnp.float32(1.0),          # X_DET
                vbx, vby,
                jnp.float32(t_band),
                jnp.float32(base_reach),
                jnp.float32(ff.speed_safety * cfg.dt),
                jnp.float32(0.0),
            ])

        def rebuild_side(m, side):
            raw = raw_planes_from_side(side, w, h, (0, 0), ff)
            ix_, ax_, iy_, ay_ = extrude_chunk_planes(
                raw, cany, ff=ff, radius=cfg.particle_radius,
                T=float((R + 1) * cfg.dt), extruded=True)
            cp = ChunkPlanes(ix_, ax_, iy_, ay_, cany, raw.band,
                             jnp.zeros(2, jnp.float32))
            return rebuild_far_list_from_chunks(
                cp, interior(m[PX]), interior(m[PY]),
                interior(m[VX]), interior(m[VY]), ff=ff)

        def substep_detect(m, fl):
            return substep(m, fl,
                           cvec_=jnp.concatenate([cvec, extras_of(m)]),
                           detect=True)

        vb0 = vbar_of(hot)
        side = kernel_side_from_planes(
            interior(hot[PX]), interior(hot[PY]), alive_int,
            interior(hot[VX]), interior(hot[VY]),
            s=spec.collision_stencil, ff=ff,
            radius=cfg.particle_radius, T_band=t_band, vbar=vb0,
            interior_off=(0, 0), interior_shape=(w, h))

        def outer_k(carry, _):
            m, sd, st_ = carry
            fl = rebuild_side(m, sd)

            def inner(mm, _):
                return substep(mm, fl), None

            if R > 1:
                m, _ = jax.lax.scan(inner, m, None, length=R - 1)
            m, sd = substep_detect(m, fl)
            return (m, sd, merge_st(st_, fl, fl.n_pairs)), None

        # full blocks before the final segment; the final segment (rem
        # substeps, or a full R when rem == 0) ends with the observing
        # substep (observe=True) or a plain hot substep — its side
        # output would be unused (no cross-frame far state), so it
        # never runs detect
        last = rem if rem else R
        n_full_before = n_outer if rem else n_outer - 1
        if n_full_before > 0:
            (hot, side, st), _ = jax.lax.scan(
                outer_k, (hot, side, st), None, length=n_full_before)
        fl = rebuild_side(hot, side)

        def inner_last(mm, _):
            return substep(mm, fl), None

        if last > 1:
            hot, _ = jax.lax.scan(inner_last, hot, None, length=last - 1)
        if observe:
            hot, obs = substep(hot, fl, obs_in=obs)
        else:
            hot = substep(hot, fl)
        st = merge_st(st, fl, fl.n_pairs)
        return (_zero_pads(hot, spec, tile_w, pad_hl, pad_w),
                _zero_pads(obs, spec, tile_w, pad_hl, pad_w) if observe else obs,
                st)

    def outer(carry, _):
        m, st_ = carry
        m, fl, na = block(m, R)
        return (m, merge_st(st_, fl, na)), None

    mst = (hot, mir_of(hot)) if kmir else hot

    if not observe:
        (mst, st), _ = jax.lax.scan(outer, (mst, st), None,
                                    length=n_outer)
        if rem:
            mst, fl, na = block(mst, rem)
            st = merge_st(st, fl, na)
        hot = mst[0] if kmir else mst
        return _zero_pads(hot, spec, tile_w, pad_hl, pad_w), obs, st

    # last block (remainder size, or a full R) ends with the observing
    # substep; everything before it runs through the outer scan
    last = rem if rem else R
    n_full_before = n_outer if rem else n_outer - 1
    if n_full_before > 0:
        (mst, st), _ = jax.lax.scan(outer, (mst, st), None,
                                    length=n_full_before)
    fl, n_act = rebuild(mst[0] if kmir else mst)

    def inner(mm, s_idx):
        return substep(mm, fl,
                       None if n_act is None else n_act[s_idx]), None

    if last > 1:
        mst, _ = jax.lax.scan(inner, mst,
                              jnp.arange(last - 1, dtype=jnp.int32))
    mst, obs = substep(mst, fl,
                       None if n_act is None else n_act[last - 1],
                       obs_in=obs)
    hot = mst[0] if kmir else mst
    st = merge_st(st, fl,
                  fl.n_pairs if n_act is None else n_act[last - 1])
    return (_zero_pads(hot, spec, tile_w, pad_hl, pad_w),
            _zero_pads(obs, spec, tile_w, pad_hl, pad_w), st)
