"""Fused kernel v3 (in-kernel far-field trigger + detection
side-outputs, ops/pallas/fused_substep2.py): the side outputs must match
the XLA detection front-end bit-for-bit (interpret mode), and the
autonomous v3 frame must reproduce the v2 auto frame's physics.

Also the golden tear test for the benched fragile-fabric scene
(VERDICT r2 weak #4/#9): tear onset pinned vs the NumPy oracle at small
scale with the exact bench constants."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from softbody_tpu import PhysicsConstants, StaticConfig, UserInput
from softbody_tpu.ops.stencil import LatticeSpec
from softbody_tpu.ops.farfield import (
    FarFieldSpec,
    empty_far_list,
    raw_chunk_planes,
    raw_planes_from_side,
)
from softbody_tpu.ops.pallas.fused_substep import PAD_H, PAD_W, _consts_vector
from softbody_tpu.ops.pallas.fused_substep2 import (
    ALIVE,
    PX,
    PY,
    VX,
    VY,
    far3_carry_init,
    fused_frame2_auto,
    fused_frame3_auto,
    fused_substep2_call,
    pack_lattice2,
    padded_dims,
    unpack_lattice2,
)

from test_farfield import hairpin

RADIUS = 4.0
FF = FarFieldSpec(max_pairs=64, max_tile_pairs=32, skin=4.0, horizon=8)
CFG = StaticConfig(subticks=8, collision_mode="allpairs",
                   particle_radius=RADIUS, force_mode="quantized")


def test_kernel_side_outputs_match_xla_frontend():
    """The kernel's detection side outputs (chunk AABBs, velocity spans,
    band flags — computed on the input state from VMEM) must equal the
    XLA particle-plane front-end's raw chunk planes."""
    ls = hairpin()
    w, h = ls.shape
    consts, uin = PhysicsConstants.default(), UserInput.none()
    hot, obs, immut, ec = pack_lattice2(ls, tile_w=8)
    wr, hr = padded_dims(w, h, 8)
    cvec = jnp.concatenate([_consts_vector(consts, uin, CFG, h), ec])
    alive = immut[ALIVE] > 0.0
    n_alive = float(jnp.sum(alive))
    vbx = float(jnp.sum(jnp.where(alive, hot[VX], 0.0)) / n_alive)
    vby = float(jnp.sum(jnp.where(alive, hot[VY], 0.0)) / n_alive)
    t_band = (FF.horizon + 1) * CFG.dt
    extras = jnp.asarray(
        [CFG.dt, 1.0, vbx, vby, t_band, 2 * RADIUS + FF.skin,
         FF.speed_safety * CFG.dt, 0.0], jnp.float32)
    refs = jnp.stack([hot[PX], hot[PY], hot[VX], hot[VY]])
    _m2, stats, side = fused_substep2_call(
        hot, immut, jnp.concatenate([cvec, extras]),
        w=wr, h=hr, stencil=2, quantized=True, tile_w=8, interpret=True,
        refs=refs, detect=True,
    )
    raw_k = raw_planes_from_side(side, hot.shape[1], hot.shape[2],
                                 (PAD_W, PAD_H), FF)
    raw_x, cany, _com = raw_chunk_planes(
        hot[PX], hot[PY], alive, s=2, ff=FF, radius=RADIUS,
        vxu=hot[VX], vyu=hot[VY], T_band=t_band, vbar=(vbx, vby),
    )
    m = np.asarray(cany)
    for name in ("minx", "maxx", "miny", "maxy",
                 "vminx", "vmaxx", "vminy", "vmaxy"):
        np.testing.assert_allclose(
            np.asarray(getattr(raw_k, name))[m],
            np.asarray(getattr(raw_x, name))[m], atol=1e-5, rtol=0,
            err_msg=name)
    np.testing.assert_array_equal(np.asarray(raw_k.band),
                                  np.asarray(raw_x.band))
    assert np.asarray(stats).shape[1] >= 3
    assert float(np.asarray(stats)[:, 0].max()) >= 0.0


def test_v3_auto_frame_matches_v2():
    """Two frames of the folded strip: the v3 frame (kernel trigger +
    side-output rebuilds) must reproduce the v2 auto frame's physics —
    both candidate lists cover every truly interacting pair, so forces
    agree up to f32 summation order (measured bit-identical here)."""
    ls = hairpin()
    w, h = ls.shape
    spec = LatticeSpec(w, h, collision_stencil=2)
    consts, uin = PhysicsConstants.default(), UserInput.none()
    outs = {}
    for name in ("v2", "v3"):
        hot, obs, immut, ec = pack_lattice2(ls, tile_w=8)
        fl = empty_far_list(hot.shape[1], hot.shape[2], FF)
        st = None
        if name == "v2":
            for _ in range(2):
                hot, obs, fl, st = fused_frame2_auto(
                    hot, obs, immut, ec, fl, consts, uin, spec, CFG,
                    FF, tile_w=8, interpret=True)
        else:
            side, trig = far3_carry_init(hot, immut, CFG, spec, FF,
                                         tile_w=8)
            for _ in range(2):
                hot, obs, fl, side, trig, st = fused_frame3_auto(
                    hot, obs, immut, ec, fl, side, trig, consts, uin,
                    spec, CFG, FF, tile_w=8, interpret=True)
        got = unpack_lattice2(hot, obs, ls)
        outs[name] = (np.asarray(got.pos), np.asarray(got.vel),
                      np.asarray(st))
    assert np.isfinite(outs["v3"][0]).all()
    assert outs["v3"][2][1] > 0, "v3 found no far pairs on the fold"
    np.testing.assert_allclose(outs["v3"][0], outs["v2"][0],
                               rtol=0, atol=5e-3)
    np.testing.assert_allclose(outs["v3"][1], outs["v2"][1],
                               rtol=0, atol=5e-2)


def test_v3_flat_lattice_no_rebuild_storm():
    """Free-falling flat cloth: after the first-substep rebuild anchors
    the list, the velocity-extruded detection must keep the list valid —
    rebuilds stay at the horizon cadence, pairs stay zero.

    Runs at the reference dt = 1/64: at dt = 1/8 the spring-120
    8-neighbour lattice is integrator-unstable (ω·dt ≈ 3 > 2) and
    genuinely collapses into real contacts — measured identical on the
    v2-plain kernel, so it is scene physics, not a v3 artifact."""
    from softbody_tpu.models import make_lattice

    ls = make_lattice(32, 16, 10.0)
    ls = dataclasses.replace(
        ls, vel=jnp.full_like(ls.vel, -2.0))
    w, h = ls.shape
    spec = LatticeSpec(w, h, collision_stencil=2)
    consts, uin = PhysicsConstants.default(), UserInput.none()
    cfg64 = dataclasses.replace(CFG, subticks=64)
    ff = dataclasses.replace(FF, skin=3.0, horizon=8)
    hot, obs, immut, ec = pack_lattice2(ls, tile_w=8)
    fl = empty_far_list(hot.shape[1], hot.shape[2], ff)
    side, trig = far3_carry_init(hot, immut, cfg64, spec, ff, tile_w=8)
    hot, obs, fl, side, trig, st = fused_frame3_auto(
        hot, obs, immut, ec, fl, side, trig, consts, uin, spec, cfg64,
        ff, tile_w=8, interpret=True, n_sub=8)
    st = np.asarray(st)
    assert st[1] == 0, f"flat cloth produced far pairs: {st}"
    # 8 substeps, horizon 8: the empty-list anchor rebuild plus at most
    # one horizon-expiry rebuild
    assert st[0] <= 3, f"rebuild storm on flat cloth: {st}"


def test_golden_tear_onset_matches_oracle():
    """The benched fragile-fabric constants (strain_limit 0.22 /
    yield 0.18, pre-cut slits) at 32×32 with a fast fall: tear ONSET —
    when breakage starts, how many beams break, and where — must match
    the NumPy oracle (pins the headline workload's physics to the
    reference semantics, compute.wgsl:96-131 breakage, at a testable
    scale).  Post-onset trajectories are chaotic (breakage branches on
    f32 collision sums whose order differs between kernel and oracle),
    so onset is the right golden quantity."""
    import oracle
    from softbody_tpu.models import tearing_cloth_lattice
    from test_farfield import to_oracle

    # soft springs: impact strain scales as v/(spacing·√k), and 32×32
    # spacing is 33× the 1M bench's — spring 2.0 restores the bench's
    # strain regime at this scale (oracle-measured: onset substep 63,
    # 2 beams — a localized tear, so the location assertion is sharp)
    lstate, spec, cfg, consts = tearing_cloth_lattice(
        n_particles=32 * 32, spring=2.0, damp=0.2, fall_speed=10.0,
        slits=2, strain_limit=0.22, yield_strain=0.18,
    )
    uin = UserInput.none()
    s_np = to_oracle(lstate)
    oconsts = {
        "gravity": np.asarray(consts.gravity),
        "border_elasticity": np.float32(consts.border_elasticity),
        "border_friction": np.float32(consts.border_friction),
        "elasticity": np.float32(consts.elasticity),
        "friction": np.float32(consts.friction),
        "drag_coeff": np.float32(consts.drag_coeff),
        "drag_exp": np.float32(consts.drag_exp),
    }
    # oracle first: find the onset substep (first breakage) + 4 more
    onset = None
    for t in range(256):
        s_np = oracle.substep(s_np, consts=oconsts, dt=cfg.dt,
                              radius=cfg.particle_radius, quantized=True)
        if onset is None and (~s_np["beam_alive"]).any():
            onset = t
        if onset is not None and t >= onset + 4:
            break
    assert onset is not None, "scene never tore — not the bench regime"
    n_sub = t + 1

    from softbody_tpu.ops.pallas.fused_substep2 import fused_frame2

    hot, obs, immut, ec = pack_lattice2(lstate, tile_w=8)
    hot, obs = fused_frame2(hot, obs, immut, ec, consts, uin, spec,
                            cfg, tile_w=8, interpret=True, n_sub=n_sub)
    got = unpack_lattice2(hot, obs, lstate)
    n_broken_kernel = sum(
        int((np.asarray(lstate.edges[ci].alive)
             & ~np.asarray(e.alive)).sum())
        for ci, e in enumerate(got.edges))
    n_broken_oracle = int((~s_np["beam_alive"]).sum())
    # onset count parity (same substep horizon): within 2× of each other
    assert n_broken_kernel > 0, "kernel did not tear at oracle onset"
    assert n_broken_kernel <= 2 * n_broken_oracle + 4
    assert n_broken_oracle <= 2 * n_broken_kernel + 4
    # onset LOCATION: every kernel-broken beam sits near an
    # oracle-broken beam (within 3 rest spacings)
    w, h = lstate.shape
    spacing = 980.0 / (w - 1)
    pos0 = np.asarray(lstate.pos).reshape(-1, 2)
    ob = s_np["beam_a"][~s_np["beam_alive"]]
    oracle_pts = pos0[ob]
    # kernel broken beams per class → owner particle index
    kpts = []
    for ci, e in enumerate(got.edges):
        dead = ~np.asarray(e.alive)
        # exclude edges that were never alive (lattice boundary slots)
        dead &= np.asarray(lstate.edges[ci].alive)
        kpts.append(np.asarray(lstate.pos)[dead])
    kpts = np.concatenate([k.reshape(-1, 2) for k in kpts])
    assert kpts.shape[0] == n_broken_kernel
    d = np.sqrt(((kpts[:, None, :] - oracle_pts[None, :, :]) ** 2
                 ).sum(-1)).min(axis=1)
    assert (d < 3 * spacing).all(), (
        f"kernel tear sites far from oracle's: {d.max():.1f}")
