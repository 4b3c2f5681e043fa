"""Far-field self-collision (ops/farfield.py): index-distant contacts on
the lattice path must match the reference's all-pairs semantics
(compute.wgsl:144-170, via the NumPy oracle)."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from softbody_tpu import PhysicsConstants, StaticConfig, UserInput
from softbody_tpu.models import lattice_to_simstate, make_lattice
from softbody_tpu.ops.farfield import (
    FarFieldSpec,
    displacement_check,
    far_collision_terms,
    max_relative_speed,
    rebuild_far_list,
)
from softbody_tpu.ops.stencil import (
    LatticeSpec,
    lattice_frame_far_jit,
    lattice_substep_jit,
)

import oracle

RADIUS = 4.0
SPACING = 10.0


def hairpin(w=96, h=4, gap=6.0, spring=0.0):
    """A strip folded back on itself: columns i and w-1-i overlap
    spatially at vertical offset ``gap`` (< 2·RADIUS, so the two layers
    are in contact) while being index-distant — the configuration the
    near-field stencil cannot see."""
    ls = make_lattice(w, h, SPACING, spring=spring, damp=0.0,
                      yield_strain=10.0, strain_limit=100.0)
    half = w // 2
    pos = np.zeros((w, h, 2), np.float32)
    for i in range(w):
        y_row = 300.0 if i < half else 300.0 + gap
        xi = i if i < half else (w - 1 - i)
        # half-spacing shift so folded particles interleave, not stack
        xoff = 0.0 if i < half else SPACING * 0.5
        pos[i, :, 0] = 100.0 + xi * SPACING + xoff
        pos[i, :, 1] = y_row + np.arange(h) * SPACING * 3.0
    # rows separated by 3*SPACING so only the fold contact matters
    pos = pos.reshape(w, h, 2)
    vel = np.zeros((w, h, 2), np.float32)
    # push the layers together so contacts generate impulses
    vel[:half, :, 1] = 1.5
    vel[half:, :, 1] = -1.5
    return dataclasses.replace(
        ls, pos=jnp.asarray(pos), vel=jnp.asarray(vel)
    )


def to_oracle(ls):
    sim = lattice_to_simstate(ls, build_incidence=False)
    return {
        "pos": np.asarray(sim.pos),
        "vel": np.asarray(sim.vel),
        "acc": np.asarray(sim.acc),
        "alive": np.asarray(sim.particle_alive),
        "beam_a": np.asarray(sim.beam_a),
        "beam_b": np.asarray(sim.beam_b),
        "length": np.asarray(sim.beam_length),
        "target": np.asarray(sim.beam_target_length),
        "last": np.asarray(sim.beam_last_length),
        "spring": np.asarray(sim.beam_spring),
        "damp": np.asarray(sim.beam_damp),
        "yield_strain": np.asarray(sim.beam_yield_strain),
        "strain_limit": np.asarray(sim.beam_strain_limit),
        "strain": np.asarray(sim.beam_strain),
        "stress": np.asarray(sim.beam_stress),
        "beam_alive": np.asarray(sim.beam_alive),
    }


FF = FarFieldSpec(max_pairs=512, max_tile_pairs=64, skin=4.0)
CFG = StaticConfig(subticks=8, collision_mode="allpairs",
                   particle_radius=RADIUS, force_mode="quantized")


def test_flat_lattice_has_no_candidates():
    """Unfolded cloth: every contact is near-field — the candidate list
    must be empty (this is the 1M bench's fast-path invariant)."""
    ls = make_lattice(40, 40, SPACING)
    fl = rebuild_far_list(ls.pos, ls.alive, s=2, ff=FF, radius=RADIUS)
    assert int(fl.n_pairs) == 0
    assert int(fl.overflow) == 0
    assert not bool(np.asarray(fl.valid).any())


def test_hairpin_detected_and_terms_nonzero():
    ls = hairpin()
    fl = rebuild_far_list(ls.pos, ls.alive, s=2, ff=FF, radius=RADIUS)
    assert int(fl.n_pairs) > 0
    assert int(fl.overflow) == 0
    dvx, dvy, dax, day, dyn = far_collision_terms(
        ls.pos[..., 0], ls.pos[..., 1], ls.vel[..., 0], ls.vel[..., 1],
        ls.alive, fl, s=2, ff=FF, radius=RADIUS, dt=CFG.dt,
        ecoeff=0.75, friction=0.1, world_h=ls.shape[1],
    )
    assert float(jnp.abs(dvy).max()) > 0.0


def _run_far(ls, spec, steps, consts, uin):
    for _ in range(steps):
        fl = rebuild_far_list(
            ls.pos, ls.alive, s=spec.collision_stencil, ff=FF, radius=RADIUS
        )
        ls = lattice_substep_jit(ls, consts, uin, spec, CFG,
                                 far=fl, ffspec=FF)
    return ls


def vertical_hairpin(w=4, h=96, gap=6.0):
    """hairpin folded along the OTHER axis: rows j and h-1-j overlap, so
    candidate chunk pairs have offset (0, dy) — the annulus half-plane's
    dx == 0 edge.  Guards against double-emission of vertical pairs
    (each duplicate doubles the collision impulse)."""
    ls = make_lattice(w, h, SPACING, spring=0.0, damp=0.0,
                      yield_strain=10.0, strain_limit=100.0)
    half = h // 2
    pos = np.zeros((w, h, 2), np.float32)
    for j in range(h):
        x_col = 300.0 if j < half else 300.0 + gap
        yj = j if j < half else (h - 1 - j)
        yoff = 0.0 if j < half else SPACING * 0.5
        pos[:, j, 1] = 100.0 + yj * SPACING + yoff
        pos[:, j, 0] = x_col
        # columns separated widely so only the fold contact matters
    for i in range(w):
        pos[i, :, 0] += i * SPACING * 3.0
    vel = np.zeros((w, h, 2), np.float32)
    vel[:, :half, 0] = 1.5
    vel[:, half:, 0] = -1.5
    return dataclasses.replace(
        ls, pos=jnp.asarray(pos), vel=jnp.asarray(vel)
    )


def test_vertical_fold_no_duplicate_pairs():
    """Every candidate chunk pair must appear exactly once — a duplicated
    (0, dy) annulus pair would double its impulse."""
    ls = vertical_hairpin()
    fl = rebuild_far_list(ls.pos, ls.alive, s=2, ff=FF, radius=RADIUS)
    n = int(fl.n_pairs)
    assert n > 0
    pairs = np.stack([np.asarray(fl.ca)[:n], np.asarray(fl.cb)[:n]], axis=1)
    uniq = np.unique(pairs, axis=0)
    assert uniq.shape[0] == n, "duplicate candidate chunk pairs emitted"


def test_vertical_fold_matches_oracle():
    ls = vertical_hairpin()
    w, h = ls.shape
    spec = LatticeSpec(w, h, collision_stencil=2)
    consts, uin = PhysicsConstants.default(), UserInput.none()
    os = to_oracle(ls)
    for _ in range(6):
        os = oracle.substep(os, dt=CFG.dt, radius=RADIUS, quantized=True)
    ls_out = _run_far(ls, spec, 6, consts, uin)
    p = np.asarray(ls_out.pos).reshape(w * h, 2)
    v = np.asarray(ls_out.vel).reshape(w * h, 2)
    np.testing.assert_allclose(p, os["pos"], rtol=0, atol=2e-3)
    np.testing.assert_allclose(v, os["vel"], rtol=0, atol=2e-2)


@pytest.mark.parametrize("spring", [0.0, 5.0])
def test_fold_matches_oracle(spring):
    # spring=5 keeps ω·dt small: stiffer springs at dt=1/8 amplify the
    # f32 collision-sum ordering ulps into divergence within a few steps
    """Near-field stencil + far-field list == the oracle's all-pairs
    collision, on a folded strip where most contacts are index-distant."""
    ls = hairpin(spring=spring)
    w, h = ls.shape
    spec = LatticeSpec(w, h, collision_stencil=2)
    consts, uin = PhysicsConstants.default(), UserInput.none()

    os = to_oracle(ls)
    for _ in range(6):
        os = oracle.substep(os, dt=CFG.dt, radius=RADIUS, quantized=True)
    ls_out = _run_far(ls, spec, 6, consts, uin)

    p = np.asarray(ls_out.pos).reshape(w * h, 2)
    v = np.asarray(ls_out.vel).reshape(w * h, 2)
    np.testing.assert_allclose(p, os["pos"], rtol=0, atol=2e-3)
    np.testing.assert_allclose(v, os["vel"], rtol=0, atol=2e-2)


def test_far_field_changes_trajectory():
    """Without the far list the layers pass through each other —
    proves the fold contacts are genuinely out of stencil range."""
    ls = hairpin()
    w, h = ls.shape
    spec = LatticeSpec(w, h, collision_stencil=2)
    consts, uin = PhysicsConstants.default(), UserInput.none()
    near_only = ls
    for _ in range(6):
        near_only = lattice_substep_jit(near_only, consts, uin, spec, CFG)
    with_far = _run_far(ls, spec, 6, consts, uin)
    dv = np.abs(np.asarray(with_far.vel) - np.asarray(near_only.vel)).max()
    assert dv > 1e-3


def test_frame_scan_with_fixed_list_matches_oracle():
    """lattice_frame_far: one rebuilt list reused for a whole frame stays
    correct while displacements remain within the skin budget."""
    ls = hairpin()
    w, h = ls.shape
    spec = LatticeSpec(w, h, collision_stencil=2)
    consts, uin = PhysicsConstants.default(), UserInput.none()
    # a frame covers 8 substeps of free motion — size the skin so the
    # list stays valid for the whole frame
    ff = dataclasses.replace(FF, skin=8.0)
    fl = rebuild_far_list(ls.pos, ls.alive, s=2, ff=ff, radius=RADIUS)

    os = to_oracle(ls)
    for _ in range(CFG.subticks):
        os = oracle.substep(os, dt=CFG.dt, radius=RADIUS, quantized=True)
    out = lattice_frame_far_jit(ls, fl, consts, uin, spec, CFG, ff)
    # validity: max COM-relative displacement stayed within skin/2
    disp = float(displacement_check(out.pos, out.alive, fl))
    assert disp <= ff.skin * 0.5
    p = np.asarray(out.pos).reshape(w * h, 2)
    np.testing.assert_allclose(p, os["pos"], rtol=0, atol=2e-3)


@pytest.mark.parametrize("w,h", [(96, 6), (6, 96), (94, 6)])
def test_edge_chunk_momentum_conservation(w, h):
    """Non-chunk-multiple plane dims: XLA's clip-mode windowed gather
    duplicates the last real row/col of boundary-straddling chunks as
    phantom particles.  Before the in-bounds alive mask, their one-sided
    impulses injected momentum (measured sum(dax) = -99.8 at 8x62).
    The far terms must stay antisymmetric: every delta plane sums to ~0."""
    ls = hairpin(w=w, h=h) if w >= h else vertical_hairpin(w=w, h=h)
    fl = rebuild_far_list(ls.pos, ls.alive, s=2, ff=FF, radius=RADIUS)
    assert int(fl.n_pairs) > 0
    deltas = far_collision_terms(
        ls.pos[..., 0], ls.pos[..., 1], ls.vel[..., 0], ls.vel[..., 1],
        ls.alive, fl, s=2, ff=FF, radius=RADIUS, dt=CFG.dt,
        ecoeff=0.75, friction=0.1, world_h=ls.shape[1],
    )
    assert float(jnp.abs(deltas[1]).max()) + float(
        jnp.abs(deltas[0]).max()) > 0.0  # contacts actually fire
    for name, d in zip(("dvx", "dvy", "dax", "day"), deltas):
        total = float(jnp.sum(d))
        scale = float(jnp.abs(d).sum()) + 1.0
        assert abs(total) < 1e-4 * scale, (name, total, scale)


def test_overflow_counter_fires():
    tiny = FarFieldSpec(max_pairs=4, max_tile_pairs=2, skin=4.0)
    ls = hairpin()
    fl = rebuild_far_list(ls.pos, ls.alive, s=2, ff=tiny, radius=RADIUS)
    assert int(fl.overflow) > 0


def test_lattice_engine_farfield_end_to_end():
    """LatticeEngine with a FarFieldSpec: the worker's adaptive rebuild
    kicks in, stats surface the pair count, and the fold layers bounce
    instead of passing through."""
    from softbody_tpu.engine.engine import LatticeEngine
    from softbody_tpu.engine.protocol import EngineOptions

    ls = hairpin()
    w, h = ls.shape
    spec = LatticeSpec(w, h, collision_stencil=2)
    opts = EngineOptions(subticks=8, particle_radius=RADIUS,
                         collision_mode="allpairs")
    ff = dataclasses.replace(FF, skin=8.0)
    y_top0 = float(np.asarray(ls.pos)[w // 2 :, :, 1].min())
    with LatticeEngine(ls, spec, options=opts, farfield=ff) as eng:
        deadline = 60.0
        import time as _t
        t0 = _t.monotonic()
        while _t.monotonic() - t0 < deadline:
            st = eng.stats()
            if st.frame_index >= 4:
                break
            _t.sleep(0.2)
        st = eng.stats()
        pkt = eng.render_packet()
    assert st.far_rebuilds >= 1
    assert st.far_pairs > 0
    assert st.far_overflow == 0
    pos = pkt.pos.reshape(w, h, 2)
    # the top (folded-back) layer approaches at -1.5 but must not sink
    # below the bottom layer: contact holds the two apart
    assert np.isfinite(pos).all()
    y_bottom = pos[: w // 2, :, 1]
    y_top = pos[w // 2 :, :, 1]
    assert float(np.median(y_top - y_bottom[::-1])) > 0.0


def test_fused_far_matches_xla_far():
    """fused_frame_far (Pallas, interpret mode) == the XLA lattice far
    path on the folded strip: the kernel's extra far-delta input plane
    must carry exactly the same physics."""
    from softbody_tpu.ops.pallas.fused_substep import (
        fused_frame_far,
        pack_lattice,
        rebuild_far_list_packed,
        unpack_lattice,
    )

    ls = hairpin()
    w, h = ls.shape
    spec = LatticeSpec(w, h, collision_stencil=2)
    cfg = StaticConfig(subticks=2, collision_mode="allpairs",
                       particle_radius=RADIUS, force_mode="quantized")
    consts, uin = PhysicsConstants.default(), UserInput.none()
    ff = dataclasses.replace(FF, skin=8.0)

    mut, immut = pack_lattice(ls, tile_w=8)
    fl_p = rebuild_far_list_packed(mut, immut, s=2, ff=ff, radius=RADIUS)
    assert int(fl_p.n_pairs) > 0
    mut = fused_frame_far(mut, immut, fl_p, consts, uin, spec, cfg, ff,
                          tile_w=8, interpret=True)
    got = unpack_lattice(mut, immut, ls)

    fl = rebuild_far_list(ls.pos, ls.alive, s=2, ff=ff, radius=RADIUS)
    ref = ls
    for _ in range(cfg.subticks):
        ref = lattice_substep_jit(ref, consts, uin, spec, cfg,
                                  far=fl, ffspec=ff)
    np.testing.assert_allclose(
        np.asarray(got.pos), np.asarray(ref.pos), rtol=0, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.vel), np.asarray(ref.vel), rtol=0, atol=1e-3
    )


def test_auto_frame_matches_per_substep_rebuild():
    """fused_frame2_auto (on-device FarList carry + lax.cond rebuild) ==
    the XLA far path with a fresh list every substep.  Any pair actually
    within contact range is in BOTH lists while the displacement budget
    holds (extra candidates contribute exactly zero), so the rebuild
    cadence must not change the trajectory."""
    from softbody_tpu.engine.backends import FusedLatticeBackend

    ls = hairpin()
    w, h = ls.shape
    spec = LatticeSpec(w, h, collision_stencil=2)
    cfg = StaticConfig(subticks=4, collision_mode="allpairs",
                       particle_radius=RADIUS, force_mode="quantized")
    consts, uin = PhysicsConstants.default(), UserInput.none()
    ff = dataclasses.replace(FF, skin=8.0)

    # kernel_variants=(): this test pins auto-frame == fresh-list-
    # every-substep parity against the strict XLA far path, so the
    # kernel must bit-match the oracle op sequence
    backend = FusedLatticeBackend(spec, cfg, farfield=ff, tile_w=8,
                                  kernel_variants=())
    st = backend.pack_state(ls)
    for _ in range(2):
        st = backend.step(st, consts, uin)
    got = backend.unpack_state(st)
    stats = backend.far_stats()
    assert stats["far_rebuilds"] >= 1
    assert stats["far_pairs"] > 0
    assert stats["far_overflow"] == 0

    ref = ls
    for _ in range(2 * cfg.subticks):
        fl = rebuild_far_list(ref.pos, ref.alive, s=2, ff=ff, radius=RADIUS)
        ref = lattice_substep_jit(ref, consts, uin, spec, cfg,
                                  far=fl, ffspec=ff)
    np.testing.assert_allclose(
        np.asarray(got.pos), np.asarray(ref.pos), rtol=0, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.vel), np.asarray(ref.vel), rtol=0, atol=1e-3
    )


def test_auto_frame_flat_lattice_stays_empty():
    """Unfolded cloth through the auto frame: exactly one rebuild (the
    self-initializing first substep), empty list, near-only physics —
    the 1M bench's fast-path invariant, now on device."""
    from softbody_tpu.engine.backends import FusedLatticeBackend
    from softbody_tpu.ops.pallas.fused_substep2 import (
        fused_frame2, pack_lattice2,
    )

    ls = make_lattice(24, 24, SPACING)
    w, h = ls.shape
    spec = LatticeSpec(w, h, collision_stencil=2)
    cfg = StaticConfig(subticks=4, collision_mode="allpairs",
                       particle_radius=RADIUS, force_mode="quantized")
    consts, uin = PhysicsConstants.default(), UserInput.none()
    ff = dataclasses.replace(FF, skin=8.0)

    # kernel_variants=(): compared bit-exactly against a direct
    # fused_frame2 call, which defaults to kvar=()
    backend = FusedLatticeBackend(spec, cfg, farfield=ff, tile_w=8,
                                  kernel_variants=())
    st = backend.pack_state(ls)
    st = backend.step(st, consts, uin)
    got = backend.unpack_state(st)
    stats = backend.far_stats()
    assert stats["far_pairs"] == 0
    assert stats["far_overflow"] == 0

    hot, obs, immut, ec = pack_lattice2(ls, tile_w=8)
    hot, obs = fused_frame2(hot, obs, immut, ec, consts, uin, spec, cfg,
                            tile_w=8, interpret=True)
    ref = backend.unpack_state((hot, obs))
    np.testing.assert_array_equal(np.asarray(got.pos), np.asarray(ref.pos))
    np.testing.assert_array_equal(np.asarray(got.vel), np.asarray(ref.vel))


def test_displacement_trigger_ignores_translation():
    ls = hairpin()
    fl = rebuild_far_list(ls.pos, ls.alive, s=2, ff=FF, radius=RADIUS)
    # rigid translation: COM correction cancels it exactly
    moved = ls.pos + jnp.asarray([123.0, -77.0])
    assert float(displacement_check(moved, ls.alive, fl)) < 1e-3
    # one particle moving relative to the rest trips the trigger
    bump = ls.pos.at[0, 0, 0].add(5.0)
    assert float(displacement_check(bump, ls.alive, fl)) > 4.0
    # relative speed measure: uniform velocity → ~0
    vel = jnp.ones_like(ls.vel) * 9.0
    assert float(max_relative_speed(vel, ls.alive)) < 1e-5
