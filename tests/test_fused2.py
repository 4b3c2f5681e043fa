"""Fused Pallas kernel v2 (interpret mode) vs the XLA lattice path.

v2 evaluates each spring ONCE at its owner (lower endpoint) and applies
the partner's +f as a shifted copy of the same quantized value (exact
antisymmetry, bit-matching quantized sums); collision terms accumulate
in half-offset antisymmetric order, so f32 trajectories match the XLA
path to float tolerance like v1 does."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from softbody_tpu import PhysicsConstants, StaticConfig, UserInput
from softbody_tpu.models import cloth_lattice
from softbody_tpu.ops.stencil import LatticeSpec, lattice_substep_jit
from softbody_tpu.ops.pallas.fused_substep2 import (
    fused_frame2,
    pack_lattice2,
    unpack_lattice2,
    uniform_edge_consts,
)


def scene(w, h, spacing=16.0, seed=0, strain_limit=None):
    ls, spec, _ = cloth_lattice(w=w, h=h, spacing=spacing, spring=8.0)
    rng = np.random.default_rng(seed)
    ls = dataclasses.replace(
        ls,
        pos=ls.pos + jnp.asarray(rng.uniform(-2, 2, (w, h, 2)).astype(np.float32)),
        vel=jnp.asarray(rng.normal(0, 10, (w, h, 2)).astype(np.float32)),
    )
    if strain_limit is not None:
        edges = tuple(
            dataclasses.replace(
                e, strain_limit=jnp.full((w, h), strain_limit, jnp.float32)
            )
            for e in ls.edges
        )
        ls = dataclasses.replace(ls, edges=edges)
    return ls


@pytest.mark.parametrize("stencil", [0, 2])
def test_fused2_matches_xla(stencil):
    w, h = 12, 10
    ls = scene(w, h)
    spec = LatticeSpec(w, h, collision_stencil=stencil)
    cfg = StaticConfig(
        subticks=2, particle_radius=9.0,
        collision_mode="allpairs" if stencil else "none",
    )
    consts, uin = PhysicsConstants.default(), UserInput.none()

    hot, obs, immut, ec = pack_lattice2(ls, tile_w=8)
    hot, obs = fused_frame2(hot, obs, immut, ec, consts, uin, spec, cfg,
                            tile_w=8, interpret=True)
    got = unpack_lattice2(hot, obs, ls)

    ref = ls
    for _ in range(cfg.subticks):
        ref = lattice_substep_jit(ref, consts, uin, spec, cfg)

    # tolerance floor: the interpret-mode pow in the drag term contracts
    # FMAs differently than the XLA path (1 ulp), amplified ~2x/substep
    np.testing.assert_allclose(np.asarray(got.pos), np.asarray(ref.pos),
                               rtol=0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got.vel), np.asarray(ref.vel),
                               rtol=0, atol=5e-3)
    for eo, er in zip(got.edges, ref.edges):
        np.testing.assert_array_equal(np.asarray(eo.alive),
                                      np.asarray(er.alive))
        np.testing.assert_allclose(np.asarray(eo.target_length),
                                   np.asarray(er.target_length),
                                   rtol=0, atol=5e-4)
        # strain/stress written by the observing (final) substep
        np.testing.assert_allclose(np.asarray(eo.strain),
                                   np.asarray(er.strain),
                                   rtol=0, atol=1e-3)
        np.testing.assert_allclose(np.asarray(eo.stress),
                                   np.asarray(er.stress),
                                   rtol=0, atol=1e-2)


def test_fused2_tearing_matches_xla():
    w, h = 12, 10
    ls = scene(w, h, seed=5, strain_limit=0.02)
    spec = LatticeSpec(w, h, collision_stencil=2)
    cfg = StaticConfig(subticks=4, particle_radius=9.0,
                       collision_mode="allpairs")
    consts, uin = PhysicsConstants.default(), UserInput.none()

    hot, obs, immut, ec = pack_lattice2(ls, tile_w=8)
    hot, obs = fused_frame2(hot, obs, immut, ec, consts, uin, spec, cfg,
                            tile_w=8, interpret=True)
    got = unpack_lattice2(hot, obs, ls)

    ref = ls
    for _ in range(cfg.subticks):
        ref = lattice_substep_jit(ref, consts, uin, spec, cfg)

    broke = 0
    for eo, er in zip(got.edges, ref.edges):
        np.testing.assert_array_equal(np.asarray(eo.alive),
                                      np.asarray(er.alive))
        broke += int((~np.asarray(er.alive)).sum())
    assert broke > 0


def test_uniform_check_rejects_varying_edges():
    ls = scene(8, 8)
    edges = list(ls.edges)
    sp = np.asarray(edges[0].spring).copy()
    sp[2, 3] = 99.0
    edges[0] = dataclasses.replace(edges[0], spring=jnp.asarray(sp))
    ls = dataclasses.replace(ls, edges=tuple(edges))
    assert uniform_edge_consts(ls) is None
    with pytest.raises(ValueError):
        pack_lattice2(ls)


def test_fused2_obs_retention():
    """Edges broken mid-frame keep their previous obs values (they are
    dead — nothing renders them), live edges get fresh final-substep
    strain/stress."""
    w, h = 12, 10
    ls = scene(w, h, seed=5, strain_limit=0.12)
    spec = LatticeSpec(w, h, collision_stencil=0)
    cfg = StaticConfig(subticks=4, particle_radius=9.0,
                       collision_mode="none")
    consts, uin = PhysicsConstants.default(), UserInput.none()
    hot, obs, immut, ec = pack_lattice2(ls, tile_w=8)
    hot, obs2 = fused_frame2(hot, obs, immut, ec, consts, uin, spec, cfg,
                             tile_w=8, interpret=True)
    got = unpack_lattice2(hot, obs2, ls)
    alive_any = any(bool(np.asarray(e.alive).any()) for e in got.edges)
    assert alive_any
    for e in got.edges:
        al = np.asarray(e.alive)
        if al.any():
            assert np.isfinite(np.asarray(e.strain)[al]).all()


def test_lane_pad_geometries_bit_identical():
    """The packed stack carries either a full 128-lane right pad or, when
    the 128-rounding slack covers LANE_REACH, no right pad at all
    (lane_pad_hr).  Physics must be bit-identical across the two
    layouts: the trimmed geometry reuses dead rounding lanes as the +dy
    read halo, with rotation tails zero-filled in-kernel."""
    from softbody_tpu.ops.pallas.fused_substep2 import (
        LANE_REACH, lane_pad_hr,
    )

    w, h = 12, 20            # hr = 128, slack 108 >= LANE_REACH -> phr 0
    ls = scene(w, h, strain_limit=0.4)
    spec = LatticeSpec(w, h, collision_stencil=2)
    cfg = StaticConfig(subticks=2, particle_radius=9.0,
                       collision_mode="allpairs")
    consts, uin = PhysicsConstants.default(), UserInput.none()

    hot0, obs0, immut0, ec = pack_lattice2(ls, tile_w=8)
    assert lane_pad_hr(h, 128) == 0 and hot0.shape[-1] == 128 + 128
    # same state in the legacy full-right-pad layout
    padt = ((0, 0), (0, 0), (0, 128))
    hot1, obs1, immut1 = (jnp.pad(x, padt) for x in (hot0, obs0, immut0))

    outs = []
    for hot, obs, immut in ((hot0, obs0, immut0), (hot1, obs1, immut1)):
        hh, oo = fused_frame2(hot, obs, immut, ec, consts, uin, spec,
                              cfg, tile_w=8, interpret=True)
        outs.append(unpack_lattice2(hh, oo, ls))
    a, b = outs
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))
    np.testing.assert_array_equal(np.asarray(a.vel), np.asarray(b.vel))
    for ea, eb in zip(a.edges, b.edges):
        np.testing.assert_array_equal(np.asarray(ea.target_length),
                                      np.asarray(eb.target_length))
        np.testing.assert_array_equal(np.asarray(ea.alive),
                                      np.asarray(eb.alive))
    # the fall-back geometry is still chosen when the slack is too thin
    assert lane_pad_hr(128, 128) == 128
    assert lane_pad_hr(128 - LANE_REACH + 1, 128) == 128
    assert lane_pad_hr(128 - LANE_REACH, 128) == 0


@pytest.mark.parametrize("kv", [("rollgroup",), ("dexp2",), ("rsqrt",),
                                ("rollgroup", "rsqrt", "dexp2")])
def test_fused2_kernel_variants_match_base(kv):
    """Round-4 kernel-variant flags (fused_substep2 ``kvar``) against
    the unflagged kernel.  "rollgroup" batches the partner-shift lane
    rolls per Δy — quantized spring sums stay BIT-identical (int32
    addition is associative), f32 collision sums change only in
    addition order; "dexp2" collapses the drag pow (exponent 2.0) to a
    square — the correctly rounded value the generic pow approximates."""
    w, h = 12, 10
    ls = scene(w, h, seed=3)
    spec = LatticeSpec(w, h, collision_stencil=2)
    cfg = StaticConfig(subticks=4, particle_radius=9.0,
                       collision_mode="allpairs")
    consts, uin = PhysicsConstants.default(), UserInput.none()

    outs = []
    for kvar in [(), kv]:
        hot, obs, immut, ec = pack_lattice2(ls, tile_w=8)
        hh, oo = fused_frame2(hot, obs, immut, ec, consts, uin, spec,
                              cfg, tile_w=8, interpret=True, kvar=kvar)
        outs.append(unpack_lattice2(hh, oo, ls))
    base, got = outs
    # collision sums are regrouped (one deferred roll per Δy), so f32
    # addition order differs — positions are O(1000), so a few 1e-3 of
    # absolute drift over 4 contact substeps is order noise, not error.
    # "rsqrt" additionally changes per-op rounding (rsqrt+mul vs
    # sqrt+div, 1-2 ulp), which contact dynamics amplify a bit more.
    atol_p, atol_v = (5e-2, 2e-1) if "rsqrt" in kv else (1e-2, 5e-2)
    np.testing.assert_allclose(np.asarray(got.pos), np.asarray(base.pos),
                               rtol=0, atol=atol_p)
    np.testing.assert_allclose(np.asarray(got.vel), np.asarray(base.vel),
                               rtol=0, atol=atol_v)
    for eg, eb in zip(got.edges, base.edges):
        np.testing.assert_array_equal(np.asarray(eg.alive),
                                      np.asarray(eb.alive))


def test_fused2_rollgroup_springs_bit_exact():
    """With collisions OFF, "rollgroup" must be BIT-identical to the
    base kernel: only quantized int32 spring sums are regrouped, and
    int32 addition is order-independent."""
    w, h = 12, 10
    ls = scene(w, h, seed=7)
    spec = LatticeSpec(w, h, collision_stencil=2)
    cfg = StaticConfig(subticks=4, particle_radius=9.0,
                       collision_mode="none")
    consts, uin = PhysicsConstants.default(), UserInput.none()

    outs = []
    for kvar in [(), ("rollgroup",)]:
        hot, obs, immut, ec = pack_lattice2(ls, tile_w=8)
        hh, oo = fused_frame2(hot, obs, immut, ec, consts, uin, spec,
                              cfg, tile_w=8, interpret=True, kvar=kvar)
        outs.append(unpack_lattice2(hh, oo, ls))
    base, got = outs
    np.testing.assert_array_equal(np.asarray(got.pos), np.asarray(base.pos))
    np.testing.assert_array_equal(np.asarray(got.vel), np.asarray(base.vel))
