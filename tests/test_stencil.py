"""Dense lattice (stencil) path vs the general gather path: same physics,
different data layout — trajectories must agree."""

import numpy as np
import pytest

import jax.numpy as jnp

from softbody_tpu import PhysicsConstants, StaticConfig, UserInput
from softbody_tpu.models import cloth_lattice, lattice_to_simstate
from softbody_tpu.ops.stencil import (
    LatticeSpec,
    lattice_frame_jit,
    lattice_substep_jit,
)
from softbody_tpu.ops.step import substep_jit


def flat(ls):
    w, h = ls.shape
    return (
        np.asarray(ls.pos).reshape(w * h, 2),
        np.asarray(ls.vel).reshape(w * h, 2),
    )


def test_lattice_matches_general_no_collisions():
    """Springs + integration only: the stencil path must match the
    general incidence path (identical quantized int force sums)."""
    ls, spec, _ = cloth_lattice(w=7, h=5, spacing=25.0, pin_top=True)
    sim = lattice_to_simstate(ls)
    cfg = StaticConfig(subticks=8, collision_mode="none",
                       particle_radius=9.0, force_mode="quantized")
    consts, uin = PhysicsConstants.default(), UserInput.none()
    # layouts round differently at the ulp level and stiff-spring dynamics
    # amplify ~2x per substep — compare over a short horizon
    for _ in range(6):
        ls = lattice_substep_jit(ls, consts, uin, spec, cfg)
        sim = substep_jit(sim, consts, uin, cfg)
    p_l, v_l = flat(ls)
    np.testing.assert_allclose(p_l, np.asarray(sim.pos), atol=2e-3)
    np.testing.assert_allclose(v_l, np.asarray(sim.vel), atol=5e-3)


def test_lattice_collisions_match_allpairs():
    """Compressed lattice (spacing < 2r): every overlapping pair is within
    the index stencil, so the stencil collision terms must equal the
    all-pairs terms on the same state (single-evaluation, no chaos)."""
    import dataclasses

    from softbody_tpu.ops.collisions import collision_terms
    from softbody_tpu.ops.stencil import _stencil_collisions

    ls, _, _ = cloth_lattice(w=6, h=6, spacing=15.0)
    spec = LatticeSpec(6, 6, collision_stencil=2)
    rng = np.random.default_rng(3)
    ls = dataclasses.replace(
        ls,
        pos=ls.pos + jnp.asarray(rng.uniform(-1, 1, (6, 6, 2)).astype(np.float32)),
        vel=jnp.asarray(rng.normal(0, 5, (6, 6, 2)).astype(np.float32)),
    )
    sim = lattice_to_simstate(ls)
    cfg = StaticConfig(subticks=8, collision_mode="allpairs",
                       particle_radius=10.0, collision_tile=36)
    consts = PhysicsConstants.default()
    dvx, dvy, dax, day, dy_s = _stencil_collisions(ls, consts, spec, cfg)
    dv_s = jnp.stack([dvx, dvy], -1)
    da_s = jnp.stack([dax, day], -1)
    dv_g, da_g, dy_g = collision_terms(
        sim.pos, sim.vel, sim.particle_alive, consts, cfg
    )
    n = 36
    np.testing.assert_allclose(np.asarray(dv_s).reshape(n, 2),
                               np.asarray(dv_g), atol=1e-4)
    np.testing.assert_allclose(np.asarray(da_s).reshape(n, 2),
                               np.asarray(da_g), rtol=1e-5, atol=1e-2)
    np.testing.assert_array_equal(np.asarray(dy_s).reshape(n),
                                  np.asarray(dy_g))


def test_lattice_tearing():
    """Low strain limit → edges break under load; alive counts drop in
    the edge classes and the sheet stays finite."""
    ls, spec, cfg0 = cloth_lattice(w=10, h=10, spacing=20.0, pin_top=True,
                                   spring=300.0)
    import dataclasses

    edges = tuple(
        dataclasses.replace(e, strain_limit=jnp.full((10, 10), 0.05, jnp.float32))
        for e in ls.edges
    )
    ls = dataclasses.replace(ls, edges=edges)
    cfg = StaticConfig(subticks=16, collision_mode="none",
                       particle_radius=9.0)
    consts, uin = PhysicsConstants.default(), UserInput.none()
    alive0 = sum(int(np.asarray(e.alive).sum()) for e in ls.edges)
    for _ in range(6):
        ls = lattice_frame_jit(ls, consts, uin, spec, cfg)
    alive1 = sum(int(np.asarray(e.alive).sum()) for e in ls.edges)
    assert alive1 < alive0
    assert np.isfinite(np.asarray(ls.pos)).all()
    # pinned top row never moved
    w, h = ls.shape
    np.testing.assert_array_equal(
        np.asarray(ls.pos)[:, h - 1, 1], np.full(w, 980.0)
    )


def test_lattice_pinned_and_border():
    ls, spec, _ = cloth_lattice(w=4, h=4, spacing=30.0)
    cfg = StaticConfig(subticks=8, collision_mode="none", particle_radius=10.0)
    consts, uin = PhysicsConstants.default(), UserInput.none()
    for _ in range(40):
        ls = lattice_frame_jit(ls, consts, uin, spec, cfg)
    p = np.asarray(ls.pos).reshape(-1, 2)
    assert (p >= 10 - 1e-3).all() and (p <= 990 + 1e-3).all()
