"""Fused Pallas substep (interpret mode) vs the XLA lattice path."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from softbody_tpu import PhysicsConstants, StaticConfig, UserInput
from softbody_tpu.models import cloth_lattice
from softbody_tpu.ops.stencil import LatticeSpec, lattice_substep_jit
from softbody_tpu.ops.pallas.fused_substep import (
    fused_frame,
    pack_lattice,
    unpack_lattice,
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
def test_fused_frame_matches_xla(stencil):
    w, h = 12, 10
    ls = scene(w, h)
    spec = LatticeSpec(w, h, collision_stencil=stencil)
    # short horizon: contact dynamics amplify f32 rounding differences
    # between the two implementations ~2x per substep
    cfg = StaticConfig(
        subticks=2, particle_radius=9.0,
        collision_mode="allpairs" if stencil else "none",
    )
    consts, uin = PhysicsConstants.default(), UserInput.none()

    mut, immut = pack_lattice(ls, tile_w=8)
    mut = fused_frame(mut, immut, consts, uin, spec, cfg,
                      tile_w=8, interpret=True)
    got = unpack_lattice(mut, immut, ls)

    ref = ls
    for _ in range(cfg.subticks):
        ref = lattice_substep_jit(ref, consts, uin, spec, cfg)

    np.testing.assert_allclose(np.asarray(got.pos), np.asarray(ref.pos),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got.vel), np.asarray(ref.vel),
                               rtol=1e-5, atol=5e-3)
    np.testing.assert_allclose(np.asarray(got.acc), np.asarray(ref.acc),
                               rtol=1e-4, atol=5e-2)
    for eg, er in zip(got.edges, ref.edges):
        np.testing.assert_array_equal(np.asarray(eg.alive), np.asarray(er.alive))
        np.testing.assert_allclose(np.asarray(eg.target_length),
                                   np.asarray(er.target_length), atol=1e-4)
        np.testing.assert_allclose(np.asarray(eg.last_length),
                                   np.asarray(er.last_length), atol=1e-4)


def test_fused_frame_breakage_and_user_input():
    w, h = 16, 8
    ls = scene(w, h, spacing=20.0, seed=3, strain_limit=0.03)
    spec = LatticeSpec(w, h, collision_stencil=1)
    cfg = StaticConfig(subticks=4, particle_radius=8.0)
    consts = PhysicsConstants.default()
    uin = UserInput.none()
    uin.mouse_active = jnp.asarray(True)
    uin.mouse_pos = jnp.asarray([200.0, 900.0], jnp.float32)
    uin.mouse_vel = jnp.asarray([30.0, 0.0], jnp.float32)
    uin.applied_force = jnp.asarray([0.2, 0.1], jnp.float32)

    mut, immut = pack_lattice(ls, tile_w=8)
    mut = fused_frame(mut, immut, consts, uin, spec, cfg,
                      tile_w=8, interpret=True)
    got = unpack_lattice(mut, immut, ls)
    ref = ls
    for _ in range(cfg.subticks):
        ref = lattice_substep_jit(ref, consts, uin, spec, cfg)

    for eg, er in zip(got.edges, ref.edges):
        np.testing.assert_array_equal(np.asarray(eg.alive), np.asarray(er.alive))
    broke = sum(int((~np.asarray(e.alive)).sum()) for e in got.edges)
    assert broke > 0  # exercise the breakage path
    np.testing.assert_allclose(np.asarray(got.pos), np.asarray(ref.pos),
                               rtol=1e-5, atol=5e-3)
