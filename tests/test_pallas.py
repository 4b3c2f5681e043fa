"""Pallas kernel tests (interpret mode on CPU): the fused collision
stencil must match the XLA stencil implementation."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from softbody_tpu import PhysicsConstants, StaticConfig, UserInput
from softbody_tpu.models import cloth_lattice
from softbody_tpu.ops.stencil import (
    LatticeSpec,
    _stencil_collisions,
    lattice_substep_jit,
)
from softbody_tpu.ops.pallas.collide_stencil import stencil_collisions_pallas


def perturbed_lattice(w=12, h=9, spacing=15.0, seed=0):
    ls, _, _ = cloth_lattice(w=w, h=h, spacing=spacing)
    rng = np.random.default_rng(seed)
    return dataclasses.replace(
        ls,
        pos=ls.pos + jnp.asarray(rng.uniform(-1.5, 1.5, (w, h, 2)).astype(np.float32)),
        vel=jnp.asarray(rng.normal(0, 8, (w, h, 2)).astype(np.float32)),
    )


@pytest.mark.parametrize("stencil", [1, 2])
def test_pallas_collision_matches_xla(stencil):
    w, h = 12, 9
    ls = perturbed_lattice(w, h)
    spec = LatticeSpec(w, h, collision_stencil=stencil)
    cfg = StaticConfig(subticks=8, particle_radius=10.0)
    consts = PhysicsConstants.default()
    ref = _stencil_collisions(ls, consts, spec, cfg)
    out = stencil_collisions_pallas(
        ls.pos[..., 0], ls.pos[..., 1],
        ls.vel[..., 0], ls.vel[..., 1],
        ls.alive,
        jnp.float32(cfg.particle_radius),
        jnp.float32(cfg.dt),
        (consts.elasticity + 1.0) * 0.5,
        consts.friction,
        w=w, h=h, stencil=stencil,
        tile_w=8, tile_h=8,  # force multi-tile + ragged edge
        interpret=True,
    )
    names = ("dvx", "dvy", "dax", "day", "dyn")
    for name, a, b in zip(names, ref, out):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-3, err_msg=name
        )


def test_pallas_substep_matches_xla_substep():
    """Full substep with cfg.use_pallas vs without."""
    w, h = 10, 10
    ls = perturbed_lattice(w, h, spacing=16.0, seed=2)
    spec = LatticeSpec(w, h, collision_stencil=2)
    consts, uin = PhysicsConstants.default(), UserInput.none()
    cfg_x = StaticConfig(subticks=8, particle_radius=10.0, use_pallas=False)
    cfg_p = StaticConfig(subticks=8, particle_radius=10.0, use_pallas=True)
    a = lattice_substep_jit(ls, consts, uin, spec, cfg_x)
    b = lattice_substep_jit(ls, consts, uin, spec, cfg_p)
    np.testing.assert_allclose(np.asarray(a.pos), np.asarray(b.pos),
                               rtol=1e-6, atol=1e-4)
    np.testing.assert_allclose(np.asarray(a.vel), np.asarray(b.vel),
                               rtol=1e-6, atol=1e-4)


def test_pallas_dead_particles_masked():
    w, h = 8, 8
    ls = perturbed_lattice(w, h, spacing=12.0, seed=3)
    alive = np.ones((w, h), bool)
    alive[3, :] = False
    ls = dataclasses.replace(ls, alive=jnp.asarray(alive))
    spec = LatticeSpec(w, h, collision_stencil=1)
    cfg = StaticConfig(subticks=8, particle_radius=10.0)
    consts = PhysicsConstants.default()
    out = stencil_collisions_pallas(
        ls.pos[..., 0], ls.pos[..., 1], ls.vel[..., 0], ls.vel[..., 1],
        ls.alive, jnp.float32(cfg.particle_radius), jnp.float32(cfg.dt),
        (consts.elasticity + 1.0) * 0.5, consts.friction,
        w=w, h=h, stencil=1, tile_w=8, tile_h=8, interpret=True,
    )
    ref = _stencil_collisions(ls, consts, spec, cfg)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-3)
    # dead row receives nothing
    assert np.abs(np.asarray(out[0])[3]).sum() == 0.0
