"""Sharded dense lattice (halo exchange) vs single device: trajectories
must agree — bit-exactly for the quantized spring coupling."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from softbody_tpu import PhysicsConstants, StaticConfig, UserInput
from softbody_tpu.models import cloth_lattice
from softbody_tpu.ops.stencil import LatticeSpec, lattice_frame_jit
from softbody_tpu.parallel import make_mesh
from softbody_tpu.parallel.lattice_spatial import (
    lattice_spatial_frame_fn,
    shard_lattice,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def scene(w=32, h=12, spacing=18.0):
    ls, spec, _ = cloth_lattice(w=w, h=h, spacing=spacing)
    rng = np.random.default_rng(0)
    ls = dataclasses.replace(
        ls,
        vel=jnp.asarray(rng.normal(0, 6, (w, h, 2)).astype(np.float32)),
    )
    return ls, spec


@pytest.mark.parametrize("stencil,use_pallas", [(0, False), (2, False),
                                                (2, True)])
def test_sharded_matches_single(stencil, use_pallas):
    w, h = 32, 12
    ls, _ = scene(w, h)
    spec = LatticeSpec(w, h, collision_stencil=stencil)
    cfg = StaticConfig(subticks=4, particle_radius=10.0,
                       collision_mode="allpairs" if stencil else "none",
                       use_pallas=use_pallas)
    consts, uin = PhysicsConstants.default(), UserInput.none()
    mesh = make_mesh(8, dp=1)

    step = lattice_spatial_frame_fn(spec, cfg, mesh, donate=False)
    sharded = shard_lattice(ls, mesh)
    out = step(sharded, consts, uin)
    for _ in range(2):
        out = step(out, consts, uin)

    ref = ls
    for _ in range(3):
        ref = lattice_frame_jit(ref, consts, uin, spec, cfg)

    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.vel), np.asarray(ref.vel),
                               atol=5e-4)
    for eo, er in zip(out.edges, ref.edges):
        np.testing.assert_array_equal(np.asarray(eo.alive), np.asarray(er.alive))


def test_sharded_tearing_across_boundary():
    """Edges crossing device boundaries must break identically."""
    w, h = 16, 8
    ls, _ = scene(w, h, spacing=22.0)
    edges = tuple(
        dataclasses.replace(e, strain_limit=jnp.full((w, h), 0.02, jnp.float32))
        for e in ls.edges
    )
    ls = dataclasses.replace(ls, edges=edges,
                             vel=ls.vel * 4.0)
    spec = LatticeSpec(w, h, collision_stencil=1)
    cfg = StaticConfig(subticks=8, particle_radius=9.0)
    consts, uin = PhysicsConstants.default(), UserInput.none()
    mesh = make_mesh(4, dp=1)

    full = sum(int(np.asarray(e.alive).sum()) for e in ls.edges)
    step = lattice_spatial_frame_fn(spec, cfg, mesh, donate=False)
    out = step(shard_lattice(ls, mesh), consts, uin)
    ref = lattice_frame_jit(ls, consts, uin, spec, cfg)  # donates ls
    for eo, er in zip(out.edges, ref.edges):
        np.testing.assert_array_equal(np.asarray(eo.alive), np.asarray(er.alive))
    alive_total = sum(int(np.asarray(e.alive).sum()) for e in out.edges)
    assert alive_total < full  # something tore
