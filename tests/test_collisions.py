"""Grid broad-phase must agree with the reference O(N²) all-pairs path
(the spatial hash replaces compute.wgsl:144-170 at scale)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from softbody_tpu import PhysicsConstants, StaticConfig
from softbody_tpu.ops.collisions import build_grid, collision_terms as _collision_terms

collision_terms = jax.jit(_collision_terms, static_argnames=("cfg",))
build_grid = jax.jit(build_grid, static_argnames=("cfg",))


def random_scene(n, seed, bounds=1000.0, r=10.0):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(r, bounds - r, size=(n, 2)).astype(np.float32)
    vel = rng.normal(0, 20, size=(n, 2)).astype(np.float32)
    alive = rng.uniform(size=n) > 0.1
    return jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(alive)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_grid_matches_allpairs(seed):
    n = 256
    pos, vel, alive = random_scene(n, seed)
    c = PhysicsConstants.default()
    cfg_ap = StaticConfig(collision_mode="allpairs", collision_tile=64)
    cfg_gr = StaticConfig(collision_mode="grid", grid_cell_capacity=16)
    dv_a, da_a, dy_a = collision_terms(pos, vel, alive, c, cfg_ap)
    dv_g, da_g, dy_g = collision_terms(pos, vel, alive, c, cfg_gr)
    # identical pair sets; tiny f32 summation-order differences allowed
    np.testing.assert_allclose(np.asarray(dv_a), np.asarray(dv_g), atol=1e-4)
    np.testing.assert_allclose(np.asarray(da_a), np.asarray(da_g),
                               rtol=1e-4, atol=0.1)
    np.testing.assert_allclose(np.asarray(dy_a), np.asarray(dy_g), atol=0)


def test_grid_dense_cluster():
    """Overlapping cluster in one cell — exercises bucket capacity and the
    3×3 neighborhood."""
    rng = np.random.default_rng(7)
    pos = (500.0 + rng.normal(0, 15, size=(64, 2))).astype(np.float32)
    vel = rng.normal(0, 5, size=(64, 2)).astype(np.float32)
    alive = np.ones(64, bool)
    c = PhysicsConstants.default()
    cfg_ap = StaticConfig(collision_mode="allpairs", collision_tile=64)
    cfg_gr = StaticConfig(collision_mode="grid", grid_cell_capacity=64)
    outs_a = collision_terms(jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(alive), c, cfg_ap)
    outs_g = collision_terms(jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(alive), c, cfg_gr)
    for a, g in zip(outs_a, outs_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(g),
                                   rtol=1e-4, atol=0.1)


def test_grid_border_cells():
    """Particles hugging the world border: off-grid neighbor cells must be
    masked, not clamped into duplicates."""
    pos = np.array(
        [[10.0, 10.0], [22.0, 10.0], [990.0, 990.0], [978.0, 990.0],
         [10.0, 990.0], [990.0, 10.0]],
        np.float32,
    )
    vel = np.zeros_like(pos)
    alive = np.ones(len(pos), bool)
    c = PhysicsConstants.default()
    outs_a = collision_terms(
        jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(alive), c,
        StaticConfig(collision_mode="allpairs", collision_tile=8),
    )
    outs_g = collision_terms(
        jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(alive), c,
        StaticConfig(collision_mode="grid"),
    )
    for a, g in zip(outs_a, outs_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(g), atol=1e-4)


def test_grid_overflow_counter():
    """More particles in one cell than capacity → overflow surfaced."""
    pos = jnp.asarray(np.full((32, 2), 505.0, np.float32))
    alive = jnp.ones(32, bool)
    cfg = StaticConfig(collision_mode="grid", grid_cell_capacity=4)
    _, _, overflow = build_grid(pos, alive, cfg)
    assert int(overflow) == 28


def test_dead_particles_ignored():
    pos = np.array([[500.0, 500.0], [512.0, 500.0]], np.float32)
    vel = np.array([[5.0, 0.0], [-5.0, 0.0]], np.float32)
    alive = np.array([True, False])
    c = PhysicsConstants.default()
    for mode in ("allpairs", "grid"):
        dv, da, dy = collision_terms(
            jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(alive), c,
            StaticConfig(collision_mode=mode, collision_tile=2),
        )
        assert float(jnp.abs(dv).sum()) == 0.0
        assert float(jnp.abs(da).sum()) == 0.0


def test_window_matches_allpairs():
    """The sliding-window broad phase must reproduce allpairs exactly
    (same pair math, superset candidate windows, true-distance mask)."""
    import dataclasses

    import jax.numpy as jnp

    from softbody_tpu import PhysicsConstants, StaticConfig
    from softbody_tpu.ops.collisions import collision_terms

    rng = np.random.default_rng(11)
    n = 700
    pos = jnp.asarray(rng.uniform(30, 970, (n, 2)).astype(np.float32))
    vel = jnp.asarray(rng.normal(0, 20, (n, 2)).astype(np.float32))
    alive = jnp.asarray(rng.random(n) > 0.1)
    consts = PhysicsConstants.default()
    cfg_ap = StaticConfig(collision_mode="allpairs", particle_radius=12.0)
    cfg_w = StaticConfig(collision_mode="window", particle_radius=12.0,
                         window_rows=512)
    dv0, da0, dy0 = collision_terms(pos, vel, alive, consts, cfg_ap)
    dv1, da1, dy1 = collision_terms(pos, vel, alive, consts, cfg_w)
    np.testing.assert_allclose(np.asarray(dv1), np.asarray(dv0),
                               rtol=0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(da1), np.asarray(da0),
                               rtol=0, atol=1e-1)  # dt^-2 scaled terms
    np.testing.assert_array_equal(np.asarray(dy1), np.asarray(dy0))


def test_window_coincident_and_dead():
    import jax.numpy as jnp

    from softbody_tpu import PhysicsConstants, StaticConfig
    from softbody_tpu.ops.collisions import collision_terms

    pos = jnp.asarray([[100.0, 100.0], [100.0, 100.0], [500.0, 500.0],
                       [100.0, 100.0]], jnp.float32)
    vel = jnp.zeros((4, 2), jnp.float32)
    alive = jnp.asarray([True, True, True, False])
    consts = PhysicsConstants.default()
    cfg = StaticConfig(collision_mode="window", particle_radius=10.0)
    dv, da, dy = collision_terms(pos, vel, alive, consts, cfg)
    # coincident pair 0-1: nudges by sign(i-j); dead particle 3 inert
    assert float(dy[0]) == -1.0 and float(dy[1]) == 1.0
    assert float(dy[3]) == 0.0
