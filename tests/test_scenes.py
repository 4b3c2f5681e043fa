"""Scene builder tests: the reference default world and BASELINE configs."""

import numpy as np
import pytest

from softbody_tpu import PhysicsConstants, StaticConfig, UserInput
from softbody_tpu.mapping import SceneRegistry
from softbody_tpu.models import (
    add_rectangle,
    blob,
    cloth,
    default_scene,
    lattice_arrays,
    multi_blob,
    tearing_cloth,
)
from softbody_tpu.ops.step import substep_jit


def test_lattice_counts_match_reference_formula():
    """addRectangle beam structure (main.ts:203-213): per node a vertical
    (y<h-1), horizontal (x<w-1), diagonal (both) and anti-diagonal
    (y>0 & x<w-1) beam."""
    w, h = 9, 4
    pos, beams, lengths, _ = lattice_arrays(20, 120, 30, w, h, 50, 700)
    assert pos.shape[0] == w * h
    expected = w * (h - 1) + (w - 1) * h + 2 * (w - 1) * (h - 1)
    assert beams.shape[0] == expected
    # diagonals have √2 length
    d = pos[beams[:, 0]] - pos[beams[:, 1]]
    actual = np.sqrt((d * d).sum(-1))
    np.testing.assert_allclose(actual, lengths, rtol=1e-6)


def test_default_scene_counts():
    """The reference default world has 119 particles / 299 beams
    (SURVEY.md §6, counted from main.ts:218-246)."""
    state, cfg = default_scene()
    assert int(state.particle_count) == 119
    assert int(state.beam_count) == 299


def test_default_scene_steps_stably():
    state, _ = default_scene()
    cfg = StaticConfig(subticks=16, collision_mode="allpairs", collision_tile=128)
    consts, uin = PhysicsConstants.default(), UserInput.none()
    for _ in range(16):
        state = substep_jit(state, consts, uin, cfg)
    p = np.asarray(state.pos)[np.asarray(state.particle_alive)]
    assert np.isfinite(p).all()
    assert (p >= 10 - 1e-3).all() and (p <= 990 + 1e-3).all()


def test_registry_add_rectangle_matches_arrays():
    reg = SceneRegistry()
    add_rectangle(reg, 100, 100, 25, 3, 3, 10, 5, 0.5, 2.0)
    pos, beams, _, _ = lattice_arrays(100, 100, 25, 3, 3, 10, 5, 0.5, 2.0)
    assert reg.particle_count == pos.shape[0]
    assert reg.beam_count == beams.shape[0]


def test_cloth_pinned_top_row_stays():
    state, cfg = cloth(w=6, h=6, pin_top=True)
    consts, uin = PhysicsConstants.default(), UserInput.none()
    cfg = StaticConfig(subticks=8, collision_mode="none",
                       particle_radius=cfg.particle_radius)
    top = np.asarray(state.particle_pinned)
    assert top.sum() == 6
    p0 = np.asarray(state.pos).copy()
    for _ in range(16):
        state = substep_jit(state, consts, uin, cfg)
    p = np.asarray(state.pos)
    np.testing.assert_array_equal(p[top], p0[top])  # anchors never move
    # the sheet as a whole sags (individual particles may transiently rise
    # while the spring network redistributes load)
    assert p[~top, 1].mean() < p0[~top, 1].mean()
    assert (p[~top, 1] < p0[~top, 1]).mean() > 0.6


def test_blob_scene():
    state, cfg = blob(radius=80.0, spacing=30.0)
    n = int(state.particle_count)
    assert n > 10
    assert int(state.beam_count) > n  # triangulated: degree > 2
    assert bool(np.asarray(state.particle_pinned).any())


def test_multi_blob_scene_small():
    state, cfg = multi_blob(n_blobs=4, blob_radius=30.0, spacing=15.0)
    assert int(state.particle_count) > 20
    consts, uin = PhysicsConstants.default(), UserInput.none()
    cfg = StaticConfig(subticks=4, collision_mode="grid",
                       particle_radius=cfg.particle_radius)
    for _ in range(8):
        state = substep_jit(state, consts, uin, cfg)
    assert np.isfinite(np.asarray(state.pos)).all()


def test_tearing_cloth_small():
    """Scaled-down tearing config: weight of an unpinned-but-heavy sheet
    breaks beams over time."""
    state, cfg = tearing_cloth(n_particles=400, spring=120.0,
                               strain_limit=0.02)
    m0 = int(state.beam_count)
    consts, uin = PhysicsConstants.default(), UserInput.none()
    cfg = StaticConfig(subticks=16, collision_mode="grid",
                       particle_radius=cfg.particle_radius)
    for _ in range(12):
        state = substep_jit(state, consts, uin, cfg)
    assert int(state.beam_count) < m0  # something tore
    assert np.isfinite(np.asarray(state.pos)).all()
