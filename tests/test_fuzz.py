"""Property/fuzz tests (the systematic version of the reference's
hidden corrupt button, SURVEY.md §4 'fault injection')."""

import numpy as np
import pytest

from softbody_tpu import PhysicsConstants, StaticConfig, UserInput, state_from_numpy
from softbody_tpu.ops.step import substep_jit
from softbody_tpu.snapshot import (
    SnapshotError,
    load_snapshot,
    load_lattice_snapshot,
    save_snapshot,
)


@pytest.mark.parametrize("seed", range(8))
def test_snapshot_bitflip_fuzz(seed):
    """Randomly corrupted snapshot bytes must either load (garbage-in,
    garbage-out is fine) or raise SnapshotError — never crash with an
    unrelated exception."""
    rng = np.random.default_rng(seed)
    pos = rng.uniform(50, 950, (20, 2)).astype(np.float32)
    beams = rng.integers(0, 20, (30, 2)).astype(np.int32)
    state = state_from_numpy(pos, beams=beams, beam_spring=5.0)
    buf = bytearray(save_snapshot(state, PhysicsConstants.default()))
    for _ in range(rng.integers(1, 30)):
        buf[rng.integers(0, len(buf))] = rng.integers(0, 256)
    try:
        load_snapshot(bytes(buf))
    except (SnapshotError, ValueError):
        pass  # clean rejection is acceptable


@pytest.mark.parametrize("seed", range(4))
def test_truncated_snapshot_rejected(seed):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(50, 950, (10, 2)).astype(np.float32)
    state = state_from_numpy(pos)
    buf = save_snapshot(state, PhysicsConstants.default())
    cut = rng.integers(1, len(buf) - 1)
    try:
        load_snapshot(buf[:cut])
    except (SnapshotError, ValueError):
        pass


def test_lattice_loader_rejects_garbage():
    with pytest.raises((SnapshotError, ValueError)):
        load_lattice_snapshot(b"SBL1" + b"\x00" * 4)
    with pytest.raises((SnapshotError, ValueError)):
        load_lattice_snapshot(b"nope" + b"\x00" * 100)


@pytest.mark.parametrize("seed", range(3))
def test_corrupted_state_keeps_stepping(seed):
    """Random garbage state (incl. NaN/Inf bit patterns) must not crash
    the step function — shapes stay intact (≙ engineWorker.ts:610
    'this will spawn race conditions all over the place lol')."""
    rng = np.random.default_rng(seed)
    n = 16
    pos = rng.uniform(-1e6, 1e6, (n, 2)).astype(np.float32)
    pos[rng.integers(0, n)] = np.inf
    vel = rng.normal(0, 1e5, (n, 2)).astype(np.float32)
    beams = rng.integers(0, n, (n, 2)).astype(np.int32)
    state = state_from_numpy(pos, vel=vel, beams=beams,
                             beam_spring=rng.uniform(0, 1e4))
    cfg = StaticConfig(subticks=8, collision_mode="grid")
    consts, uin = PhysicsConstants.default(), UserInput.none()
    for _ in range(4):
        state = substep_jit(state, consts, uin, cfg)
    assert np.asarray(state.pos).shape == (n, 2)
