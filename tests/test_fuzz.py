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


@pytest.mark.parametrize("seed", range(2))
def test_corrupted_fused_backend_keeps_stepping(seed):
    """Corrupt-state chaos on the FUSED kernel path (≙ corruptBuffers,
    engineWorker.ts:599-617): random garbage — including NaN/Inf bit
    patterns — in the packed plane stacks must not fault the kernel or
    change any shape."""
    from softbody_tpu.engine.backends import FusedLatticeBackend
    from softbody_tpu.models import make_lattice
    from softbody_tpu.ops.stencil import LatticeSpec

    rng = np.random.default_rng(100 + seed)
    ls = make_lattice(12, 12, 20.0, ox=200.0, oy=300.0)
    spec = LatticeSpec(12, 12, collision_stencil=2)
    cfg = StaticConfig(subticks=4, collision_mode="allpairs",
                       particle_radius=8.0, force_mode="quantized")
    consts, uin = PhysicsConstants.default(), UserInput.none()
    be = FusedLatticeBackend(spec, cfg, farfield=None, tile_w=8)
    st = be.pack_state(ls)
    shapes = tuple(x.shape for x in st)
    st = be.corrupt(st, rng)
    for _ in range(3):
        st = be.step(st, consts, uin)
    assert tuple(x.shape for x in st) == shapes
    g = be.unpack_state(st)
    assert np.asarray(g.pos).shape == (12, 12, 2)
