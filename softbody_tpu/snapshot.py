"""Snapshot (checkpoint) serialization.

The reference's snapshot subsystem is first-class (SURVEY.md §5): format
producer ``engineMapping.ts:377-401``, consumer ``407-430``; the snapshot
ArrayBuffer is the single interchange format between engine, editor, disk
files and the reset slot (``main.ts:262-276``).

Two wire formats:

- **v0** — byte-compatible with the reference:
  ``[6×u16 section byte-lengths][8×f32 physics constants]
  [particle mapping u16[pc]][particle data 24 B×pc]
  [beam mapping u16[bc]][beam data 40 B×bc]``
  where particle data is pos/vel/acc ``vec2<f32>`` (engineMapping.ts:103)
  and beam data is ``u16 a, u16 b, f32 length, target_len, last_len,
  spring, damp, yield_strain, strain_limit, strain, stress``
  (engineMapping.ts:151).  The u16 byte-length header silently overflows
  past ~2730 particles in the reference (engineMapping.ts:388-393 —
  SURVEY.md §3.3 note); we refuse to *write* v0 beyond that instead.

- **v1** — same layout widened: magic ``SBT1``, u32 section lengths,
  u32 particle/beam counts, i32 beam endpoint indices, f64-safe order.
  No practical capacity limit (the u16 ID space of the reference was a
  bug to fix, not to keep).

Snapshots embed physics constants exactly like the reference
(engineMapping.ts:394,419).
"""

from __future__ import annotations

import io
import struct
from typing import Optional, Tuple

import numpy as np

from .config import PhysicsConstants
from .state import SimState, state_from_numpy

_V1_MAGIC = b"SBT1"
_PARTICLE_STRIDE = 24
_BEAM_STRIDE_V0 = 40
# v1 beam record: 2×i32 endpoints + 9×f32 fields = 44 bytes
_BEAM_STRIDE_V1 = 44

V0_MAX_PARTICLES = 65535 // _PARTICLE_STRIDE  # 2730 (u16 byte-length header)
V0_MAX_BEAMS = 65535 // _BEAM_STRIDE_V0  # 1638


class SnapshotError(ValueError):
    pass


def _gather_live(state: SimState):
    """Compact live particles/beams to dense host arrays (device arrays are
    read back wholesale, once)."""
    pos = np.asarray(state.pos, np.float32)
    vel = np.asarray(state.vel, np.float32)
    acc = np.asarray(state.acc, np.float32)
    p_alive = np.asarray(state.particle_alive, bool)
    b_alive = np.asarray(state.beam_alive, bool)
    a = np.asarray(state.beam_a, np.int64)
    b = np.asarray(state.beam_b, np.int64)
    # beams whose endpoints died are dropped (the reference leaves them
    # dangling as "invalid beams" — editor.ts:631-658; we don't persist them)
    b_alive = b_alive & p_alive[a] & p_alive[b]

    p_idx = np.flatnonzero(p_alive)
    remap = np.full(pos.shape[0], -1, np.int64)
    remap[p_idx] = np.arange(p_idx.size)
    b_idx = np.flatnonzero(b_alive)

    particles = {
        "pos": pos[p_idx],
        "vel": vel[p_idx],
        "acc": acc[p_idx],
    }
    beams = {
        "a": remap[a[b_idx]].astype(np.int64),
        "b": remap[b[b_idx]].astype(np.int64),
        "length": np.asarray(state.beam_length, np.float32)[b_idx],
        "target": np.asarray(state.beam_target_length, np.float32)[b_idx],
        "last": np.asarray(state.beam_last_length, np.float32)[b_idx],
        "spring": np.asarray(state.beam_spring, np.float32)[b_idx],
        "damp": np.asarray(state.beam_damp, np.float32)[b_idx],
        "yield_strain": np.asarray(state.beam_yield_strain, np.float32)[b_idx],
        "strain_limit": np.asarray(state.beam_strain_limit, np.float32)[b_idx],
        "strain": np.asarray(state.beam_strain, np.float32)[b_idx],
        "stress": np.asarray(state.beam_stress, np.float32)[b_idx],
    }
    return particles, beams


def _consts_array(consts: PhysicsConstants) -> np.ndarray:
    return np.asarray(consts.to_array(), np.float32)


def save_snapshot(
    state: SimState,
    consts: PhysicsConstants,
    *,
    format: str = "auto",
) -> bytes:
    """Serialize live simulation state (+ physics constants) to bytes.

    ``format``: ``"v0"`` (reference-compatible), ``"v1"``, or ``"auto"``
    (v0 when it fits, else v1).
    """
    particles, beams = _gather_live(state)
    pc = particles["pos"].shape[0]
    bc = beams["a"].shape[0]
    fits_v0 = pc <= V0_MAX_PARTICLES and bc <= V0_MAX_BEAMS
    if format == "auto":
        format = "v0" if fits_v0 else "v1"
    if format == "v0":
        if not fits_v0:
            raise SnapshotError(
                f"{pc} particles / {bc} beams exceed the v0 (u16 header) "
                f"capacity of {V0_MAX_PARTICLES}/{V0_MAX_BEAMS}; use v1"
            )
        return _save_v0(particles, beams, _consts_array(consts))
    if format == "v1":
        return _save_v1(particles, beams, _consts_array(consts))
    raise ValueError(f"unknown snapshot format {format!r}")


def _particle_records(particles) -> np.ndarray:
    pc = particles["pos"].shape[0]
    rec = np.zeros((pc, 6), np.float32)
    rec[:, 0:2] = particles["pos"]
    rec[:, 2:4] = particles["vel"]
    rec[:, 4:6] = particles["acc"]
    return rec


def _save_v0(particles, beams, consts8: np.ndarray) -> bytes:
    pc = particles["pos"].shape[0]
    bc = beams["a"].shape[0]
    p_map_size = 2 * pc
    p_data_size = _PARTICLE_STRIDE * pc
    b_map_size = 2 * bc
    b_data_size = _BEAM_STRIDE_V0 * bc
    out = io.BytesIO()
    out.write(struct.pack("<6H", p_map_size, p_data_size, b_map_size, b_data_size, 32, 0))
    out.write(consts8.tobytes())
    out.write(np.arange(pc, dtype=np.uint16).tobytes())  # identity mapping
    out.write(_particle_records(particles).tobytes())
    out.write(np.arange(bc, dtype=np.uint16).tobytes())
    brec = np.zeros((bc, _BEAM_STRIDE_V0 // 4), np.float32)
    pair = (beams["a"].astype(np.uint32) | (beams["b"].astype(np.uint32) << 16)).astype(
        np.uint32
    )
    brec[:, 0] = pair.view(np.float32)
    for i, k in enumerate(
        ("length", "target", "last", "spring", "damp", "yield_strain",
         "strain_limit", "strain", "stress"), start=1
    ):
        brec[:, i] = beams[k]
    out.write(brec.tobytes())
    return out.getvalue()


def _save_v1(particles, beams, consts8: np.ndarray) -> bytes:
    pc = particles["pos"].shape[0]
    bc = beams["a"].shape[0]
    out = io.BytesIO()
    out.write(_V1_MAGIC)
    out.write(struct.pack("<II", pc, bc))
    out.write(consts8.tobytes())
    out.write(_particle_records(particles).tobytes())
    out.write(beams["a"].astype(np.int32).tobytes())
    out.write(beams["b"].astype(np.int32).tobytes())
    for k in ("length", "target", "last", "spring", "damp", "yield_strain",
              "strain_limit", "strain", "stress"):
        out.write(beams[k].astype(np.float32).tobytes())
    return out.getvalue()


def load_snapshot(
    buf: bytes,
    *,
    max_particles: Optional[int] = None,
    max_beams: Optional[int] = None,
    build_incidence: bool = True,
) -> Tuple[SimState, PhysicsConstants]:
    """Deserialize a snapshot (either format, auto-detected) into a fresh
    :class:`SimState` plus embedded :class:`PhysicsConstants`.

    Raises :class:`SnapshotError` when the snapshot exceeds the requested
    capacity — the analog of the reference returning ``false``
    (engineMapping.ts:418) and surfacing an alert (main.ts:79-83).
    """
    if buf[:4] == _L1_MAGIC:
        raise SnapshotError(
            "lattice (L1) snapshot — use load_lattice_snapshot"
        )
    try:
        if buf[:4] == _V1_MAGIC:
            parsed = _load_v1(buf)
        else:
            parsed = _load_v0(buf)
    except (ValueError, IndexError, struct.error) as e:
        # truncated/corrupted bytes must surface as a clean rejection
        raise SnapshotError(f"malformed snapshot: {e}") from e
    particles, beams, consts8 = parsed
    pc = particles["pos"].shape[0]
    bc = beams["a"].shape[0]
    if max_particles is not None and pc > max_particles:
        raise SnapshotError(f"snapshot has {pc} particles > capacity {max_particles}")
    if max_beams is not None and bc > max_beams:
        raise SnapshotError(f"snapshot has {bc} beams > capacity {max_beams}")
    state = state_from_numpy(
        particles["pos"],
        particles["vel"],
        acc=particles["acc"],
        beams=np.stack([beams["a"], beams["b"]], -1) if bc else None,
        beam_length=beams["length"],
        beam_spring=beams["spring"],
        beam_damp=beams["damp"],
        beam_yield_strain=beams["yield_strain"],
        beam_strain_limit=beams["strain_limit"],
        beam_target_length=beams["target"],
        beam_last_length=beams["last"],
        max_particles=max_particles,
        max_beams=max_beams,
        build_incidence=build_incidence,
    )
    import jax.numpy as jnp

    if bc:
        m = state.max_beams
        strain = np.zeros(m, np.float32)
        stress = np.zeros(m, np.float32)
        strain[:bc] = beams["strain"]
        stress[:bc] = beams["stress"]
        state.beam_strain = jnp.asarray(strain)
        state.beam_stress = jnp.asarray(stress)
    return state, PhysicsConstants.from_array(consts8)


def _load_v0(buf: bytes):
    if len(buf) < 12 + 32:
        raise SnapshotError("truncated v0 snapshot")
    p_map_size, p_data_size, b_map_size, b_data_size, meta_size, _ = struct.unpack(
        "<6H", buf[:12]
    )
    off = 12
    consts8 = np.frombuffer(buf, np.float32, meta_size // 4, off).copy()
    off += meta_size
    pc = p_map_size // 2
    bc = b_map_size // 2
    p_map = np.frombuffer(buf, np.uint16, pc, off).astype(np.int64)
    off += p_map_size
    p_rec = np.frombuffer(buf, np.float32, p_data_size // 4, off).reshape(pc, 6)
    off += p_data_size
    b_map = np.frombuffer(buf, np.uint16, bc, off).astype(np.int64)
    off += b_map_size
    b_rec = np.frombuffer(buf, np.float32, b_data_size // 4, off).reshape(
        bc, _BEAM_STRIDE_V0 // 4
    )

    # Honor the ID→index mapping: particle id i lives at buffer index
    # p_map[i]; beam endpoints are buffer *indices* which we invert back to
    # ids (the costly ``mBuf.indexOf`` of engineMapping.ts:201, vectorized).
    p_data = p_rec[p_map] if pc else p_rec
    inv = np.full(65536, -1, np.int64)
    inv[p_map] = np.arange(pc)
    b_data = b_rec[b_map] if bc else b_rec
    pair = (
        np.ascontiguousarray(b_data[:, 0]).view(np.uint32)
        if bc
        else np.zeros(0, np.uint32)
    )
    idx_a = inv[(pair & 0xFFFF).astype(np.int64)]
    idx_b = inv[(pair >> 16).astype(np.int64)]
    if bc and (np.any(idx_a < 0) or np.any(idx_b < 0)):
        raise SnapshotError("beam references unknown particle index")

    particles = {
        "pos": p_data[:, 0:2].astype(np.float32),
        "vel": p_data[:, 2:4].astype(np.float32),
        "acc": p_data[:, 4:6].astype(np.float32),
    }
    keys = ("length", "target", "last", "spring", "damp", "yield_strain",
            "strain_limit", "strain", "stress")
    beams = {k: b_data[:, i + 1].astype(np.float32) for i, k in enumerate(keys)}
    beams["a"] = idx_a
    beams["b"] = idx_b
    return particles, beams, consts8


_L1_MAGIC = b"SBL1"


def save_lattice_snapshot(state, consts: PhysicsConstants) -> bytes:
    """Serialize a dense LatticeState (L1 format): magic, W, H, particle
    planes, then 4 edge classes × 10 field planes."""
    import io as _io

    w, h = state.pos.shape[0], state.pos.shape[1]
    out = _io.BytesIO()
    out.write(_L1_MAGIC)
    out.write(struct.pack("<II", w, h))
    out.write(_consts_array(consts).tobytes())
    for arr in (state.pos, state.vel, state.acc):
        out.write(np.asarray(arr, np.float32).tobytes())
    out.write(np.asarray(state.alive, bool).astype(np.uint8).tobytes())
    out.write(np.asarray(state.pinned, bool).astype(np.uint8).tobytes())
    for e in state.edges:
        for f in ("length", "target_length", "last_length", "spring", "damp",
                  "yield_strain", "strain_limit", "strain", "stress"):
            out.write(np.asarray(getattr(e, f), np.float32).tobytes())
        out.write(np.asarray(e.alive, bool).astype(np.uint8).tobytes())
    return out.getvalue()


def load_lattice_snapshot(buf: bytes):
    """Deserialize an L1 lattice snapshot → (LatticeState, PhysicsConstants)."""
    import jax.numpy as jnp

    from .ops.stencil import EDGE_OFFSETS, EdgeClass, LatticeState

    if buf[:4] != _L1_MAGIC:
        raise SnapshotError("not an L1 lattice snapshot")
    if len(buf) < 12 + 32:
        raise SnapshotError("truncated L1 snapshot")
    w, h = struct.unpack("<II", buf[4:12])
    expected = 12 + 32 + (w * h) * (3 * 8 + 2 + 4 * (9 * 4 + 1))
    if len(buf) < expected or w == 0 or h == 0 or w * h > 300_000_000:
        raise SnapshotError(
            f"L1 snapshot malformed: {w}x{h}, {len(buf)} bytes < {expected}"
        )
    off = 12
    consts8 = np.frombuffer(buf, np.float32, 8, off).copy()
    off += 32
    n = w * h

    def f32_plane(shape):
        nonlocal off
        count = int(np.prod(shape))
        arr = np.frombuffer(buf, np.float32, count, off).reshape(shape).copy()
        off += 4 * count
        return jnp.asarray(arr)

    def bool_plane():
        nonlocal off
        arr = np.frombuffer(buf, np.uint8, n, off).reshape(w, h).astype(bool)
        off += n
        return jnp.asarray(arr)

    pos = f32_plane((w, h, 2))
    vel = f32_plane((w, h, 2))
    acc = f32_plane((w, h, 2))
    alive = bool_plane()
    pinned = bool_plane()
    edges = []
    for _ in EDGE_OFFSETS:
        fields = {
            f: f32_plane((w, h))
            for f in ("length", "target_length", "last_length", "spring",
                      "damp", "yield_strain", "strain_limit", "strain",
                      "stress")
        }
        fields["alive"] = bool_plane()
        edges.append(EdgeClass(**fields))
    state = LatticeState(pos=pos, vel=vel, acc=acc, alive=alive,
                         pinned=pinned, edges=tuple(edges))
    return state, PhysicsConstants.from_array(consts8)


def _load_v1(buf: bytes):
    pc, bc = struct.unpack("<II", buf[4:12])
    off = 12
    consts8 = np.frombuffer(buf, np.float32, 8, off).copy()
    off += 32
    p_rec = np.frombuffer(buf, np.float32, pc * 6, off).reshape(pc, 6)
    off += pc * _PARTICLE_STRIDE
    idx_a = np.frombuffer(buf, np.int32, bc, off).astype(np.int64)
    off += 4 * bc
    idx_b = np.frombuffer(buf, np.int32, bc, off).astype(np.int64)
    off += 4 * bc
    beams = {"a": idx_a, "b": idx_b}
    for k in ("length", "target", "last", "spring", "damp", "yield_strain",
              "strain_limit", "strain", "stress"):
        beams[k] = np.frombuffer(buf, np.float32, bc, off).copy()
        off += 4 * bc
    particles = {
        "pos": p_rec[:, 0:2].astype(np.float32),
        "vel": p_rec[:, 2:4].astype(np.float32),
        "acc": p_rec[:, 4:6].astype(np.float32),
    }
    return particles, beams, consts8
