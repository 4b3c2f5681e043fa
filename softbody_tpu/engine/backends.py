"""Engine state backends: the worker's frame loop is backend-agnostic —
a backend owns stepping, render extraction, snapshot IO, fault injection
and stats for one state representation.

- :class:`SimBackend` — the general gather-path :class:`SimState`
  (arbitrary topology; editor scenes, blobs, reference default world).
- :class:`LatticeBackend` — the dense stencil engine
  (:class:`LatticeState`); snapshots use the L1 lattice format
  (snapshot.py) and also export reference-compatible v0/v1 bytes.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import PhysicsConstants, StaticConfig, UserInput
from ..ops.step import frame as _frame
from ..snapshot import SnapshotError, load_snapshot, save_snapshot
from ..state import SimState


@functools.partial(jax.jit, donate_argnames=("state",), static_argnames=("cfg",))
def _sim_step(state, consts, uin, cfg):
    return _frame(state, consts, uin, cfg)


@jax.jit
def _sim_extract(state: SimState):
    return tuple(
        jnp.copy(x)
        for x in (
            state.pos, state.particle_alive, state.beam_a, state.beam_b,
            state.beam_alive, state.beam_strain, state.beam_stress,
        )
    )


class SimBackend:
    def __init__(self, cfg: StaticConfig,
                 max_particles: Optional[int] = None,
                 max_beams: Optional[int] = None) -> None:
        self.cfg = cfg
        self.max_particles = max_particles
        self.max_beams = max_beams

    def step(self, state, consts, uin):
        return _sim_step(state, consts, uin, self.cfg)

    def extract(self, state):
        return _sim_extract(state)

    def packet_arrays(self, extracted):
        return tuple(np.asarray(x) for x in extracted)

    def save(self, state, consts) -> bytes:
        return save_snapshot(state, consts)

    def load(self, buf: bytes):
        try:
            return load_snapshot(
                buf, max_particles=self.max_particles, max_beams=self.max_beams
            )
        except SnapshotError:
            return None

    def counts(self, state) -> Tuple[int, int]:
        return (
            int(np.asarray(state.particle_alive).sum()),
            int(np.asarray(state.beam_alive).sum()),
        )

    def broad_phase_overflow(self, state) -> int:
        """Current broad-phase truncation (grid cell-capacity clipping /
        window-row truncation) — SURVEY §5 metrics, computed on demand."""
        from ..ops.collisions import broad_phase_overflow

        return int(np.asarray(broad_phase_overflow(
            state.pos, state.particle_alive, self.cfg)))

    def corrupt(self, state, rng: np.random.Generator):
        upd = {}
        for f in ("pos", "vel", "acc", "beam_length", "beam_target_length",
                  "beam_last_length", "beam_spring", "beam_damp",
                  "beam_yield_strain", "beam_strain_limit"):
            upd[f] = _corrupt_array(getattr(state, f), rng)
        if rng.random() < 0.1:
            upd["particle_alive"] = _corrupt_array(state.particle_alive, rng)
            upd["beam_alive"] = _corrupt_array(state.beam_alive, rng)
        return dataclasses.replace(state, **upd)


def _corrupt_array(arr, rng: np.random.Generator):
    """Random u32 bit patterns at random offsets (≙ engineWorker.ts:599-617)."""
    host = np.asarray(arr).copy()
    flat = host.reshape(-1)
    view = flat.view(np.uint32) if flat.dtype.itemsize == 4 else None
    while rng.random() < 0.5:
        pos = rng.integers(0, flat.size)
        if view is not None:
            view[pos] = rng.integers(0, 2**32, dtype=np.uint64)
        elif flat.dtype == bool:
            flat[pos] = bool(rng.integers(0, 2))
    return jnp.asarray(host)


@jax.jit
def _stats_merge(a, b):
    """Accumulate per-frame far stats [rebuilds, max pairs, max
    overflow, (max active)] lazily on device (no sync in the frame
    loop) — first entry sums, the rest take the running max."""
    return jnp.concatenate(
        [a[:1] + b[:1], jnp.maximum(a[1:], b[1:])]
    )


class LatticeBackend:
    """Dense stencil engine backend.

    ``farfield``: optional :class:`~softbody_tpu.ops.farfield.FarFieldSpec`
    enabling index-distant (fold/tear) self-collision.  The backend keeps
    a Verlet-style candidate list and rebuilds it adaptively: before each
    frame it projects the maximum COM-relative displacement the frame can
    add (current displacement + max relative speed × frame time × safety
    factor 2) against the skin/2 validity budget.  An empty list keeps
    the zero-cost near-field-only fast path; capacity buckets (64/256/…)
    keep the per-substep gather small when few pairs are active.
    """

    _FAR_BUCKETS = (64, 256, 1024)
    # below this validity horizon (in substeps) a rebuild is cheaper than
    # dicing the frame further; chunks are powers of two to bound the
    # number of compiled n_sub variants
    _MIN_CHUNK = 4

    def __init__(self, spec, cfg: StaticConfig, farfield=None) -> None:
        from ..ops.stencil import lattice_frame_far_jit, lattice_frame_jit

        self.spec = spec
        self.cfg = cfg
        self.ff = farfield
        self._frame = lattice_frame_jit
        self._frame_far = lattice_frame_far_jit
        self._static_topology = None  # (beam_a, beam_b, class slices) cache
        self._far_list = None         # full-capacity list (device)
        self._far_active = None       # cropped list passed to the frame fn
        self.far_rebuilds = 0
        self.far_pairs = 0
        self.far_overflow = 0
        self.far_chunks = 0           # frame chunks run (observability)

    def _motion(self, state):
        """(COM-relative displacement since rebuild, max relative speed).
        One batched readback."""
        import jax

        from ..ops.farfield import displacement_check, max_relative_speed

        vrel = max_relative_speed(state.vel, state.alive)
        if self._far_list is None:
            return float("inf"), float(jax.device_get(vrel))
        disp = displacement_check(state.pos, state.alive, self._far_list)
        d, v = jax.device_get((disp, vrel))
        return float(d), float(v)

    def _far_rebuild(self, pos, alive) -> None:
        """Two-stage rebuild: a detection-only count first (the common
        no-fold frame skips the compaction machinery entirely), then the
        full list build when candidates exist.  Hysteresis: while the
        previous list was non-empty (persistent folds), skip the count
        pre-pass — it would run the same detection twice."""
        from ..ops.farfield import (
            crop_far_list,
            empty_far_list_at,
            far_candidate_count,
            rebuild_far_list,
        )

        kw = dict(s=self.spec.collision_stencil, ff=self.ff,
                  radius=self.cfg.particle_radius)
        self.far_rebuilds += 1
        if self.far_pairs == 0:
            total, com = far_candidate_count(pos, alive, **kw)
            if int(total) == 0:
                self._far_list = empty_far_list_at(pos, com, self.ff)
                self._far_active = None
                self.far_overflow = 0
                return
        self._far_list = rebuild_far_list(pos, alive, **kw)
        self.far_pairs = int(self._far_list.n_pairs)
        self.far_overflow = int(self._far_list.overflow)
        if self.far_pairs == 0:
            self._far_active = None
        else:
            k = next((b for b in self._FAR_BUCKETS if b >= self.far_pairs),
                     self.ff.max_pairs)
            self._far_active = crop_far_list(
                self._far_list, min(k, self.ff.max_pairs)
            )

    def _frame_chunk(self, state, consts, uin, n_sub, observe):
        # the XLA stencil path keeps strain/stress in-loop (see
        # lattice_frame's NOTE), so ``observe`` is accepted for interface
        # parity and ignored
        if self._far_active is not None:
            return self._frame_far(state, self._far_active, consts, uin,
                                   self.spec, self.cfg, self.ff,
                                   n_sub=n_sub)
        return self._frame(state, consts, uin, self.spec, self.cfg,
                           n_sub=n_sub)

    def _pos_alive(self, state):
        return state.pos, state.alive

    def step(self, state, consts, uin):
        """One frame.  With far-field armed the frame is run as chunks
        whose length never exceeds the candidate list's validity horizon:
        the Verlet list built at ``pos_ref`` covers every pair reachable
        while no particle's COM-relative displacement exceeds skin/2
        (ops/farfield.py docstring), so with max relative speed v the
        list stays exact for ⌊(skin/2 − disp)/(2·v·dt)⌋ more substeps
        (safety factor 2 for mid-chunk speed growth).  Horizons shorter
        than _MIN_CHUNK trigger a rebuild instead."""
        if self.ff is None or self.cfg.collision_mode == "none":
            return self._frame(state, consts, uin, self.spec, self.cfg)

        dt = self.cfg.dt
        budget = self.ff.skin * 0.5
        remaining = self.cfg.subticks
        while remaining > 0:
            disp, vrel = self._motion(state)
            denom = max(2.0 * vrel * dt, 1e-12)
            horizon = (budget - disp) / denom
            if horizon < min(self._MIN_CHUNK, remaining):
                pos, alive = self._pos_alive(state)
                self._far_rebuild(pos, alive)
                horizon = max(budget / denom, 1.0)
            # largest power of two ≤ min(remaining, horizon): bounds the
            # compiled n_sub variants to {1, 2, 4, …, subticks}
            j = 1
            while 2 * j <= min(remaining, int(max(horizon, 1.0))):
                j *= 2
            state = self._frame_chunk(state, consts, uin,
                                      n_sub=j if j != self.cfg.subticks
                                      else None,
                                      observe=(j == remaining))
            self.far_chunks += 1
            remaining -= j
        return state

    def far_stats(self) -> dict:
        return {"far_rebuilds": self.far_rebuilds,
                "far_pairs": self.far_pairs,
                "far_overflow": self.far_overflow}


    def extract(self, state):
        from ..ops.stencil import EDGE_OFFSETS

        w, h = self.spec.width, self.spec.height
        pos = jnp.copy(state.pos.reshape(w * h, 2))
        alive = jnp.copy(state.alive.reshape(w * h))
        strains = tuple(jnp.copy(e.strain.reshape(w * h)) for e in state.edges)
        stresses = tuple(jnp.copy(e.stress.reshape(w * h)) for e in state.edges)
        ealive = tuple(jnp.copy(e.alive.reshape(w * h)) for e in state.edges)
        return (pos, alive) + strains + stresses + ealive

    def _topology(self):
        if self._static_topology is None:
            from ..ops.stencil import EDGE_OFFSETS

            w, h = self.spec.width, self.spec.height
            x = np.arange(w)[:, None]
            y = np.arange(h)[None, :]
            lin = (x * h + y)
            a_list, b_list, sel_list = [], [], []
            for dx, dy in EDGE_OFFSETS:
                valid = ((x + dx >= 0) & (x + dx < w)
                         & (y + dy >= 0) & (y + dy < h))
                sel = valid.reshape(-1)
                a = lin.reshape(-1)[sel]
                a_list.append(a)
                b_list.append(a + dx * h + dy)
                sel_list.append(sel)
            self._static_topology = (a_list, b_list, sel_list)
        return self._static_topology

    def packet_arrays(self, extracted):
        pos, alive = np.asarray(extracted[0]), np.asarray(extracted[1])
        n_cls = 4
        strains = [np.asarray(x) for x in extracted[2 : 2 + n_cls]]
        stresses = [np.asarray(x) for x in extracted[2 + n_cls : 2 + 2 * n_cls]]
        ealive = [np.asarray(x) for x in extracted[2 + 2 * n_cls :]]
        a_list, b_list, sel_list = self._topology()
        beam_a = np.concatenate(a_list).astype(np.int32)
        beam_b = np.concatenate(b_list).astype(np.int32)
        beam_alive = np.concatenate(
            [ea[sel] for ea, sel in zip(ealive, sel_list)]
        )
        beam_strain = np.concatenate(
            [s[sel] for s, sel in zip(strains, sel_list)]
        )
        beam_stress = np.concatenate(
            [s[sel] for s, sel in zip(stresses, sel_list)]
        )
        return (pos, alive, beam_a, beam_b, beam_alive, beam_strain, beam_stress)

    def save(self, state, consts) -> bytes:
        from ..snapshot import save_lattice_snapshot

        return save_lattice_snapshot(state, consts)

    def load(self, buf: bytes):
        from ..snapshot import load_lattice_snapshot

        try:
            state, consts = load_lattice_snapshot(buf)
        except SnapshotError:
            return None
        if (state.pos.shape[0], state.pos.shape[1]) != (
            self.spec.width, self.spec.height
        ):
            return None
        return state, consts

    def counts(self, state) -> Tuple[int, int]:
        n = int(np.asarray(state.alive).sum())
        m = sum(int(np.asarray(e.alive).sum()) for e in state.edges)
        return n, m

    def corrupt(self, state, rng: np.random.Generator):
        upd = {
            "pos": _corrupt_array(state.pos, rng),
            "vel": _corrupt_array(state.vel, rng),
            "acc": _corrupt_array(state.acc, rng),
        }
        edges = tuple(
            dataclasses.replace(
                e,
                target_length=_corrupt_array(e.target_length, rng),
                last_length=_corrupt_array(e.last_length, rng),
            )
            for e in state.edges
        )
        return dataclasses.replace(state, edges=edges, **upd)


class FusedLatticeBackend(LatticeBackend):
    """Lattice backend running the fused Pallas kernel v2 over persistent
    packed plane stacks — the engine-API route to the bench-headline path
    (requires per-class-uniform edge parameters; tile_w must divide the
    padded interior width).

    State representation: ``(hot [18,Wp,Hp], obs [8,Wp,Hp])``; the
    immutable stack and edge-constant vector live on the backend.
    Snapshot/corrupt round-trip through LatticeState (cold paths)."""

    def __init__(self, spec, cfg: StaticConfig, farfield=None,
                 tile_w: int = 128, far_mode: str = "v4",
                 far_buckets: Optional[Tuple[int, ...]] = None,
                 far_activation: bool = False,
                 far_mb: int = 32,
                 far_mb_out: Optional[int] = None,
                 far_detect: str = "xla",
                 far_band: Optional[str] = None,
                 kernel_variants: Tuple[str, ...] = (
                     "rollgroup", "rsqrt", "dexp2", "lanecut",
                     "krec", "ealpack")) -> None:
        super().__init__(spec, cfg, farfield=farfield)
        self.tile_w = tile_w
        # Static kernel-variant flags threaded into the fused kernel
        # (fused_substep2._kernel2 ``kvar``): "rollgroup" (batched
        # partner-shift rolls), "rsqrt" (sqrt+div → rsqrt+mul),
        # "dexp2" (drag pow → square; only valid when the concrete
        # drag_exp is 2.0 — auto-dropped in step() otherwise),
        # "nospring" (attribution-only, NOT physics).
        #
        # The default is the measured-best set (1M tearing cloth, v5e:
        # kernel 0.888 → 0.767 ms/substep, full physics 568 → 616
        # substeps/s, bench_sweep r4; "lanecut" below).  The f32 ones
        # within f32 rounding: rollgroup only regroups f32 collision
        # sums (quantized spring sums stay bit-identical), dexp2 is the
        # correctly-rounded value the generic pow approximates, rsqrt
        # shifts individual ops by 1-2 ulp — well inside the reference
        # GPU's own precision envelope (WGSL sqrt/divide carry no
        # correct-rounding guarantee).  Pass ``kernel_variants=()`` for
        # the strict path that bit-matches the NumPy oracle's op
        # sequence (what the cross-path parity tests pin).  Applies to
        # the v2/v4 frames; the legacy v3 far frame ignores it.
        self.kvar = tuple(kernel_variants)
        # "lanecut" packs the hot/obs/immut stacks WITHOUT the bottom
        # lane pad (pad_hl=0; fused_substep2.pack_lattice2) — the kernel
        # serves −dy halo reads from zero-filled rotations instead.
        # Measured (bench_sweep r4): bare slab pipe 0.601 → 0.555
        # ms/substep, full physics 600 → 616 substeps/s at 1M; bit-exact
        # (tests/test_fused4.py::test_pipeline_layout_kvars_bit_exact).
        # Layout-level flag: the v3 far frames still assume the classic
        # PAD_H layout, so v3 silently keeps it (drop, not error — the
        # default kvar includes "lanecut").
        # "kmirror": the kernel emits each substep's far-apply mirror
        # records as a side output riding the scan carry, so the
        # apply's granularity-bound [5,w,h]→records relayout runs once
        # per frame instead of per substep.  Measured same-session A/B
        # (bench_sweep r4): 613.1 → 624.9 substeps/s at the 1M tear;
        # bit-exact (same test).
        # "krec" (default; implies the kmirror carry): the apply also
        # returns delta RECORDS and the kernel consumes them directly —
        # the unmirror relayout disappears too.  Measured same-session
        # A/B: kmirror 629.4 → krec 657.8 substeps/s = 1.32×; bit-exact
        # (same test).
        if far_mode == "v3":
            # layout-level flags: the v3 far frames assume the classic
            # PAD_H / 18-plane layout, so both drop (not error)
            self.kvar = tuple(v for v in self.kvar
                              if v not in ("lanecut", "ealpack"))
        # (a "padw4" thin-sublane-halo layout was built and measured
        # unloweable — Mosaic pins sublane DMA offsets to multiples of
        # 8; see fused_substep2._kvar_pads.)
        self._pad_hl = 0 if "lanecut" in self.kvar else None
        # "kmirror"/"krec" (kernel-produced far-apply mirror records /
        # kernel-consumed delta records riding the scan carry) are v4
        # xla-detect features on the default mb=32 record layout; v3
        # frames, kernel-side detection, and the far_mb/far_mb_out
        # measurement knobs silently drop them, like lanecut.  A custom
        # bucket ladder with a bucket ≤ 256 also drops krec: krec skips
        # the narrow small-bucket apply variant, which would change the
        # f32 collision scatter-add ORDER vs the non-krec path (same
        # contribution set) — dropping keeps the backend's default
        # bit-exactness contract for every ladder, not just the
        # (no-bucket-≤256) default one
        if (far_mode == "v3" or far_detect == "kernel"
                or far_mb != 32 or far_mb_out is not None):
            self.kvar = tuple(v for v in self.kvar
                              if v not in ("kmirror", "krec"))
        if far_buckets is not None and any(b <= 256 for b in far_buckets):
            self.kvar = tuple(v for v in self.kvar if v != "krec")
        # kmirror's side-output slab window offset is (tile_w/4)·i and
        # krec's record input block is (tile_w/4) sublanes — real-TPU
        # Mosaic lowering requires both to be 8-aligned, so small-tile
        # worlds (the 1M bench runs tile_w=64) silently keep the XLA
        # relayout path there.  Interpret mode (CPU tests) has no such
        # constraint and keeps small-tile kmirror/krec coverage.
        if tile_w % 32 != 0 and jax.default_backend() == "tpu":
            self.kvar = tuple(v for v in self.kvar
                              if v not in ("kmirror", "krec"))
        # "v4": fixed-cadence rebuilds + mirror-table apply (the round-3
        # default; ops/farfield4.py).  "v3": triggered rebuilds with
        # kernel-side detection, far state carried across frames.
        self.far_mode = far_mode
        # apply-capacity buckets (None = the frame's default); fewer
        # buckets shrink the compiled switch, more track n_pairs tighter
        self.far_buckets = far_buckets
        # per-substep active-prefix schedule (ops/farfield.py::
        # pair_activation): the apply prices by pairs that can touch by
        # the current substep, not the whole candidate list (v4 only).
        # Default OFF here: at the 1M tear the list is already
        # all-active (far_active 1028/1031) while the schedule costs
        # +2.8 ms per rebuild (probe_r5b) — it pays on sparse/onset
        # workloads, e.g. the planified path keeps it on
        self.far_activation = far_activation
        # record lane-block widths for the mirror apply (32 or 128):
        # far_mb = gather-side table, far_mb_out = delta-table scatter
        # side (None = same as far_mb) — farfield4.far_terms_from_mirror
        self.far_mb = far_mb
        self.far_mb_out = far_mb_out
        # "xla" = dense detection at each rebuild; "kernel" = the
        # block's last substep emits detection side-outputs in-kernel
        # (fused_frame4 detect_mode — see its docstring)
        self.far_detect = far_detect
        # band-pass implementation inside the (xla-detect) rebuild:
        # "kernel" = the dedicated Pallas band kernel
        # (ops/pallas/band_detect.py) — bit-identical flags, reads the
        # planes once per slab instead of once per ~100 offsets.
        # Measured same-session A/B at the 1M tear (bench_sweep r5):
        # 675.7 → 714.8 substeps/s (the XLA loop re-reads ~1.4 GB of
        # padded planes per rebuild; probe_r7).  Default: kernel on
        # real TPU, xla elsewhere — in interpret mode the kernel is
        # pure overhead (its expansion also bloats every far-armed
        # CPU test graph, which pushed the long-lived suite process
        # into an XLA CPU compiler segfault regime)
        if far_band is None:
            far_band = ("kernel" if jax.default_backend() == "tpu"
                        else "xla")
        self.far_band = far_band
        self._immut = None
        self._edge_consts = None
        self._template = None
        self._stats_acc = None   # device int32[3]: rebuilds/pairs/overflow
        self._far_side = None    # kernel detection side planes (carried)
        self._far_trig = None    # trigger carry vector (carried)

    def pack_state(self, lstate):
        """LatticeState → packed (hot, obs); captures immut/edge consts
        and a template for unpacking."""
        from ..ops.pallas.fused_substep2 import pack_lattice2

        hot, obs, immut, ec = pack_lattice2(lstate, tile_w=self.tile_w,
                                            **self._pad_kw())
        self._immut = immut
        self._edge_consts = ec
        self._template = lstate
        # new state ⇒ the carried far list / detection side planes /
        # trigger vector describe a world that no longer exists; drop
        # them so step() re-anchors from the fresh state
        self._far_list = None
        self._far_side = None
        self._far_trig = None
        return (hot, obs)

    def _pad_kw(self):
        """Layout overrides implied by the kvar flags ({"pad_hl": 0}
        under lanecut, {"ealpack": True} under ealpack); {} keeps the
        classic-default signatures untouched."""
        kw = {}
        if self._pad_hl is not None:
            kw["pad_hl"] = self._pad_hl
        if "ealpack" in self.kvar:
            kw["ealpack"] = True
        return kw

    def unpack_state(self, state):
        from ..ops.pallas.fused_substep2 import unpack_lattice2

        hot, obs = state
        return unpack_lattice2(hot, obs, self._template, **self._pad_kw())

    def _frame_chunk(self, state, consts, uin, n_sub, observe):
        from ..ops.pallas.fused_substep2 import fused_frame2, fused_frame2_far

        interp = jax.default_backend() != "tpu"
        hot, obs = state
        if self._far_active is not None:
            return fused_frame2_far(
                hot, obs, self._immut, self._edge_consts,
                self._far_active, consts, uin, self.spec, self.cfg,
                self.ff, tile_w=self.tile_w, interpret=interp,
                n_sub=n_sub, observe=observe,
                kvar=self._checked_kvar(consts),
            )
        return fused_frame2(hot, obs, self._immut, self._edge_consts,
                            consts, uin, self.spec, self.cfg,
                            tile_w=self.tile_w, interpret=interp,
                            n_sub=n_sub, observe=observe,
                            kvar=self._checked_kvar(consts))

    def _checked_kvar(self, consts) -> Tuple[str, ...]:
        """The backend's kernel-variant flags, with ``dexp2`` dropped
        (not errored — constants are runtime-mutable) whenever the
        concrete drag exponent isn't exactly 2.0."""
        if "dexp2" in self.kvar and (
            float(np.asarray(consts.drag_exp)) != 2.0
        ):
            return tuple(v for v in self.kvar if v != "dexp2")
        return self.kvar

    def step(self, state, consts, uin):
        """One frame.  With far-field armed the far machinery rides the
        substep scan on device, zero host syncs; stats accumulate
        device-side (``far_stats``).  ``far_mode="v4"`` (default) runs
        fixed-cadence rebuilds + the mirror-table apply (fused_frame4,
        no cross-frame far state); ``"v3"`` runs the round-2 triggered
        design (fused_frame3_auto: kernel side-output detection, list
        carried across frames, lax.cond rebuilds)."""
        if self.ff is None or self.cfg.collision_mode == "none":
            return self._frame_chunk(state, consts, uin, n_sub=None,
                                     observe=True)
        interp = jax.default_backend() != "tpu"
        if self.far_mode == "v4":
            from ..ops.pallas.fused_substep2 import fused_frame4

            hot, obs = state
            bkw = ({} if self.far_buckets is None
                   else {"buckets": self.far_buckets})
            hot, obs, st = fused_frame4(
                hot, obs, self._immut, self._edge_consts, consts, uin,
                self.spec, self.cfg, self.ff, tile_w=self.tile_w,
                interpret=interp, activation=self.far_activation,
                far_mb=self.far_mb, far_mb_out=self.far_mb_out,
                detect_mode=self.far_detect,
                band_impl=self.far_band,
                kvar=self._checked_kvar(consts), **bkw,
            )
            if self._stats_acc is None:
                self._stats_acc = st
            else:
                self._stats_acc = _stats_merge(self._stats_acc, st)
            return hot, obs
        from ..ops.farfield import empty_far_list
        from ..ops.pallas.fused_substep2 import (
            far3_carry_init,
            fused_frame3_auto,
        )

        hot, obs = state
        if self._far_list is None:
            pw, ph = hot.shape[1], hot.shape[2]
            self._far_list = empty_far_list(pw, ph, self.ff)
            self._far_side, self._far_trig = far3_carry_init(
                hot, self._immut, self.cfg, self.spec, self.ff,
                tile_w=self.tile_w,
            )
        (hot, obs, self._far_list, self._far_side, self._far_trig,
         st) = fused_frame3_auto(
            hot, obs, self._immut, self._edge_consts, self._far_list,
            self._far_side, self._far_trig,
            consts, uin, self.spec, self.cfg, self.ff,
            tile_w=self.tile_w, interpret=interp,
        )
        if self._stats_acc is None:
            self._stats_acc = st
        else:
            self._stats_acc = _stats_merge(self._stats_acc, st)
        return hot, obs

    def far_stats(self) -> dict:
        """Device-accumulated stats SINCE THE LAST READ: total rebuilds,
        max n_pairs, max overflow across the frames in the window (the
        accumulator resets on read, so a transient fold's pair count
        decays once reported — matching LatticeBackend's last-rebuild
        semantics at frame granularity)."""
        if self._stats_acc is None:
            return super().far_stats()
        vals = [int(x) for x in np.asarray(self._stats_acc)]
        self._stats_acc = None
        out = {"far_rebuilds": vals[0], "far_pairs": vals[1],
               "far_overflow": vals[2]}
        if len(vals) > 3:   # v4 activation schedule: max active pairs
            out["far_active"] = vals[3]
        return out

    def extract(self, state):
        return super().extract(self.unpack_state(state))

    def save(self, state, consts) -> bytes:
        return super().save(self.unpack_state(state), consts)

    def load(self, buf: bytes):
        loaded = super().load(buf)
        if loaded is None:
            return None
        lstate, consts = loaded
        return self.pack_state(lstate), consts

    def counts(self, state):
        return super().counts(self.unpack_state(state))

    def corrupt(self, state, rng: np.random.Generator):
        return self.pack_state(super().corrupt(self.unpack_state(state), rng))



class PlanifiedBackend(SimBackend):
    """General-topology engine on the DENSE stencil path: arbitrary beam
    graphs (editor scenes, blobs, meshes) spatially embedded onto [W, H]
    planes (ops/planify.py) — the TPU-native route to the reference's
    uniform any-graph handling (compute.wgsl:96-131) at dense-path
    speed.  Exception beams (the non-local tail) ride a flat list merged
    into the same int32 force accumulator, so beam physics stays
    bit-identical to the flat path under quantized forces.

    State representation: :class:`~softbody_tpu.ops.planify.PlanifiedState`;
    the embedding (host-side maps) lives on the backend and is rebuilt on
    pack/load — like the reference's buffer rebuild on SNAPSHOT_LOAD
    (engineWorker.ts:532-538)."""

    def __init__(self, cfg: StaticConfig,
                 max_particles: Optional[int] = None,
                 max_beams: Optional[int] = None,
                 collision_stencil: int = 3,
                 farfield=None) -> None:
        super().__init__(cfg, max_particles, max_beams)
        self.collision_stencil = collision_stencil
        # optional FarFieldSpec: contacts that develop AFTER the pack-time
        # embedding can be index-distant in the embedded plane; far-field
        # restores them (fixed-cadence v4 schedule, planified_frame_far)
        self.ff = farfield
        self._stats_acc = None
        self._spec = None
        self._aux = None
        self._template = None

    def pack_state(self, state: SimState):
        from ..ops.planify import planify

        # far-armed embeddings must be chunk-grid aligned: the v4 apply
        # decodes linear chunk ids with cwy = h // chunk, which matches
        # the rebuild's tile-padded chunk grid only when the lane dim is
        # a multiple of chunk * tile_chunks (16) — see farfield4
        cm = self.ff.chunk * self.ff.tile_chunks if self.ff else 1
        ps, spec, aux = planify(state,
                                collision_stencil=self.collision_stencil,
                                chunk_multiple=cm)
        self._spec = spec
        self._aux = aux
        self._template = state
        return ps

    def unpack_state(self, ps) -> SimState:
        from ..ops.planify import unplanify

        return unplanify(ps, self._template, self._aux)

    def step(self, ps, consts, uin):
        from ..ops.planify import planified_frame, planified_frame_far

        if self.ff is not None and self.cfg.collision_mode != "none":
            ps, st = planified_frame_far(ps, consts, uin, self._spec,
                                         self.cfg, self.ff)
            if self._stats_acc is None:
                self._stats_acc = st
            else:
                self._stats_acc = _stats_merge(self._stats_acc, st)
            return ps
        return planified_frame(ps, consts, uin, self._spec, self.cfg)

    def far_stats(self) -> dict:
        """Device-accumulated far stats since the last read (resets on
        read — same semantics as FusedLatticeBackend.far_stats)."""
        if self._stats_acc is None:
            return {}
        vals = [int(x) for x in np.asarray(self._stats_acc)]
        self._stats_acc = None
        out = {"far_rebuilds": vals[0], "far_pairs": vals[1],
               "far_overflow": vals[2]}
        if len(vals) > 3:   # activation schedule: max active pairs
            out["far_active"] = vals[3]
        return out

    def extract(self, ps):
        return _sim_extract(self.unpack_state(ps))

    def save(self, ps, consts) -> bytes:
        return save_snapshot(self.unpack_state(ps), consts)

    def load(self, buf: bytes):
        got = super().load(buf)
        if got is None:
            return None
        state, consts = got
        return self.pack_state(state), consts

    def counts(self, ps) -> Tuple[int, int]:
        return (
            int(np.asarray(ps.lat.alive).sum()),
            int(np.asarray(
                jnp.concatenate([e.alive.reshape(-1) for e in ps.lat.edges]
                                + [ps.x.alive])).sum()),
        )

    def corrupt(self, ps, rng: np.random.Generator):
        # corrupt through the flat representation (reference byte-level
        # semantics, engineWorker.ts:599-617), then re-embed
        flat = super().corrupt(self.unpack_state(ps), rng)
        return self.pack_state(flat)

    def broad_phase_overflow(self, ps) -> int:
        # the dense index stencil has no capacity to overflow; far-field
        # truncation is reported separately (far_stats)
        return 0
