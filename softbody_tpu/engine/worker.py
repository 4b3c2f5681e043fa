"""Engine worker: the runtime that owns device state and runs the frame
loop (component C5 — ≙ ``WGPUSoftbodyEngineWorker``, engineWorker.ts:21-725).

TPU redesign of the reference worker:

- The 64 substep dispatches per frame (engineWorker.ts:655-661) are one
  jitted, state-donating ``lax.scan`` call — zero host↔device round trips
  inside a frame.
- The A/B bind-group double buffering (:243-244) is the scan carry.
- GPU⇄CPU staging-buffer transfer (``loadBuffers``/``writeBuffers``,
  :548-597) becomes wholesale device_get / host-rebuild, still serialized
  behind the FIFO lock exactly like the reference.
- Render readback is decoupled: a separate non-donating jitted extractor
  copies (positions, stress, strain) so the host can fetch the previous
  frame while the next one computes (the BASELINE "decoupled readback"
  north star).
- ``corrupt_buffers`` fault injection (:599-617) pokes random u32 bit
  patterns into random offsets of every state array.
- Hidden-visibility throttling (:699-708): paused sim polls at 100 ms.
"""

from __future__ import annotations

import dataclasses
import functools
import queue
import threading
import time
from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..config import PhysicsConstants, StaticConfig, UserInput
from ..ops.step import frame as _frame_fn
from ..snapshot import SnapshotError, load_snapshot, save_snapshot
from ..state import SimState
from .lock import FifoLock
from .protocol import EngineOptions, Message, MessageType


@dataclasses.dataclass
class RenderPacket:
    """Host-side view of one frame for visualization (what the reference's
    render pass consumes: positions + per-beam stress/strain colors,
    render.wgsl:77-83)."""

    pos: np.ndarray
    particle_alive: np.ndarray
    beam_a: np.ndarray
    beam_b: np.ndarray
    beam_alive: np.ndarray
    beam_strain: np.ndarray
    beam_stress: np.ndarray
    frame_index: int


@dataclasses.dataclass
class EngineStats:
    fps: float
    substeps_per_sec: float
    particle_substeps_per_sec: float
    frame_index: int
    particle_count: int
    beam_count: int
    # far-field self-collision observability (lattice backend with a
    # FarFieldSpec; zeros otherwise)
    far_pairs: int = 0
    far_rebuilds: int = 0
    far_overflow: int = 0


class EngineWorker:
    """Background engine thread. Use through :class:`..engine.Engine`."""

    def __init__(
        self,
        state,
        consts: Optional[PhysicsConstants] = None,
        options: Optional[EngineOptions] = None,
        backend=None,
    ) -> None:
        opts = options or EngineOptions()
        self.options = opts
        self.cfg = StaticConfig(
            bounds_size=opts.bounds_size,
            particle_radius=opts.particle_radius,
            subticks=opts.subticks,
            collision_mode=opts.collision_mode,
            force_mode=opts.force_mode,
            grid_cell_capacity=opts.grid_cell_capacity,
            use_pallas=opts.use_pallas,
        )
        if backend is None:
            from .backends import SimBackend

            backend = SimBackend(
                self.cfg,
                max_particles=opts.max_particles,
                max_beams=opts.max_beams,
            )
        self.backend = backend
        self._state = state
        self._consts = consts or PhysicsConstants.default()
        self._uin_host = {
            "applied_force": np.zeros(2, np.float32),
            "mouse_pos": np.zeros(2, np.float32),
            "mouse_active": False,
        }
        self._last_mouse = np.zeros(2, np.float32)
        self._last_frame_t = time.monotonic()
        self._user_strength = 1.0

        self._lock = FifoLock()
        self._queue: "queue.Queue[Message]" = queue.Queue()
        self._running = True
        self._visible = True
        self._frame_index = 0
        self._frame_times: list[float] = []
        self._render_src = None  # device tuple from _extract_render
        self._render_frame = -1
        self._packet_lock = threading.Lock()
        self.error: Optional[BaseException] = None

        self._thread = threading.Thread(
            target=self._run, name="softbody-engine-worker", daemon=True
        )
        self._thread.start()

    # ---- thread body ----

    def _run(self) -> None:
        try:
            while self._running:
                self._drain_messages()
                if not self._running:
                    break
                if self._visible:
                    self._frame()
                    self._pace()
                else:
                    # hidden tab → 100 ms polls (engineWorker.ts:699-708)
                    time.sleep(0.1)
        except BaseException as e:  # surfaced to host like engine.ts:139
            self.error = e
            self._running = False

    def _pace(self) -> None:
        target = self.options.target_fps
        if not target:
            return
        next_t = self._last_frame_t + 1.0 / target
        now = time.monotonic()
        if next_t > now:
            time.sleep(next_t - now)

    def _drain_messages(self) -> None:
        while True:
            try:
                msg = self._queue.get_nowait()
            except queue.Empty:
                return
            self._handle(msg)

    def _handle(self, msg: Message) -> None:
        t = msg.type
        if t == MessageType.DESTROY:
            self._running = False
            msg.respond()
        elif t == MessageType.PHYSICS_CONSTANTS:
            with self._lock:
                self._consts = msg.data
            msg.respond(self._consts)
        elif t == MessageType.GET_PHYSICS_CONSTANTS:
            msg.respond(self._consts)
        elif t == MessageType.INPUT:
            force, mouse_pos, mouse_active, strength = msg.data
            self._uin_host["applied_force"] = np.asarray(force, np.float32)
            self._uin_host["mouse_pos"] = np.asarray(mouse_pos, np.float32)
            self._uin_host["mouse_active"] = bool(mouse_active)
            self._user_strength = float(strength)
            msg.respond()
        elif t == MessageType.VISIBILITY_CHANGE:
            self._visible = not bool(msg.data)
            msg.respond()
        elif t == MessageType.SNAPSHOT_SAVE:
            with self._lock:
                buf = self.backend.save(self._state, self._consts)
            msg.respond(buf)
        elif t == MessageType.SNAPSHOT_LOAD:
            loaded = self.backend.load(msg.data)
            if loaded is None:
                msg.respond(False)
                return
            state, consts = loaded
            with self._lock:
                self._state = state
                self._consts = consts
                self._render_src = None
                self._render_frame = -1
            msg.respond(True)
        elif t == MessageType.CORRUPT_BUFFERS:
            with self._lock:
                self._corrupt()
            msg.respond()
        elif t == MessageType.GET_RENDER_PACKET:
            msg.respond(self._make_packet())
        elif t == MessageType.GET_STATS:
            msg.respond(self._stats())
        elif t == MessageType.GET_BP_OVERFLOW:
            if hasattr(self.backend, "broad_phase_overflow"):
                with self._lock:
                    msg.respond(
                        self.backend.broad_phase_overflow(self._state))
            else:
                msg.respond(0)
        else:
            msg.respond(None)

    # ---- frame (≙ engineWorker.ts:626-695) ----

    def _frame(self) -> None:
        with self._lock:
            now = time.monotonic()
            dt_wall = max(now - self._last_frame_t, 1e-6)
            mouse = self._uin_host["mouse_pos"]
            # mouse velocity in world units per sim frame:
            # Δpos · fps · Δt_wall (≙ engineWorker.ts:638-640)
            mouse_vel = (mouse - self._last_mouse) * (max(self.fps, 1.0) * dt_wall)
            self._last_mouse = mouse.copy()
            self._last_frame_t = now
            uin = UserInput(
                user_strength=jnp.float32(self._user_strength),
                mouse_active=jnp.asarray(self._uin_host["mouse_active"]),
                mouse_pos=jnp.asarray(mouse),
                mouse_vel=jnp.asarray(mouse_vel.astype(np.float32)),
                applied_force=jnp.asarray(self._uin_host["applied_force"]),
            )
            new_state = self.backend.step(self._state, self._consts, uin)
            self._state = new_state
            self._frame_index += 1
            # decoupled render source: snapshot device refs (cheap copies)
            with self._packet_lock:
                self._render_src = self.backend.extract(new_state)
                self._render_frame = self._frame_index
        self._frame_times.append(now)
        cutoff = now - 1.0
        while self._frame_times and self._frame_times[0] < cutoff:
            self._frame_times.pop(0)

    def _make_packet(self) -> Optional[RenderPacket]:
        with self._packet_lock:
            src, idx = self._render_src, self._render_frame
        if src is None:
            return None
        pos, p_alive, ba, bb, b_alive, strain, stress = self.backend.packet_arrays(src)
        return RenderPacket(pos, p_alive, ba, bb, b_alive, strain, stress, idx)

    def host_packet(self) -> Optional[RenderPacket]:
        """Decoupled readback: build the packet on the CALLING thread.

        ``_render_src`` holds device-side copies snapshotted at frame end
        (≙ the staging buffers, engineWorker.ts:453-478); the
        device→host transfer (``packet_arrays``) runs here, so a large
        readback never blocks the stepping thread — the reference's
        ``mapAsync`` readback never blocks its render loop either.
        Thread-safe: the source tuple is immutable and replaced, not
        mutated, under ``_packet_lock``."""
        return self._make_packet()

    def _stats(self) -> EngineStats:
        fps = self.fps
        n, m = self.backend.counts(self._state)
        if hasattr(self.backend, "far_stats"):
            far = self.backend.far_stats()
        else:
            far = {"far_pairs": 0, "far_rebuilds": 0, "far_overflow": 0}
        return EngineStats(
            fps=fps,
            substeps_per_sec=fps * self.cfg.subticks,
            particle_substeps_per_sec=fps * self.cfg.subticks * n,
            frame_index=self._frame_index,
            particle_count=n,
            beam_count=m,
            **far,
        )

    @property
    def fps(self) -> float:
        return float(len(self._frame_times))

    # ---- fault injection (≙ corruptBuffers, engineWorker.ts:599-617) ----

    def _corrupt(self) -> None:
        self._state = self.backend.corrupt(self._state, np.random.default_rng())

    # ---- host-side entry ----

    def post(self, type: MessageType, data: Any = None) -> None:
        self._queue.put(Message(type, data))

    def post_with_ack(self, type: MessageType, data: Any = None,
                      timeout: Optional[float] = 120.0) -> Any:
        ev = threading.Event()
        msg = Message(type, data, reply_event=ev)
        self._queue.put(msg)
        if not ev.wait(timeout):
            if self.error is not None:
                raise RuntimeError("engine worker died") from self.error
            raise TimeoutError(f"engine worker did not ack {type}")
        return msg.reply

    def join(self, timeout: Optional[float] = None) -> None:
        self._thread.join(timeout)

    @property
    def running(self) -> bool:
        return self._running and self._thread.is_alive()
