"""Runtime engine tests: worker thread, RPC protocol, decoupled readback,
snapshot round-trip through the engine, fault injection survival."""

import time

import numpy as np
import pytest

import jax.numpy as jnp

from softbody_tpu import PhysicsConstants, state_from_numpy
from softbody_tpu.engine import Engine, EngineOptions, FifoLock
from softbody_tpu.models import default_scene


def small_engine(**kw):
    pos = np.array([[300.0, 500.0], [340.0, 500.0], [700.0, 300.0]], np.float32)
    beams = np.array([[0, 1]], np.int32)
    state = state_from_numpy(pos, beams=beams, beam_spring=10.0, beam_damp=2.0)
    opts = EngineOptions(subticks=8, collision_mode="allpairs",
                         target_fps=None, **kw)
    return Engine(state, options=opts)


def wait_frames(eng, n, timeout=60.0):
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        st = eng.stats()
        if st.frame_index >= n:
            return st
        time.sleep(0.01)
    raise TimeoutError(f"engine only reached frame {eng.stats().frame_index}")


def test_engine_steps_and_reports_stats():
    with small_engine() as eng:
        st = wait_frames(eng, 5)
        assert st.particle_count == 3
        assert st.beam_count == 1
        assert st.frame_index >= 5
    assert eng.destroyed


def test_render_packet_decoupled():
    with small_engine() as eng:
        wait_frames(eng, 3)
        pkt = eng.render_packet()
        assert pkt is not None
        assert pkt.pos.shape == (3, 2)
        assert np.isfinite(pkt.pos).all()
        f1 = pkt.frame_index
        wait_frames(eng, f1 + 3)
        pkt2 = eng.render_packet()
        assert pkt2.frame_index > f1
        # gravity must be pulling the free particle down
        assert pkt2.pos[2, 1] < 300.0
        # RPC variant (worker-thread readback, protocol parity) agrees
        pkt3 = eng.render_packet_rpc()
        assert pkt3 is not None and pkt3.frame_index >= pkt2.frame_index


def test_render_packet_polling_never_stalls_stepping():
    """Host-thread readback (worker.host_packet): hammering
    render_packet() must not serialize against the frame loop — frames
    keep advancing and every packet is internally consistent."""
    import time

    with small_engine() as eng:
        wait_frames(eng, 2)
        f0 = eng.stats().frame_index
        seen = []
        t_end = time.monotonic() + 1.5
        while time.monotonic() < t_end:
            pkt = eng.render_packet()  # no sleep: poll flat-out
            assert pkt is not None
            assert pkt.pos.shape[0] == pkt.particle_alive.shape[0]
            assert pkt.beam_a.shape == pkt.beam_b.shape
            seen.append(pkt.frame_index)
        f1 = eng.stats().frame_index
        assert f1 > f0 + 2  # stepping progressed under poll pressure
        assert seen == sorted(seen)  # frame indices monotonic


def test_physics_constants_rpc():
    with small_engine() as eng:
        c = PhysicsConstants.default()
        c.gravity = jnp.asarray([0.0, 3.0], jnp.float32)  # antigravity
        eng.set_physics_constants(c)
        got = eng.get_physics_constants()
        np.testing.assert_array_equal(np.asarray(got.gravity), [0.0, 3.0])
        wait_frames(eng, 10)
        pkt = eng.render_packet()
        assert pkt.pos[2, 1] > 300.0  # free particle floats up


def test_snapshot_roundtrip_through_engine():
    with small_engine() as eng:
        wait_frames(eng, 3)
        buf = eng.save_snapshot()
        assert isinstance(buf, (bytes, bytearray))
        st0 = eng.stats()
        assert eng.load_snapshot(buf)
        # state restored; engine keeps stepping from the checkpoint
        wait_frames(eng, st0.frame_index + 2)
        assert eng.error is None


def test_snapshot_too_large_returns_false():
    with small_engine(max_particles=2) as eng:
        pos = np.random.uniform(50, 950, (10, 2)).astype(np.float32)
        from softbody_tpu.snapshot import save_snapshot
        buf = save_snapshot(state_from_numpy(pos), PhysicsConstants.default())
        assert eng.load_snapshot(buf) is False
        assert eng.error is None  # engine survives (≙ main.ts:79-83 alert path)


def test_input_affects_simulation():
    with small_engine() as eng:
        eng.keyboard_force = 5.0
        eng.key_down("d")  # push +x
        wait_frames(eng, 12)
        pkt = eng.render_packet()
        assert pkt.pos[2, 0] > 700.0


def test_visibility_pause():
    with small_engine() as eng:
        wait_frames(eng, 2)
        eng.set_hidden(True)
        time.sleep(0.3)
        f1 = eng.stats().frame_index
        time.sleep(0.3)
        f2 = eng.stats().frame_index
        assert f2 == f1  # paused
        eng.set_hidden(False)
        wait_frames(eng, f2 + 2)


def test_corrupt_buffers_survival():
    """Chaos test (≙ corruptBuffers, engineWorker.ts:599-617): random bit
    garbage in every buffer must not kill the engine loop."""
    with small_engine() as eng:
        wait_frames(eng, 2)
        for _ in range(5):
            eng.corrupt_buffers()
            time.sleep(0.05)
        st = wait_frames(eng, eng.stats().frame_index + 5)
        assert eng.error is None
        pkt = eng.render_packet()
        assert pkt.pos.shape == (3, 2)  # shapes intact even if values are junk


def test_fifo_lock_ordering():
    import threading

    lock = FifoLock()
    order = []

    def worker(i):
        with lock:
            order.append(i)
            time.sleep(0.01)

    with lock:
        threads = [threading.Thread(target=worker, args=(i,)) for i in range(5)]
        for i, t in enumerate(threads):
            t.start()
            time.sleep(0.02)  # enforce arrival order
    for t in threads:
        t.join()
    assert order == [0, 1, 2, 3, 4]


def test_lattice_engine_backend():
    """Engine running the dense stencil backend: steps, packets with
    static topology, L1 snapshot round-trip, input."""
    from softbody_tpu.engine import LatticeEngine
    from softbody_tpu.models import cloth_lattice

    ls, spec, cfg = cloth_lattice(w=8, h=8, spacing=20.0, pin_top=True,
                                  spring=5.0)  # stable at dt=1/8
    opts = EngineOptions(subticks=8, particle_radius=cfg.particle_radius,
                         target_fps=None)
    with LatticeEngine(ls, spec, options=opts) as eng:
        st = wait_frames(eng, 5)
        assert st.particle_count == 64
        assert st.beam_count > 150
        pkt = eng.render_packet()
        assert pkt.pos.shape == (64, 2)
        assert pkt.beam_a.shape == pkt.beam_alive.shape
        assert np.isfinite(pkt.pos).all()
        buf = eng.save_snapshot()
        assert buf[:4] == b"SBL1"
        assert eng.load_snapshot(buf)
        # general-format snapshot must be rejected, not crash
        from softbody_tpu.snapshot import save_snapshot
        from softbody_tpu import state_from_numpy
        other = save_snapshot(
            state_from_numpy(np.array([[1.0, 2.0]], np.float32)),
            PhysicsConstants.default(),
        )
        assert eng.load_snapshot(other) is False
        eng.corrupt_buffers()
        wait_frames(eng, eng.stats().frame_index + 2)
        assert eng.error is None


def test_initial_state_reset_slot():
    """≙ the reference's reset/set-initial-state buttons (main.ts:262-276)."""
    with small_engine() as eng:
        wait_frames(eng, 2)
        eng.set_initial_state()
        pkt0 = eng.render_packet()
        wait_frames(eng, pkt0.frame_index + 10)
        pkt1 = eng.render_packet()
        assert not np.allclose(pkt0.pos, pkt1.pos)  # world moved on
        assert eng.reset()
        # a load clears the render source; the next frame repopulates it
        wait_frames(eng, eng.stats().frame_index + 1)
        pkt2 = eng.render_packet()
        # freshly reloaded world is (close to) the captured slot; give the
        # loop a frame or two of slack
        assert np.abs(pkt2.pos - pkt0.pos).max() < np.abs(pkt1.pos - pkt0.pos).max()


def test_constants_clamping():
    from softbody_tpu.config import clamp_constants, clamp_value

    c = PhysicsConstants.default()
    c.gravity = jnp.asarray([99.0, -99.0], jnp.float32)
    c.elasticity = jnp.float32(7.0)
    c.drag_exp = jnp.float32(0.0)
    cc = clamp_constants(c)
    assert float(cc.gravity[0]) == 10.0
    assert float(cc.gravity[1]) == -10.0
    assert float(cc.elasticity) == 1.0
    assert float(cc.drag_exp) == 1.0
    # step snapping (subticks step=2, main.ts:121)
    assert clamp_value("subticks", 63) == 64
    assert clamp_value("subticks", 1) == 2
    assert clamp_value("particle_radius", 1234.0) == 500.0


def test_fused_lattice_engine_backend():
    """LatticeEngine(fused=True): the v2 Pallas path behind the full
    engine API — stepping, packets, snapshot round-trip, reset."""
    from softbody_tpu.engine.engine import LatticeEngine
    from softbody_tpu.engine.protocol import EngineOptions
    from softbody_tpu.models import cloth_lattice

    ls, spec, _ = cloth_lattice(w=8, h=8, spacing=20.0)
    opts = EngineOptions(subticks=4, particle_radius=8.0,
                         collision_mode="allpairs", target_fps=None)
    with LatticeEngine(ls, spec, options=opts, fused=True, tile_w=8) as eng:
        st = wait_frames(eng, 3)
        assert st.particle_count == 64
        pkt = eng.render_packet()
        assert pkt.pos.shape == (64, 2)
        assert np.isfinite(pkt.pos).all()
        buf = eng.save_snapshot()
        assert buf[:4] == b"SBL1"
        assert eng.load_snapshot(buf)
        eng.set_initial_state()
        wait_frames(eng, eng.stats().frame_index + 2)
        assert eng.reset()
        assert eng.error is None


def test_recreate_preserves_state_on_option_change():
    """≙ the reference's apply-options flow (main.ts:137-146): changing a
    compile-time option rebuilds the engine around a snapshot."""
    with small_engine() as eng:
        wait_frames(eng, 3)
        eng.set_initial_state()
        pkt0 = eng.render_packet()
        assert eng.options.subticks == 8
        new = eng.recreate(subticks=32)
        assert eng.destroyed
    try:
        assert new.options.subticks == 32
        wait_frames(new, 1)
        pkt1 = new.render_packet()
        # State carried over (not reset): the scene is in free fall, so x
        # is untouched and y keeps falling from wherever pkt0 left it.  A
        # fixed drift bound is flaky on a loaded box (the free-running
        # engines step a nondeterministic number of frames between the
        # two packets), so assert the direction of motion instead.
        assert pkt1.pos.shape == pkt0.pos.shape
        assert np.array_equal(pkt1.pos[:, 0], pkt0.pos[:, 0])
        assert (pkt1.pos[:, 1] < pkt0.pos[:, 1]).all()
        assert (pkt1.pos[:, 1] > 0).all()
        # initial-state slot survives re-creation
        assert new.reset()
        assert new.error is None
    finally:
        new.destroy()


def test_recreate_lattice_engine():
    from softbody_tpu.engine import LatticeEngine
    from softbody_tpu.models import cloth_lattice

    ls, spec, cfg = cloth_lattice(w=8, h=8, spacing=20.0, pin_top=True,
                                  spring=5.0)
    opts = EngineOptions(subticks=8, particle_radius=cfg.particle_radius,
                         target_fps=None)
    eng = LatticeEngine(ls, spec, options=opts)
    try:
        wait_frames(eng, 3)
        new = eng.recreate(particle_radius=6.0)
        assert eng.destroyed
    finally:
        eng.destroy()
    try:
        st = wait_frames(new, 1)
        assert st.particle_count == 64
        assert new.options.particle_radius == 6.0
        assert new.error is None
    finally:
        new.destroy()


def test_broad_phase_overflow_surfaced():
    """Grid cell-capacity truncation is observable through the engine
    (SURVEY §5 metrics): a deliberately crowded cell overflows a tiny
    capacity; a roomy capacity reports zero."""
    pos = np.full((32, 2), 505.0, np.float32)
    for cap, expect_over in ((4, True), (64, False)):
        opts = EngineOptions(subticks=2, collision_mode="grid",
                             grid_cell_capacity=cap, target_fps=None)
        # fresh state per engine: the frame fn donates its input buffers
        with Engine(state_from_numpy(pos), options=opts) as eng:
            wait_frames(eng, 1)
            got = eng.broad_phase_overflow()
            if expect_over:
                assert got > 0, f"cap {cap}: overflow not surfaced"
            else:
                assert got == 0, f"cap {cap}: spurious overflow {got}"
