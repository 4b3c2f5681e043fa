"""On-device rendering of simulation state to RGB images (component C7 —
≙ ``render.wgsl``).

The reference renders on the GPU: particles as SDF circles with a white
outline (render.wgsl:42-54), beams as lines colored by stress/strain
(:77-83 — R = clamp(stress+1), G = clamp(1−stress), B = 1−|strain|), with
a trail effect from the alpha-0.4 clear (engineWorker.ts:43,672).

The TPU build renders the same way *on device*: a jitted rasterizer
evaluates the particle SDF and beam segment-distance fields, chunked with
``lax.scan`` so memory stays O(pixels · chunk).  Only the final uint8
image crosses to the host."""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

# Colors from render.wgsl:42-44 (premultiplied particle fill) and the
# outline edge fraction.
_PARTICLE_FILL = np.array([0.0, 0.35, 0.5], np.float32)  # (0,0.7,1,1)·0.5
_PARTICLE_OUTLINE = np.array([1.0, 1.0, 1.0], np.float32)
_OUTLINE_EDGE = 0.8
_TRAIL_ALPHA = 0.4  # engineWorker.ts:43


@functools.partial(
    jax.jit,
    static_argnames=("resolution", "bounds_size", "particle_radius", "chunk"),
)
def render_frame(
    pos: jax.Array,
    particle_alive: jax.Array,
    beam_a: jax.Array,
    beam_b: jax.Array,
    beam_alive: jax.Array,
    beam_strain: jax.Array,
    beam_stress: jax.Array,
    *,
    resolution: int = 512,
    bounds_size: float = 1000.0,
    particle_radius: float = 10.0,
    chunk: int = 1024,
    prev_frame: Optional[jax.Array] = None,
) -> jax.Array:
    """Rasterize one frame; returns [res, res, 3] f32 in [0,1].

    ``prev_frame`` enables the reference's trail effect (alpha-blended
    clear): ``out = draw over prev·(1−0.4)``."""
    res = resolution
    scale = res / bounds_size
    # pixel centers in world space, y up (clip transform ≙ render.wgsl:7-9)
    xs = (jnp.arange(res, dtype=jnp.float32) + 0.5) / scale
    ys = (jnp.arange(res, dtype=jnp.float32) + 0.5) / scale
    px = xs[None, :]  # [1, W]
    py = ys[::-1][:, None]  # [H, 1] flipped so row 0 = top of world

    r = jnp.float32(particle_radius)
    n = pos.shape[0]
    m = beam_a.shape[0]

    def pad_to(x, k, fill):
        need = (-x.shape[0]) % k
        if need:
            pad_width = ((0, need),) + ((0, 0),) * (x.ndim - 1)
            x = jnp.pad(x, pad_width, constant_values=fill)
        return x

    # --- beams first (particles draw over them, like pass order
    # engineWorker.ts:675-684) ---
    img = jnp.zeros((res, res, 3), jnp.float32)
    if prev_frame is not None:
        img = prev_frame * jnp.float32(1.0 - _TRAIL_ALPHA)
    cov = jnp.zeros((res, res), jnp.float32)  # coverage mask of drawn pixels

    bchunk = max(1, min(chunk // 8, m))
    pa = pad_to(pos[beam_a] * 1.0, bchunk, 0.0)
    pb = pad_to(pos[beam_b] * 1.0, bchunk, 0.0)
    bal = pad_to(
        beam_alive & particle_alive[beam_a] & particle_alive[beam_b], bchunk, False
    )
    bst = pad_to(beam_stress, bchunk, 0.0)
    bsn = pad_to(beam_strain, bchunk, 0.0)
    nb = pa.shape[0] // bchunk
    half_px = jnp.float32(0.75 / scale)  # line half-thickness in world units

    def beam_body(carry, it):
        img, cov = carry
        a, b, alive, stress, strain = it
        # distance from each pixel to each segment (capsule SDF)
        d = b - a  # [C,2]
        len2 = jnp.maximum(jnp.sum(d * d, -1), 1e-12)
        relx = px[None, :, :] - a[:, 0, None, None]  # [C,H,W]
        rely = py[None, :, :] - a[:, 1, None, None]
        t = jnp.clip(
            (relx * d[:, 0, None, None] + rely * d[:, 1, None, None])
            / len2[:, None, None],
            0.0,
            1.0,
        )
        distx = relx - t * d[:, 0, None, None]
        disty = rely - t * d[:, 1, None, None]
        dist2 = distx * distx + disty * disty
        hit = (dist2 < half_px * half_px) & alive[:, None, None]
        # stress→RGB (render.wgsl:82)
        col = jnp.stack(
            [
                jnp.clip(stress + 1.0, 0.0, 1.0),
                jnp.clip(1.0 - stress, 0.0, 1.0),
                jnp.maximum(0.0, 1.0 - jnp.abs(strain)),
            ],
            axis=-1,
        )  # [C,3]
        w = hit.astype(jnp.float32)  # [C,H,W]
        add = jnp.einsum("chw,ck->hwk", w, col)
        num = jnp.sum(w, 0)[..., None]
        img = jnp.where(num > 0, add / jnp.maximum(num, 1.0), img)
        cov = jnp.maximum(cov, jnp.max(w, 0))
        return (img, cov), None

    if m:
        its = (
            pa.reshape(nb, bchunk, 2),
            pb.reshape(nb, bchunk, 2),
            bal.reshape(nb, bchunk),
            bst.reshape(nb, bchunk),
            bsn.reshape(nb, bchunk),
        )
        (img, cov), _ = jax.lax.scan(beam_body, (img, cov), its)

    # --- particles: SDF circles with outline (render.wgsl:45-54) ---
    pchunk = max(1, min(chunk, n))
    pp = pad_to(pos, pchunk, -1e6)
    pal = pad_to(particle_alive, pchunk, False)
    np_ = pp.shape[0] // pchunk

    def particle_body(carry, it):
        img, cov = carry
        p, alive = it
        dx = px[None, :, :] - p[:, 0, None, None]
        dy = py[None, :, :] - p[:, 1, None, None]
        d2 = dx * dx + dy * dy
        inner = (d2 < (r * _OUTLINE_EDGE) ** 2) & alive[:, None, None]
        outer = (d2 < r * r) & alive[:, None, None]
        ring = outer & ~inner
        any_inner = jnp.max(inner.astype(jnp.float32), 0)
        any_ring = jnp.max(ring.astype(jnp.float32), 0)
        fill = jnp.asarray(_PARTICLE_FILL)
        outline = jnp.asarray(_PARTICLE_OUTLINE)
        img = jnp.where(any_ring[..., None] > 0, outline, img)
        img = jnp.where(any_inner[..., None] > 0, fill, img)
        cov = jnp.maximum(cov, jnp.maximum(any_inner, any_ring))
        return (img, cov), None

    its = (pp.reshape(np_, pchunk, 2), pal.reshape(np_, pchunk))
    (img, cov), _ = jax.lax.scan(particle_body, (img, cov), its)
    return jnp.clip(img, 0.0, 1.0)


def render_state(state, cfg, resolution: int = 512,
                 prev_frame: Optional[jax.Array] = None) -> jax.Array:
    """Render a :class:`SimState` under a :class:`StaticConfig`."""
    return render_frame(
        state.pos,
        state.particle_alive,
        state.beam_a,
        state.beam_b,
        state.beam_alive,
        state.beam_strain,
        state.beam_stress,
        resolution=resolution,
        bounds_size=cfg.bounds_size,
        particle_radius=cfg.particle_radius,
        prev_frame=prev_frame,
    )


def render_packet(pkt, *, resolution: int = 512, bounds_size: float = 1000.0,
                  particle_radius: float = 10.0,
                  prev_frame: Optional[np.ndarray] = None) -> np.ndarray:
    """Render an engine :class:`RenderPacket` to a host uint8 image."""
    img = render_frame(
        jnp.asarray(pkt.pos),
        jnp.asarray(pkt.particle_alive),
        jnp.asarray(pkt.beam_a),
        jnp.asarray(pkt.beam_b),
        jnp.asarray(pkt.beam_alive),
        jnp.asarray(pkt.beam_strain),
        jnp.asarray(pkt.beam_stress),
        resolution=resolution,
        bounds_size=bounds_size,
        particle_radius=particle_radius,
        prev_frame=None if prev_frame is None else jnp.asarray(prev_frame),
    )
    return np.asarray(jnp.round(img * 255).astype(jnp.uint8))


def save_png(path: str, img) -> None:
    from .utils.png import write_png

    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = np.clip(np.round(arr * 255), 0, 255).astype(np.uint8)
    write_png(path, arr)
