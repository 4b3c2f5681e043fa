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


# ---------------------------------------------------------------------------
# Host-side overlay drawing (editor visual feedback layer, editor.ts:575-854):
# snap grid, velocity vectors, dashed invalid beams, selection outlines and
# HUD text. Pure NumPy on uint8 images — deliberately CPU-side, like the
# reference's Canvas2D editor (it never touches the GPU either).


def draw_line(img, a, b, color, *, width: int = 1, dash=None) -> None:
    """Draw segment a→b (pixel coords, y down) in place by sampling.
    ``dash=(on, off)`` in pixels for dashed strokes."""
    h, w, _ = img.shape
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    n = max(2, int(np.ceil(np.abs(b - a).max())) + 1)
    t = np.linspace(0.0, 1.0, n, dtype=np.float32)
    pts = a[None, :] + (b - a)[None, :] * t[:, None]
    if dash is not None:
        on, off = dash
        dist = t * float(np.linalg.norm(b - a))
        pts = pts[(dist % (on + off)) < on]
        if pts.size == 0:
            return
    half = (width - 1) // 2
    for ox in range(-half, width - half):
        for oy in range(-half, width - half):
            x = np.clip(pts[:, 0].astype(np.int32) + ox, 0, w - 1)
            y = np.clip(pts[:, 1].astype(np.int32) + oy, 0, h - 1)
            img[y, x] = color


def draw_circle_outline(img, center, radius, color, *, width: int = 1) -> None:
    h, w, _ = img.shape
    n = max(8, int(2 * np.pi * radius) + 1)
    t = np.linspace(0.0, 2 * np.pi, n, dtype=np.float32)
    for r in np.linspace(max(radius - width + 1, 1), radius, max(width, 1)):
        x = np.clip((center[0] + r * np.cos(t)).astype(np.int32), 0, w - 1)
        y = np.clip((center[1] + r * np.sin(t)).astype(np.int32), 0, h - 1)
        img[y, x] = color


# 3×5 bitmap font (rows top→bottom); enough glyphs for the reference HUD
# strings (editor.ts:792-851)
_FONT = {
    "A": ("010", "101", "111", "101", "101"),
    "B": ("110", "101", "110", "101", "110"),
    "C": ("011", "100", "100", "100", "011"),
    "D": ("110", "101", "101", "101", "110"),
    "E": ("111", "100", "110", "100", "111"),
    "F": ("111", "100", "110", "100", "100"),
    "G": ("011", "100", "101", "101", "011"),
    "H": ("101", "101", "111", "101", "101"),
    "I": ("111", "010", "010", "010", "111"),
    "J": ("001", "001", "001", "101", "010"),
    "K": ("101", "110", "100", "110", "101"),
    "L": ("100", "100", "100", "100", "111"),
    "M": ("101", "111", "101", "101", "101"),
    "N": ("110", "101", "101", "101", "101"),
    "O": ("010", "101", "101", "101", "010"),
    "P": ("110", "101", "110", "100", "100"),
    "Q": ("010", "101", "101", "110", "011"),
    "R": ("110", "101", "110", "110", "101"),
    "S": ("011", "100", "010", "001", "110"),
    "T": ("111", "010", "010", "010", "010"),
    "U": ("101", "101", "101", "101", "111"),
    "V": ("101", "101", "101", "101", "010"),
    "W": ("101", "101", "101", "111", "101"),
    "X": ("101", "101", "010", "101", "101"),
    "Y": ("101", "101", "010", "010", "010"),
    "Z": ("111", "001", "010", "100", "111"),
    "0": ("111", "101", "101", "101", "111"),
    "1": ("010", "110", "010", "010", "111"),
    "2": ("111", "001", "111", "100", "111"),
    "3": ("111", "001", "111", "001", "111"),
    "4": ("101", "101", "111", "001", "001"),
    "5": ("111", "100", "111", "001", "111"),
    "6": ("111", "100", "111", "101", "111"),
    "7": ("111", "001", "001", "010", "010"),
    "8": ("111", "101", "111", "101", "111"),
    "9": ("111", "101", "111", "001", "111"),
    ":": ("000", "010", "000", "010", "000"),
    ".": ("000", "000", "000", "000", "010"),
    ",": ("000", "000", "000", "010", "100"),
    "<": ("001", "010", "100", "010", "001"),
    ">": ("100", "010", "001", "010", "100"),
    "=": ("000", "111", "000", "111", "000"),
    "-": ("000", "000", "111", "000", "000"),
    "(": ("010", "100", "100", "100", "010"),
    ")": ("010", "001", "001", "001", "010"),
    "/": ("001", "001", "010", "100", "100"),
    " ": ("000", "000", "000", "000", "000"),
}


def draw_text(img, xy, text, color, *, scale: int = 2,
              align: str = "left") -> None:
    """Burn HUD text at pixel ``xy`` (top-left or top-right anchored)."""
    h, w, _ = img.shape
    cw = 4 * scale  # glyph + 1px spacing
    text = str(text).upper()
    x0, y0 = int(xy[0]), int(xy[1])
    if align == "right":
        x0 -= len(text) * cw
    for ci, ch in enumerate(text):
        glyph = _FONT.get(ch)
        if glyph is None:
            continue
        for ry, row in enumerate(glyph):
            for rx, bit in enumerate(row):
                if bit != "1":
                    continue
                xs = x0 + ci * cw + rx * scale
                ys = y0 + ry * scale
                img[max(0, ys) : min(h, ys + scale),
                    max(0, xs) : min(w, xs + scale)] = color
