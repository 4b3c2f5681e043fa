"""Multi-chip sharding of the FUSED Pallas substep: halo exchange of the
packed plane stacks over ICI.

The packed layout (ops/pallas/fused_substep.py) already carries a
``PAD_W = 8``-column margin on each side of every device's slab — wider
than the physics reach (springs r=1, collisions r≤stencil).  That margin
IS the ghost ring:

- at pack time each device's window is cut from the *global* raw plane
  stacks, so margins hold authentic neighbor data (and, in ``immut``,
  the neighbor's alive/pinned/spring parameters — static for the whole
  frame since lattice particles are never deleted and edge parameters
  never change);
- per substep, each device ``ppermute``s its ``hx`` interior edge
  columns of the ``mut`` stack to its neighbors' margins (the kernel
  never writes margins, so they would otherwise go stale), then runs the
  ordinary single-device ``fused_substep_call`` on its local stack;
- world-edge devices receive ppermute zeros, masked by the margin's
  ``alive = 0`` (= the world-boundary semantics of the dense path).

With quantized (int32) spring accumulation the sharded trajectory is
**bit-identical** to the single-device fused kernel: every force term is
evaluated from the same values in the same order, and cross-boundary
sums commute (tests/test_fused_spatial.py asserts exact equality).

Far-field self-collision is a single-device feature (candidate pairs may
span slabs); sharded frames keep near-field stencil semantics.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import PhysicsConstants, StaticConfig, UserInput
from ..ops.pallas.fused_substep import (
    PAD_H,
    PAD_W,
    _consts_vector,
    fused_substep_call,
    raw_stacks,
)
from ..ops.stencil import LatticeSpec, LatticeState


def pack_lattice_sharded(
    state: LatticeState,
    n_dev: int,
    tile_w: int = 128,
) -> Tuple[jax.Array, jax.Array, int]:
    """LatticeState → per-device packed stacks with authentic margins.

    Returns ``(mut [n_dev, 26, wl+2·PAD_W, Hp], immut [n_dev, 22, …],
    w_loc)``.  Requires ``W % (n_dev · tile_w) == 0`` so each slab's
    interior is DMA-aligned without dead columns between interior and
    ghost margin."""
    w, h = state.shape
    if w % n_dev:
        raise ValueError(f"W={w} not divisible by {n_dev} devices")
    w_loc = w // n_dev
    if w_loc % tile_w:
        raise ValueError(f"slab width {w_loc} not a multiple of tile_w={tile_w}")
    hr = -(-h // 128) * 128
    mut, immut = raw_stacks(state)

    def windows(stack):
        # pad W by PAD_W both sides (world edge → zeros) and H to the
        # aligned interior + PAD_H margins, then cut overlapping windows
        p = jnp.pad(
            stack,
            ((0, 0), (PAD_W, PAD_W), (PAD_H, PAD_H + hr - h)),
        )
        return jnp.stack([
            p[:, d * w_loc : d * w_loc + w_loc + 2 * PAD_W, :]
            for d in range(n_dev)
        ])

    return windows(mut), windows(immut), w_loc


def unpack_lattice_sharded(mut_sh, template: LatticeState, n_dev: int,
                           w_loc: int) -> LatticeState:
    """Per-device stacks → LatticeState (interiors concatenated)."""
    import dataclasses

    from ..ops.pallas.fused_substep import (
        AX, AY, EAL, LST, PX, PY, STR, STS, TGT, VX, VY,
    )

    w, h = template.shape
    core = jnp.concatenate(
        [mut_sh[d, :, PAD_W : PAD_W + w_loc, PAD_H : PAD_H + h]
         for d in range(n_dev)],
        axis=1,
    )
    edges = []
    for ci, e in enumerate(template.edges):
        mb = 6 + ci * 5
        edges.append(dataclasses.replace(
            e,
            target_length=core[mb + TGT],
            last_length=core[mb + LST],
            strain=core[mb + STR],
            stress=core[mb + STS],
            alive=core[mb + EAL] > 0.0,
        ))
    return dataclasses.replace(
        template,
        pos=jnp.stack([core[PX], core[PY]], -1),
        vel=jnp.stack([core[VX], core[VY]], -1),
        acc=jnp.stack([core[AX], core[AY]], -1),
        edges=tuple(edges),
    )


def fused_spatial_frame_fn(
    spec: LatticeSpec,
    cfg: StaticConfig,
    mesh: Mesh,
    *,
    sp_axis: str = "sp",
    tile_w: int = 128,
    donate: bool = True,
    interpret: bool = False,
):
    """Jitted frame fn over ``(mut_sh, immut_sh, consts, uin)`` where the
    stacks are sharded on their leading device axis."""
    n_dev = mesh.shape[sp_axis]
    if spec.width % n_dev:
        raise ValueError(f"W={spec.width} not divisible by {n_dev}")
    w_loc = spec.width // n_dev
    if w_loc % tile_w:
        raise ValueError(f"slab width {w_loc} not a multiple of {tile_w}")
    hr = -(-spec.height // 128) * 128
    hx = max(1, spec.collision_stencil)
    if hx > PAD_W:
        raise ValueError(f"stencil reach {hx} exceeds margin {PAD_W}")
    quantized = cfg.force_mode == "quantized"
    stencil = 0 if cfg.collision_mode == "none" else spec.collision_stencil
    fwd = [(i, i + 1) for i in range(n_dev - 1)]
    bwd = [(i + 1, i) for i in range(n_dev - 1)]
    lo, hi = PAD_W, PAD_W + w_loc

    def frame_local(mut, immut, consts, uin):
        mut = mut[0]      # shard_map block: [1, 26, wl+2p, hp]
        immut = immut[0]
        cvec = _consts_vector(consts, uin, cfg, spec.height)

        def substep(m, _):
            from_l = jax.lax.ppermute(m[:, hi - hx : hi, :], sp_axis, fwd)
            from_r = jax.lax.ppermute(m[:, lo : lo + hx, :], sp_axis, bwd)
            m = m.at[:, lo - hx : lo, :].set(from_l)
            m = m.at[:, hi : hi + hx, :].set(from_r)
            return fused_substep_call(
                m, immut, cvec, w=w_loc, h=hr, stencil=stencil,
                quantized=quantized, tile_w=tile_w, interpret=interpret,
            ), None

        out, _ = jax.lax.scan(substep, mut, None, length=cfg.subticks)
        return out[None]

    sm = shard_map(
        frame_local,
        mesh=mesh,
        in_specs=(P(sp_axis), P(sp_axis), P(), P()),
        out_specs=P(sp_axis),
        check_vma=False,
    )

    def fn(mut_sh, immut_sh, consts, uin):
        return sm(mut_sh, immut_sh, consts, uin)

    if donate:
        return jax.jit(fn, donate_argnums=(0,))
    return jax.jit(fn)


def shard_stacks(mut_sh, immut_sh, mesh: Mesh, *, sp_axis: str = "sp"):
    sharding = NamedSharding(mesh, P(sp_axis))
    return (jax.device_put(mut_sh, sharding),
            jax.device_put(immut_sh, sharding))
