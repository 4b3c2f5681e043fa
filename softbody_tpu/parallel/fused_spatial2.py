"""Multi-chip sharding of the fused Pallas kernel **v2** (hot/obs split,
scalar edge params — ops/pallas/fused_substep2.py), with optional
GLOBAL far-field self-collision across device slabs.

Near-field sharding follows parallel/fused_spatial.py: the packed
``PAD_W = 8``-column margins are the ghost ring; per substep each device
``ppermute``s its interior edge columns of the *hot* stack to its
neighbors' margins, then runs the single-device ``fused_substep2_call``
on its local stack.  The obs stack needs no exchange (written and read
center-only, once per frame).  With quantized spring accumulation the
sharded trajectory is bit-identical to single-device v2
(tests/test_fused_spatial.py).

Far-field across shards (reference bar: the O(N²) loop sees the whole
world, compute.wgsl:144-170).  Index-space sharding means a spatially
close pair can live on index-distant devices, so ghost columns alone
cannot carry far contacts.  Instead:

- **Rebuild** (every ``rebuild_every`` substeps, statically scheduled so
  no collective ever sits behind a data-dependent branch): each device
  runs the particle-plane detection front-end
  (ops/farfield.py::_chunk_detection) on its local padded planes — the
  ghost columns (fresh to ``hx = PAD_W`` when far is armed) make band
  hits across slab boundaries visible to the owning side — keeps its
  OWNED interior chunk columns, and ``all_gather``s them into the global
  chunk-plane grid (tiny: ~6 planes × cwx×cwy).  Candidate extraction +
  compaction then run replicated on every device from identical inputs,
  yielding the same global :class:`FarList` everywhere.
- **Apply** (every substep): chunk windows are fetched *locally* — each
  of the list's ``2k`` chunk ids is owned by exactly one device, which
  window-gathers its ``[5, c, c]`` record while others contribute zeros
  — and summed into a replicated table with one ``psum`` (~2k·5·c²
  floats, a few hundred KB).  The shared pair math
  (ops/farfield.py::far_pair_contributions) computes antisymmetric
  contributions, and each device scatters only its owned rows into its
  local delta planes, which feed the kernel's ``far=`` input.

Chunk ownership is by index interval: chunks never straddle device
boundaries because ``PAD_W``, the slab width, and the chunk size are
all multiples of ``chunk`` (asserted at build).  The periodic rebuild
trades the single-device path's deviation trigger for static control
flow; validity between rebuilds relies on the same velocity-extruded
detection envelope (FarFieldSpec.horizon ≥ rebuild_every required).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import PhysicsConstants, StaticConfig, UserInput
from ..ops.farfield import (
    FarFieldSpec,
    FarList,
    _chunk_dims,
    _chunk_detection,
    ChunkPlanes,
    far_gather_windows,
    far_pair_contributions,
    far_scatter_contributions,
    rebuild_far_list_from_chunks,
)
from ..ops.pallas.fused_substep import PAD_H, PAD_W, _consts_vector
from ..ops.pallas.fused_substep2 import (
    ALIVE,
    PX,
    PY,
    VX,
    VY,
    fused_substep2_call,
    lane_pad_hr,
    pack_lattice2,
    unpack_lattice2,
)
from ..ops.stencil import LatticeSpec, LatticeState

_BIG = jnp.float32(3.0e38)


def pack_lattice2_sharded(
    state: LatticeState,
    n_dev: int,
    tile_w: int = 128,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, int]:
    """LatticeState → per-device v2 packed stacks with authentic margins:
    ``(hot [n, 18, wl+2·PAD_W, Hp], obs [n, 8, …], immut [n, 2, …],
    edge_consts [20], w_loc)``."""
    w, h = state.shape
    if w % n_dev:
        raise ValueError(f"W={w} not divisible by {n_dev} devices")
    w_loc = w // n_dev
    if w_loc % tile_w:
        raise ValueError(f"slab width {w_loc} not a multiple of tile_w={tile_w}")
    # global-width pack (interior padded to the full W, pads zero), then
    # overlapping windows
    hot, obs, immut, ec = pack_lattice2(state, tile_w=w)

    def windows(stack):
        return jnp.stack([
            stack[:, d * w_loc : d * w_loc + w_loc + 2 * PAD_W, :]
            for d in range(n_dev)
        ])

    return windows(hot), windows(obs), windows(immut), ec, w_loc


def unpack_lattice2_sharded(hot_sh, obs_sh, template: LatticeState,
                            n_dev: int, w_loc: int) -> LatticeState:
    """Per-device stacks → LatticeState (interiors concatenated)."""
    w, h = template.shape
    hot = jnp.concatenate(
        [hot_sh[d, :, PAD_W : PAD_W + w_loc, :] for d in range(n_dev)],
        axis=1,
    )
    obs = jnp.concatenate(
        [obs_sh[d, :, PAD_W : PAD_W + w_loc, :] for d in range(n_dev)],
        axis=1,
    )
    # re-add a fake margin so unpack_lattice2's PAD_W/PAD_H cropping works
    hot = jnp.pad(hot, ((0, 0), (PAD_W, PAD_W), (0, 0)))
    obs = jnp.pad(obs, ((0, 0), (PAD_W, PAD_W), (0, 0)))
    return unpack_lattice2(hot, obs, template)


def _owner_of(cx: jax.Array, c: int, w_loc: int, n_dev: int) -> jax.Array:
    """Device owning chunk column ``cx`` (global padded grid): the slab
    whose interior contains the chunk's first column; global-pad chunks
    clamp to the edge devices (their alive mask is all-zero)."""
    return jnp.clip((cx * c - PAD_W) // w_loc, 0, n_dev - 1)


def fused_spatial2_frame_fn(
    spec: LatticeSpec,
    cfg: StaticConfig,
    mesh: Mesh,
    *,
    sp_axis: str = "sp",
    tile_w: int = 128,
    donate: bool = True,
    interpret: bool = False,
    ffspec: Optional[FarFieldSpec] = None,
    rebuild_every: int = 8,
):
    """Jitted frame fn over ``(hot_sh, obs_sh, immut_sh, edge_consts,
    consts, uin)``; stacks sharded on their leading device axis.  With
    ``ffspec`` the frame also simulates far-field contacts across the
    whole world (see module docstring); ``cfg.subticks`` must be a
    multiple of ``rebuild_every`` and ``ffspec.horizon ≥ rebuild_every``.
    """
    n_dev = mesh.shape[sp_axis]
    if spec.width % n_dev:
        raise ValueError(f"W={spec.width} not divisible by {n_dev}")
    w_loc = spec.width // n_dev
    if w_loc % tile_w:
        raise ValueError(f"slab width {w_loc} not a multiple of {tile_w}")
    hr = -(-spec.height // 128) * 128
    hx = max(1, spec.collision_stencil)
    quantized = cfg.force_mode == "quantized"
    stencil = 0 if cfg.collision_mode == "none" else spec.collision_stencil
    if ffspec is not None:
        c = ffspec.chunk
        if PAD_W % c or w_loc % c:
            raise ValueError("PAD_W and slab width must be chunk multiples")
        # far band detection reads neighbours up to 2c−1 columns away;
        # refresh the full margin so boundary-crossing band pairs are
        # seen from authentic data on both sides
        hx = PAD_W
        if cfg.subticks % rebuild_every:
            raise ValueError("subticks must be a multiple of rebuild_every")
        if ffspec.horizon < rebuild_every:
            raise ValueError("ffspec.horizon must cover rebuild_every")
    if hx > PAD_W:
        raise ValueError(f"stencil reach {hx} exceeds margin {PAD_W}")
    fwd = [(i, i + 1) for i in range(n_dev - 1)]
    bwd = [(i + 1, i) for i in range(n_dev - 1)]
    lo, hi = PAD_W, PAD_W + w_loc
    # global plane/chunk geometry (the sharded list lives on the GLOBAL
    # padded chunk grid so chunk ids mean the same thing on every device)
    wp_glob = spec.width + 2 * PAD_W
    hp_glob = PAD_H + hr + lane_pad_hr(spec.height, hr)
    cwx_g, cwy_g, wpc_g, hpc_g = (None, None, None, None)
    if ffspec is not None:
        cwx_g, cwy_g, wpc_g, hpc_g = _chunk_dims(wp_glob, hp_glob, ffspec)

    def frame_local(hot, obs, immut, edge_consts, consts, uin):
        hot = hot[0]      # shard_map block: [1, 18, wl+2p, hp]
        obs = obs[0]
        immut = immut[0]
        d = jax.lax.axis_index(sp_axis)
        cvec = jnp.concatenate(
            [_consts_vector(consts, uin, cfg, spec.height), edge_consts]
        )
        alive_loc = immut[ALIVE] > 0.0

        def exchange(m):
            from_l = jax.lax.ppermute(m[:, hi - hx : hi, :], sp_axis, fwd)
            from_r = jax.lax.ppermute(m[:, lo : lo + hx, :], sp_axis, bwd)
            m = m.at[:, lo - hx : lo, :].set(from_l)
            m = m.at[:, hi : hi + hx, :].set(from_r)
            return m

        kw = dict(w=w_loc, h=hr, stencil=stencil, quantized=quantized,
                  tile_w=tile_w, interpret=interpret)

        if ffspec is None:
            def substep(m, _):
                return fused_substep2_call(exchange(m), immut, cvec,
                                           **kw), None

            hot, _ = jax.lax.scan(substep, hot, None,
                                  length=cfg.subticks - 1)
            hot, obs_out = fused_substep2_call(exchange(hot), immut, cvec,
                                               obs_in=obs, **kw)
            return hot[None], obs_out[None]

        # ---- far-field-armed frame: rebuild_every-substep blocks -------
        ff = ffspec
        c = ff.chunk
        cl0 = PAD_W // c          # first owned local chunk column
        cln = w_loc // c          # owned chunk columns per device
        ht_glob = hp_glob         # linear index height (matches 1-dev path)

        def rebuild(m):
            """Local front-end → owned chunk columns → all_gather →
            replicated candidate extraction."""
            cp = _chunk_detection(
                m[PX], m[PY], alive_loc, s=spec.collision_stencil,
                ff=ff, radius=cfg.particle_radius,
                vxu=m[VX], vyu=m[VY], dt=cfg.dt,
            )

            def owned(plane):
                return plane[cl0 : cl0 + cln]

            gathered = {
                name: jax.lax.all_gather(
                    owned(getattr(cp, name)), sp_axis, tiled=True
                )
                for name in ("iminx", "imaxx", "iminy", "imaxy",
                             "cany", "cband")
            }

            def embed(plane, fill):
                # owned columns start at global chunk column PAD_W/c;
                # pad to the full global (tile-aligned) chunk grid
                out = jnp.full((cwx_g, cwy_g), fill, plane.dtype)
                return jax.lax.dynamic_update_slice(
                    out, plane, (PAD_W // c, 0)
                )

            gcp = ChunkPlanes(
                iminx=embed(gathered["iminx"], _BIG),
                imaxx=embed(gathered["imaxx"], -_BIG),
                iminy=embed(gathered["iminy"], _BIG),
                imaxy=embed(gathered["imaxy"], -_BIG),
                cany=embed(gathered["cany"], False),
                cband=embed(gathered["cband"], False),
                com=cp.com,  # local; com_ref unused on this path
            )
            return rebuild_far_list_from_chunks(
                gcp, m[PX], m[PY], m[VX], m[VY], ff=ff
            )

        def far_planes(m, fl):
            ids = jnp.concatenate([fl.ca, fl.cb])
            cx = (ids // cwy_g).astype(jnp.int32)
            cy = (ids % cwy_g).astype(jnp.int32)
            mine = _owner_of(cx, c, w_loc, n_dev) == d
            lcx = cx - (d * w_loc) // c  # local chunk column
            stack = jnp.stack([m[PX], m[PY], m[VX], m[VY],
                               alive_loc.astype(jnp.float32)])
            g_loc = far_gather_windows(
                stack, jnp.where(mine, lcx, 0), cy,
                c=c, w=stack.shape[1], h=min(hp_glob, stack.shape[2]),
            )
            g = jax.lax.psum(
                jnp.where(mine[:, None], g_loc, 0.0), sp_axis
            )
            contrib = far_pair_contributions(
                g, fl, cx, cy, s=spec.collision_stencil, ff=ff,
                radius=cfg.particle_radius, dt=cfg.dt,
                ecoeff=(consts.elasticity + 1.0) * 0.5,
                friction=consts.friction, world_h=ht_glob,
            )
            contrib = jnp.where(mine[:, None, None], contrib, 0.0)
            planes = far_scatter_contributions(
                contrib, jnp.where(mine, lcx, 0), cy,
                c=c, wp=stack.shape[1], hp=stack.shape[2],
            )
            return planes[:, : stack.shape[1], : stack.shape[2]]

        def far_substep(mm, fl, obs_in=None):
            return fused_substep2_call(
                mm, immut, cvec, far=far_planes(mm, fl),
                obs_in=obs_in, **kw
            )

        def block(carry, _):
            m, fl = carry
            m = exchange(m)
            fl = rebuild(m)

            def substep(mm, _):
                return far_substep(exchange(mm), fl), None

            # first substep reuses the exchange done for the rebuild
            m = far_substep(m, fl)
            m, _ = jax.lax.scan(substep, m, None,
                                length=rebuild_every - 1)
            return (m, fl), None

        # (n_blocks − 1) full blocks; the final block's LAST substep is
        # the observing one (obs carries the final state's strain/stress,
        # the only values the reference ever renders — render.wgsl:82)
        n_blocks = cfg.subticks // rebuild_every
        from ..ops.farfield import empty_far_list

        fl0 = empty_far_list(hot.shape[1], hot.shape[2], ff)
        (hot, fl), _ = jax.lax.scan(
            block, (hot, fl0), None, length=n_blocks - 1
        )
        hot = exchange(hot)
        fl = rebuild(hot)
        for _ in range(rebuild_every - 1):
            hot = far_substep(hot, fl)
            hot = exchange(hot)
        hot, obs = far_substep(hot, fl, obs_in=obs)
        return hot[None], obs[None]

    sm = shard_map(
        frame_local,
        mesh=mesh,
        in_specs=(P(sp_axis), P(sp_axis), P(sp_axis), P(), P(), P()),
        out_specs=(P(sp_axis), P(sp_axis)),
        check_vma=False,
    )

    def fn(hot_sh, obs_sh, immut_sh, edge_consts, consts, uin):
        return sm(hot_sh, obs_sh, immut_sh, edge_consts, consts, uin)

    if donate:
        return jax.jit(fn, donate_argnums=(0, 1))
    return jax.jit(fn)


def shard_stacks2(hot_sh, obs_sh, immut_sh, mesh: Mesh, *,
                  sp_axis: str = "sp"):
    sharding = NamedSharding(mesh, P(sp_axis))
    return (jax.device_put(hot_sh, sharding),
            jax.device_put(obs_sh, sharding),
            jax.device_put(immut_sh, sharding))
