"""Device mesh construction for multi-chip scaling.

The reference is a single-device, single-queue program (SURVEY.md §2.4);
its communication layer is postMessage + Transferables.  The TPU build
scales two ways instead, both over a ``jax.sharding.Mesh`` with XLA
collectives riding ICI:

- **dp** (world parallel): independent worlds batched and sharded across
  devices — the analog of data parallelism.
- **sp** (spatial parallel): one huge world, particles and beams sharded
  into index slabs across devices; per-substep exchange is an
  ``all_gather`` of positions/velocities plus a ``psum`` of the
  beam-force accumulator (see parallel/spatial.py).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(
    n_devices: Optional[int] = None,
    *,
    dp: Optional[int] = None,
    devices: Optional[Sequence] = None,
    axis_names: Tuple[str, str] = ("dp", "sp"),
) -> Mesh:
    """Build a 2D (dp × sp) mesh over the first ``n_devices`` devices.

    ``dp`` defaults to the largest power-of-two divisor ≤ √n so both axes
    get devices; pass ``dp=1`` for pure spatial or ``dp=n`` for pure
    world-parallel."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[: int(n_devices)]
    n = len(devs)
    if dp is None:
        dp = 1
        while dp * 2 <= int(np.sqrt(n)) and n % (dp * 2) == 0:
            dp *= 2
    if n % dp != 0:
        raise ValueError(f"{n} devices not divisible by dp={dp}")
    arr = np.array(devs).reshape(dp, n // dp)
    return Mesh(arr, axis_names)


def pad_to_multiple(n: int, k: int) -> int:
    return -(-n // k) * k
