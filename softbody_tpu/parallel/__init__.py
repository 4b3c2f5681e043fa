"""Multi-chip parallelism: device meshes, world-parallel batching (dp),
spatial slab sharding (sp) — SURVEY.md §2.4's TPU-native plan."""

from .mesh import make_mesh, pad_to_multiple  # noqa: F401
from .batched import (  # noqa: F401
    batched_frame_fn,
    device_put_batched,
    stack_states,
    unstack_states,
)
from .spatial import (  # noqa: F401
    pad_state_for_mesh,
    shard_state,
    spatial_frame_fn,
)
