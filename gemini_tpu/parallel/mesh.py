"""Device-mesh utilities.

The reference has no distribution at all — its scalability story is
streaming (SURVEY.md §5).  The TPU-native replacement is sharding:
every length-N coefficient vector is laid out (L, N) with the lane
axis partitioned in contiguous blocks across a 1-D mesh, so

  * even/odd sumcheck folds stay shard-local (block length is kept
    even), and
  * round messages / inner products are local lane-sums + one tiny
    `psum` over ICI.

Collectives ride the single "shard" axis; multi-host layouts simply
extend the same axis across hosts.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "shard"


def default_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (AXIS,))


def shard_vector(mesh: Mesh, v):
    """Place an (L, N) limb array with lanes blocked across the mesh.
    N must be divisible by mesh size * 2 (fold locality)."""
    n = v.shape[-1]
    size = mesh.devices.size
    assert n % (2 * size) == 0, f"lane count {n} not divisible by 2*{size}"
    return jax.device_put(v, NamedSharding(mesh, P(None, AXIS)))
