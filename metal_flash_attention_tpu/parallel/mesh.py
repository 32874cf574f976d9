"""Device mesh construction helpers.

The TPU analog of the reference's device bookkeeping
(`MTLContext.swift:10-20`, `GEMMDescriptor+CoreCount.swift:19-80`):
instead of one GPU + core count, a named `jax.sharding.Mesh` over
(data, heads, context) axes that the sharded/ring attention entry
points consume.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


DATA_AXIS = "data"
HEAD_AXIS = "heads"
CONTEXT_AXIS = "context"


def make_mesh(
    *,
    data: int = 1,
    heads: int = 1,
    context: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, heads, context) mesh.

    Axis sizes must multiply to the device count.  `heads` shards query
    heads (zero-communication attention), `context` shards the KV
    sequence (ring attention / context parallelism), `data` shards the
    batch.
    """
    if devices is None:
        devices = jax.devices()
    n = data * heads * context
    assert n <= len(devices), (
        f"mesh {data}x{heads}x{context} needs {n} devices, "
        f"have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(data, heads, context)
    return Mesh(arr, (DATA_AXIS, HEAD_AXIS, CONTEXT_AXIS))
