"""Multi-chip MSM: points sharded over a device mesh, partials reduced
with point addition over ICI.

The reference is single-process (SURVEY.md §5.8) — its only parallelism is
gnark's goroutine fan-out inside MultiExp.  Here the scaling dimension is a
``jax.sharding.Mesh``: the point/scalar arrays are sharded along the batch
axis ("data" parallelism over MSM points, SURVEY.md §2 parallelism item 1),
each device runs the full local Pippenger (ops/msm.py) on its shard, and
the per-device partial results (single points, 3*L words) are combined with
an all-gather + point-add tree.  Reducing *results* rather than bucket
tables keeps the collective payload tiny while the bucket work — the O(N)
part — stays fully sharded.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops.g1 import G1Ctx
from ..ops.msm import msm

Array = jax.Array


def allreduce_point(g1: G1Ctx, x: Array, axis_name: str) -> Array:
    """All-reduce a (3, L, 1) point with group addition over a mesh axis.

    Payload per device is one point, so a simple all-gather + local tree
    reduction beats a ppermute butterfly at any realistic device count.
    """
    gathered = jax.lax.all_gather(x, axis_name)  # (ndev, 3, L, 1)
    return g1.sum_reduce_axis(gathered, axis=0)


def sharded_msm(
    g1: G1Ctx,
    points: Array,
    scalars: Array,
    mesh: Mesh,
    axis: str = "data",
    c: int = 8,
    win_chunk: Optional[int] = None,
) -> Array:
    """MSM with the N points sharded across ``mesh`` axis ``axis``.

    points: (3, L, N), scalars: (S, N); N (the lane axis) must divide
    evenly by the axis size.  Returns the replicated (3, L, 1) result.
    """

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, None, axis), P(None, axis)),
        out_specs=P(),
        check_rep=False,
    )
    def _run(pts, scs):
        local = msm(g1, pts, scs, c=c, win_chunk=win_chunk)
        return allreduce_point(g1, local, axis)

    return _run(points, scalars)


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.array(devs), (axis,))
