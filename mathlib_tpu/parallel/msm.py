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
from jax import shard_map

from ..ops.g1 import G1Ctx
from ..ops.msm import bucket_table, horner_windows, msm, window_totals

Array = jax.Array


def allreduce_point(g1: G1Ctx, x: Array, axis_name: str) -> Array:
    """All-reduce a (3, L, 1) point with group addition over a mesh axis.

    Payload per device is one point, so a simple all-gather + local tree
    reduction beats a ppermute butterfly at any realistic device count.
    """
    gathered = jax.lax.all_gather(x, axis_name)  # (ndev, 3, L, 1)
    return g1.sum_reduce_axis(gathered, axis=0)


def allreduce_points_butterfly(
    g1: G1Ctx, x: Array, axis_name: str, ndev: int
) -> Array:
    """All-reduce a point *array* with group addition over a mesh axis.

    Group addition is not an XLA reduction op, so ``lax.psum`` cannot
    carry it; instead run the recursive-doubling butterfly by hand —
    log2(ndev) ``ppermute`` exchanges, each followed by one batched
    complete-formula point add.  Payload per step is the full array, so
    use this for bucket tables (W*2^c points); single points go through
    :func:`allreduce_point`.
    """
    if ndev & (ndev - 1) == 0:
        step = 1
        while step < ndev:
            perm = [(i, i ^ step) for i in range(ndev)]
            x = g1.add(x, jax.lax.ppermute(x, axis_name, perm=perm))
            step *= 2
        return x
    gathered = jax.lax.all_gather(x, axis_name)
    return g1.sum_reduce_axis(gathered, axis=0)


def sharded_msm(
    g1: G1Ctx,
    points: Array,
    scalars: Array,
    mesh: Mesh,
    axis: str = "data",
    c: int = 8,
    win_chunk: Optional[int] = None,
    glv: bool = False,
) -> Array:
    """MSM with the N points sharded across ``mesh`` axis ``axis``.

    points: (3, L, N), scalars: (S, N); N (the lane axis) must divide
    evenly by the axis size.  Returns the replicated (3, L, 1) result.
    ``glv`` applies the per-device endomorphism split (BLS12 only): the
    local Pippenger runs on 2N half-width sub-scalars, halving the window
    count and the per-device tail.
    """

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, None, axis), P(None, axis)),
        out_specs=P(),
        check_vma=False,
    )
    def _run(pts, scs):
        local = msm(g1, pts, scs, c=c, win_chunk=win_chunk, glv=glv)
        return allreduce_point(g1, local, axis)

    return _run(points, scalars)


def sharded_msm_buckets(
    g1: G1Ctx,
    points: Array,
    scalars: Array,
    mesh: Mesh,
    axis: str = "data",
    c: int = 8,
    signed: bool = True,
    glv: bool = False,
) -> Array:
    """Bucket-parallel MSM: bucket tables reduced over ICI, bucket-sum
    tail sharded over windows (SURVEY §2 parallelism item 2).

    Pipeline per device:
      1. local Pippenger bucket table over its point shard (the O(N) part),
      2. butterfly all-reduce of the (W, B) point tables over ICI —
         after this every device holds the *global* bucket table,
      3. weighted bucket sum for a 1/ndev slice of the windows (the
         O(W·B) tail now runs ndev-way parallel instead of duplicated),
      4. all-gather of the W per-window totals (W single points) + a
         replicated Horner recombination.

    Collective payload is W·B points per butterfly step (B = 2^(c-1)
    signed, 2^c unsigned — signed digits halve the wire bytes too), so
    this strategy wants moderate window widths (c <= 10); at c=16 the
    table rivals the input size and :func:`sharded_msm` (result
    reduction) wins.

    ``glv`` applies the endomorphism split per device (BLS12 only,
    reference seam: gnark's GLV behind bls12381/bls12-381.go:238-247):
    128-bit sub-scalars over 2N local points HALVE the window count —
    i.e. half the butterfly all-reduce payload and half the bucket-sum
    tail, the two terms that bound multi-chip efficiency (SCALING.md).
    ``points``: (3, L, N); ``scalars``: (S, N); N divisible by ndev.
    """
    from ..ops.msm import get_glv_ctx, n_windows

    gl = get_glv_ctx(g1) if glv else None
    nbits = gl.nbits if glv else None
    ndev = mesh.shape[axis]
    nwin = n_windows(g1, c, signed, nbits=nbits)
    wpd = -(-nwin // ndev)  # windows per device (last device may pad)
    npad = ndev * wpd - nwin

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, None, axis), P(None, axis)),
        out_specs=P(),
        check_vma=False,
    )
    def _run(pts, scs):
        if glv:
            if pts.shape[-3] == 3:
                # [k]inf = inf: zero the scalar so both GLV halves vanish
                inf = g1.is_inf(pts)
                scs_z = jnp.where(inf[None, :], jnp.uint32(0), scs)
            else:
                scs_z = scs
            k1, k2 = gl.split(scs_z)
            pts2 = jnp.concatenate([pts, gl.endo_points(pts)], axis=-1)
            scs2 = jnp.concatenate([k1, k2], axis=-1)
            local = bucket_table(
                g1, pts2, scs2, c, signed=signed, nbits=nbits
            )  # (3, L, W, B) with W halved
        else:
            local = bucket_table(g1, pts, scs, c, signed=signed)  # (3, L, W, B)
        L, B = local.shape[1], local.shape[-1]
        # group adds expect the (3, L, lanes) layout (coords on axis -3):
        # flatten windows*buckets onto lanes for the collective
        flat = allreduce_points_butterfly(
            g1, local.reshape(3, L, nwin * B), axis, ndev
        )
        full = flat.reshape(3, L, nwin, B)
        if npad:  # pad with infinity windows: Horner no-ops at the top
            inf = jnp.broadcast_to(
                jnp.asarray(g1.inf)[..., None], (3, L, npad, B)
            )
            full = jnp.concatenate([full, inf], axis=-2)
        idx = jax.lax.axis_index(axis)
        mine = jax.lax.dynamic_slice_in_dim(full, idx * wpd, wpd, axis=-2)
        totals = window_totals(g1, mine, c, signed=signed)  # (3, L, wpd)
        allw = jax.lax.all_gather(totals, axis)  # (ndev, 3, L, wpd)
        allw = jnp.moveaxis(allw, 0, -2).reshape(3, totals.shape[1], -1)
        return horner_windows(g1, allw, c)

    return _run(points, scalars)


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.array(devs), (axis,))
