"""Multi-chip batched pairing products over a device mesh.

The BBS+/BLS-style verification workload (BASELINE.json config #5) is a
product of pairings  prod_i e(P_i, Q_i) ?= 1.  Miller loops are
embarrassingly parallel over the pair batch; only the tiny Fp12 product
crosses chips.  Shape: pairs sharded along the lane axis, per-device
Miller values multiplied locally, one all-gather of a single Fp12 element
per device, local product + one shared final exponentiation (replicated).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.pairing import PairingCtx

Array = jax.Array


def _local_f12_product(tw, f: Array) -> Array:
    """Tree-multiply the lane batch of Fp12 values down to one lane."""
    n = f.shape[-1]
    while n > 1:
        half = n // 2
        head = tw.f12_mul(f[..., 0 : 2 * half : 2], f[..., 1 : 2 * half : 2])
        if n % 2:
            head = jnp.concatenate([head, f[..., 2 * half :]], axis=-1)
        f = head
        n = f.shape[-1]
    return f


def sharded_miller_product(
    ctx: PairingCtx,
    xP: Array,
    yP: Array,
    Qx: Array,
    Qy: Array,
    mesh: Mesh,
    axis: str = "data",
) -> Array:
    """prod_i miller(P_i, Q_i) with the pair batch sharded over ``axis``.

    xP, yP: (L, N); Qx, Qy: (2, L, N); N divisible by the axis size.
    Returns the unreduced Fp12 Miller product, (2, 3, 2, L, 1), replicated.
    This is the multi-chip part of a pairing-product check; the final
    exponentiation is replicated (no sharding), so callers jit it
    separately or evaluate it on the host tower.
    """
    tw = ctx.tw

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(None, None, axis), P(None, None, axis)),
        out_specs=P(),
        check_vma=False,
    )
    def _run(xp, yp, qx, qy):
        f = ctx.miller_loop(xp, yp, qx, qy)
        local = _local_f12_product(tw, f)  # (..., 1)
        gathered = jax.lax.all_gather(local, axis)  # (ndev, 2,3,2,L,1)
        prod = gathered[0]
        for i in range(1, gathered.shape[0]):
            prod = tw.f12_mul(prod, gathered[i])
        return prod

    return _run(xP, yP, Qx, Qy)


def sharded_pairing_check(
    ctx: PairingCtx,
    xP: Array,
    yP: Array,
    Qx: Array,
    Qy: Array,
    mesh: Mesh,
    axis: str = "data",
) -> Array:
    """prod_i e(P_i, Q_i) == 1 with the pair batch sharded over ``axis``.

    Returns a scalar bool (replicated).  The final exp runs once on the
    replicated Miller product (it is sharding-free; on-device here so the
    whole check is one program for TPU use — the CPU dry run avoids its
    compile cost via :func:`sharded_miller_product` + host final exp).
    """
    tw = ctx.tw
    prod = sharded_miller_product(ctx, xP, yP, Qx, Qy, mesh, axis)
    return tw.f12_is_one(ctx.final_exp(prod))[..., 0]
