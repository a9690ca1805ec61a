"""Multi-scalar multiplication (Pippenger) as static-shape TPU programs.

The reference delegates MSM to gnark's goroutine-parallel Pippenger
(driver/gurvy/bn254.go:239-242) or a naive loop (driver/kilic/
bls12-381.go:247-254).  Neither shape survives on a TPU: bucket scatter-add
is a data-dependent histogram.  Here it becomes:

  1. windowed digit decomposition of all scalars (vector ops),
  2. per window: sort point indices by digit (XLA sort),
  3. segmented reduction of the sorted points with a work-optimal chunked
     scan (``_segment_scan``): one ``lax.scan`` over chunk-interleaved
     lanes plus a recursive cross-chunk carry fix — no branches, O(levels)
     graph size,
  4. scatter the per-segment totals into the bucket table (unique indices),
  5. weighted bucket sum with the running-sum trick (one ``lax.scan`` over
     buckets, vectorized across windows),
  6. Horner recombination over windows (c doublings + 1 add per window).

Layout: points are (3, L, N) with the batch N on lanes; all point data
gathers/scans move along the lane axis only.

Memory is bounded by processing windows in chunks (``lax.map``), since the
sorted point gather materializes (chunk, 3, L, N).

Correctness oracle: MSM == naive fold, as pinned by the reference
(math_test.go:323-346).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .field import LIMB_BITS
from .g1 import G1Ctx

Array = jax.Array

_SENTINEL = jnp.uint32(0xFFFFFFFF)


def _digits(scalars: Array, c: int, nwin: int) -> Array:
    """(S, N) 16-bit scalar limbs -> (nwin, N) window digits (c | 16)."""
    per = LIMB_BITS // c
    wins = []
    for w in range(nwin):
        limb = scalars[(w * c) // LIMB_BITS]
        wins.append((limb >> ((w % per) * c)) & ((1 << c) - 1))
    return jnp.stack(wins, axis=0)


def _segment_scan(g1: G1Ctx, keys: Array, pts: Array, K: int = 64):
    """Inclusive segmented point-sum scan along the last (lane) axis.

    keys: (..., N) sorted; pts: (..., 3, L, N).  Returns (..., 3, L, N)
    where lane i holds the sum of all pts in i's key-segment up to i.

    Chunked scheme: split the sorted order into C contiguous chunks of K,
    lay the chunks out along lanes, run ONE ``lax.scan`` of K steps (graph:
    a single point-add), then recurse on the C chunk summaries to produce
    cross-chunk carries, added to every lane of each chunk's first segment.
    Total work ~N(1 + 1/K + ...) point-adds with an O(levels) graph.
    """
    batch = keys.shape[:-1]
    N = keys.shape[-1]
    L = pts.shape[-2]
    if N > K:
        pad = (-N) % K
        if pad:
            keys = jnp.concatenate(
                [keys, jnp.full(batch + (pad,), _SENTINEL, keys.dtype)], axis=-1
            )
            inf = jnp.broadcast_to(jnp.asarray(g1.inf), batch + (3, L, pad))
            pts = jnp.concatenate([pts, inf], axis=-1)
        C = keys.shape[-1] // K
    else:
        C, K = 1, N
        pad = 0

    # chunk c covers sorted lanes [cK, (c+1)K); scan step t touches lane
    # c*K + t of every chunk -> reshape (..., C, K) and put K first
    k2 = jnp.moveaxis(keys.reshape(batch + (C, K)), -1, 0)  # (K, ..., C)
    p2 = jnp.moveaxis(
        pts.reshape(batch + (3, L, C, K)), -1, 0
    )  # (K, ..., 3, L, C)

    init = (
        jnp.full(batch + (C,), _SENTINEL, keys.dtype),
        jnp.broadcast_to(jnp.asarray(g1.inf), batch + (3, L, C)),
    )

    def body(carry, x):
        ck, cp = carry
        k, p = x
        run = g1.select(k == ck, g1.add(cp, p), p)
        return (k, run), run

    (_, _), local = jax.lax.scan(body, init, (k2, p2))  # (K, ..., 3, L, C)
    local = jnp.moveaxis(local, 0, -1).reshape(batch + (3, L, C * K))
    keys_c = keys.reshape(batch + (C, K))

    if C > 1:
        # summaries: last key / last running of each chunk
        sum_keys = keys_c[..., -1]  # (..., C)
        sum_pts = jnp.moveaxis(local.reshape(batch + (3, L, C, K)), -1, 0)[-1]
        inc = _segment_scan(g1, sum_keys, sum_pts, K)  # (..., 3, L, C)
        # exclusive carries, valid where previous chunk's last key matches
        carry_pt = jnp.roll(inc, 1, axis=-1)
        carry_key = jnp.roll(sum_keys, 1, axis=-1)
        valid = carry_key == keys_c[..., 0]
        valid = valid.at[..., 0].set(False)
        first_seg = keys_c == keys_c[..., :1]  # (..., C, K)
        mask = jnp.logical_and(first_seg, valid[..., None]).reshape(batch + (C * K,))
        carry_full = jnp.repeat(carry_pt, K, axis=-1)  # (..., 3, L, C*K)
        fixed = g1.add(local, carry_full)
        local = g1.select(mask, fixed, local)

    return local[..., :N] if pad else local


def _bucket_totals(g1: G1Ctx, points: Array, digits: Array, c: int) -> Array:
    """Per-window bucket-weighted sums.

    points: (3, L, N); digits: (W, N) in [0, 2^c).  Returns (3, L, W) with
    T_w = sum_b b * S_{w,b} where S_{w,b} is the sum of points with digit b.
    """
    W, N = digits.shape
    L = points.shape[-2]
    B = 1 << c
    order = jnp.argsort(digits, axis=1)  # (W, N)
    keys = jnp.take_along_axis(digits, order, axis=1)  # sorted digits
    pts = jnp.moveaxis(points[..., order], -2, 0)  # (W, 3, L, N)

    seg = _segment_scan(g1, keys, pts)  # (W, 3, L, N)
    # last element of each segment holds that bucket's full sum
    is_last = jnp.concatenate(
        [keys[:, :-1] != keys[:, 1:], jnp.ones((W, 1), dtype=bool)], axis=1
    )
    win_ids = jnp.broadcast_to(jnp.arange(W, dtype=jnp.uint32)[:, None], (W, N))
    flat_idx = jnp.where(is_last, win_ids * B + keys, W * B)  # W*B = dropped
    seg_flat = jnp.moveaxis(seg, 0, -2).reshape(3, L, W * N)
    inf = jnp.broadcast_to(jnp.asarray(g1.inf), (3, L, W * B))
    buckets = inf.at[..., flat_idx.reshape(-1)].set(seg_flat, mode="drop")
    buckets = buckets.reshape(3, L, W, B)

    # running-sum trick: sum_{b=1}^{B-1} b * S_b, scanning b = B-1 .. 1
    init = (
        jnp.broadcast_to(jnp.asarray(g1.inf), (3, L, W)),
        jnp.broadcast_to(jnp.asarray(g1.inf), (3, L, W)),
    )

    def body(carry, bucket_b):
        running, total = carry
        running = g1.add(running, bucket_b)
        total = g1.add(total, running)
        return (running, total), None

    rev = jnp.moveaxis(jnp.flip(buckets[..., 1:], axis=-1), -1, 0)  # (B-1, 3, L, W)
    (running, total), _ = jax.lax.scan(body, init, rev)
    return total  # (3, L, W)


def msm(
    g1: G1Ctx,
    points: Array,
    scalars: Array,
    c: int = 8,
    win_chunk: Optional[int] = None,
) -> Array:
    """Pippenger MSM: sum_i [scalars_i] points_i.

    points: (3, L, N) projective; scalars: (S, N) plain 16-bit limbs.
    ``c`` must divide 16.  Returns a single (3, L, 1) point.
    """
    assert LIMB_BITS % c == 0
    nbits = g1.nbits
    nwin = -(-nbits // c)
    digits = _digits(scalars, c, nwin)  # (nwin, N)

    if win_chunk is None:
        win_chunk = max(1, min(nwin, 4))
    # pad nwin to a multiple of win_chunk with zero-digit windows (no-ops)
    pad = (-nwin) % win_chunk
    if pad:
        digits = jnp.concatenate(
            [digits, jnp.zeros((pad, digits.shape[1]), digits.dtype)], axis=0
        )
    groups = digits.reshape(-1, win_chunk, digits.shape[1])

    totals = jax.lax.map(
        lambda d: _bucket_totals(g1, points, d, c), groups
    )  # (groups, 3, L, win_chunk)
    totals = jnp.moveaxis(totals, 0, -2).reshape(3, g1.fp.L, -1)[..., :nwin]

    # Horner over windows, high to low: acc = 2^c acc + T_w
    def horner(acc, t_w):
        for _ in range(c):
            acc = g1.double(acc)
        return g1.add(acc, t_w[..., None]), None

    rev = jnp.moveaxis(jnp.flip(totals, axis=-1), -1, 0)  # (nwin, 3, L)
    acc, _ = jax.lax.scan(horner, rev[0][..., None], rev[1:])
    return acc  # (3, L, 1)


def msm_naive(g1: G1Ctx, points: Array, scalars: Array) -> Array:
    """Oracle: batched scalar-mul then tree reduction (math_test.go:323-346)."""
    return g1.sum_reduce(g1.scalar_mul(points, scalars))
