"""Multi-scalar multiplication (Pippenger) as static-shape TPU programs.

The reference delegates MSM to gnark's goroutine-parallel Pippenger
(driver/gurvy/bn254.go:239-242) or a naive loop (driver/kilic/
bls12-381.go:247-254).  Neither shape survives on a TPU: bucket scatter-add
is a data-dependent histogram.  Here it becomes:

  1. windowed digit decomposition of all scalars (vector ops),
  2. per window: sort point indices by digit (XLA sort, u32 keys),
  3. one streaming ``lax.scan`` over K chunk steps: each step gathers one
     sorted slice of points for ALL windows, advances the segmented
     running sums with the fused add_select kernel, and scatters finished
     segments straight into the bucket table — no (W, N)-sized
     intermediates, no transposes, O(1) graph size,
  4. cross-chunk segment carries are resolved by a recursive segmented
     scan over the chunk summaries (1/K the data) and patched into the
     bucket table,
  5. weighted bucket sum via bit/byte decomposition of the bucket index:
     masked tree-reductions (log-depth, full-lane) instead of a 2^c-step
     serial scan,
  6. Horner recombination over windows (c doublings + 1 add per window).

Layout: points are (3, L, N) with the batch N on lanes; everything moves
along the lane axis only.

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

# dense-capture buffer budget: above this the bucket table is computed in
# halves (pointwise-added) or falls back to the in-scan scatter
_DENSE_CAPTURE_LIMIT = 6 << 30


def _digits(scalars: Array, c: int, nwin: int) -> Array:
    """(S, N) 16-bit scalar limbs -> (nwin, N) window digits (c | 16)."""
    per = LIMB_BITS // c
    wins = []
    for w in range(nwin):
        limb = scalars[(w * c) // LIMB_BITS]
        wins.append((limb >> ((w % per) * c)) & ((1 << c) - 1))
    return jnp.stack(wins, axis=0)


def _signed_digits(scalars: Array, c: int, nwin: int, nbits: Optional[int] = None):
    """Balanced (signed) window digits: k = sum_w d_w 2^(cw) with
    d_w in [-(2^(c-1)-1), 2^(c-1)].

    Returns (abs, neg): magnitudes in [0, 2^(c-1)] and sign flags, shaped
    (nwin, N) — or (nwin + 1, N) when scalars may reach 2^(c*nwin - 1)
    (e.g. FP256BN's 256-bit r at c*nwin = 256), where the extra top window
    holds the outgoing carry.  Halves the bucket count versus unsigned
    digits — the point for digit -d goes into bucket d with its y negated
    at gather time (one masked subtract, vs 2^(c-1) extra buckets).
    """
    raw = _digits(scalars, c, nwin)  # (nwin, N) in [0, 2^c)
    half = jnp.uint32(1 << (c - 1))
    full = jnp.uint32(1 << c)

    def body(carry, d):
        t = d + carry
        neg = t > half
        a = jnp.where(neg, full - t, t)
        return neg.astype(d.dtype), (a, neg)

    carry0 = jnp.zeros(raw.shape[1:], raw.dtype)
    last_carry, (absd, neg) = jax.lax.scan(body, carry0, raw)
    if nbits is None or nbits >= c * nwin:
        # scalars can fill the top window: keep the outgoing carry
        absd = jnp.concatenate([absd, last_carry[None]], axis=0)
        neg = jnp.concatenate(
            [neg, jnp.zeros((1,) + neg.shape[1:], dtype=bool)], axis=0
        )
    return absd, neg


def _seg_scan_inclusive(g1: G1Ctx, keys: Array, pts: Array, K: int = 64):
    """Inclusive segmented point-sum scan along the last (lane) axis.

    keys: (..., N) sorted; pts: (..., 3, L, N).  Returns (..., 3, L, N).
    Used for the (small) chunk-summary levels of the bucket accumulation.
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

    k2 = jnp.moveaxis(keys.reshape(batch + (C, K)), -1, 0)  # (K, ..., C)
    p2 = jnp.moveaxis(pts.reshape(batch + (3, L, C, K)), -1, 0)

    init = (
        jnp.full(batch + (C,), _SENTINEL, keys.dtype),
        jnp.broadcast_to(jnp.asarray(g1.inf), batch + (3, L, C)),
    )

    def body(carry, x):
        ck, cp = carry
        k, p = x
        run = g1.add_select(cp, p, k == ck)
        return (k, run), run

    (_, _), local = jax.lax.scan(body, init, (k2, p2))
    local = jnp.moveaxis(local, 0, -1).reshape(batch + (3, L, C * K))
    keys_c = keys.reshape(batch + (C, K))

    if C > 1:
        sum_keys = keys_c[..., -1]
        sum_pts = jnp.moveaxis(local.reshape(batch + (3, L, C, K)), -1, 0)[-1]
        inc = _seg_scan_inclusive(g1, sum_keys, sum_pts, K)
        carry_pt = jnp.roll(inc, 1, axis=-1)
        carry_key = jnp.roll(sum_keys, 1, axis=-1)
        valid = carry_key == keys_c[..., 0]
        valid = valid.at[..., 0].set(False)
        first_seg = keys_c == keys_c[..., :1]
        mask = jnp.logical_and(first_seg, valid[..., None]).reshape(batch + (C * K,))
        carry_full = jnp.repeat(carry_pt, K, axis=-1)
        local = g1.add_select(carry_full, local, mask)

    return local[..., :N] if pad else local


def _bucket_table(
    g1: G1Ctx,
    points: Array,
    digits: Array,
    c: int,
    K: int = 64,
    neg: Optional[Array] = None,
    capture: str = "auto",
) -> Array:
    """Bucket sums for all windows: (3, L, W, B).

    points: (3, L, N); digits: (W, N).  Streaming scatter-during-scan: the
    full point set is touched exactly once per window (gather + one fused
    add_select), and finished segments go straight into the bucket table.

    Unsigned mode (neg=None): digits in [0, 2^c), B = 2^c buckets indexed
    by digit (bucket 0 is computed but unused downstream).  Signed mode:
    digits are |d| in [0, 2^(c-1)] with ``neg`` (W, N) sign flags,
    B = 2^(c-1) buckets indexed by |d| - 1 (|d| = 0 contributes nothing),
    and the gathered point's y is conditionally negated — one masked
    subtract per step versus half the buckets everywhere downstream.

    Memory layout: the random-access sides (point gather, bucket scatter)
    run in point-major rows — one point = 3*L consecutive words — so every
    gather/scatter touches contiguous bytes instead of one 4-byte word per
    512-byte tile.  The compute side (the fused add_select kernel) stays in
    lane-major (3, L, lanes); the two layouts meet at one dense transpose
    per scan step, which XLA executes at memory bandwidth.

    ``capture`` selects how finished segments reach the bucket table:

    * ``"scatter"`` — scatter the running-sum rows of segment-end lanes
      into the table on every scan step (random 3*L-word writes, ~94%
      dropped at production shapes).
    * ``"dense"`` — the scan just *emits* its running sums as stacked
      scan output (sequential, bandwidth-speed writes); segment-end
      positions are precomputed from the sorted keys alone, so the
      bucket table is ONE contiguous row-gather from the (K, W*C, 3L)
      capture buffer after the scan.  Costs N*W point rows of HBM
      (~4.8 GB at 2^20/c=16), wins whenever that fits.
    * ``"auto"`` — dense when the capture buffer is < 6 GiB.
    """
    W, N = digits.shape
    L = points.shape[-2]
    signed = neg is not None
    B = 1 << (c - 1) if signed else 1 << c
    lo = 1 if signed else 0  # smallest digit that owns a bucket
    RP = points.shape[-3] * L  # words per GATHERED point row (2L affine)
    R = 3 * L  # words per accumulator/bucket row (projective)
    mixed = points.shape[-3] == 2

    # Sorted keys via a SECOND jnp.sort instead of take_along_axis(order):
    # the word-gather take costs ~200 ms at (16, 2^20) on v5e (measured
    # round 5, tools/profile_bucket_internals.py) while a whole extra
    # sort is ~40 ms.  Signed mode packs the sign into bit 0 so one
    # sort yields consistent (|d|, neg) pairs; ties are permutations
    # within a segment, which leave every segment sum unchanged.
    if signed:
        pack = (digits << 1) | neg.astype(digits.dtype)
        order = jnp.argsort(pack, axis=1)  # (W, N)
        spk = jnp.sort(pack, axis=1)
        keys = spk >> 1
        negs = (spk & 1) != 0
    else:
        order = jnp.argsort(digits, axis=1)  # (W, N)
        keys = jnp.sort(digits, axis=1)
        negs = None

    pad = (-N) % K
    NP = N + pad
    if pad:
        keys = jnp.concatenate(
            [keys, jnp.full((W, pad), _SENTINEL, keys.dtype)], axis=1
        )
        order = jnp.concatenate(
            [order, jnp.zeros((W, pad), order.dtype)], axis=1
        )  # gathered points for sentinel keys are never used
        if signed:
            negs = jnp.concatenate(
                [negs, jnp.zeros((W, pad), dtype=bool)], axis=1
            )
    C = NP // K

    def bucket_of(k):  # digit -> flat bucket index (W*B = out of range)
        return jnp.where(
            jnp.logical_and(k >= lo, k - lo < B), win_ids * B + (k - lo), W * B
        )

    # last element of each segment (flat sorted order) -> scatter target
    is_last = jnp.concatenate(
        [keys[:, :-1] != keys[:, 1:], jnp.ones((W, 1), dtype=bool)], axis=1
    )
    win_ids = jnp.broadcast_to(jnp.arange(W, dtype=jnp.uint32)[:, None], (W, NP))
    scatter_idx = jnp.where(is_last, bucket_of(keys), W * B)

    def to_steps(x):  # (W, NP) -> (K, W*C), step-major
        return jnp.moveaxis(x.reshape(W, C, K), -1, 0).reshape(K, W * C)

    keys_t = to_steps(keys)
    order_t = to_steps(order)
    negs_t = to_steps(negs) if signed else None

    # point-major copy for the streaming gather: one row = one point
    # (affine rows when mixed: 2L words instead of 3L).  Rows are padded
    # up to 64 words: XLA's row gather is per-row bound and width-flat
    # from 64 to 128 words, but 4.3x SLOWER below 64 (measured on v5e) —
    # this is what makes BN254's 48-word projective rows gather fast.
    points_rows = jnp.asarray(points).reshape(RP, N).T  # (N, RP)
    row_pad = max(0, 64 - RP)
    if row_pad:
        points_rows = jnp.pad(points_rows, [(0, 0), (0, row_pad)])
    inf_row = jnp.asarray(g1.inf).reshape(R)

    def combine(cp, rows_gathered, sel, ng):
        """One segmented-scan step on freshly gathered point rows."""
        rows_gathered = rows_gathered[:, :RP]
        p = rows_gathered.T.reshape(points.shape[-3], L, rows_gathered.shape[0])
        if mixed:
            if signed:
                return g1.madd_select_neg(cp, p, sel, ng)
            return g1.madd_select(cp, p, sel)
        if signed:
            return g1.add_select_neg(cp, p, sel, ng)
        return g1.add_select(cp, p, sel)

    if capture == "auto":
        # same padded quantity as bucket_table's split guard, so an even-N
        # call that skipped the split always lands on dense here
        capture = "dense" if K * W * C * R * 4 < _DENSE_CAPTURE_LIMIT else "scatter"

    if capture == "dense":
        # flat index into the stacked (K, W*C) capture buffer of the
        # running sum AT sorted position (w, i): i = chunk*K + step
        i_idx = jnp.arange(NP, dtype=jnp.uint32)
        ys_pos = (i_idx % K)[None, :] * jnp.uint32(W * C) + (
            win_ids * C + (i_idx // K)[None, :]
        )
        # per-bucket capture position (sentinel = empty bucket),
        # precomputed entirely outside the scan — keys only
        pos = (
            jnp.full((W * B + 1,), _SENTINEL, jnp.uint32)
            .at[jnp.where(is_last, bucket_of(keys), W * B).reshape(-1)]
            .set(ys_pos.reshape(-1))[: W * B]
        )

        init = (
            jnp.full((W * C,), _SENTINEL, keys.dtype),
            jnp.broadcast_to(jnp.asarray(g1.inf), (3, L, W * C)),
        )

        def body(carry, x):
            ck, cp = carry
            if signed:
                k, o, ng = x
            else:
                (k, o), ng = x, None
            run = combine(cp, points_rows[o], k == ck, ng)
            return (k, run), run.reshape(R, W * C).T

        xs = (keys_t, order_t, negs_t) if signed else (keys_t, order_t)
        (_, final_run), ys = jax.lax.scan(body, init, xs)
        # NOTE: ys is 128-lane padded by XLA (R=3L=72 -> 78% extra HBM);
        # a compact re-tiled emit + flat gather was measured 2.8x SLOWER
        # end-to-end (relayout cost), so large MSMs control memory by
        # splitting to smaller leaves (see bucket_table) instead.
        ys_flat = ys.reshape(K * W * C, R)
        rows = ys_flat[jnp.minimum(pos, K * W * C - 1)]  # (W*B, R) row gather
        bucket_rows = jnp.where(
            (pos == _SENTINEL)[:, None], inf_row[None, :], rows
        )
    else:
        sidx_t = to_steps(scatter_idx)

        init = (
            jnp.full((W * C,), _SENTINEL, keys.dtype),
            jnp.broadcast_to(jnp.asarray(g1.inf), (3, L, W * C)),
            jnp.broadcast_to(inf_row, (W * B, R)),
        )

        def body(carry, x):
            ck, cp, bucket_rows = carry
            if signed:
                k, o, si, ng = x
            else:
                (k, o, si), ng = x, None
            run = combine(cp, points_rows[o], k == ck, ng)
            bucket_rows = bucket_rows.at[si].set(
                run.reshape(R, W * C).T, mode="drop"
            )
            return (k, run, bucket_rows), None

        xs = (
            (keys_t, order_t, sidx_t, negs_t)
            if signed
            else (keys_t, order_t, sidx_t)
        )
        (_, final_run, bucket_rows), _ = jax.lax.scan(body, init, xs)

    if C > 1:
        # cross-chunk carries from the chunk summaries (1/K the data)
        keys_c = keys.reshape(W, C, K)
        sum_keys = keys_c[..., -1]  # (W, C)
        sum_pts = jnp.moveaxis(final_run.reshape(3, L, W, C), -2, 0)  # (W,3,L,C)
        inc = _seg_scan_inclusive(g1, sum_keys, sum_pts, K)  # (W, 3, L, C)
        carry_pt = jnp.roll(inc, 1, axis=-1)
        carry_key = jnp.roll(sum_keys, 1, axis=-1)
        first_key = keys_c[..., 0]  # (W, C)
        valid = carry_key == first_key
        valid = valid.at[..., 0].set(False)
        # the carried-into segment must END within this chunk for its bucket
        # entry to have been scattered from here
        next_first = jnp.concatenate(
            [first_key[:, 1:], jnp.full((W, 1), _SENTINEL, keys.dtype)], axis=1
        )
        ends_here = first_key != next_first
        in_range = jnp.logical_and(first_key >= lo, first_key - lo < B)
        fix = jnp.logical_and(jnp.logical_and(valid, ends_here), in_range)
        tgt = jnp.where(
            fix, win_ids[:, :C] * B + (first_key - lo), W * B
        ).reshape(-1)
        cur = bucket_rows[jnp.minimum(tgt, W * B - 1)]  # (W*C, R) row gather
        carry_flat = jnp.moveaxis(carry_pt, 0, -2).reshape(3, L, W * C)
        fixed = g1.add(cur.T.reshape(3, L, W * C), carry_flat)
        bucket_rows = bucket_rows.at[tgt].set(
            fixed.reshape(R, W * C).T, mode="drop"
        )

    return bucket_rows.T.reshape(3, L, W, B)


def _tree_reduce_last(g1: G1Ctx, x: Array, n: int) -> Array:
    """Point tree-reduction over the trailing n lanes of (3, L, W*n)."""
    L = x.shape[1]
    W = x.shape[-1] // n
    while n > 1:
        half = n // 2
        x4 = x.reshape(3, L, W, n)
        x = g1.add(
            x4[..., :half].reshape(3, L, W * half),
            x4[..., half : 2 * half].reshape(3, L, W * half),
        )
        n = half
    return x  # (3, L, W)


def _weighted_bucket_sum(g1: G1Ctx, buckets: Array, c: int) -> Array:
    """sum_{b=1}^{B-1} b * S_b per window: (3, L, W, B) -> (3, L, W).

    For large B, split the bucket index into hi/lo bytes first:
      sum_b b*S_b = 2^h * sum_hi hi*R_hi + sum_lo lo*C_lo
    with R/C the row/column sums of the (hi, lo) bucket grid — two tree
    reductions plus two small weighted sums.  Keeps every intermediate at
    most B-sized instead of c*B.
    """
    if c > 8:
        L = buckets.shape[1]
        W = buckets.shape[-2]
        h = c // 2
        H, Lo = 1 << h, 1 << (c - h)
        grid = buckets.reshape(3, L, W, H, Lo)
        rows = _tree_reduce_last(g1, grid.reshape(3, L, W * H * Lo), Lo)
        rows = rows.reshape(3, L, W, H)  # R_hi
        cols = _tree_reduce_last(
            g1,
            jnp.moveaxis(grid, -1, -2).reshape(3, L, W * Lo * H),
            H,
        ).reshape(3, L, W, Lo)  # C_lo
        hi_sum = _weighted_bucket_sum(g1, rows, h)
        lo_sum = _weighted_bucket_sum(g1, cols, c - h)
        for _ in range(c - h):
            hi_sum = g1.double(hi_sum)
        return g1.add(hi_sum, lo_sum)
    return _weighted_bucket_sum_bits(g1, buckets, c)


def _weighted_bucket_sum_bits(g1: G1Ctx, buckets: Array, c: int) -> Array:
    """Bit decomposition: sum_b b*S_b = sum_k 2^k * (sum_{b: bit k} S_b).

    Each inner sum is a masked lane tree-reduction (log B levels of
    full-width adds); the outer combination is a tiny Horner.  O(c log B)
    batched launches instead of a 2^c-step serial scan.
    """
    L = buckets.shape[1]
    W, B = buckets.shape[-2], buckets.shape[-1]
    inf = jnp.asarray(g1.inf)
    bidx = jnp.arange(B, dtype=jnp.uint32)

    bit_sums = []
    for k in range(c):
        mask = ((bidx >> k) & 1) == 1  # (B,)
        masked = g1.select(
            jnp.broadcast_to(mask, (W, B)).reshape(-1),
            buckets.reshape(3, L, W * B),
            jnp.broadcast_to(inf, (3, L, W * B)),
        ).reshape(3, L, W, B)
        # tree-reduce over the bucket axis (lanes)
        x = masked.reshape(3, L, W * B)
        n = B
        while n > 1:
            half = n // 2
            x4 = x.reshape(3, L, W, n)
            x = g1.add(
                x4[..., :half].reshape(3, L, W * half),
                x4[..., half : 2 * half].reshape(3, L, W * half),
            )
            n = half
        bit_sums.append(x.reshape(3, L, W))  # (3, L, W)

    # Horner over bits, high to low: acc = 2*acc + T_k
    acc = bit_sums[-1]
    for k in range(c - 2, -1, -1):
        acc = g1.add(g1.double(acc), bit_sums[k])
    return acc


# ---------------------------------------------------------------------------
# GLV: k = k2 * lam + k1 by exact device divmod (BLS12: lam = x^2 - 1, so
# the plain quotient/remainder split is balanced at ~sqrt(r) with NO signs)
# ---------------------------------------------------------------------------


class GlvCtx:
    """Device GLV split for BLS12 G1 (endomorphism phi(P) = (beta x, y)).

    The reference reaches gnark's GLV ScalarMultiplication through
    bls12381/bls12-381.go:238-247; here the split halves the Pippenger
    window count (16 -> 8 at c=16) for doubled points.  BLS12 only: with
    lam = x^2 - 1 and r = x^4 - x^2 + 1, k = k2*lam + k1 gives
    0 <= k1 < lam < 2^128 and 0 <= k2 <= x^2 < 2^128 — balanced without
    lattice rounding or signed halves.
    """

    def __init__(self, g1: G1Ctx):
        from ..curves.params import Family
        from ..host.engine import get_engine

        spec = g1.spec
        if spec.family != Family.BLS12:
            raise ValueError("device GLV split: BLS12 curves only")
        lam = (spec.x * spec.x - 1) % spec.r
        assert (lam * lam + lam + 1) % spec.r == 0, "lam is not a cube root"
        # match the beta with [lam]P == (beta x, y) on the generator
        eng = get_engine(spec)
        gx, gy = spec.g1_gen
        want = eng.g1.mul(spec.g1_gen, lam)
        beta = None
        p = spec.p
        for cand in self._cube_roots(p):
            if (gx * cand % p, gy) == want:
                beta = cand
                break
        assert beta is not None, "no beta matches the lam eigenvalue"
        self.lam, self.beta = lam, beta
        self.g1 = g1
        self.nbits = 128
        self.SL = self.nbits // LIMB_BITS  # 8 sub-scalar limbs
        S = g1.fr.L
        # Barrett: mu = floor(2^(16*S) / lam) (k < 2^(16*S) gives
        # q_hat in {q-1, q}); quotient q <= x^2 < 2^128
        self.shift_limbs = S
        mu = (1 << (LIMB_BITS * self.shift_limbs)) // lam
        self.mu = np.array(
            [(mu >> (LIMB_BITS * k)) & 0xFFFF for k in range(-(-mu.bit_length() // LIMB_BITS))],
            dtype=np.uint32,
        )[:, None]
        self.lam_limbs = np.array(
            [(lam >> (LIMB_BITS * k)) & 0xFFFF for k in range(self.SL)],
            dtype=np.uint32,
        )[:, None]
        self.beta_mont = g1.fp.encode(beta)

    @staticmethod
    def _cube_roots(m: int) -> list:
        # roots of z^2 + z + 1 mod m: (-1 +- sqrt(-3)) / 2
        s = pow(m - 3, (m + 1) // 4, m) if m % 4 == 3 else None
        if s is None or s * s % m != m - 3:
            # generic Tonelli-Shanks via host engine helpers
            from ..host.native import _sqrt_mod

            s = _sqrt_mod(m - 3, m)
        if s is None:
            return []
        inv2 = pow(2, -1, m)
        return [((-1 + s) * inv2) % m, ((-1 - s) * inv2) % m]

    # ------------------------------------------------------------- helpers --
    @staticmethod
    def _sub_limbs(a: Array, b: Array, n: int) -> Array:
        """a - b on (n, N) canonical 16-bit limbs, assuming a >= b."""
        out = []
        borrow = jnp.zeros_like(a[0])
        for k in range(n):
            bk = b[k] if k < b.shape[0] else jnp.zeros_like(a[0])
            v = a[k] + jnp.uint32(0x10000) - bk - borrow
            out.append(v & jnp.uint32(0xFFFF))
            borrow = jnp.uint32(1) - (v >> 16)
        return jnp.stack(out, axis=0)

    @staticmethod
    def _geq(a: Array, b_limbs: np.ndarray, n: int) -> Array:
        """a >= b (b a constant limb column), lexicographic from the top."""
        ge = jnp.ones(a.shape[1:], dtype=bool)
        decided = jnp.zeros_like(ge)
        for k in range(n - 1, -1, -1):
            bv = jnp.uint32(int(b_limbs[k, 0]) if k < b_limbs.shape[0] else 0)
            ne = a[k] != bv
            ge = jnp.where(jnp.logical_and(~decided, ne), a[k] > bv, ge)
            decided = jnp.logical_or(decided, ne)
        return ge

    def split(self, scalars: Array):
        """(S, N) canonical limbs of k in [0, r) -> (k1, k2), each
        (SL, N) with k = k2*lam + k1 exactly and both < 2^128."""
        from .field import _conv

        S = self.g1.fr.L
        N = scalars.shape[-1]
        mu = jnp.asarray(self.mu)
        lam = jnp.asarray(self.lam_limbs)
        # q_hat = floor(k * mu / 2^(16*shift)) (within 2 of the true q)
        prod = _conv(scalars, mu)  # (S + len(mu), N) redundant limbs
        from .field import _normalize

        prod = _normalize(prod)
        q = prod[self.shift_limbs : self.shift_limbs + self.SL]
        # rem = k - q*lam (fits S limbs; non-negative by Barrett bound)
        ql = _normalize(_conv(q, lam))[:S]
        rem = self._sub_limbs(scalars, ql, S)
        # at most two corrections: rem >= lam -> rem -= lam, q += 1
        for _ in range(2):
            fix = self._geq(rem, self.lam_limbs, S)
            rem_f = self._sub_limbs(rem, jnp.asarray(self.lam_limbs), S)
            rem = jnp.where(fix[None, :], rem_f, rem)
            carry = fix.astype(jnp.uint32)
            qf = []
            for k in range(self.SL):
                v = q[k] + carry
                qf.append(v & jnp.uint32(0xFFFF))
                carry = v >> 16
            q = jnp.stack(qf, axis=0)
        return rem[: self.SL], q

    def endo_points(self, points: Array) -> Array:
        """phi(P): scale the X coordinate by beta — exact on affine
        (beta x, y) and projective (beta X : Y : Z) stacks alike."""
        fp = self.g1.fp
        X = fp.mont_mul(points[..., 0, :, :], jnp.asarray(self.beta_mont))
        return jnp.concatenate(
            [X[..., None, :, :], points[..., 1:, :, :]], axis=-3
        )


_GLV_CACHE: dict = {}


def get_glv_ctx(g1: G1Ctx) -> GlvCtx:
    ctx = _GLV_CACHE.get(g1.spec.name)
    if ctx is None:
        ctx = GlvCtx(g1)
        _GLV_CACHE[g1.spec.name] = ctx
    return ctx


def n_windows(
    g1: G1Ctx, c: int, signed: bool = False, nbits: Optional[int] = None
) -> int:
    """Static window count of the bucket table (incl. the signed-carry
    window when r fills the top window exactly, e.g. FP256BN's 256-bit r)."""
    nbits = nbits or g1.nbits
    nwin = -(-nbits // c)
    if signed and nbits >= c * nwin:
        nwin += 1
    return nwin


def bucket_table(
    g1: G1Ctx,
    points: Array,
    scalars: Array,
    c: int,
    signed: bool = False,
    K: int = 64,
    capture: str = "auto",
    _limit: Optional[int] = None,
    nbits: Optional[int] = None,
) -> Array:
    """Stage 1 of Pippenger: per-window bucket sums.

    (3, L, nwin, 2^c) unsigned (bucket = digit), or (3, L, nwin, 2^(c-1))
    signed (bucket b = magnitude b+1; see _signed_digits).  Public seam so
    multi-chip MSM (parallel/msm.py) can shard the O(N) bucket
    accumulation over points and reduce bucket *tables* over ICI.

    Points may be projective (3, L, N) — complete-add combiner, infinity
    absorbing — or affine rows (2, L, N) from an affine source (e.g. the
    API bridge): the scan then uses the cheaper RCB mixed add; affine
    callers must zero the scalars of any infinity inputs themselves.
    (Converting projective inputs to affine inside the MSM was measured a
    net LOSS at 2^20 on v5e: the point-row gather is per-row bound and
    width-flat from 64 to 128 words, so shrinking rows 72 -> 48 saves no
    gather time — 48-word rows are in fact 4.3x slower — while the batch
    inversion costs real time.)
    """
    assert LIMB_BITS % c == 0
    nbits = nbits or g1.nbits
    nwin = -(-nbits // c)
    N = points.shape[-1]
    nwin_eff = n_windows(g1, c, signed=signed, nbits=nbits)
    NP = N + ((-N) % K)  # _bucket_table pads to a K multiple
    limit = _DENSE_CAPTURE_LIMIT if _limit is None else _limit
    if (
        capture == "auto"
        and N % 2 == 0
        and NP * nwin_eff * 3 * g1.fp.L * 4 >= limit
    ):
        # Bucket tables are pointwise-addable: split the points in half so
        # each half's dense-capture buffer fits, then add the two tables.
        # Keeps the scatter-free capture path at any N.  Once a split
        # happens, recurse with HALF the budget: the leaf ys buffers are
        # 128-lane padded (~1.8x), and smaller leaves keep XLA's peak
        # liveness under HBM (2^20 leaves OOMed a 2^22 MSM by 750 MB).
        h = N // 2
        half_limit = _DENSE_CAPTURE_LIMIT // 2
        t0 = bucket_table(
            g1, points[..., :h], scalars[..., :h], c, signed, K, capture,
            _limit=half_limit, nbits=nbits,
        )
        t1 = bucket_table(
            g1, points[..., h:], scalars[..., h:], c, signed, K, capture,
            _limit=half_limit, nbits=nbits,
        )
        W, B = t0.shape[-2], t0.shape[-1]
        L = t0.shape[1]
        return g1.add(
            t0.reshape(3, L, W * B), t1.reshape(3, L, W * B)
        ).reshape(3, L, W, B)
    if signed:
        absd, neg = _signed_digits(scalars, c, nwin, nbits=nbits)
        return _bucket_table(g1, points, absd, c, K=K, neg=neg, capture=capture)
    digits = _digits(scalars, c, nwin)  # (nwin, N)
    return _bucket_table(g1, points, digits, c, K=K, capture=capture)


def window_totals(
    g1: G1Ctx, buckets: Array, c: int, signed: bool = False
) -> Array:
    """Stage 2: weighted bucket sums per window, (3, L, nwin).

    Unsigned: sum_b b * S_b over B = 2^c.  Signed: bucket b holds the
    magnitude-(b+1) sum, so the total is sum_b (b+1) S_b =
    (sum_b b S_b) + (sum_b S_b) — the weighted sum over HALF the buckets
    plus one plain tree reduction.
    """
    if not signed:
        return _weighted_bucket_sum(g1, buckets, c)
    L = buckets.shape[1]
    W, B = buckets.shape[-2], buckets.shape[-1]
    assert B == 1 << (c - 1)
    weighted = _weighted_bucket_sum(g1, buckets, c - 1)
    plain = _tree_reduce_last(g1, buckets.reshape(3, L, W * B), B)
    return g1.add(weighted, plain)


def horner_windows(g1: G1Ctx, totals: Array, c: int) -> Array:
    """Stage 3: Horner recombination over windows -> one (3, L, 1) point."""

    def horner(acc, t_w):
        for _ in range(c):
            acc = g1.double(acc)
        return g1.add(acc, t_w[..., None]), None

    rev = jnp.moveaxis(jnp.flip(totals, axis=-1), -1, 0)  # (nwin, 3, L)
    acc, _ = jax.lax.scan(horner, rev[0][..., None], rev[1:])
    return acc  # (3, L, 1)


def msm(
    g1: G1Ctx,
    points: Array,
    scalars: Array,
    c: int = 8,
    win_chunk: Optional[int] = None,  # kept for API compat; unused
    signed: bool = False,
    K: int = 64,
    capture: str = "auto",
    glv: bool = False,
) -> Array:
    """Pippenger MSM: sum_i [scalars_i] points_i.

    points: (3, L, N) projective; scalars: (S, N) plain 16-bit limbs.
    ``c`` must divide 16.  Returns a single (3, L, 1) point.

    ``signed`` uses balanced digits — half the buckets for one masked
    point negation per scan step (gnark's MultiExp trick).  Measured on
    v5e at 2^20/c=16 the XLA-land negation costs more than the halved
    tail saves (688K vs 917K pts/s), so unsigned is the single-chip
    default; the sharded bucket strategy still uses signed digits, where
    halving the butterfly all-reduce payload is the point.  ``K`` is the
    streaming-scan chunk count knob (scan steps; lanes/step = W*N/K).
    """
    del win_chunk
    if glv:
        # GLV split (BLS12): 2N points with 128-bit sub-scalars — half the
        # windows; the O(N) scan work is unchanged, the O(W*2^c) tail and
        # the capture footprint halve.
        gl = get_glv_ctx(g1)
        if points.shape[-3] == 3:
            # [k]inf = inf: zero the scalar so both GLV halves vanish
            # (phi of the (0:1:0) infinity stays absorbing regardless)
            inf = g1.is_inf(points)
            scalars = jnp.where(inf[None, :], jnp.uint32(0), scalars)
        k1, k2 = gl.split(scalars)
        pts2 = jnp.concatenate([points, gl.endo_points(points)], axis=-1)
        scs2 = jnp.concatenate([k1, k2], axis=-1)
        buckets = bucket_table(
            g1, pts2, scs2, c, signed=signed, K=K, capture=capture,
            nbits=gl.nbits,
        )
    else:
        buckets = bucket_table(
            g1, points, scalars, c, signed=signed, K=K, capture=capture
        )
    totals = window_totals(g1, buckets, c, signed=signed)  # (3, L, nwin)
    return horner_windows(g1, totals, c)


def msm_totals(
    g1: G1Ctx,
    points: Array,
    scalars: Array,
    c: int = 8,
    signed: bool = False,
    K: int = 64,
    capture: str = "auto",
    glv: bool = False,
) -> Array:
    """The traced part of the host-Horner MSM split: per-window totals
    (3, L, nwin).  Identical staging to ``msm`` minus the final Horner.

    The device Horner is ~26 ms at c=16 (measured round 5): 16 windows x
    16 doublings + an add, all at 1/1024-lane occupancy — pure serial
    latency.  The host C++ engine runs the same 256 point ops in <1 ms,
    and the (3, L, W) totals fetch rides the result round trip the
    caller already pays.  Finish with ``horner_host``."""
    if glv:
        gl = get_glv_ctx(g1)
        if points.shape[-3] == 3:
            inf = g1.is_inf(points)
            scalars = jnp.where(inf[None, :], jnp.uint32(0), scalars)
        k1, k2 = gl.split(scalars)
        pts2 = jnp.concatenate([points, gl.endo_points(points)], axis=-1)
        scs2 = jnp.concatenate([k1, k2], axis=-1)
        buckets = bucket_table(
            g1, pts2, scs2, c, signed=signed, K=K, capture=capture,
            nbits=gl.nbits,
        )
    else:
        buckets = bucket_table(
            g1, points, scalars, c, signed=signed, K=K, capture=capture
        )
    return window_totals(g1, buckets, c, signed=signed)


def horner_host(g1: G1Ctx, totals, c: int) -> Optional[tuple]:
    """Host-side Horner over fetched window totals: (3, L, W) projective
    -> affine host point (None = infinity).  ~W*(c+1) Jacobian ops on
    the C++ engine vs ~26 ms of 1-lane device latency (measured r5)."""
    from ..host.engine import get_engine

    eng = get_engine(g1.spec)
    tot = np.asarray(totals)
    pts = g1.decode_points(tot)  # W affine host points, high window last
    acc = None
    for P in reversed(pts):  # windows stored low-to-high; Horner high->low
        if acc is not None:
            acc = eng.g1.mul(acc, 1 << c)
        if acc is None:
            acc = P
        elif P is not None:
            acc = eng.g1.add(acc, P)
    return acc


def msm_naive(g1: G1Ctx, points: Array, scalars: Array) -> Array:
    """Oracle: batched scalar-mul then tree reduction (math_test.go:323-346)."""
    return g1.sum_reduce(g1.scalar_mul(points, scalars))


# ---------------------------------------------------------------------------
# host bridge — the Curve.MultiScalarMul device dispatch (math.go:957-969)
# ---------------------------------------------------------------------------

_BRIDGE_CACHE: dict = {}


def auto_window(n: int, nbits: int = 255) -> int:
    """Window size c from the MSM size (gnark's MultiExp auto-sizing seam,
    driver/gurvy/bn254.go:239-242, translated to the TPU cost model).

    c must divide 16 (LIMB_BITS).  Bucket-phase work is ~n*ceil(nbits/c)
    point adds; the tail (weighted bucket sums) is ~2*(nbits/c)*2^c adds.
    Minimizing the sum over c in {4, 8, 16} gives thresholds validated by
    the measured c-sweep in BENCH_NOTES.md (c=16 ~45% faster at 2^20).
    """
    best, best_cost = 4, float("inf")
    for c in (4, 8, 16):
        w = -(-nbits // c)
        cost = n * w + 2 * w * (1 << c)
        if cost < best_cost:
            best, best_cost = c, cost
    return best


def auto_glv(spec, n: int) -> bool:
    """Enable the GLV split automatically in the tail-dominated regime.

    Measured on v5e (BENCH_NOTES.md): +44% at 2^16 (the O(W·2^c) tail
    dominates, and GLV halves W), -6% at 2^20 (the O(N·W) scan is
    GLV-invariant and the split overhead loses), HBM-OOM at 2^22.  The
    crossover sits near 2^17; BLS12 curves only (the endomorphism)."""
    from ..curves.params import Family

    return spec.family == Family.BLS12 and n <= (1 << 17)


def _bridge_fn(spec_name: str, g1: G1Ctx, n_pad: int, c: int, glv: bool):
    # the combiner-strategy env knob is baked in at trace time, so it is
    # part of the cache key (tools/profile_stacked.py A/Bs it in-process)
    from .kernels.g1_pallas import _stacked_env

    key = (spec_name, n_pad, c, glv, _stacked_env())
    fn = _BRIDGE_CACHE.get(key)
    if fn is None:
        fn = jax.jit(lambda p, s: msm(g1, p, s, c=c, glv=glv))
        _BRIDGE_CACHE[key] = fn
    return fn


def msm_host_bridge(spec, points, scalars):
    """Host-level MSM: list of affine points + int scalars -> affine point.

    Encodes to the (3, L, N) device layout, pads N up to a power of two
    (infinity points with zero scalars are absorbing), runs the jitted
    Pippenger program with the auto-sized window, and decodes.  Backs
    ``Curve.MultiScalarMul`` for n >= 64 (reference seam:
    driver/gurvy/bls12381/bls12-381.go:766-783).
    """
    from .g1 import get_g1_ctx

    g1 = get_g1_ctx(spec)
    n = len(points)
    n_pad = 1 << max(6, (n - 1).bit_length())
    pts_l = list(points) + [None] * (n_pad - n)
    # affine inputs ride the mixed-add scan (one fewer mul per combine);
    # infinity entries get their scalars zeroed ([k]inf = inf)
    scs_l = [
        0 if P is None else int(s)
        for P, s in zip(pts_l, list(scalars) + [0] * (n_pad - n))
    ]
    pts = g1.encode_points_affine(pts_l)
    scs = g1.encode_scalars(scs_l)
    c = auto_window(n_pad, g1.nbits)
    out = _bridge_fn(spec.name, g1, n_pad, c, auto_glv(spec, n_pad))(pts, scs)
    return g1.decode_point(np.asarray(out))
