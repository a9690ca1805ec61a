"""Batched prime-field arithmetic over limb arrays — the TPU compute core.

Layout: a batch of field elements is a ``(..., L, B)`` uint32 array — L
16-bit limbs (little-endian) on the SUBLANE axis, the element batch B on
the LANE axis.  This matches the TPU register model: every limb operation
(carry shifts, convolution shears, digit scans) moves data along sublanes
while the 128-wide lane dimension stays dense with independent elements.
(The transposed layout, limbs-minor, wastes 81% of each vector register
for L=24 and turns every carry into a cross-lane shuffle — measured ~50x
slower on v5e.)

Values are kept in Montgomery form with ``R = 2**(16*L)`` and are *lazily
reduced*: canonical 16-bit limbs, value in [0, 2p).  With R >= 4p this
domain is closed under mont_mul with no trailing conditional subtraction,
and add/sub need one cond-sub against 2p.  Full canonicalization happens
only at host boundaries and inside exact predicates.

All operations are pure jnp functions of static shape: they vectorize over
leading batch dims and the lane axis, contain no data-dependent control
flow, trace once under ``jit``, and shard transparently under
``shard_map``.  Design notes:

* **Limb convolution via a pad/reshape skew** (``_skew_sum``) — the
  schoolbook product's anti-diagonal reduction as one shear + one sum.
* **Non-interleaved Montgomery (REDC)** — full ``m = (T mod R) * N' mod R``
  with N' = -p^{-1} mod R as one more convolution, then ``(T + m*p)/R``;
  no sequential per-limb recurrence (cf. the CIOS loop the reference
  spells out at driver/kilic/custom_generic.go:57-175, and the ADX/BMI2
  assembly it linknames at driver/kilic/custom_amd64.go:26-30).
* **Carry-lookahead normalization** — redundant limbs are made canonical
  with one shift-carry pass plus a generate/propagate ``associative_scan``
  (log-depth) along sublanes.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1

Array = jax.Array


def _pallas_enabled() -> bool:
    """Use the Mosaic kernel path?  Decided at trace time (static)."""
    import os

    if os.environ.get("MATHLIB_TPU_NO_PALLAS"):
        return False
    return jax.default_backend() == "tpu"


def int_to_limbs(x: int, L: int) -> np.ndarray:
    assert 0 <= x < (1 << (LIMB_BITS * L)), "value does not fit in L limbs"
    return np.array(
        [(x >> (LIMB_BITS * k)) & LIMB_MASK for k in range(L)], dtype=np.uint32
    )


def limbs_to_int(a) -> int:
    a = np.asarray(a)
    return sum(int(v) << (LIMB_BITS * k) for k, v in enumerate(a))


def bits_of(e: int, n: Optional[int] = None) -> np.ndarray:
    """Little-endian bit array of ``e`` (length ``n`` or minimal)."""
    if n is None:
        n = max(1, e.bit_length())
    assert e >= 0 and e < (1 << n)
    return np.array([(e >> i) & 1 for i in range(n)], dtype=np.uint32)


def _pad_limb(t: Array, lo: int, hi: int) -> Array:
    """Pad the limb (sublane, -2) axis."""
    return jnp.pad(t, [(0, 0)] * (t.ndim - 2) + [(lo, hi), (0, 0)])


def _normalize(t: Array) -> Array:
    """Redundant limbs -> canonical 16-bit digits of the same integer.

    ``t`` is ``(..., K, B)`` uint32 with every position < 2**31 and total
    value < 2**(16K) (so the top position generates no immediate carry).
    One shift-carry pass leaves values < 2**17 whose residual carries are
    0/1; those are resolved with a generate/propagate carry-lookahead scan
    (log-depth along sublanes instead of a K-step ripple).
    """
    c = t >> LIMB_BITS
    v = (t & LIMB_MASK) + _pad_limb(c[..., :-1, :], 1, 0)
    g = v >> LIMB_BITS  # generate: carry out even with no carry in (0/1)
    p = ((v & LIMB_MASK) == LIMB_MASK).astype(jnp.uint32)  # propagate

    def combine(a, b):
        ga, pa = a
        gb, pb = b
        return (gb | (pb & ga), pa & pb)

    cg, _ = jax.lax.associative_scan(combine, (g, p), axis=-2)
    cin = _pad_limb(cg[..., :-1, :], 1, 0)
    return (v + cin) & LIMB_MASK


def _skew_sum(M: Array) -> Array:
    """Anti-diagonal sums of ``M`` (..., A, W, B): out[k] = sum_i M[i, k-i].

    Implemented by shearing: pad rows to width A+W, flatten the (A, W)
    axes, truncate and reshape so row i lands shifted right by i, then one
    reduction.  The lane axis B rides along untouched.
    """
    A, W, B = M.shape[-3], M.shape[-2], M.shape[-1]
    batch = M.shape[:-3]
    Mp = jnp.pad(M, [(0, 0)] * (M.ndim - 3) + [(0, 0), (0, A), (0, 0)])
    Mp = Mp.reshape(batch + (A * (W + A), B))
    Ms = Mp[..., : A * (W + A - 1), :].reshape(batch + (A, W + A - 1, B))
    return Ms.sum(axis=-3)


def _conv(a: Array, b: Array) -> Array:
    """Limb convolution (= big-int product) of canonical limb arrays.

    a: (..., A, B), b: (..., A2, B) with 16-bit limbs; returns
    (..., A+A2, B) redundant limbs, each < 2**17 * min(A, A2) < 2**22.
    """
    prod = a[..., :, None, :] * b[..., None, :, :]  # exact in uint32
    lo = _skew_sum(prod & LIMB_MASK)  # (..., A+A2-1, B)
    hi = _skew_sum(prod >> LIMB_BITS)
    return _pad_limb(lo, 0, 1) + _pad_limb(hi, 1, 0)


class FpCtx:
    """All batched mod-p arithmetic for one prime ``p``.

    Constants live as numpy arrays of shape (L, 1) (broadcast over lanes);
    under ``jit`` they fold into the compiled executable.
    """

    def __init__(self, p: int, name: str = "fp"):
        self.p = p
        self.name = name
        self.nbits = p.bit_length()
        # pad so R >= 4p: headroom for the lazy [0, 2p) value domain
        self.L = -(-(self.nbits + 2) // LIMB_BITS)
        L = self.L
        self.R = 1 << (LIMB_BITS * L)
        assert p % 2 == 1 and 4 * p <= self.R

        def col(x: int) -> np.ndarray:
            return int_to_limbs(x, L)[:, None]  # (L, 1)

        self.p_limbs = col(p)
        # N' = -p^{-1} mod R (full-width Montgomery constant)
        self.nprime_limbs = col((-pow(p, -1, self.R)) % self.R)
        self.r_minus_p = col(self.R - p)
        self.r_minus_2p = col(self.R - 2 * p)
        # borrow-absorbing representation of 2p + R: every limb >= 2^16 - 1,
        # so a + X - b never underflows limbwise (see ``sub``)
        self.sub_offset = col(2 * p) + np.uint32(LIMB_MASK)
        self.sub_offset[0] += 1
        self.r_mod_p = self.R % p
        self.r2 = (self.R * self.R) % p
        self.r2_limbs = col(self.r2)
        self.one_mont = col(self.r_mod_p)  # 1 in Montgomery form
        self.zero = np.zeros((L, 1), dtype=np.uint32)
        self._inv_bits = bits_of(p - 2, self.nbits)
        # sqrt exponent for p % 4 == 3 (BLS12-381/BN254/FP256BN); BLS12-377
        # has p % 4 == 1 and uses host-side Tonelli-Shanks for decompression.
        self.sqrt_bits = (
            bits_of((p + 1) // 4, self.nbits) if p % 4 == 3 else None
        )

    # ------------------------------------------------------------ host <-> --
    def encode(self, x: Union[int, Sequence[int], np.ndarray]) -> np.ndarray:
        """Host int(s) -> Montgomery limb array.

        A scalar encodes to (L, 1); an array of shape S encodes to
        S[:-1] + (L, S[-1]) — the trailing input axis becomes the lane axis.
        """
        if isinstance(x, (int, np.integer)):
            return int_to_limbs((int(x) % self.p) * self.R % self.p, self.L)[:, None]
        xs = np.asarray(x, dtype=object)
        assert xs.ndim >= 1
        out = np.empty(xs.shape[:-1] + (self.L, xs.shape[-1]), dtype=np.uint32)
        for idx in np.ndindex(xs.shape):
            v = (int(xs[idx]) % self.p) * self.R % self.p
            out[idx[:-1] + (slice(None), idx[-1])] = int_to_limbs(v, self.L)
        return out

    def encode_plain(self, xs, wide: bool = True) -> np.ndarray:
        """Host ints -> PLAIN (non-Montgomery) limb array, vectorized.

        One C-speed ``to_bytes`` pass per element instead of ``encode``'s
        per-limb Python loop (~10 us/element: the Montgomery mulmod plus
        24 bigint shifts dominated the pairing check's wall time at 1024
        pairs).  Pair with the device ``to_mont`` so the Montgomery entry
        runs in-graph.  List of N ints -> (L, N).

        ``wide=False`` keeps the array uint16 — HALF the host->device
        bytes on the wire (the tunnel moves ~95 MB/s, so a 1024-pair
        check's packed transfer drops ~3 ms); widen on device with
        ``.astype(jnp.uint32)`` before ``to_mont``."""
        vals = [int(x) % self.p for x in xs]
        buf = b"".join(v.to_bytes(2 * self.L, "little") for v in vals)
        out = (
            np.frombuffer(buf, dtype="<u2")  # explicit LE (host-endian safe)
            .reshape(len(vals), self.L)
            .T
        )
        return out.astype(np.uint32) if wide else np.ascontiguousarray(out)

    def decode(self, a) -> np.ndarray:
        """Montgomery limb array (..., L, B) -> host ints (..., B)."""
        arr = np.asarray(a)
        rinv = pow(self.R, -1, self.p)
        out = np.empty(arr.shape[:-2] + (arr.shape[-1],), dtype=object)
        for idx in np.ndindex(out.shape):
            limbs = arr[idx[:-1] + (slice(None), idx[-1])]
            out[idx] = limbs_to_int(limbs) * rinv % self.p
        return out

    def decode1(self, a) -> int:
        """Decode a single element of shape (L,) or (L, 1)."""
        arr = np.asarray(a)
        if arr.ndim == 2:
            arr = arr[:, 0]
        return limbs_to_int(arr) * pow(self.R, -1, self.p) % self.p

    # ------------------------------------------------------------- helpers --
    def _cond_sub_p(self, r: Array) -> Array:
        """r - p if r >= p, for canonical-limb r with value < 2p."""
        w = _normalize(_pad_limb(r + jnp.asarray(self.r_minus_p), 0, 1))
        ge = w[..., self.L, :] > 0  # r + (R - p) overflowed R  <=>  r >= p
        return jnp.where(ge[..., None, :], w[..., : self.L, :], r)

    def _cond_sub_2p(self, r: Array) -> Array:
        """r - 2p if r >= 2p, for canonical-limb r with value < 4p <= R."""
        w = _normalize(_pad_limb(r + jnp.asarray(self.r_minus_2p), 0, 1))
        ge = w[..., self.L, :] > 0
        return jnp.where(ge[..., None, :], w[..., : self.L, :], r)

    def canon(self, a: Array) -> Array:
        """Relaxed [0, 2p) -> canonical [0, p)."""
        return self._cond_sub_p(a)

    # ------------------------------------------------------------- arith ----
    def add(self, a: Array, b: Array) -> Array:
        return self._cond_sub_2p(_normalize(a + b))  # a + b < 4p <= R

    def sub(self, a: Array, b: Array) -> Array:
        # a - b + (2p + R), with the offset represented borrow-absorbingly so
        # no limb underflows; the guaranteed top digit (= R) is dropped.
        t = a + jnp.asarray(self.sub_offset) - b
        w = _normalize(_pad_limb(t, 0, 1))  # value in (R, R + 4p), top digit 1
        return self._cond_sub_2p(w[..., : self.L, :])

    def neg(self, a: Array) -> Array:
        return self.sub(jnp.zeros_like(a), a)

    def mul_int(self, a: Array, n: int) -> Array:
        """a * n for small host integer n (double-and-add chain)."""
        n = n % self.p
        if n == 0:
            return jnp.zeros_like(a)
        if n > self.p - n:  # cheaper as -(p-n)
            return self.neg(self.mul_int(a, self.p - n))
        bits = bin(n)[2:]
        acc = a
        for bit in bits[1:]:
            acc = self.add(acc, acc)
            if bit == "1":
                acc = self.add(acc, a)
        return acc

    def mont_mul(self, a: Array, b: Array) -> Array:
        """Montgomery product a*b*R^{-1} mod p, relaxed in / relaxed out.

        On TPU this dispatches to the Pallas kernel (kernels/fp_pallas.py),
        which keeps the whole product + REDC in VMEM with native 16x16
        multiplies (~100x the XLA path).  The XLA composition below is the
        portable reference path (CPU tests, any backend without Mosaic).

        T = a*b; m = (T mod R) * N' mod R; out = (T + m*p)/R.
        Inputs < 2p each give T < 4p^2, so out < 4p^2/R + p < 2p (R >= 4p):
        the [0, 2p) domain is closed with no conditional subtraction.
        The division by R is exact: after normalization the low L digits of
        T + m*p are zero by construction, and the carry into digit L is
        handled by the same carry-lookahead pass.
        """
        if _pallas_enabled():
            from .kernels.fp_pallas import mont_mul_pallas

            return mont_mul_pallas(self.p, self.L, a, b)
        L = self.L
        T = _conv(a, b)  # (..., 2L, B), limbs < 2**22, value < 4p^2
        Tlo = T[..., :L, :]
        t1, t2 = Tlo & LIMB_MASK, Tlo >> LIMB_BITS  # t2 < 2**6
        np_ = jnp.asarray(self.nprime_limbs)
        m_r = _conv(t1, np_)[..., :L, :] + _pad_limb(
            _conv(t2, np_)[..., : L - 1, :], 1, 0
        )
        m = _normalize(m_r)  # canonical mod R (top carries drop R-multiples)
        MP = _conv(m, jnp.asarray(self.p_limbs))  # (..., 2L, B)
        S = _pad_limb(T, 0, 1) + _pad_limb(MP, 0, 1)
        digits = _normalize(S)  # low L digits are zero
        return digits[..., L : 2 * L, :]  # value < 2p

    def sqr(self, a: Array) -> Array:
        return self.mont_mul(a, a)

    def to_mont(self, a_std: Array) -> Array:
        return self.mont_mul(a_std, jnp.asarray(self.r2_limbs))

    def from_mont(self, a: Array) -> Array:
        one = jnp.zeros_like(a).at[..., 0, :].set(1)
        return self.mont_mul(a, one)

    # --------------------------------------------------------- predicates ---
    def is_zero(self, a: Array) -> Array:
        """a ≡ 0 (mod p) -> (..., B); relaxed values are 0 mod p iff 0 or p."""
        return jnp.logical_or(
            jnp.all(a == 0, axis=-2),
            jnp.all(a == jnp.asarray(self.p_limbs), axis=-2),
        )

    def eq(self, a: Array, b: Array) -> Array:
        """a ≡ b (mod p) for relaxed values."""
        return self.is_zero(self.sub(a, b))

    def select(self, mask: Array, a: Array, b: Array) -> Array:
        """mask ? a : b, mask shaped (..., B)."""
        return jnp.where(mask[..., None, :], a, b)

    # ------------------------------------------------------ exponentiation --
    def pow_bits(self, a: Array, bits: np.ndarray) -> Array:
        """a**e where ``bits`` is the little-endian bit array of e (static).

        On TPU the whole chain runs as ONE Mosaic kernel (the acc stays in
        VMEM across bits — kernels/pairing_pallas.py fp_pow_pallas);
        otherwise a ``lax.scan`` over bit index keeps the graph small.
        """
        if _pallas_enabled():
            from .kernels.pairing_pallas import fp_pow_pallas

            return fp_pow_pallas(self.p, self.L, a, bits[::-1].copy())
        one = jnp.broadcast_to(jnp.asarray(self.one_mont), a.shape)
        bits_arr = jnp.asarray(bits[::-1].copy())  # MSB first

        def body(acc, bit):
            acc = self.sqr(acc)
            hit = self.mont_mul(acc, a)
            acc = jnp.where(jnp.bool_(bit), hit, acc)
            return acc, None

        out, _ = jax.lax.scan(body, one, bits_arr)
        return out

    def inv(self, a: Array) -> Array:
        """a^{p-2} (maps 0 -> 0), cf. linknamed `inverse` in the reference
        (driver/kilic/custom.go:113-123)."""
        return self.pow_bits(a, self._inv_bits)

    def batch_inv(self, a: Array) -> Array:
        """Elementwise inverse along the lane axis via a parallel product
        tree (Montgomery's trick, log-depth): ~3N muls + ONE pow chain,
        instead of N pow chains.  Zeros map to zero.  (..., L, N) in/out."""
        N = a.shape[-1]
        if N == 1:
            return self.inv(a)
        zero_mask = self.is_zero(a)
        one = jnp.broadcast_to(jnp.asarray(self.one_mont), a.shape)
        cur = self.select(~zero_mask, a, one)
        P2 = 1 << (N - 1).bit_length()
        if P2 != N:
            pad = jnp.broadcast_to(
                jnp.asarray(self.one_mont), a.shape[:-1] + (P2 - N,)
            )
            cur = jnp.concatenate([cur, pad], axis=-1)
        # up-sweep: pairwise products, stopping at a lane cutoff — each
        # tree level is a separate (relayout-heavy) device op, so taking
        # the tree all the way to 1 lane costs ~40 latency-bound levels at
        # 2^20; one 2048-lane pow chain (a single fused kernel launch on
        # TPU) replaces the last 11 up + 11 down levels
        cutoff = 2048
        levels = [cur]
        while levels[-1].shape[-1] > min(cutoff, P2):
            c = levels[-1]
            levels.append(self.mont_mul(c[..., 0::2], c[..., 1::2]))
        inv = self.inv(levels[-1])  # (..., L, <=cutoff)
        # down-sweep: child_inv = parent_inv * sibling
        for c in reversed(levels[:-1]):
            m = c.shape[-1]
            sw = jnp.flip(
                c.reshape(c.shape[:-1] + (m // 2, 2)), axis=-1
            ).reshape(c.shape)
            inv = self.mont_mul(jnp.repeat(inv, 2, axis=-1), sw)
        inv = inv[..., :N]
        return self.select(~zero_mask, inv, jnp.zeros_like(a))

    def sqrt(self, a: Array) -> Array:
        """a^{(p+1)/4} for p ≡ 3 (mod 4); caller must verify the square."""
        assert self.sqrt_bits is not None, "p % 4 != 3: use host Tonelli-Shanks"
        return self.pow_bits(a, self.sqrt_bits)


@lru_cache(maxsize=None)
def get_fp_ctx(p: int, name: str = "fp") -> FpCtx:
    return FpCtx(p, name)
