"""Batched prime-field arithmetic over limb arrays — the TPU compute core.

Every field element is a ``(..., L)`` uint32 array of canonical 16-bit limbs
(little-endian), kept in Montgomery form with ``R = 2**(16*L)``.  All
operations are pure jnp functions of static shape: they vectorize over
arbitrary leading batch dimensions on the VPU (8x128 lanes) and contain no
data-dependent control flow, so they trace once under ``jit`` and shard
transparently under ``shard_map``.

Design notes (chosen for XLA op-count and TPU lane parallelism):

* **16-bit limbs in uint32** — a 16x16 product fits uint32 exactly and the
  lo/hi split keeps every accumulator below 2**23.  L is padded so that
  ``R >= 4p`` (one extra limb for FP256BN), which gives the headroom the
  bound analyses below rely on.
* **Limb convolution via a pad/reshape skew** — the schoolbook product is a
  polynomial convolution; instead of L sequential slice-updates we build the
  full (L, L) product matrix in one vector op and reduce its anti-diagonals
  by shearing rows with a pad+reshape (``_skew_sum``), one reduction.
* **Non-interleaved Montgomery (REDC)** — instead of the sequential per-limb
  ``m_i`` recurrence of CIOS (the algorithm the reference spells out at
  driver/kilic/custom_generic.go:57-175), we compute the full
  ``m = (T mod R) * N' mod R`` with N' = -p^{-1} mod R as one more
  convolution, then ``(T + m*p) / R``.  Every step is lane-parallel.
* **Carry-lookahead normalization** — redundant limbs (< 2**23) are made
  canonical with one shift-carry pass plus a generate/propagate
  ``associative_scan`` (log-depth), not an L-step ripple.

This replaces the 64-bit ADX/BMI2 Montgomery assembly the reference reaches
via go:linkname (driver/kilic/custom_amd64.go:26-30): the TPU has no 64-bit
scalar multiplier, but it has thousands of 32-bit lanes.
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


def _normalize(t: Array) -> Array:
    """Redundant limbs -> canonical 16-bit digits of the same integer.

    ``t`` is ``(..., K)`` uint32 with every position < 2**31 and total value
    < 2**(16K) (so the top position generates no immediate carry).  One
    shift-carry pass leaves values < 2**17 whose residual carries are 0/1;
    those are resolved with a generate/propagate carry-lookahead scan
    (log-depth instead of a K-step ripple).
    """
    c = t >> LIMB_BITS
    pad = [(0, 0)] * (t.ndim - 1) + [(1, 0)]
    v = (t & LIMB_MASK) + jnp.pad(c[..., :-1], pad)
    g = v >> LIMB_BITS  # generate: carry out even with no carry in (0/1)
    p = ((v & LIMB_MASK) == LIMB_MASK).astype(jnp.uint32)  # propagate

    def combine(a, b):
        ga, pa = a
        gb, pb = b
        return (gb | (pb & ga), pa & pb)

    cg, _ = jax.lax.associative_scan(combine, (g, p), axis=-1)
    cin = jnp.pad(cg[..., :-1], pad)
    return (v + cin) & LIMB_MASK


def _skew_sum(M: Array) -> Array:
    """Anti-diagonal sums of ``M`` (..., A, B): out[k] = sum_i M[i, k-i].

    Implemented by shearing: pad rows to width A+B, flatten, truncate and
    reshape so row i lands shifted right by i, then one reduction.
    """
    A, B = M.shape[-2], M.shape[-1]
    batch = M.shape[:-2]
    W = A + B
    pad = [(0, 0)] * (M.ndim - 2) + [(0, 0), (0, A)]
    Mp = jnp.pad(M, pad).reshape(batch + (A * W,))
    Ms = Mp[..., : A * (W - 1)].reshape(batch + (A, W - 1))
    return Ms.sum(axis=-2)


def _conv(a: Array, b: Array) -> Array:
    """Limb convolution (= big-int product) of canonical limb arrays.

    a: (..., A), b: (..., B), both with 16-bit limbs; returns (..., A+B)
    redundant limbs, each < 2**17 * min(A, B) < 2**22 for A,B <= 32.
    """
    prod = a[..., :, None] * b[..., None, :]  # exact in uint32
    lo = _skew_sum(prod & LIMB_MASK)  # (..., A+B-1)
    hi = _skew_sum(prod >> LIMB_BITS)
    pad0 = [(0, 0)] * (lo.ndim - 1)
    return jnp.pad(lo, pad0 + [(0, 1)]) + jnp.pad(hi, pad0 + [(1, 0)])


class FpCtx:
    """All batched mod-p arithmetic for one prime ``p``.

    Constants live as numpy arrays; under ``jit`` they fold into the
    compiled executable, so a single traced function serves any batch shape.
    """

    def __init__(self, p: int, name: str = "fp"):
        self.p = p
        self.name = name
        self.nbits = p.bit_length()
        # pad so R >= 4p: headroom for the lazy [0, 2p) value domain below
        self.L = -(-(self.nbits + 2) // LIMB_BITS)
        L = self.L
        self.R = 1 << (LIMB_BITS * L)
        assert p % 2 == 1 and 4 * p <= self.R
        self.p_limbs = int_to_limbs(p, L)
        # N' = -p^{-1} mod R (full-width Montgomery constant)
        self.nprime_limbs = int_to_limbs((-pow(p, -1, self.R)) % self.R, L)
        # R - p / R - 2p, canonical: used for the conditional subtractions
        self.r_minus_p = int_to_limbs(self.R - p, L)
        self.r_minus_2p = int_to_limbs(self.R - 2 * p, L)
        self.p2_limbs = int_to_limbs(2 * p, L)
        # borrow-absorbing representation of 2p + R: every limb >= 2^16 - 1,
        # so a + X - b never underflows limbwise (see ``sub``)
        self.sub_offset = self.p2_limbs.astype(np.uint32) + np.uint32(LIMB_MASK)
        self.sub_offset[0] += 1
        self.r_mod_p = self.R % p
        self.r2 = (self.R * self.R) % p
        self.r2_limbs = int_to_limbs(self.r2, L)
        self.one_mont = int_to_limbs(self.r_mod_p, L)  # 1 in Montgomery form
        self.zero = np.zeros(L, dtype=np.uint32)
        self._inv_bits = bits_of(p - 2, self.nbits)
        # sqrt exponent for p % 4 == 3 (BLS12-381/BN254/FP256BN); BLS12-377
        # has p % 4 == 1 and uses host-side Tonelli-Shanks for decompression.
        self.sqrt_bits = (
            bits_of((p + 1) // 4, self.nbits) if p % 4 == 3 else None
        )

    # ------------------------------------------------------------ host <-> --
    def encode(self, x: Union[int, Sequence[int], np.ndarray]) -> np.ndarray:
        """Host int(s) -> Montgomery limb array ``(..., L)``."""
        if isinstance(x, (int, np.integer)):
            return int_to_limbs((int(x) % self.p) * self.R % self.p, self.L)
        xs = np.asarray(x, dtype=object)
        out = np.empty(xs.shape + (self.L,), dtype=np.uint32)
        for idx in np.ndindex(xs.shape):
            out[idx] = int_to_limbs((int(xs[idx]) % self.p) * self.R % self.p, self.L)
        return out

    def decode(self, a) -> Union[int, np.ndarray]:
        """Montgomery limb array -> host int(s)."""
        arr = np.asarray(a)
        rinv = pow(self.R, -1, self.p)
        if arr.ndim == 1:
            return limbs_to_int(arr) * rinv % self.p
        out = np.empty(arr.shape[:-1], dtype=object)
        for idx in np.ndindex(arr.shape[:-1]):
            out[idx] = limbs_to_int(arr[idx]) * rinv % self.p
        return out

    # ------------------------------------------------------------- helpers --
    #
    # Value domain: every device element is held with canonical 16-bit limbs
    # but a *lazily reduced* value in [0, 2p) ("relaxed form").  With
    # R >= 4p this domain is closed under mont_mul with NO trailing
    # conditional subtraction (bound: (2p)(2p)/R + p < 2p), and add/sub need
    # only a single cond-sub against 2p.  Full canonicalization to [0, p)
    # happens only at host boundaries (``canon``/``decode``) and inside
    # exact predicates.
    def _cond_sub_p(self, r: Array) -> Array:
        """r - p if r >= p, for canonical-limb r with value < 2p."""
        pad = [(0, 0)] * (r.ndim - 1) + [(0, 1)]
        w = _normalize(jnp.pad(r + jnp.asarray(self.r_minus_p), pad))
        ge = w[..., self.L] > 0  # r + (R - p) overflowed R  <=>  r >= p
        return jnp.where(ge[..., None], w[..., : self.L], r)

    def _cond_sub_2p(self, r: Array) -> Array:
        """r - 2p if r >= 2p, for canonical-limb r with value < 4p <= R."""
        pad = [(0, 0)] * (r.ndim - 1) + [(0, 1)]
        w = _normalize(jnp.pad(r + jnp.asarray(self.r_minus_2p), pad))
        ge = w[..., self.L] > 0
        return jnp.where(ge[..., None], w[..., : self.L], r)

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
        pad = [(0, 0)] * (t.ndim - 1) + [(0, 1)]
        w = _normalize(jnp.pad(t, pad))  # value in (R, R + 4p), top digit 1
        return self._cond_sub_2p(w[..., : self.L])

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

        T = a*b; m = (T mod R) * N' mod R; out = (T + m*p)/R.
        Inputs < 2p each give T < 4p^2, so out < 4p^2/R + p < 2p (R >= 4p):
        the [0, 2p) domain is closed with no conditional subtraction.
        The division by R is exact: after normalization the low L digits of
        T + m*p are zero by construction, and the carry into digit L is
        handled by the same carry-lookahead pass.
        """
        L = self.L
        T = _conv(a, b)  # (..., 2L), limbs < 2**22, value < 4p^2
        Tlo = T[..., :L]
        t1, t2 = Tlo & LIMB_MASK, Tlo >> LIMB_BITS  # t2 < 2**6
        np_ = jnp.asarray(self.nprime_limbs)
        pad0 = [(0, 0)] * (t1.ndim - 1)
        m_r = _conv(t1, np_)[..., :L] + jnp.pad(
            _conv(t2, np_)[..., : L - 1], pad0 + [(1, 0)]
        )
        m = _normalize(m_r)  # canonical mod R (top carries drop R-multiples)
        MP = _conv(m, jnp.asarray(self.p_limbs))  # (..., 2L)
        S = jnp.pad(T, pad0 + [(0, 1)]) + jnp.pad(MP, pad0 + [(0, 1)])
        digits = _normalize(S)  # low L digits are zero
        return digits[..., L : 2 * L]  # value < 2p

    def sqr(self, a: Array) -> Array:
        return self.mont_mul(a, a)

    def to_mont(self, a_std: Array) -> Array:
        return self.mont_mul(a_std, jnp.asarray(self.r2_limbs))

    def from_mont(self, a: Array) -> Array:
        one = jnp.zeros_like(a).at[..., 0].set(1)
        return self.mont_mul(a, one)

    # --------------------------------------------------------- predicates ---
    def is_zero(self, a: Array) -> Array:
        """a ≡ 0 (mod p); relaxed values are 0 mod p iff they are 0 or p."""
        return jnp.logical_or(
            jnp.all(a == 0, axis=-1),
            jnp.all(a == jnp.asarray(self.p_limbs), axis=-1),
        )

    def eq(self, a: Array, b: Array) -> Array:
        """a ≡ b (mod p) for relaxed values."""
        return self.is_zero(self.sub(a, b))

    def select(self, mask: Array, a: Array, b: Array) -> Array:
        """mask ? a : b, mask shaped (...,)."""
        return jnp.where(mask[..., None], a, b)

    # ------------------------------------------------------ exponentiation --
    def pow_bits(self, a: Array, bits: np.ndarray) -> Array:
        """a**e where ``bits`` is the little-endian bit array of e (static).

        Runs as a ``lax.scan`` over bit index so the compiled graph stays
        small (one square + one masked multiply per step).
        """
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

    def sqrt(self, a: Array) -> Array:
        """a^{(p+1)/4} for p ≡ 3 (mod 4); caller must verify the square."""
        assert self.sqrt_bits is not None, "p % 4 != 3: use host Tonelli-Shanks"
        return self.pow_bits(a, self.sqrt_bits)


@lru_cache(maxsize=None)
def get_fp_ctx(p: int, name: str = "fp") -> FpCtx:
    return FpCtx(p, name)
