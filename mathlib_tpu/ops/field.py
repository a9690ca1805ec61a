"""Batched prime-field arithmetic over limb arrays — the TPU compute core.

Every field element is a ``(..., L)`` uint32 array of 16-bit limbs
(little-endian), kept in Montgomery form with ``R = 2**(16*L)``.  All
operations are pure jnp functions of static shape: they vectorize over
arbitrary leading batch dimensions on the VPU (8x128 lanes) and contain no
data-dependent control flow, so they trace once under ``jit`` and shard
transparently under ``shard_map``.

Why 16-bit limbs in uint32: a 16x16 product fits uint32 exactly, and the
lo/hi halves of each product are < 2**16, so an accumulator position never
exceeds ~2**23 before a carry sweep (see the audit in ``mont_mul``).  This
replaces the 64-bit ADX/BMI2 Montgomery assembly the reference reaches via
go:linkname (driver/kilic/custom_amd64.go:26-30) and the generic CIOS spec
(driver/kilic/custom_generic.go:57-175) with lane-parallel arithmetic — the
TPU has no 64-bit scalar multiplier, but it has thousands of 32-bit lanes.
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


class FpCtx:
    """All batched mod-p arithmetic for one prime ``p``.

    Constants live as numpy arrays; under ``jit`` they fold into the
    compiled executable, so a single traced function serves any batch shape.
    """

    def __init__(self, p: int, name: str = "fp"):
        self.p = p
        self.name = name
        self.nbits = p.bit_length()
        self.L = -(-self.nbits // LIMB_BITS)
        L = self.L
        self.R = 1 << (LIMB_BITS * L)
        assert p % 2 == 1 and p < self.R
        self.p_limbs = int_to_limbs(p, L)
        # n0inv = -p^{-1} mod 2^16 (the CIOS "m'": custom_generic.go:56)
        self.n0inv = np.uint32((-pow(p, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS))
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
    def _carry_sweep(self, t: Array) -> Array:
        """Propagate carries so every position is a canonical 16-bit limb.

        Input positions may hold values up to ~2**23; output has the same
        length with a fully-propagated final limb (caller must ensure the
        true value fits).
        """
        K = t.shape[-1]
        out = []
        c = jnp.zeros_like(t[..., 0])
        for k in range(K):
            v = t[..., k] + c
            out.append(v & LIMB_MASK)
            c = v >> LIMB_BITS
        return jnp.stack(out, axis=-1)

    def _sub_limbs(self, a: Array, b: Array):
        """(a - b) limbwise; returns (diff, borrow) with borrow in {0,1}."""
        L = a.shape[-1]
        diff = []
        borrow = jnp.zeros_like(a[..., 0])
        for k in range(L):
            v = a[..., k] + jnp.uint32(1 << LIMB_BITS) - b[..., k] - borrow
            diff.append(v & LIMB_MASK)
            borrow = jnp.uint32(1) - (v >> LIMB_BITS)
        return jnp.stack(diff, axis=-1), borrow

    def _cond_sub_p(self, r: Array, extra_bit: Optional[Array] = None) -> Array:
        """r - p if r >= p (r < 2p; ``extra_bit`` is r's 2^(16L) bit)."""
        p = jnp.asarray(self.p_limbs)
        diff, borrow = self._sub_limbs(r, jnp.broadcast_to(p, r.shape))
        ge = borrow == 0
        if extra_bit is not None:
            ge = jnp.logical_or(ge, extra_bit > 0)
        return jnp.where(ge[..., None], diff, r)

    # ------------------------------------------------------------- arith ----
    def add(self, a: Array, b: Array) -> Array:
        t = a + b  # limbwise, values < 2**17
        r = self._carry_sweep(
            jnp.concatenate([t, jnp.zeros_like(t[..., :1])], axis=-1)
        )
        return self._cond_sub_p(r[..., : self.L], extra_bit=r[..., self.L])

    def sub(self, a: Array, b: Array) -> Array:
        d, borrow = self._sub_limbs(a, b)
        # if borrowed, add p back
        t = d + jnp.where(
            (borrow > 0)[..., None], jnp.asarray(self.p_limbs), jnp.uint32(0)
        )
        return self._carry_sweep(
            jnp.concatenate([t, jnp.zeros_like(t[..., :1])], axis=-1)
        )[..., : self.L]

    def neg(self, a: Array) -> Array:
        """-a mod p (maps 0 -> 0)."""
        d, _ = self._sub_limbs(jnp.broadcast_to(jnp.asarray(self.p_limbs), a.shape), a)
        return jnp.where(self.is_zero(a)[..., None], a, d)

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
        """Montgomery product a*b*R^{-1} mod p.

        Full schoolbook product with lo/hi split accumulation, then REDC.
        Accumulator audit: position k gets <= L lo-terms + L hi-terms from the
        product phase (< 2**21.6) plus <= 2 terms per REDC iteration
        (< 2**22.6 total) plus pushed carries (< 2**8) — all well under 2**32.
        """
        L = self.L
        a, b = jnp.broadcast_arrays(a, b)
        shape = a.shape[:-1]
        t = jnp.zeros(shape + (2 * L + 1,), dtype=jnp.uint32)
        for i in range(L):
            prod = a[..., i : i + 1] * b  # (..., L) exact u32
            t = t.at[..., i : i + L].add(prod & LIMB_MASK)
            t = t.at[..., i + 1 : i + 1 + L].add(prod >> LIMB_BITS)
        p = jnp.asarray(self.p_limbs)
        for i in range(L):
            m = (t[..., i] * self.n0inv) & LIMB_MASK
            prod = m[..., None] * p
            t = t.at[..., i : i + L].add(prod & LIMB_MASK)
            t = t.at[..., i + 1 : i + 1 + L].add(prod >> LIMB_BITS)
            # position i is now ≡ 0 mod 2^16; push its carry up and retire it
            t = t.at[..., i + 1].add(t[..., i] >> LIMB_BITS)
        r = self._carry_sweep(t[..., L:])  # (..., L+1)
        return self._cond_sub_p(r[..., :L], extra_bit=r[..., L])

    def sqr(self, a: Array) -> Array:
        return self.mont_mul(a, a)

    def to_mont(self, a_std: Array) -> Array:
        return self.mont_mul(a_std, jnp.asarray(self.r2_limbs))

    def from_mont(self, a: Array) -> Array:
        one = jnp.zeros_like(a).at[..., 0].set(1)
        return self.mont_mul(a, one)

    # --------------------------------------------------------- predicates ---
    def is_zero(self, a: Array) -> Array:
        return jnp.all(a == 0, axis=-1)

    def eq(self, a: Array, b: Array) -> Array:
        return jnp.all(a == b, axis=-1)

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
