"""In-kernel field arithmetic on limb rows (shared by the Pallas kernels).

A field element inside a kernel is a Python list of L uint32 arrays (rows),
each row one limb broadcast over a (TS, 128) tile.  All helpers are pure
trace-time functions: loops unroll into straight-line vector code; ripple
carries are fine here because rows live in vector registers, not HBM.

Every multiply is annotated so operands are provably < 2^16 and products
lower to native 16x16->32 VPU multiplies (a 32x32 multiply is emulated and
~40x slower on v5e).

Value domain matches ops/field.py: canonical 16-bit limbs, values lazily
reduced into [0, 2p) with R >= 4p.
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1

Rows = List  # list of (TS, 128) uint32 arrays


class RowCtx:
    """Per-prime constants for in-kernel row arithmetic."""

    def __init__(self, p: int, L: int):
        self.p = p
        self.L = L
        R = 1 << (LIMB_BITS * L)
        assert 4 * p <= R
        self.R = R
        nprime = (-pow(p, -1, R)) % R
        self.np_limbs = tuple((nprime >> (LIMB_BITS * k)) & LIMB_MASK for k in range(L))
        self.p_limbs = tuple((p >> (LIMB_BITS * k)) & LIMB_MASK for k in range(L))
        self.r_minus_2p = tuple(
            ((R - 2 * p) >> (LIMB_BITS * k)) & LIMB_MASK for k in range(L)
        )
        self.r_minus_p = tuple(
            ((R - p) >> (LIMB_BITS * k)) & LIMB_MASK for k in range(L)
        )
        # borrow-absorbing limbs of (2p + R) for subtraction
        off = [((2 * p) >> (LIMB_BITS * k)) & LIMB_MASK for k in range(L)]
        self.sub_offset = tuple(
            off[k] + LIMB_MASK + (1 if k == 0 else 0) for k in range(L)
        )

    # ------------------------------------------------------------------ mul
    def mul(self, a: Rows, b: Rows) -> Rows:
        """Montgomery product, interleaved CIOS REDC; [0,2p) in/out.

        Per limb i: accumulate a_i*b, finalize T[i] mod 2^16 with one
        carry push, derive m_i = T[i] * (-p^-1 mod 2^16) with a SINGLE
        multiply, accumulate m_i*p.  2L^2 + L multiplies total, vs the
        separated form's 2.5L^2 (full m = T*n' mod R triangle).  Each
        accumulator row stays < 4L*2^16 + carries < 2^32.
        """
        L = self.L
        zero = jnp.zeros_like(a[0])
        a = [x & LIMB_MASK for x in a]  # range hint: 16x16 native multiply
        b = [x & LIMB_MASK for x in b]
        np0 = np.uint32(self.np_limbs[0])
        T = [zero] * (2 * L + 1)
        for i in range(L):
            ai = a[i]
            for j in range(L):
                prod = ai * b[j]
                T[i + j] = T[i + j] + (prod & LIMB_MASK)
                T[i + j + 1] = T[i + j + 1] + (prod >> LIMB_BITS)
            # position i is complete (all a_j b_{i-j}, j<=i and m_j p_{i-j},
            # j<i have landed); push its carry so T[i] mod 2^16 is exact
            ti = T[i]
            T[i + 1] = T[i + 1] + (ti >> LIMB_BITS)
            ti = ti & LIMB_MASK
            mi = (ti * np0) & LIMB_MASK
            for j in range(L):
                pj = np.uint32(self.p_limbs[j])
                prod = mi * pj
                if j == 0:
                    # T[i] + mi*p0 == 0 mod 2^16 by construction; only the
                    # high half survives the shift-out
                    T[i + 1] = T[i + 1] + ((ti + (prod & LIMB_MASK)) >> LIMB_BITS)
                    T[i + 1] = T[i + 1] + (prod >> LIMB_BITS)
                else:
                    T[i + j] = T[i + j] + (prod & LIMB_MASK)
                    T[i + j + 1] = T[i + j + 1] + (prod >> LIMB_BITS)
        out = []
        carry = zero
        for k in range(L):
            v = T[L + k] + carry
            out.append(v & LIMB_MASK)
            carry = v >> LIMB_BITS
        return out

    def sqr(self, a: Rows) -> Rows:
        """Montgomery square: schoolbook with the off-diagonal symmetry
        (a_i*a_j computed once, accumulated with a 1-bit shift), then a
        separated REDC pass.  (L^2+L)/2 + L^2 + L native multiplies vs
        mul's 2L^2 + L — ~23% fewer; the pow chains (field inverse/sqrt,
        hash-to-curve, final-exp easy part) are ~2/3 squarings.

        Accumulator bounds: each T position gathers <= L doubled product
        halves (< 2^17) plus L REDC halves (< 2^16) plus pushed carries
        — comfortably < 2^23.  Output < 2p exactly as in ``mul`` (a < 2p
        so a^2 < 4p^2 <= R*p, hence (a^2 + m*p)/R < 2p)."""
        L = self.L
        zero = jnp.zeros_like(a[0])
        a = [x & LIMB_MASK for x in a]  # range hint: 16x16 native multiply
        np0 = np.uint32(self.np_limbs[0])
        T = [zero] * (2 * L + 1)
        for i in range(L):
            ai = a[i]
            prod = ai * ai
            T[2 * i] = T[2 * i] + (prod & LIMB_MASK)
            T[2 * i + 1] = T[2 * i + 1] + (prod >> LIMB_BITS)
            for j in range(i + 1, L):
                prod = ai * a[j]
                T[i + j] = T[i + j] + ((prod & LIMB_MASK) << 1)
                T[i + j + 1] = T[i + j + 1] + ((prod >> LIMB_BITS) << 1)
        for i in range(L):
            ti = T[i]
            T[i + 1] = T[i + 1] + (ti >> LIMB_BITS)
            ti = ti & LIMB_MASK
            mi = (ti * np0) & LIMB_MASK
            for j in range(L):
                pj = np.uint32(self.p_limbs[j])
                prod = mi * pj
                if j == 0:
                    T[i + 1] = T[i + 1] + ((ti + (prod & LIMB_MASK)) >> LIMB_BITS)
                    T[i + 1] = T[i + 1] + (prod >> LIMB_BITS)
                else:
                    T[i + j] = T[i + j] + (prod & LIMB_MASK)
                    T[i + j + 1] = T[i + j + 1] + (prod >> LIMB_BITS)
        out = []
        carry = zero
        for k in range(L):
            v = T[L + k] + carry
            out.append(v & LIMB_MASK)
            carry = v >> LIMB_BITS
        return out

    # -------------------------------------------------- lazy (wide) domain --
    # Unreduced 2L-row values for tower-level lazy reduction: an Fp2
    # Karatsuba multiply runs its 3 schoolbook products WITHOUT REDC,
    # combines them in the 2L-limb product domain, and REDCs only the 2
    # output coefficients — 5L^2 native multiplies instead of 6L^2
    # (plus the matching share of adds).  Soundness bound: REDC(x) is in
    # [0, 2p) for any x < p*R; the pairing tower guarantees x < 8p^2 and
    # gates the lazy path on 8p <= R (RowTower.lazy).

    def mul_wide(self, a: Rows, b: Rows) -> Rows:
        """Plain (non-Montgomery-reduced) product a*b -> exact 16-bit
        2L rows; inputs [0, 2p), output < 4p^2 < 2^(32L)."""
        L = self.L
        zero = jnp.zeros_like(a[0])
        a = [x & LIMB_MASK for x in a]  # range hint: 16x16 native multiply
        b = [x & LIMB_MASK for x in b]
        T = [zero] * (2 * L + 1)
        for i in range(L):
            ai = a[i]
            for j in range(L):
                prod = ai * b[j]
                T[i + j] = T[i + j] + (prod & LIMB_MASK)
                T[i + j + 1] = T[i + j + 1] + (prod >> LIMB_BITS)
        # normalize to exact 16-bit rows (top row T[2L] ripples to zero:
        # the value fits 2L limbs)
        out = []
        carry = zero
        for k in range(2 * L):
            v = T[k] + carry
            out.append(v & LIMB_MASK)
            carry = v >> LIMB_BITS
        return out

    def _wide_ripple_mod(self, t: Rows) -> Rows:
        """Carry-propagate to exact 16-bit rows, value taken mod 2^(32L)
        (the top carry is dropped — callers guarantee the true result is
        in [0, 2^(32L)))."""
        out = []
        carry = jnp.zeros_like(t[0])
        for k in range(len(t)):
            v = t[k] + carry
            out.append(v & LIMB_MASK)
            carry = v >> LIMB_BITS
        return out

    def wide_sub2_exact(self, t2: Rows, t0: Rows, t1: Rows) -> Rows:
        """t2 - t0 - t1 on exact 16-bit 2L rows, KNOWN non-negative
        (the Karatsuba middle term).  Same offset trick as ``sub``:
        per-limb add 2*0xFFFF (+2 at limb 0) so every limb stays
        unsigned, i.e. compute t2 - t0 - t1 + 2*2^(32L); the ripple
        then reduces mod 2^(32L), exact for results in [0, 2^(32L))."""
        t = [
            t2[k]
            + np.uint32(2 * LIMB_MASK + (2 if k == 0 else 0))
            - t0[k]
            - t1[k]
            for k in range(len(t2))
        ]
        return self._wide_ripple_mod(t)

    def wide_sub_const(self, t0: Rows, t1: Rows, off_limbs) -> Rows:
        """t0 - t1 + OFF on exact 16-bit 2L rows (OFF a precomputed
        constant with OFF >= max possible t1 and OFF a multiple of p, so
        the result is non-negative and congruent mod p).  Adds the
        per-limb 0xFFFF (+1 at limb 0) = +2^(32L) offset; the ripple
        drops it mod 2^(32L)."""
        t = [
            t0[k]
            + np.uint32(int(off_limbs[k]) + LIMB_MASK + (1 if k == 0 else 0))
            - t1[k]
            for k in range(len(t0))
        ]
        return self._wide_ripple_mod(t)

    def wide_small(self, t: Rows, n: int) -> Rows:
        """t * n for small n on exact 16-bit wide rows (add chain with a
        ripple per step; caller guarantees n*t < 2^(16*len(t)))."""
        assert 0 < n < 1 << 8
        acc = t
        for bit in bin(n)[3:]:
            acc = self._wide_ripple_mod([x + x for x in acc])
            if bit == "1":
                acc = self._wide_ripple_mod(
                    [x + y for x, y in zip(acc, t)]
                )
        return acc

    def add_nored(self, a: Rows, b: Rows) -> Rows:
        """a + b WITHOUT the conditional 2p subtraction: exact integer
        sum < 4p on canonical 16-bit rows (4p <= R so no top carry).
        The lazy Karatsuba path needs INTEGER identities — a mod-2p
        wrap in the sum term would make t2 - t0 - t1 negative."""
        return self._ripple([a[k] + b[k] for k in range(self.L)])

    def redc(self, T: Rows) -> Rows:
        """Montgomery reduction of an exact 16-bit 2L-row value < p*R:
        out = T * R^-1 mod p in [0, 2p).  Same interleaved structure as
        ``mul``'s REDC half; L^2 + L native multiplies."""
        L = self.L
        np0 = np.uint32(self.np_limbs[0])
        T = list(T) + [jnp.zeros_like(T[0])]
        for i in range(L):
            ti = T[i]
            T[i + 1] = T[i + 1] + (ti >> LIMB_BITS)
            ti = ti & LIMB_MASK
            mi = (ti * np0) & LIMB_MASK
            for j in range(L):
                pj = np.uint32(self.p_limbs[j])
                prod = mi * pj
                if j == 0:
                    T[i + 1] = T[i + 1] + ((ti + (prod & LIMB_MASK)) >> LIMB_BITS)
                    T[i + 1] = T[i + 1] + (prod >> LIMB_BITS)
                else:
                    T[i + j] = T[i + j] + (prod & LIMB_MASK)
                    T[i + j + 1] = T[i + j + 1] + (prod >> LIMB_BITS)
        out = []
        carry = jnp.zeros_like(T[0])
        for k in range(L):
            v = T[L + k] + carry
            out.append(v & LIMB_MASK)
            carry = v >> LIMB_BITS
        return out

    # ------------------------------------------------------------- add/sub --
    def _ripple(self, t: Rows) -> Rows:
        """Full carry propagation to canonical 16-bit rows (drops top carry
        only if the caller guarantees the value fits L limbs)."""
        out = []
        carry = jnp.zeros_like(t[0])
        for k in range(self.L):
            v = t[k] + carry
            out.append(v & LIMB_MASK)
            carry = v >> LIMB_BITS
        return out

    def _cond_sub_2p(self, r: Rows) -> Rows:
        """r - 2p if r >= 2p, via r + (R - 2p) with overflow test."""
        w = []
        carry = jnp.zeros_like(r[0])
        for k in range(self.L):
            v = r[k] + np.uint32(self.r_minus_2p[k]) + carry
            w.append(v & LIMB_MASK)
            carry = v >> LIMB_BITS
        ge = carry > 0  # overflowed R  <=>  r >= 2p
        return [jnp.where(ge, w[k], r[k]) for k in range(self.L)]

    def add(self, a: Rows, b: Rows) -> Rows:
        t = [a[k] + b[k] for k in range(self.L)]  # value < 4p <= R
        return self._cond_sub_2p(self._ripple(t))

    def sub(self, a: Rows, b: Rows) -> Rows:
        # a - b + (2p + R); the guaranteed R-overflow carry is dropped
        t = [
            a[k] + np.uint32(self.sub_offset[k]) - b[k] for k in range(self.L)
        ]
        return self._cond_sub_2p(self._ripple(t))

    def canon(self, r: Rows) -> Rows:
        """Reduce [0, 2p) rows to canonical [0, p): r - p if r >= p, via
        r + (R - p) with overflow test (same trick as _cond_sub_2p)."""
        w = []
        carry = jnp.zeros_like(r[0])
        for k in range(self.L):
            v = r[k] + np.uint32(self.r_minus_p[k]) + carry
            w.append(v & LIMB_MASK)
            carry = v >> LIMB_BITS
        ge = carry > 0  # overflowed R  <=>  r >= p
        return [jnp.where(ge, w[k], r[k]) for k in range(self.L)]

    def mul_small(self, a: Rows, n: int) -> Rows:
        """a * n for small positive n via an add chain."""
        assert 0 < n < 1 << 8
        bits = bin(n)[2:]
        acc = a
        for bit in bits[1:]:
            acc = self.add(acc, acc)
            if bit == "1":
                acc = self.add(acc, a)
        return acc
