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
        # borrow-absorbing limbs of (2p + R) for subtraction
        off = [((2 * p) >> (LIMB_BITS * k)) & LIMB_MASK for k in range(L)]
        self.sub_offset = tuple(
            off[k] + LIMB_MASK + (1 if k == 0 else 0) for k in range(L)
        )

    # ------------------------------------------------------------------ mul
    def mul(self, a: Rows, b: Rows) -> Rows:
        """Montgomery product, non-interleaved REDC; [0,2p) in/out."""
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
        m_acc = [zero] * L
        for i in range(L):
            t1 = T[i] & LIMB_MASK
            t2 = (T[i] >> LIMB_BITS) & LIMB_MASK
            for j in range(L - i):
                npj = np.uint32(self.np_limbs[j])
                p1 = t1 * npj
                m_acc[i + j] = m_acc[i + j] + (p1 & LIMB_MASK)
                if i + j + 1 < L:
                    p2 = t2 * npj
                    m_acc[i + j + 1] = (
                        m_acc[i + j + 1] + (p1 >> LIMB_BITS) + (p2 & LIMB_MASK)
                    )
                    if i + j + 2 < L:
                        m_acc[i + j + 2] = m_acc[i + j + 2] + (p2 >> LIMB_BITS)
        m = []
        carry = zero
        for k in range(L):
            v = m_acc[k] + carry
            m.append(v & LIMB_MASK)
            carry = v >> LIMB_BITS
        for i in range(L):
            mi = m[i]  # already masked
            for j in range(L):
                pj = np.uint32(self.p_limbs[j])
                prod = mi * pj
                T[i + j] = T[i + j] + (prod & LIMB_MASK)
                T[i + j + 1] = T[i + j + 1] + (prod >> LIMB_BITS)
        carry = zero
        for k in range(L):
            carry = (T[k] + carry) >> LIMB_BITS
        out = []
        for k in range(L):
            v = T[L + k] + carry
            out.append(v & LIMB_MASK)
            carry = v >> LIMB_BITS
        return out

    def sqr(self, a: Rows) -> Rows:
        return self.mul(a, a)

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
