"""Fused Pallas kernels for the pairing: Miller loop, add steps, pow chains.

Round 2 ran the pairing as ~1500 small XLA/Pallas launches (one stacked
Montgomery mul per tower op, glue in XLA) and measured 115 pairing
products/s per chip — no better than one CPU core.  These kernels execute
the ENTIRE Miller loop (and the final-exp exponentiation chains) inside
single Mosaic kernels: f and T live in VMEM across all loop iterations,
every tower multiply runs as sublane-stacked straight-line vector code,
and one pairing-product check is a handful of launches instead of ~1500.

Replaces the reference's engine pairing loops (driver/kilic/bls12-381.go:
260-281 Engine.Result, driver/gurvy/bn254.go:247-267 MillerLoop +
FinalExponentiation) with TPU-native fused kernels.

Design:

* In-kernel layout: one field element = L uint32 limb rows of (8, 128) —
  sublanes x lanes = 1024 independent pairs per grid step (the same tile
  contract as g1/g2_pallas).
* **Sublane-stacked multiplies**: all independent base-field muls of one
  algorithm level are concatenated along sublanes and run as ONE
  RowCtx.mul on (8*k, 128) rows (k <= MUL_CHUNK, capped for VMEM).  A
  full Fp12 squaring is 3 stacked muls instead of 36 serial ones; this
  keeps the Mosaic instruction count ~10x smaller than naive unrolling
  and the vector pipelines full.
* The Miller loop is a `fori_loop` over the static bit pattern (SMEM
  input); the sparse add step runs under `pl.when(bit)` — the reference
  curves' loop constants have Hamming weight ~6, so the add branch
  executes ~6 times in 63 iterations instead of being masked every step.
* Doubling/addition steps use incomplete projective formulas that SHARE
  intermediates with the line computation (derived in-line below; the
  line coefficient convention A, D-B, -C matches ops/pairing.py, whose
  docstring derivation is the repo-local spec).  Incomplete is sound in
  a Miller loop: T = [m]Q with 0 < m < r never equals ±Q or infinity for
  subgroup points Q != infinity.
* Line scale freedom: each step's line and T representative are scaled
  by Fp2* factors relative to the XLA path; subfield factors die in the
  final exponentiation, so reduced pairings are bit-identical (tests
  compare post-FExp against the exact host engine).

Tower shape (matches ops/tower.py): Fp2 = Fp[u]/(u^2 - beta) with
beta = -beta_neg; Fp6 = Fp2[v]/(v^3 - xi), xi = xi0 + u; Fp12 = Fp6[w]/
(w^2 - v).  An f2 element in-kernel is a pair of limb-row lists; f6 a
triple of f2; f12 a pair of f6.  Coefficient q of a stacked ref lives at
rows [q*L, (q+1)*L).
"""

from __future__ import annotations

import os
from functools import lru_cache, partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fp_rows import LIMB_BITS, LIMB_MASK, RowCtx

TILE_SUBLANES = 8
TILE = TILE_SUBLANES * 128
# max base-field muls stacked into one RowCtx.mul: bounds the (8*k, 128)
# accumulator rows so the unrolled CIOS fits VMEM alongside f/T state
MUL_CHUNK = 12
# Lazy Fp2 reduction (round 5): ~17% fewer native multiplies per Fp2
# Karatsuba multiply, differentially verified on numpy rows for all four
# curves — but its MOSAIC LOWERING never ran on hardware this round (the
# serving stack's compile endpoint died mid-round), so the default stays
# OFF: the published pairing numbers reproduce bit-for-bit on the eager
# path.  Set MATHLIB_LAZY_F2=1 before import to enable; read ONCE at
# import (process-wide, not a per-trace knob).
_LAZY_F2 = os.environ.get("MATHLIB_LAZY_F2", "0") == "1"
# the Miller/pow kernels keep f (12L rows), T (6L), and a stacked-mul
# accumulator live at once — beyond the 16 MiB default scoped-vmem cap
# (measured 16.64M at L=24); v5e VMEM is far larger, so raise the limit
# the way JAX's own attention kernels do
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


class _BatchOut:
    """MulBatch result: plain stacked-mul outputs via [i] (the existing
    resolver protocol), lazy-f2 outputs via .f2v[k]."""

    def __init__(self, plain: List, f2v: List):
        self.plain = plain
        self.f2v = f2v

    def __getitem__(self, i):
        return self.plain[i]


class MulBatch:
    """Collect independent base-field muls; run them sublane-stacked.

    Two entry points: ``push(a, b)`` queues one Montgomery multiply
    (resolved by index), ``push_f2(a2, b2, off)`` queues a LAZY Fp2
    Karatsuba multiply — its 3 schoolbook products run unreduced and
    stacked, the Karatsuba combination happens in the 2L-limb product
    domain, and only the 2 output coefficients are REDC'd (also
    stacked): 5L^2 native multiplies per Fp2 mul instead of 6L^2
    (gated by RowTower.lazy: needs 8p <= R and beta = -1)."""

    def __init__(self, F: RowCtx):
        self.F = F
        self.pairs: List = []
        self.f2s: List = []

    def push(self, a, b) -> int:
        self.pairs.append((a, b))
        return len(self.pairs) - 1

    def push_f2(self, a2, b2, off, n: int = 1) -> int:
        self.f2s.append((a2, b2, off, n))
        return len(self.f2s) - 1

    @staticmethod
    def _stack1(F, op, items, nrows_in, nrows_out, chunk_cap):
        """Run a unary row op over items, concatenated on sublanes."""
        outs: List = []
        for lo in range(0, len(items), chunk_cap):
            chunk = items[lo : lo + chunk_cap]
            if len(chunk) == 1:
                outs.append(op(chunk[0]))
                continue
            A = [
                jnp.concatenate([t[i] for t in chunk], axis=0)
                for i in range(nrows_in)
            ]
            O = op(A)
            ts = chunk[0][0].shape[0]
            for k in range(len(chunk)):
                outs.append(
                    [O[i][k * ts : (k + 1) * ts] for i in range(nrows_out)]
                )
        return outs

    @staticmethod
    def _stack(F, op, pairs, nrows_out, chunk_cap):
        """Run op (2-arg row fn) over pairs, concatenated on sublanes."""
        L = F.L
        outs: List = []
        for lo in range(0, len(pairs), chunk_cap):
            chunk = pairs[lo : lo + chunk_cap]
            if len(chunk) == 1:
                outs.append(op(chunk[0][0], chunk[0][1]))
                continue
            nin = len(chunk[0][0])
            A = [
                jnp.concatenate([p[0][i] for p in chunk], axis=0)
                for i in range(nin)
            ]
            B = [
                jnp.concatenate([p[1][i] for p in chunk], axis=0)
                for i in range(len(chunk[0][1]))
            ]
            O = op(A, B)
            ts = chunk[0][0][0].shape[0]  # sublanes per operand
            for k in range(len(chunk)):
                outs.append(
                    [O[i][k * ts : (k + 1) * ts] for i in range(nrows_out)]
                )
        return outs

    def run(self) -> "_BatchOut":
        F, L = self.F, self.F.L
        plain = self._stack(F, F.mul, self.pairs, L, MUL_CHUNK)

        f2v: List = []
        if self.f2s:
            # stage 1: all 3k schoolbook products, stacked, unreduced
            prod_pairs = []
            for (a0, a1), (b0, b1), _off, _n in self.f2s:
                prod_pairs.append((a0, b0))
                prod_pairs.append((a1, b1))
                # integer (non-reducing) Karatsuba sums: F.add's
                # conditional -2p would break t2 - t0 - t1 >= 0
                prod_pairs.append((F.add_nored(a0, a1), F.add_nored(b0, b1)))
            wides = self._stack(
                F, F.mul_wide, prod_pairs, 2 * L, max(2, MUL_CHUNK // 2)
            )
            # stage 2: Karatsuba combination in the product domain
            redc_in = []
            for k, (_a2, _b2, off, n) in enumerate(self.f2s):
                t0, t1, t2 = wides[3 * k : 3 * k + 3]
                nt1 = t1 if n == 1 else F.wide_small(t1, n)
                redc_in.append(F.wide_sub_const(t0, nt1, off))
                redc_in.append(F.wide_sub2_exact(t2, t0, t1))
            # stage 3: all 2k REDCs, stacked
            reds = self._stack1(
                F, F.redc, redc_in, 2 * L, L, max(2, MUL_CHUNK // 2)
            )
            f2v = [
                (reds[2 * k], reds[2 * k + 1]) for k in range(len(self.f2s))
            ]
        self.pairs = []
        self.f2s = []
        return _BatchOut(plain, f2v)


class RowTower:
    """Fp2/Fp6/Fp12 arithmetic on limb rows with batched multiplies."""

    def __init__(self, p: int, L: int, beta_neg: int, xi0: int, twist: str):
        self.F = RowCtx(p, L)
        self.L = L
        self.n = beta_neg  # beta = -n, small positive
        self.xi0 = xi0  # xi = xi0 + u
        self.twist = twist
        R = 1 << (LIMB_BITS * L)
        one = R % p
        self.one_limbs = tuple(
            (one >> (LIMB_BITS * k)) & LIMB_MASK for k in range(L)
        )
        # lazy Fp2 reduction (MulBatch.push_f2): sound when the combined
        # product-domain values stay < p*R — c0 = t0 - n*t1 + 4n*p^2 is
        # < 4(1+n)p^2, so the gate is 4(1+n)p <= R (BLS12-381 n=1:
        # R/p ~ 9.8 ok; BLS12-377 n=5: R/p ~ 152 ok; BN254 R/p ~ 5.3
        # stays eager).  _LAZY_F2 is read at import (process-wide; not a
        # trace-time knob, so jit cache keys are unaffected).
        self.lazy = 4 * (1 + beta_neg) * p <= R and _LAZY_F2
        if self.lazy:
            off = 4 * beta_neg * p * p  # >= max n*t1, multiple of p
            self.off_4p2 = tuple(
                (off >> (LIMB_BITS * k)) & LIMB_MASK for k in range(2 * L)
            )

    # ---------------------------------------------------------- fp helpers --
    def zero_rows(self, like):
        return [jnp.zeros_like(like) for _ in range(self.L)]

    def one_rows(self, like):
        return [jnp.full_like(like, v) for v in self.one_limbs]

    def fneg(self, a):
        return self.F.sub(self.zero_rows(a[0]), a)

    # ---------------------------------------------------------------- fp2 ---
    def add(self, a, b):
        F = self.F
        return (F.add(a[0], b[0]), F.add(a[1], b[1]))

    def sub(self, a, b):
        F = self.F
        return (F.sub(a[0], b[0]), F.sub(a[1], b[1]))

    def neg(self, a):
        return (self.fneg(a[0]), self.fneg(a[1]))

    def dbl(self, a):
        return self.add(a, a)

    def small(self, a, k: int):
        F = self.F
        return (F.mul_small(a[0], k), F.mul_small(a[1], k))

    def mul_xi(self, a):
        """a * (xi0 + u): (xi0*a0 - n*a1, xi0*a1 + a0)."""
        F, n, x0 = self.F, self.n, self.xi0
        na1 = a[1] if n == 1 else F.mul_small(a[1], n)
        if x0 == 0:
            return (self.fneg(na1), a[0])
        return (
            F.sub(F.mul_small(a[0], x0), na1),
            F.add(F.mul_small(a[1], x0), a[0]),
        )

    # ---- queued f2 multiplies (resolver style; run via MulBatch) -----------
    def q_mul(self, mb: MulBatch, a, b):
        """Queue a Karatsuba f2 mul; returns resolver(outs) -> f2.

        On lazy towers the whole multiply routes through push_f2 (3
        unreduced schoolbook products + 2 REDCs instead of 3 full
        Montgomery muls — ~17% fewer native multiplies)."""
        F, n = self.F, self.n
        if self.lazy:
            k = mb.push_f2(a, b, self.off_4p2, n)

            def res_lazy(o):
                return o.f2v[k]

            return res_lazy
        i0 = mb.push(a[0], b[0])
        i1 = mb.push(a[1], b[1])
        i2 = mb.push(F.add(a[0], a[1]), F.add(b[0], b[1]))

        def res(o):
            t0, t1, t2 = o[i0], o[i1], o[i2]
            nt1 = t1 if n == 1 else F.mul_small(t1, n)
            return (F.sub(t0, nt1), F.sub(t2, F.add(t0, t1)))

        return res

    def q_sqr(self, mb: MulBatch, a):
        F, n = self.F, self.n
        if n == 1:
            i0 = mb.push(F.add(a[0], a[1]), F.sub(a[0], a[1]))
            i1 = mb.push(a[0], a[1])

            def res(o):
                return (o[i0], F.add(o[i1], o[i1]))

            return res
        i0 = mb.push(a[0], a[0])
        i1 = mb.push(a[1], a[1])
        i2 = mb.push(a[0], a[1])

        def res(o):
            t1 = o[i1] if n == 1 else F.mul_small(o[i1], n)
            return (F.sub(o[i0], t1), F.add(o[i2], o[i2]))

        return res

    def q_mul_fp(self, mb: MulBatch, a, r):
        """f2 x base-field rows."""
        i0 = mb.push(a[0], r)
        i1 = mb.push(a[1], r)

        def res(o):
            return (o[i0], o[i1])

        return res

    # ---------------------------------------------------------------- fp6 ---
    def f6_add(self, a, b):
        return tuple(self.add(x, y) for x, y in zip(a, b))

    def f6_sub(self, a, b):
        return tuple(self.sub(x, y) for x, y in zip(a, b))

    def f6_mul_v(self, a):
        return (self.mul_xi(a[2]), a[0], a[1])

    def q_f6_mul(self, mb: MulBatch, a, b):
        """Karatsuba: 6 independent f2 muls."""
        r0 = self.q_mul(mb, a[0], b[0])
        r1 = self.q_mul(mb, a[1], b[1])
        r2 = self.q_mul(mb, a[2], b[2])
        r12 = self.q_mul(mb, self.add(a[1], a[2]), self.add(b[1], b[2]))
        r01 = self.q_mul(mb, self.add(a[0], a[1]), self.add(b[0], b[1]))
        r02 = self.q_mul(mb, self.add(a[0], a[2]), self.add(b[0], b[2]))

        def res(o):
            t0, t1, t2 = r0(o), r1(o), r2(o)
            m12, m01, m02 = r12(o), r01(o), r02(o)
            c0 = self.add(t0, self.mul_xi(self.sub(self.sub(m12, t1), t2)))
            c1 = self.add(self.sub(self.sub(m01, t0), t1), self.mul_xi(t2))
            c2 = self.add(self.sub(self.sub(m02, t0), t2), t1)
            return (c0, c1, c2)

        return res

    def q_f6_mul01(self, mb: MulBatch, a, b0, b1):
        """a * (b0 + b1 v): 5 f2 muls."""
        r00 = self.q_mul(mb, a[0], b0)
        r11 = self.q_mul(mb, a[1], b1)
        r20 = self.q_mul(mb, a[2], b0)
        r21 = self.q_mul(mb, a[2], b1)
        rx = self.q_mul(mb, self.add(a[0], a[1]), self.add(b0, b1))

        def res(o):
            a0b0, a1b1, a2b0, a2b1, x = r00(o), r11(o), r20(o), r21(o), rx(o)
            c0 = self.add(a0b0, self.mul_xi(a2b1))
            c1 = self.sub(self.sub(x, a0b0), a1b1)
            c2 = self.add(a1b1, a2b0)
            return (c0, c1, c2)

        return res

    # --------------------------------------------------------------- fp12 ---
    def f12_sqr(self, f):
        """Complex squaring over Fp6 (2 f6 muls, one stacked batch)."""
        a0, a1 = f
        mb = MulBatch(self.F)
        rt = self.q_f6_mul(mb, a0, a1)
        rm = self.q_f6_mul(
            mb, self.f6_add(a0, a1), self.f6_add(a0, self.f6_mul_v(a1))
        )
        o = mb.run()
        t, m1 = rt(o), rm(o)
        c0 = self.f6_sub(self.f6_sub(m1, t), self.f6_mul_v(t))
        c1 = self.f6_add(t, t)
        return (c0, c1)

    def f12_cyclo_sqr(self, f):
        """Granger-Scott squaring in the cyclotomic subgroup (eprint
        2010/542, Alg. 5.2): 3 Fp4 squarings = 9 f2 squarings, half the
        mul count of the dense f12_sqr.  Valid only for unitary elements
        (everything after the easy part of the final exponentiation).

        Fp4 pairs over Fp2[w^3]: (a0, b1), (b0, a2), (a1, b2) with
        fp4_sqr(x, y) = (x^2 + xi*y^2, 2xy).
        """
        (a0, a1, a2), (b0, b1, b2) = f
        mb = MulBatch(self.F)
        qs = []
        for x, y in ((a0, b1), (b0, a2), (a1, b2)):
            qs.append(
                (
                    self.q_sqr(mb, x),
                    self.q_sqr(mb, y),
                    self.q_sqr(mb, self.add(x, y)),
                )
            )
        o = mb.run()

        def fp4(q):
            x2, y2, s2 = q[0](o), q[1](o), q[2](o)
            t0 = self.add(x2, self.mul_xi(y2))
            t1 = self.sub(self.sub(s2, x2), y2)  # 2xy
            return t0, t1

        (t00, t01) = fp4(qs[0])
        (t10, t11) = fp4(qs[1])
        (t20, t21) = fp4(qs[2])
        # z' = 2(t - z) + t for the conjugate-negated slots,
        # z' = 2(t + z) + t for the others (Granger-Scott recombination)
        def minus(t, z):
            d = self.sub(t, z)
            return self.add(self.dbl(d), t)

        def plus(t, z):
            d = self.add(t, z)
            return self.add(self.dbl(d), t)

        z0 = minus(t00, a0)
        z1 = plus(t01, b1)
        z4 = minus(t10, a1)
        z5 = plus(t11, b2)
        xt = self.mul_xi(t21)
        z2 = plus(xt, b0)
        z3 = minus(t20, a2)
        return ((z0, z4, z3), (z2, z1, z5))

    def f12_mul(self, f, g):
        """Karatsuba over Fp6 (3 f6 muls, one stacked batch)."""
        a0, a1 = f
        b0, b1 = g
        mb = MulBatch(self.F)
        r0 = self.q_f6_mul(mb, a0, b0)
        r1 = self.q_f6_mul(mb, a1, b1)
        rs = self.q_f6_mul(mb, self.f6_add(a0, a1), self.f6_add(b0, b1))
        o = mb.run()
        t0, t1, ts = r0(o), r1(o), rs(o)
        c0 = self.f6_add(t0, self.f6_mul_v(t1))
        c1 = self.f6_sub(self.f6_sub(ts, t0), t1)
        return (c0, c1)

    # ------------------------------------------- inversion / frobenius ------
    def const_fp(self, like, limbs):
        return [jnp.full_like(like, v) for v in limbs]

    def fp_pow(self, a, bits_ref, nbits: int):
        """a**e over fp rows via fori square-and-select-multiply (bits
        MSB-first in SMEM).  The masked multiply keeps the carry a plain
        value pytree (no scratch ref needed)."""
        F = self.F
        one = self.one_rows(a[0])

        def body(i, acc):
            acc = F.sqr(acc)
            m = F.mul(acc, a)
            bit = bits_ref[i] != 0
            return [jnp.where(bit, m[k], acc[k]) for k in range(self.L)]

        return jax.lax.fori_loop(0, nbits, body, one)

    def f2_inv(self, a, inv_bits_ref, inv_nbits: int):
        """1/a via the norm: (a0 - a1 u) / (a0^2 + n a1^2)."""
        F, n = self.F, self.n
        mb = MulBatch(F)
        r0 = mb.push(a[0], a[0])
        r1 = mb.push(a[1], a[1])
        o = mb.run()
        sq1 = o[r1] if n == 1 else F.mul_small(o[r1], n)
        norm = F.add(o[r0], sq1)
        ninv = self.fp_pow(norm, inv_bits_ref, inv_nbits)
        mb = MulBatch(F)
        m0 = mb.push(a[0], ninv)
        m1 = mb.push(a[1], ninv)
        o = mb.run()
        return (o[m0], self.fneg(o[m1]))

    def f6_inv(self, a, inv_bits_ref, inv_nbits: int):
        a0, a1, a2 = a
        mb = MulBatch(self.F)
        q00 = self.q_sqr(mb, a0)
        q12 = self.q_mul(mb, a1, a2)
        q22 = self.q_sqr(mb, a2)
        q01 = self.q_mul(mb, a0, a1)
        q11 = self.q_sqr(mb, a1)
        q02 = self.q_mul(mb, a0, a2)
        o = mb.run()
        c0 = self.sub(q00(o), self.mul_xi(q12(o)))
        c1 = self.sub(self.mul_xi(q22(o)), q01(o))
        c2 = self.sub(q11(o), q02(o))
        mb = MulBatch(self.F)
        r0 = self.q_mul(mb, a0, c0)
        r1 = self.q_mul(mb, a2, c1)
        r2 = self.q_mul(mb, a1, c2)
        o = mb.run()
        norm = self.add(r0(o), self.mul_xi(self.add(r1(o), r2(o))))
        ninv = self.f2_inv(norm, inv_bits_ref, inv_nbits)
        mb = MulBatch(self.F)
        s0 = self.q_mul(mb, c0, ninv)
        s1 = self.q_mul(mb, c1, ninv)
        s2 = self.q_mul(mb, c2, ninv)
        o = mb.run()
        return (s0(o), s1(o), s2(o))

    def f6_sqr(self, a):
        mb = MulBatch(self.F)
        r = self.q_f6_mul(mb, a, a)
        return r(mb.run())

    def f6_neg(self, a):
        return tuple(self.neg(c) for c in a)

    def f12_conj(self, f):
        return (f[0], self.f6_neg(f[1]))

    def f12_inv(self, f, inv_bits_ref, inv_nbits: int):
        a0, a1 = f
        n6 = self.f6_sub(self.f6_sqr(a0), self.f6_mul_v(self.f6_sqr(a1)))
        ninv = self.f6_inv(n6, inv_bits_ref, inv_nbits)
        mb = MulBatch(self.F)
        r0 = self.q_f6_mul(mb, a0, ninv)
        r1 = self.q_f6_mul(mb, a1, ninv)
        o = mb.run()
        return (r0(o), self.f6_neg(r1(o)))

    def f12_frob(self, f, gammas, n: int):
        """f^(p^n): conjugate coefficients (n odd), scale (j,k) by the
        host-derived gamma constants (Montgomery limb tuples)."""
        mb = MulBatch(self.F)
        res = []
        like = f[0][0][0][0]
        for k in range(2):
            for j in range(3):
                c = f[k][j]
                if n % 2 == 1:
                    c = (c[0], self.fneg(c[1]))
                g0, g1 = gammas[n][j][k]
                gc = (self.const_fp(like, g0), self.const_fp(like, g1))
                res.append(self.q_mul(mb, c, gc))
        o = mb.run()
        vals = [r(o) for r in res]
        return ((vals[0], vals[1], vals[2]), (vals[3], vals[4], vals[5]))

    def f12_sparse_mul(self, f, A, DmB, negC):
        """f * line with the line placed per ops/pairing.py _line_f12:
        M-twist: l0 = A*v^2,  l1 = (D-B) + (-C)*v
        D-twist: l0 = A,      l1 = (-C) + (D-B)*v
        14 (M) / 13 (D) f2 muls via w-Karatsuba, one stacked batch.
        """
        b0, b1 = (DmB, negC) if self.twist == "M" else (negC, DmB)
        a0, a1 = f
        mb = MulBatch(self.F)
        if self.twist == "M":
            # a*.(A v^2) = (xi*(a1 A), xi*(a2 A), a0 A)
            r00 = self.q_mul(mb, a0[0], A)
            r01 = self.q_mul(mb, a0[1], A)
            r02 = self.q_mul(mb, a0[2], A)
            r1 = self.q_f6_mul01(mb, a1, b0, b1)
            rs = self.q_f6_mul(
                mb, self.f6_add(a0, a1), (b0, b1, A)
            )

            def l0_of(p0, p1, p2):
                return (self.mul_xi(p1), self.mul_xi(p2), p0)

            o = mb.run()
            a0l0 = l0_of(r00(o), r01(o), r02(o))
            a1l1 = r1(o)
            cross = rs(o)
            # cross = (a0+a1)(l0+l1); c1 = cross - a0l0 - a1l1
            c0 = self.f6_add(a0l0, self.f6_mul_v(a1l1))
            c1 = self.f6_sub(self.f6_sub(cross, a0l0), a1l1)
            return (c0, c1)
        # D-twist: l0 = (A, 0, 0)
        r00 = self.q_mul(mb, a0[0], A)
        r01 = self.q_mul(mb, a0[1], A)
        r02 = self.q_mul(mb, a0[2], A)
        r1 = self.q_f6_mul01(mb, a1, b0, b1)
        rs = self.q_f6_mul01(
            mb, self.f6_add(a0, a1), self.add(b0, A), b1
        )
        o = mb.run()
        a0l0 = (r00(o), r01(o), r02(o))
        a1l1 = r1(o)
        cross = rs(o)
        c0 = self.f6_add(a0l0, self.f6_mul_v(a1l1))
        c1 = self.f6_sub(self.f6_sub(cross, a0l0), a1l1)
        return (c0, c1)

    # ------------------------------------------------------- miller steps ---
    def dbl_step(self, T, xP, yP):
        """Tangent line at T evaluated at P + incomplete projective double.

        Line convention (ops/pairing.py): A = 2YZ^2*yP, B = 2Y^2*Z,
        C = 3X^2*Z*xP, D = 3X^3; slots (A, D-B, -C).  Double (derived by
        clearing denominators of the affine tangent law; verified
        X'/Z' = lambda^2 - 2x, Y'/Z' = lambda(x - x') - y):
          S = YZ, W = 3X^2, Bd = X*Y^2*Z, H = W^2 - 8Bd
          X' = 2HS, Y' = W(4Bd - H) - 8(Y^2 Z)^2? (= 8 Y^2 S^2), Z' = 8S^3
        sharing S, X^2, YS = Y^2 Z, SZ = YZ^2 with the line.
        """
        X, Y, Z = T
        mb = MulBatch(self.F)
        rS = self.q_mul(mb, Y, Z)
        rX2 = self.q_sqr(mb, X)
        o = mb.run()
        S, X2 = rS(o), rX2(o)
        W = self.small(X2, 3)

        mb = MulBatch(self.F)
        rYS = self.q_mul(mb, Y, S)
        rSZ = self.q_mul(mb, S, Z)
        rS2 = self.q_sqr(mb, S)
        rX3 = self.q_mul(mb, X2, X)
        rX2Z = self.q_mul(mb, X2, Z)
        rW2 = self.q_sqr(mb, W)
        o = mb.run()
        YS, SZ, S2, X3t, X2Z, W2 = (
            rYS(o), rSZ(o), rS2(o), rX3(o), rX2Z(o), rW2(o),
        )

        mb = MulBatch(self.F)
        rBd = self.q_mul(mb, X, YS)
        rYS2 = self.q_sqr(mb, YS)
        rSS2 = self.q_mul(mb, S, S2)
        rA = self.q_mul_fp(mb, self.dbl(SZ), yP)
        rC = self.q_mul_fp(mb, self.small(X2Z, 3), xP)
        o = mb.run()
        Bd, YS2, SS2, A, C = rBd(o), rYS2(o), rSS2(o), rA(o), rC(o)
        H = self.sub(W2, self.small(Bd, 8))

        mb = MulBatch(self.F)
        rHS = self.q_mul(mb, H, S)
        rWt = self.q_mul(mb, W, self.sub(self.small(Bd, 4), H))
        o = mb.run()
        HS, Wt = rHS(o), rWt(o)

        Xn = self.dbl(HS)
        Yn = self.sub(Wt, self.small(YS2, 8))
        Zn = self.small(SS2, 8)

        B = self.dbl(YS)
        D = self.small(X3t, 3)
        DmB = self.sub(D, B)
        negC = self.neg(C)
        return (A, DmB, negC), (Xn, Yn, Zn)

    def add_step(self, T, Qx, Qy, xP, yP):
        """Chord line through T and affine Q evaluated at P + incomplete
        mixed addition (theta = Y - y2 Z, lambda = X - x2 Z; verified
        against the affine chord law by clearing denominators).

        Line convention (ops/pairing.py): A = lambda*yP,
        D-B = theta*x2 - lambda*y2, C = theta*xP; slots (A, D-B, -C).
        """
        X, Y, Z = T
        mb = MulBatch(self.F)
        ry2Z = self.q_mul(mb, Qy, Z)
        rx2Z = self.q_mul(mb, Qx, Z)
        o = mb.run()
        th = self.sub(Y, ry2Z(o))
        lam = self.sub(X, rx2Z(o))

        mb = MulBatch(self.F)
        rl2 = self.q_sqr(mb, lam)
        rth2 = self.q_sqr(mb, th)
        rtx = self.q_mul(mb, th, Qx)
        rly = self.q_mul(mb, lam, Qy)
        rA = self.q_mul_fp(mb, lam, yP)
        rC = self.q_mul_fp(mb, th, xP)
        o = mb.run()
        l2, th2 = rl2(o), rth2(o)
        DmB = self.sub(rtx(o), rly(o))
        A, C = rA(o), rC(o)

        mb = MulBatch(self.F)
        rl3 = self.q_mul(mb, l2, lam)
        rG = self.q_mul(mb, X, l2)
        rZt = self.q_mul(mb, Z, th2)
        o = mb.run()
        l3, G, Zt = rl3(o), rG(o), rZt(o)
        H = self.sub(self.add(l3, Zt), self.dbl(G))

        mb = MulBatch(self.F)
        rXn = self.q_mul(mb, lam, H)
        rYt = self.q_mul(mb, th, self.sub(G, H))
        rYl = self.q_mul(mb, Y, l3)
        rZn = self.q_mul(mb, Z, l3)
        o = mb.run()
        Xn = rXn(o)
        Yn = self.sub(rYt(o), rYl(o))
        Zn = rZn(o)
        return (A, DmB, self.neg(C)), (Xn, Yn, Zn)


# ---------------------------------------------------------------------------
# ref <-> row-structure helpers (coefficient q at rows [q*L, (q+1)*L))
# ---------------------------------------------------------------------------


def _ld(ref, q: int, L: int):
    return [ref[q * L + i] for i in range(L)]


def _st(ref, q: int, L: int, rows):
    for i in range(L):
        ref[q * L + i] = rows[i]


def _ld_f2(ref, k: int, L: int):
    return (_ld(ref, 2 * k, L), _ld(ref, 2 * k + 1, L))


def _st_f2(ref, k: int, L: int, e):
    _st(ref, 2 * k, L, e[0])
    _st(ref, 2 * k + 1, L, e[1])


def _ld_f12(ref, L: int):
    return tuple(
        tuple(_ld_f2(ref, h * 3 + j, L) for j in range(3)) for h in range(2)
    )


def _st_f12(ref, L: int, f):
    for h in range(2):
        for j in range(3):
            _st_f2(ref, h * 3 + j, L, f[h][j])


def _ld_T(ref, L: int):
    return tuple(_ld_f2(ref, c, L) for c in range(3))


def _st_T(ref, L: int, T):
    for c in range(3):
        _st_f2(ref, c, L, T[c])


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _miller_body(tw: RowTower, nbits: int, bits_ref, xP, yP, Qx, Qy, f_ref, t_ref):
    """Shared Miller-loop body: (f_ref, t_ref) <- Miller value and final T."""
    L = tw.L
    one = tw.one_rows(xP[0])
    zero = tw.zero_rows(xP[0])

    # T = (Qx, Qy, 1); f = 1
    _st_f2(t_ref, 0, L, Qx)
    _st_f2(t_ref, 1, L, Qy)
    _st_f2(t_ref, 2, L, (one, zero))
    for k in range(6):
        _st_f2(f_ref, k, L, (one, zero) if k == 0 else (zero, zero))

    def body(i, _):
        T = _ld_T(t_ref, L)
        (A, DmB, negC), T2 = tw.dbl_step(T, xP, yP)
        f = _ld_f12(f_ref, L)
        f = tw.f12_sqr(f)
        f = tw.f12_sparse_mul(f, A, DmB, negC)
        _st_f12(f_ref, L, f)
        _st_T(t_ref, L, T2)

        @pl.when(bits_ref[i] != 0)
        def _():
            T = _ld_T(t_ref, L)
            (A, DmB, negC), Ta = tw.add_step(T, Qx, Qy, xP, yP)
            f = _ld_f12(f_ref, L)
            f = tw.f12_sparse_mul(f, A, DmB, negC)
            _st_f12(f_ref, L, f)
            _st_T(t_ref, L, Ta)

        return 0

    jax.lax.fori_loop(0, nbits, body, 0)


def _miller_kernel(
    tw: RowTower,
    nbits: int,
    bits_ref,
    xp_ref,
    yp_ref,
    qx_ref,
    qy_ref,
    f_ref,
    t_ref,
):
    L = tw.L
    xP = _ld(xp_ref, 0, L)
    yP = _ld(yp_ref, 0, L)
    Qx = _ld_f2(qx_ref, 0, L)
    Qy = _ld_f2(qy_ref, 0, L)
    _miller_body(tw, nbits, bits_ref, xP, yP, Qx, Qy, f_ref, t_ref)


def _add_step_kernel(
    tw: RowTower, f_in, t_in, qx_ref, qy_ref, xp_ref, yp_ref, f_ref, t_ref
):
    """One Miller add step: (f, T) -> (f * l_{T,Q}(P), T + Q).

    Used for the BN Frobenius tail (Q1 = pi(Q), Q2 = -pi^2(Q) chord lines,
    ops/pairing.py miller_loop tail; reference seam bn254.go:247-267).
    """
    L = tw.L
    T = _ld_T(t_in, L)
    Qx = _ld_f2(qx_ref, 0, L)
    Qy = _ld_f2(qy_ref, 0, L)
    xP = _ld(xp_ref, 0, L)
    yP = _ld(yp_ref, 0, L)
    (A, DmB, negC), Ta = tw.add_step(T, Qx, Qy, xP, yP)
    f = _ld_f12(f_in, L)
    f = tw.f12_sparse_mul(f, A, DmB, negC)
    _st_f12(f_ref, L, f)
    _st_T(t_ref, L, Ta)


def _f12_pow_kernel(
    tw: RowTower, nbits: int, cyclo: bool, bits_ref, base_ref, out_ref
):
    """out = base**e, e given MSB-first in bits_ref (static length).

    ``cyclo`` switches the squaring to Granger-Scott cyclotomic form
    (valid for unitary bases — the final-exp hard-part chains)."""
    L = tw.L
    one = tw.one_rows(base_ref[0])
    zero = tw.zero_rows(base_ref[0])
    for k in range(6):
        _st_f2(out_ref, k, L, (one, zero) if k == 0 else (zero, zero))
    sqr = tw.f12_cyclo_sqr if cyclo else tw.f12_sqr

    def body(i, _):
        f = sqr(_ld_f12(out_ref, L))
        _st_f12(out_ref, L, f)

        @pl.when(bits_ref[i] != 0)
        def _():
            f = tw.f12_mul(_ld_f12(out_ref, L), _ld_f12(base_ref, L))
            _st_f12(out_ref, L, f)

        return 0

    jax.lax.fori_loop(0, nbits, body, 0)


def _final_exp_body(
    tw: RowTower,
    gammas,
    inv_nbits: int,
    x_nbits: int,
    x_neg: bool,
    invbits_ref,
    xbits_ref,
    f,
    acc_ref,
    base_ref,
):
    """Final exponentiation (BLS12, factor-3 HHT chain) on a loaded f12
    value; returns the reduced value.  acc/base are VMEM scratch for the
    cyclotomic x-chains."""
    L = tw.L
    # ---- easy part: t = conj(f) * inv(f); f1 = frob^2(t) * t
    fi = tw.f12_inv(f, invbits_ref, inv_nbits)
    t = tw.f12_mul(tw.f12_conj(f), fi)
    f1 = tw.f12_mul(tw.f12_frob(t, gammas, 2), t)

    # ---- hard part: (x-1)^2 (x+p) (x^2+p^2-1) + 3 (factor-3 chain)
    def exp_x(a):
        """a^|x| via the scratch-resident cyclotomic chain; conj if x<0."""
        _st_f12(base_ref, L, a)
        one = tw.one_rows(a[0][0][0][0])
        zero = tw.zero_rows(a[0][0][0][0])
        for k in range(6):
            _st_f2(acc_ref, k, L, (one, zero) if k == 0 else (zero, zero))

        def body(i, _):
            g = tw.f12_cyclo_sqr(_ld_f12(acc_ref, L))
            _st_f12(acc_ref, L, g)

            @pl.when(xbits_ref[i] != 0)
            def _():
                g = tw.f12_mul(_ld_f12(acc_ref, L), _ld_f12(base_ref, L))
                _st_f12(acc_ref, L, g)

            return 0

        jax.lax.fori_loop(0, x_nbits, body, 0)
        r = _ld_f12(acc_ref, L)
        return tw.f12_conj(r) if x_neg else r

    def exp_xm1(a):
        return tw.f12_mul(exp_x(a), tw.f12_conj(a))

    y = exp_xm1(exp_xm1(f1))
    y = tw.f12_mul(exp_x(y), tw.f12_frob(y, gammas, 1))
    y = tw.f12_mul(
        tw.f12_mul(exp_x(exp_x(y)), tw.f12_frob(y, gammas, 2)),
        tw.f12_conj(y),
    )
    f3 = tw.f12_mul(tw.f12_sqr(f1), f1)
    return tw.f12_mul(y, f3)


def _final_exp_kernel(
    tw: RowTower,
    gammas,
    inv_nbits: int,
    x_nbits: int,
    x_neg: bool,
    invbits_ref,
    xbits_ref,
    f_ref,
    out_ref,
    acc_ref,
    base_ref,
):
    """The ENTIRE final exponentiation (BLS12, factor-3 HHT chain,
    ops/tower.py f12_final_exp) in one launch: easy part
    f^((p^6-1)(p^2+1)) with the in-kernel Fp12 inversion, then the hard
    part via 5 cyclotomic x-chains kept in VMEM scratch.

    Replaces ~40 XLA-level tower launches (measured as ~57 ms of fixed
    cost per product check at 64 pairs).  Reference seam:
    FinalExponentiation at bls12381/bls12-381.go:466-468.
    """
    L = tw.L
    f = _ld_f12(f_ref, L)
    out = _final_exp_body(
        tw, gammas, inv_nbits, x_nbits, x_neg, invbits_ref, xbits_ref, f,
        acc_ref, base_ref,
    )
    _st_f12(out_ref, L, out)


def _f12_map_rows(fn, f):
    """Apply fn to every limb row of an f12 structure."""
    return tuple(
        tuple(
            ([fn(r) for r in f[h][j][0]], [fn(r) for r in f[h][j][1]])
            for j in range(3)
        )
        for h in range(2)
    )


def _f12_norm(f, L: int):
    """Normalize an f12 tree to tuple/tuple/(list, list) so it can ride a
    fori_loop carry (pytree treedefs must match exactly)."""
    return tuple(
        tuple(
            (
                [f[h][j][0][i] for i in range(L)],
                [f[h][j][1][i] for i in range(L)],
            )
            for j in range(3)
        )
        for h in range(2)
    )


def _product_all_positions(tw: RowTower, f, seg: int = 0):
    """Group-product of an f12 over sublane x lane positions.

    Rotation all-reduce: 3 sublane-axis + 7 lane-axis rotate-and-multiply
    steps leave EVERY position holding the product of all 1024.  The
    shifts are DYNAMIC (pltpu.roll takes a traced shift), so each axis is
    one fori_loop over one f12_mul body — ~10x less generated code than
    unrolling, which is what made the product kernels' AOT compile
    pathological on the serving stack.

    ``seg`` = 0 reduces everything.  A power-of-two ``seg`` (aligned
    contiguous flat segments, flat position = sublane*128 + lane) runs
    only log2(seg) doubling steps, so position k*seg + seg - 1 ends up
    holding the product of segment k (np.roll convention: roll(x, s)[i]
    = x[i - s], so each position accumulates the cyclic window ENDING at
    it).  seg <= 128 segments live inside one lane row; larger segments
    must be whole multiples of 128 lanes (seg = m*128, m <= ts)."""
    L = tw.L
    ts = f[0][0][0][0].shape[0]
    f = _f12_norm(f, L)

    def body(axis):
        def step(i, fv):
            sh = 1 << i
            g = _f12_map_rows(lambda r: pltpu.roll(r, sh, axis=axis), fv)
            return _f12_norm(tw.f12_mul(fv, g), L)

        return step

    if seg:
        lg = seg.bit_length() - 1  # log2(seg)
        n_lane = min(7, lg)
        n_sub = min(ts.bit_length() - 1, max(0, lg - 7))
        assert seg == 1 << lg and (seg <= 128 or seg % 128 == 0)
    else:
        n_lane = 7
        n_sub = ts.bit_length() - 1  # log2(ts)
    f = jax.lax.fori_loop(0, n_sub, body(0), f)
    f = jax.lax.fori_loop(0, n_lane, body(1), f)
    return f


def _mask_pad_to_one(tw: RowTower, f, mask):
    """Replace f with 1 at positions where mask is False (grid padding)."""
    like = f[0][0][0][0]
    one = tw.one_rows(like)
    zero = tw.zero_rows(like)
    out = []
    for h in range(2):
        row = []
        for j in range(3):
            c0, c1 = f[h][j]
            t0 = one if (h, j) == (0, 0) else zero
            row.append(
                (
                    [jnp.where(mask, c0[i], t0[i]) for i in range(tw.L)],
                    [jnp.where(mask, c1[i], zero[i]) for i in range(tw.L)],
                )
            )
        out.append(tuple(row))
    return (out[0], out[1])


def _is_one_flag(tw: RowTower, f):
    """Boolean tile: f == 1 in Gt (rows canonicalized to [0, p) first)."""
    F, L = tw.F, tw.L
    rmp = [jnp.uint32(v) for v in F.r_minus_p]

    def canon(rows):
        w = []
        carry = jnp.zeros_like(rows[0])
        for k in range(L):
            v = rows[k] + rmp[k] + carry
            w.append(v & LIMB_MASK)
            carry = v >> LIMB_BITS
        ge = carry > 0
        return [jnp.where(ge, w[k], rows[k]) for k in range(L)]

    like = f[0][0][0][0]
    ok = jnp.ones_like(like, dtype=jnp.bool_)
    for h in range(2):
        for j in range(3):
            for part in range(2):
                rows = canon(f[h][j][part])
                want = (
                    tw.one_limbs
                    if (h, j, part) == (0, 0, 0)
                    else (0,) * L
                )
                for k in range(L):
                    ok = jnp.logical_and(ok, rows[k] == jnp.uint32(want[k]))
    return ok


def _pairing_check_kernel(
    tw: RowTower,
    nbits: int,
    gammas,
    inv_nbits: int,
    x_nbits: int,
    x_neg: bool,
    conj_end: bool,
    bits_ref,
    invbits_ref,
    xbits_ref,
    nlanes_ref,
    xp_ref,
    yp_ref,
    qx_ref,
    qy_ref,
    ok_ref,
    f_ref,
    t_ref,
    prod_ref,
    acc_ref,
    base_ref,
):
    """prod_i e(P_i, Q_i) == 1 in ONE launch (BLS12 factor-3 curves).

    Per grid step: full Miller loop (f, T VMEM-resident), conjugation for
    x < 0, padding lanes masked to 1, rotation product over all 1024
    positions; the per-step product accumulates in scratch across the
    sequential grid.  The LAST step runs the whole final exponentiation
    on the accumulated product and writes the boolean tile.

    This replaces the miller-kernel + XLA product tree + final-exp-kernel
    + is-one pipeline (~15-30 dispatches) with a single kernel — the
    multi-launch fixed cost measured as the dominant term of the 64-pair
    BLS verify (BENCH_NOTES round 3).  Reference seam: kilic engine.Check
    (used by the BLS verify flow, perf_test.go:352-358).
    """
    L = tw.L
    xP = _ld(xp_ref, 0, L)
    yP = _ld(yp_ref, 0, L)
    Qx = _ld_f2(qx_ref, 0, L)
    Qy = _ld_f2(qy_ref, 0, L)
    _miller_body(tw, nbits, bits_ref, xP, yP, Qx, Qy, f_ref, t_ref)

    f = _ld_f12(f_ref, L)
    if conj_end:
        f = tw.f12_conj(f)

    # mask padded positions to the group identity before the product
    g = pl.program_id(0)
    like = f[0][0][0][0]
    ts = like.shape[0]
    pos = (
        g * (ts * 128)
        + jax.lax.broadcasted_iota(jnp.int32, like.shape, 0) * 128
        + jax.lax.broadcasted_iota(jnp.int32, like.shape, 1)
    )
    f = _mask_pad_to_one(tw, f, pos < nlanes_ref[0])

    f = _product_all_positions(tw, f)

    @pl.when(g == 0)
    def _():
        _st_f12(prod_ref, L, f)

    @pl.when(g > 0)
    def _():
        _st_f12(prod_ref, L, tw.f12_mul(_ld_f12(prod_ref, L), f))

    ok_ref[...] = jnp.zeros(ok_ref.shape, ok_ref.dtype)

    @pl.when(g == pl.num_programs(0) - 1)
    def _():
        prod = _ld_f12(prod_ref, L)
        red = _final_exp_body(
            tw, gammas, inv_nbits, x_nbits, x_neg, invbits_ref, xbits_ref,
            prod, acc_ref, base_ref,
        )
        ok_ref[...] = _is_one_flag(tw, red).astype(jnp.uint32)


def _miller_conj_tail(
    tw: RowTower, nbits: int, conj_end: bool, tail,
    bits_ref, xp_ref, yp_ref, qx_ref, qy_ref, f_ref, t_ref,
):
    """Shared front half of the product kernels: per-lane Miller loop,
    conjugation for negative loop parameters, and (BN curves) the two
    Frobenius tail chord lines.  Returns the per-lane Miller f12."""
    L = tw.L
    xP = _ld(xp_ref, 0, L)
    yP = _ld(yp_ref, 0, L)
    Qx = _ld_f2(qx_ref, 0, L)
    Qy = _ld_f2(qy_ref, 0, L)
    _miller_body(tw, nbits, bits_ref, xP, yP, Qx, Qy, f_ref, t_ref)

    f = _ld_f12(f_ref, L)
    if conj_end:
        f = tw.f12_conj(f)

    if tail is not None:
        T = _ld_T(t_ref, L)
        if conj_end:
            T = (T[0], tw.neg(T[1]), T[2])
        like = xP[0]
        (cx1, cy1, cx2, cy2) = (
            (tw.const_fp(like, c0), tw.const_fp(like, c1))
            for (c0, c1) in tail
        )
        mb = MulBatch(tw.F)
        r1x = tw.q_mul(mb, (Qx[0], tw.fneg(Qx[1])), cx1)
        r1y = tw.q_mul(mb, (Qy[0], tw.fneg(Qy[1])), cy1)
        r2x = tw.q_mul(mb, Qx, cx2)
        r2y = tw.q_mul(mb, Qy, cy2)
        o = mb.run()
        Q1x, Q1y, Q2x = r1x(o), r1y(o), r2x(o)
        Q2y = tw.neg(r2y(o))
        (A, DmB, negC), T = tw.add_step(T, Q1x, Q1y, xP, yP)
        f = tw.f12_sparse_mul(f, A, DmB, negC)
        (A, DmB, negC), T = tw.add_step(T, Q2x, Q2y, xP, yP)
        f = tw.f12_sparse_mul(f, A, DmB, negC)
    return f


def _pairing_prod_kernel(
    tw: RowTower,
    nbits: int,
    conj_end: bool,
    tail,
    bits_ref,
    nlanes_ref,
    xp_ref,
    yp_ref,
    qx_ref,
    qy_ref,
    prod_ref,
    f_ref,
    t_ref,
):
    """prod_i of the UNREDUCED Miller values in ONE launch (split mode).

    The first two stages of _pairing_check_kernel — Miller loops with
    pad-masking and the rotation product, accumulated across the grid
    into the (12L, TS, 128) out block — WITHOUT the in-kernel final
    exponentiation.  The caller follows with the cached final-exp kernel
    and an is-one compare: 3 launches instead of 1, but each compiles in
    minutes instead of the monolith's pathological server-side compile.

    ``tail``: None for BLS12 loops; for BN curves the 4 Frobenius
    twist-coordinate constants ((cx1, cy1, cx2, cy2), each an Fp2 pair of
    Montgomery limb tuples) driving the two chord-line add steps with
    Q1 = pi(Q) and Q2 = -pi^2(Q) after the 6x+2 loop (same tail as
    ops/pairing.py miller_loop; reference seam bn254.go:247-267).
    """
    L = tw.L
    f = _miller_conj_tail(
        tw, nbits, conj_end, tail, bits_ref, xp_ref, yp_ref, qx_ref, qy_ref,
        f_ref, t_ref,
    )

    g = pl.program_id(0)
    like = f[0][0][0][0]
    ts = like.shape[0]
    pos = (
        g * (ts * 128)
        + jax.lax.broadcasted_iota(jnp.int32, like.shape, 0) * 128
        + jax.lax.broadcasted_iota(jnp.int32, like.shape, 1)
    )
    f = _mask_pad_to_one(tw, f, pos < nlanes_ref[0])
    f = _product_all_positions(tw, f)

    @pl.when(g == 0)
    def _():
        _st_f12(prod_ref, L, f)

    @pl.when(g > 0)
    def _():
        _st_f12(prod_ref, L, tw.f12_mul(_ld_f12(prod_ref, L), f))


def _pairing_prod_seg_kernel(
    tw: RowTower,
    nbits: int,
    conj_end: bool,
    tail,
    seg: int,
    bits_ref,
    nlanes_ref,
    xp_ref,
    yp_ref,
    qx_ref,
    qy_ref,
    prod_ref,
    f_ref,
    t_ref,
):
    """SEGMENTED Miller products: one unreduced product per ``seg``
    consecutive lanes, all groups in ONE launch.

    The serving shape of the BBS+/BLS verify: MANY independent product
    checks of the same size, where the per-call fixed cost (tunnel round
    trip ~23 ms, measured round 5) would otherwise dominate every check.
    The rotation product runs only log2(seg) doubling steps, so position
    k*seg + seg - 1 of the (12L, M, 128) out buffer holds group k's
    product; each grid step owns its own out block (no cross-grid
    accumulation), so groups must not straddle grid steps — the wrapper
    enforces seg <= ts*128.  Pad lanes (>= nlanes) are masked to the
    identity, so trailing pad groups reduce to 1."""
    L = tw.L
    f = _miller_conj_tail(
        tw, nbits, conj_end, tail, bits_ref, xp_ref, yp_ref, qx_ref, qy_ref,
        f_ref, t_ref,
    )

    g = pl.program_id(0)
    like = f[0][0][0][0]
    ts = like.shape[0]
    pos = (
        g * (ts * 128)
        + jax.lax.broadcasted_iota(jnp.int32, like.shape, 0) * 128
        + jax.lax.broadcasted_iota(jnp.int32, like.shape, 1)
    )
    f = _mask_pad_to_one(tw, f, pos < nlanes_ref[0])
    f = _product_all_positions(tw, f, seg=min(seg, ts * 128))
    _st_f12(prod_ref, L, f)


def _fp_pow_kernel(F: RowCtx, one_limbs, nbits: int, bits_ref, a_ref, o_ref):
    """Base-field power chain (inverse/sqrt exponentiations) in one launch."""
    L = F.L
    a = _ld(a_ref, 0, L)
    _st(o_ref, 0, L, [jnp.full_like(a[0], v) for v in one_limbs])

    def body(i, _):
        acc = _ld(o_ref, 0, L)
        acc = F.sqr(acc)
        _st(o_ref, 0, L, acc)

        @pl.when(bits_ref[i] != 0)
        def _():
            acc = F.mul(_ld(o_ref, 0, L), a)
            _st(o_ref, 0, L, acc)

        return 0

    jax.lax.fori_loop(0, nbits, body, 0)


# ---------------------------------------------------------------------------
# pallas_call wrappers: tiling, padding, caching
# ---------------------------------------------------------------------------


def _spec(nrows: int, ts: int = TILE_SUBLANES):
    return pl.BlockSpec(
        (nrows, ts, 128), lambda g: (0, g, 0), memory_space=pltpu.VMEM
    )


def _tile_m(tot: int) -> int:
    """Row-groups (of 128 lanes) to pad tot lanes to: pow-2 up to 8,
    then multiples of 8.  Batches <= 512 lanes get a SHORTER sublane
    tile — every row op in the kernel then touches proportionally fewer
    vector registers, which is the whole per-launch cost at low
    occupancy (a 64-pair product check pays for every slot of its
    tile)."""
    M = max(1, -(-tot // 128))
    if M >= TILE_SUBLANES:
        return -(-M // TILE_SUBLANES) * TILE_SUBLANES
    return 1 << (M - 1).bit_length()


def _tile_ts(M: int) -> int:
    """Sublane tile height for a padded M (static at trace time)."""
    return M if M < TILE_SUBLANES else TILE_SUBLANES


def _flatten(x, nrows: int):
    """(..., B) limb layout with nrows leading coeff*limb rows -> (nrows, M, 128)."""
    x2 = x.reshape(nrows, -1)
    tot = x2.shape[1]
    pad = _tile_m(tot) * 128 - tot
    if pad:
        x2 = jnp.pad(x2, [(0, 0), (0, pad)])
    M = x2.shape[1] // 128
    return x2.reshape(nrows, M, 128), tot


@lru_cache(maxsize=None)
def _build_miller(
    p: int, L: int, beta_neg: int, xi0: int, twist: str, nbits: int,
    interpret: bool,
):
    tw = RowTower(p, L, beta_neg, xi0, twist)
    kernel = partial(_miller_kernel, tw, nbits)
    bits_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    @jax.jit
    def run(bits, xp, yp, qx, qy):
        M = xp.shape[1]
        ts = _tile_ts(M)
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((12 * L, M, 128), jnp.uint32),
                jax.ShapeDtypeStruct((6 * L, M, 128), jnp.uint32),
            ),
            grid=(M // ts,),
            in_specs=[
                bits_spec, _spec(L, ts), _spec(L, ts),
                _spec(2 * L, ts), _spec(2 * L, ts),
            ],
            out_specs=(_spec(12 * L, ts), _spec(6 * L, ts)),
            interpret=interpret,
            compiler_params=None if interpret else _VMEM_LIMIT,
        )(bits, xp, yp, qx, qy)

    return run


@lru_cache(maxsize=None)
def _build_add_step(
    p: int, L: int, beta_neg: int, xi0: int, twist: str, interpret: bool
):
    tw = RowTower(p, L, beta_neg, xi0, twist)
    kernel = partial(_add_step_kernel, tw)

    @jax.jit
    def run(f, t, qx, qy, xp, yp):
        M = xp.shape[1]
        ts = _tile_ts(M)
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((12 * L, M, 128), jnp.uint32),
                jax.ShapeDtypeStruct((6 * L, M, 128), jnp.uint32),
            ),
            grid=(M // ts,),
            in_specs=[
                _spec(12 * L, ts), _spec(6 * L, ts), _spec(2 * L, ts),
                _spec(2 * L, ts), _spec(L, ts), _spec(L, ts),
            ],
            out_specs=(_spec(12 * L, ts), _spec(6 * L, ts)),
            interpret=interpret,
            compiler_params=None if interpret else _VMEM_LIMIT,
        )(f, t, qx, qy, xp, yp)

    return run


@lru_cache(maxsize=None)
def _build_f12_pow(
    p: int, L: int, beta_neg: int, xi0: int, twist: str, nbits: int,
    cyclo: bool, interpret: bool,
):
    tw = RowTower(p, L, beta_neg, xi0, twist)
    kernel = partial(_f12_pow_kernel, tw, nbits, cyclo)
    bits_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    @jax.jit
    def run(bits, f):
        M = f.shape[1]
        ts = _tile_ts(M)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((12 * L, M, 128), jnp.uint32),
            grid=(M // ts,),
            in_specs=[bits_spec, _spec(12 * L, ts)],
            out_specs=_spec(12 * L, ts),
            interpret=interpret,
            compiler_params=None if interpret else _VMEM_LIMIT,
        )(bits, f)

    return run


def _mont_limbs(p: int, L: int, v: int):
    m = (v % p) * ((1 << (LIMB_BITS * L)) % p) % p
    return tuple((m >> (LIMB_BITS * k)) & LIMB_MASK for k in range(L))


def frob_gammas(spec, p: int, L: int):
    """Frobenius constants (v^j w^k)^(p^n) = gamma * v^j w^k as Montgomery
    limb tuples, derived on the exact host tower (same derivation as
    ops/tower.py frob_gamma)."""
    from ...host.fields import get_tower as get_host_tower

    host = get_host_tower(spec)
    gammas = {}
    for n in (1, 2):
        gam = [[None] * 2 for _ in range(3)]
        for j in range(3):
            for k in range(2):
                c6 = [[(0, 0)] * 3 for _ in range(2)]
                c6[k][j] = (1, 0)
                e = (tuple(map(tuple, c6[0])), tuple(map(tuple, c6[1])))
                g0, g1 = host.f12_frob(e, n)[k][j]
                gam[j][k] = (_mont_limbs(p, L, g0), _mont_limbs(p, L, g1))
        gammas[n] = gam
    return gammas


@lru_cache(maxsize=None)
def _build_final_exp(
    p: int, L: int, beta_neg: int, xi0: int, twist: str, spec_name: str,
    inv_nbits: int, x_nbits: int, x_neg: bool, interpret: bool,
):
    from ...curves.params import get_spec

    tw = RowTower(p, L, beta_neg, xi0, twist)
    gammas = frob_gammas(get_spec(spec_name), p, L)
    kernel = partial(
        _final_exp_kernel, tw, gammas, inv_nbits, x_nbits, x_neg
    )
    bits_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    @jax.jit
    def run(invbits, xbits, f):
        M = f.shape[1]
        ts = _tile_ts(M)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((12 * L, M, 128), jnp.uint32),
            grid=(M // ts,),
            in_specs=[bits_spec, bits_spec, _spec(12 * L, ts)],
            out_specs=_spec(12 * L, ts),
            scratch_shapes=[
                pltpu.VMEM((12 * L, ts, 128), jnp.uint32),
                pltpu.VMEM((12 * L, ts, 128), jnp.uint32),
            ],
            interpret=interpret,
            compiler_params=None if interpret else _VMEM_LIMIT,
        )(invbits, xbits, f)

    return run


@lru_cache(maxsize=None)
def _build_pairing_check(
    p: int, L: int, beta_neg: int, xi0: int, twist: str, spec_name: str,
    nbits: int, inv_nbits: int, x_nbits: int, x_neg: bool, conj_end: bool,
    interpret: bool,
):
    from ...curves.params import get_spec

    tw = RowTower(p, L, beta_neg, xi0, twist)
    gammas = frob_gammas(get_spec(spec_name), p, L)
    kernel = partial(
        _pairing_check_kernel, tw, nbits, gammas, inv_nbits, x_nbits, x_neg,
        conj_end,
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    @jax.jit
    def run(bits, invbits, xbits, nlanes, xp, yp, qx, qy):
        M = xp.shape[1]
        ts = _tile_ts(M)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ts, 128), jnp.uint32),
            grid=(M // ts,),
            in_specs=[
                smem, smem, smem, smem,
                _spec(L, ts), _spec(L, ts), _spec(2 * L, ts),
                _spec(2 * L, ts),
            ],
            out_specs=pl.BlockSpec(
                (ts, 128), lambda g: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((12 * L, ts, 128), jnp.uint32),
                pltpu.VMEM((6 * L, ts, 128), jnp.uint32),
                pltpu.VMEM((12 * L, ts, 128), jnp.uint32),
                pltpu.VMEM((12 * L, ts, 128), jnp.uint32),
                pltpu.VMEM((12 * L, ts, 128), jnp.uint32),
            ],
            interpret=interpret,
            compiler_params=None if interpret else _VMEM_LIMIT,
        )(bits, invbits, xbits, nlanes, xp, yp, qx, qy)

    return run


@lru_cache(maxsize=None)
def _build_pairing_prod(
    p: int, L: int, beta_neg: int, xi0: int, twist: str,
    nbits: int, conj_end: bool, interpret: bool, tail=None,
):
    # ``tail``: BN Frobenius tail constants as Fp2 pairs of PLAIN ints
    # ((cx1, cy1, cx2, cy2)); converted to Montgomery limb immediates here
    # so the lru_cache key stays small and hashable.
    tw = RowTower(p, L, beta_neg, xi0, twist)
    mont_tail = (
        tuple(
            (_mont_limbs(p, L, c0), _mont_limbs(p, L, c1))
            for (c0, c1) in tail
        )
        if tail is not None
        else None
    )
    kernel = partial(_pairing_prod_kernel, tw, nbits, conj_end, mont_tail)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    @jax.jit
    def run(bits, nlanes, xp, yp, qx, qy):
        M = xp.shape[1]
        ts = _tile_ts(M)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((12 * L, ts, 128), jnp.uint32),
            grid=(M // ts,),
            in_specs=[
                smem, smem,
                _spec(L, ts), _spec(L, ts), _spec(2 * L, ts),
                _spec(2 * L, ts),
            ],
            out_specs=pl.BlockSpec(
                (12 * L, ts, 128), lambda g: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((12 * L, ts, 128), jnp.uint32),
                pltpu.VMEM((6 * L, ts, 128), jnp.uint32),
            ],
            interpret=interpret,
            compiler_params=None if interpret else _VMEM_LIMIT,
        )(bits, nlanes, xp, yp, qx, qy)

    return run


@lru_cache(maxsize=None)
def _build_pairing_prod_seg(
    p: int, L: int, beta_neg: int, xi0: int, twist: str,
    nbits: int, conj_end: bool, seg: int, interpret: bool, tail=None,
):
    tw = RowTower(p, L, beta_neg, xi0, twist)
    mont_tail = (
        tuple(
            (_mont_limbs(p, L, c0), _mont_limbs(p, L, c1))
            for (c0, c1) in tail
        )
        if tail is not None
        else None
    )
    kernel = partial(
        _pairing_prod_seg_kernel, tw, nbits, conj_end, mont_tail, seg
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    @jax.jit
    def run(bits, nlanes, xp, yp, qx, qy):
        M = xp.shape[1]
        ts = _tile_ts(M)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((12 * L, M, 128), jnp.uint32),
            grid=(M // ts,),
            in_specs=[
                smem, smem,
                _spec(L, ts), _spec(L, ts), _spec(2 * L, ts),
                _spec(2 * L, ts),
            ],
            out_specs=_spec(12 * L, ts),
            scratch_shapes=[
                pltpu.VMEM((12 * L, ts, 128), jnp.uint32),
                pltpu.VMEM((6 * L, ts, 128), jnp.uint32),
            ],
            interpret=interpret,
            compiler_params=None if interpret else _VMEM_LIMIT,
        )(bits, nlanes, xp, yp, qx, qy)

    return run


def pairing_products_pallas(
    spec, xP, yP, Qx, Qy, bits: np.ndarray, conj_end: bool, seg: int,
    interpret=False, n=None, tail=None,
):
    """G = lanes/seg unreduced Miller products as ONE launch ->
    (2, 3, 2, L, G): group k is the product over its ``seg`` consecutive
    lanes (the grouped/serving form of pairing_product_pallas — many
    independent product checks amortize one dispatch).

    ``seg`` must be a power of two; groups must be aligned (check k's
    pairs at lanes [k*seg, (k+1)*seg)).  Lanes >= ``n`` are masked to the
    identity so trailing pad groups reduce to 1.  Same curve support as
    pairing_product_pallas (BLS12 factor-3; BN with ``tail``)."""
    from ...curves.params import Family

    bls_ok = spec.family == Family.BLS12 and spec.fexp_factor == 3
    bn_ok = spec.family == Family.BN and tail is not None
    if not (bls_ok or bn_ok):
        return None
    assert seg & (seg - 1) == 0, "segment size must be a power of two"
    p, L, beta_neg, xi0, twist = _cfg(spec)
    lanes = jnp.broadcast_shapes(xP.shape[-1:], Qx.shape[-1:])
    lead = jnp.broadcast_shapes(xP.shape[:-2], Qx.shape[:-3])
    xP = jnp.broadcast_to(xP, lead + (L,) + lanes)
    yP = jnp.broadcast_to(yP, lead + (L,) + lanes)
    Qx = jnp.broadcast_to(Qx, lead + (2, L) + lanes)
    Qy = jnp.broadcast_to(Qy, lead + (2, L) + lanes)
    xp2, tot = _flatten(jnp.moveaxis(xP, -2, 0), L)
    yp2, _ = _flatten(jnp.moveaxis(yP, -2, 0), L)
    qx2, _ = _flatten(
        jnp.moveaxis(Qx, (-3, -2), (0, 1)).reshape((2 * L,) + lead + lanes),
        2 * L,
    )
    qy2, _ = _flatten(
        jnp.moveaxis(Qy, (-3, -2), (0, 1)).reshape((2 * L,) + lead + lanes),
        2 * L,
    )
    M = xp2.shape[1]
    ts = _tile_ts(M)
    assert seg <= ts * 128, (
        "groups larger than one grid tile (%d lanes) need the single-"
        "product path per check" % (ts * 128)
    )
    nl = (
        jnp.asarray(n, jnp.int32).reshape(1)
        if n is not None
        else jnp.asarray(np.array([tot], dtype=np.int32))
    )
    out = _build_pairing_prod_seg(
        p, L, beta_neg, xi0, twist, len(bits), conj_end, seg, interpret,
        tail=tail if bn_ok else None,
    )(
        jnp.asarray(np.asarray(bits, dtype=np.uint32)),
        nl,
        xp2, yp2, qx2, qy2,
    )
    G = M * 128 // seg
    flat = out.reshape(12 * L, M * 128)
    prods = flat[:, (jnp.arange(G) * seg + seg - 1)]
    return prods.reshape(2, 3, 2, L, G)


def pairing_product_pallas(
    spec, xP, yP, Qx, Qy, bits: np.ndarray, conj_end: bool, interpret=False,
    n=None, tail=None,
):
    """prod_i of unreduced Miller values as ONE launch -> (2, 3, 2, L, 1).

    Split-mode stage 1 of the fused product check (see
    _pairing_prod_kernel); every position of the out tile holds the same
    product after the in-kernel rotation all-reduce, so the wrapper
    returns position (0, 0) only.

    ``n``: optional TRACED true pair count — callers that pad their lane
    axis to a fixed bucket pass it so ONE compiled program serves every
    batch size up to the bucket (the kernel masks lanes >= n to the
    group identity); without it the static lane count is used.

    Leading batch dims (anything before the (L, lanes) / (2, L, lanes)
    coordinate axes) are FLATTENED INTO the lane axis and multiplied into
    the single product — there is no per-lead-batch output (ADVICE r4).

    BN curves are supported by passing ``tail`` (the 4 Frobenius
    twist-coordinate Fp2 constants as plain-int pairs) — the kernel then
    finishes each lane's 6x+2 loop with the two Frobenius chord lines
    before the product (reference: bn254.go:247-267)."""
    from ...curves.params import Family

    bls_ok = spec.family == Family.BLS12 and spec.fexp_factor == 3
    bn_ok = spec.family == Family.BN and tail is not None
    if not (bls_ok or bn_ok):
        return None
    p, L, beta_neg, xi0, twist = _cfg(spec)
    lanes = jnp.broadcast_shapes(xP.shape[-1:], Qx.shape[-1:])
    lead = jnp.broadcast_shapes(xP.shape[:-2], Qx.shape[:-3])
    xP = jnp.broadcast_to(xP, lead + (L,) + lanes)
    yP = jnp.broadcast_to(yP, lead + (L,) + lanes)
    Qx = jnp.broadcast_to(Qx, lead + (2, L) + lanes)
    Qy = jnp.broadcast_to(Qy, lead + (2, L) + lanes)
    xp2, tot = _flatten(jnp.moveaxis(xP, -2, 0), L)
    yp2, _ = _flatten(jnp.moveaxis(yP, -2, 0), L)
    qx2, _ = _flatten(
        jnp.moveaxis(Qx, (-3, -2), (0, 1)).reshape((2 * L,) + lead + lanes),
        2 * L,
    )
    qy2, _ = _flatten(
        jnp.moveaxis(Qy, (-3, -2), (0, 1)).reshape((2 * L,) + lead + lanes),
        2 * L,
    )
    nl = (
        jnp.asarray(n, jnp.int32).reshape(1)
        if n is not None
        else jnp.asarray(np.array([tot], dtype=np.int32))
    )
    out = _build_pairing_prod(
        p, L, beta_neg, xi0, twist, len(bits), conj_end, interpret,
        tail=tail if bn_ok else None,
    )(
        jnp.asarray(np.asarray(bits, dtype=np.uint32)),
        nl,
        xp2, yp2, qx2, qy2,
    )
    return out[:, 0, 0].reshape(2, 3, 2, L, 1)


def pairing_check_pallas(
    spec, xP, yP, Qx, Qy, bits: np.ndarray, conj_end: bool, interpret=False,
    n=None,
):
    """prod_i e(P_i, Q_i) == 1 as ONE kernel launch; returns a scalar bool
    array (BLS12 factor-3 curves; None signals unsupported convention).

    The whole BLS/BBS+ verify pairing stage — Miller loops, product tree,
    final exponentiation, unity test — in a single dispatch, replacing the
    round-3 pipeline whose ~15 XLA-level launches made up most of the
    ~48 ms fixed cost at 64 pairs (BENCH_NOTES).

    As with pairing_product_pallas, leading batch dims fold into the lane
    axis: the result is ONE verdict over all supplied pairs (ADVICE r4).
    """
    from ...curves.params import Family

    if spec.family != Family.BLS12 or spec.fexp_factor != 3:
        return None
    p, L, beta_neg, xi0, twist = _cfg(spec)
    lanes = jnp.broadcast_shapes(xP.shape[-1:], Qx.shape[-1:])
    lead = jnp.broadcast_shapes(xP.shape[:-2], Qx.shape[:-3])
    xP = jnp.broadcast_to(xP, lead + (L,) + lanes)
    yP = jnp.broadcast_to(yP, lead + (L,) + lanes)
    Qx = jnp.broadcast_to(Qx, lead + (2, L) + lanes)
    Qy = jnp.broadcast_to(Qy, lead + (2, L) + lanes)
    xp2, tot = _flatten(jnp.moveaxis(xP, -2, 0), L)
    yp2, _ = _flatten(jnp.moveaxis(yP, -2, 0), L)
    qx2, _ = _flatten(
        jnp.moveaxis(Qx, (-3, -2), (0, 1)).reshape((2 * L,) + lead + lanes), 2 * L
    )
    qy2, _ = _flatten(
        jnp.moveaxis(Qy, (-3, -2), (0, 1)).reshape((2 * L,) + lead + lanes), 2 * L
    )
    inv_bits = np.array([int(b) for b in bin(p - 2)[2:]], dtype=np.uint32)
    x_bits = np.array([int(b) for b in bin(abs(spec.x))[2:]], dtype=np.uint32)
    out = _build_pairing_check(
        p, L, beta_neg, xi0, twist, spec.name, len(bits), len(inv_bits),
        len(x_bits), spec.x < 0, conj_end, interpret,
    )(
        jnp.asarray(np.asarray(bits, dtype=np.uint32)),
        jnp.asarray(inv_bits),
        jnp.asarray(x_bits),
        (
            jnp.asarray(n, jnp.int32).reshape(1)
            if n is not None
            else jnp.asarray(np.array([tot], dtype=np.int32))
        ),
        xp2, yp2, qx2, qy2,
    )
    return out[0, 0] != 0


def final_exp_pallas(spec, f, interpret=False):
    """Whole final exponentiation as ONE kernel launch (BLS12 factor-3
    convention); other conventions fall back to the caller's chain."""
    from ...curves.params import Family

    if spec.family != Family.BLS12 or spec.fexp_factor != 3:
        return None
    p, L, beta_neg, xi0, twist = _cfg(spec)
    inv_bits = np.array(
        [int(b) for b in bin(p - 2)[2:]], dtype=np.uint32
    )  # MSB-first
    ax = abs(spec.x)
    x_bits = np.array([int(b) for b in bin(ax)[2:]], dtype=np.uint32)
    lanes = f.shape[-1:]
    lead = f.shape[:-5]
    f2_, tot = _flatten(
        jnp.moveaxis(f, (-5, -4, -3, -2), (0, 1, 2, 3)).reshape(
            (12 * L,) + lead + lanes
        ),
        12 * L,
    )
    out = _build_final_exp(
        p, L, beta_neg, xi0, twist, spec.name, len(inv_bits), len(x_bits),
        spec.x < 0, interpret,
    )(jnp.asarray(inv_bits), jnp.asarray(x_bits), f2_)
    M = out.shape[1]
    fo = out.reshape(12 * L, M * 128)[:, :tot].reshape(
        (2, 3, 2, L) + lead + lanes
    )
    nl = len(lead)
    return jnp.moveaxis(fo, (0, 1, 2, 3), (nl, nl + 1, nl + 2, nl + 3))


@lru_cache(maxsize=None)
def _build_fp_pow(p: int, L: int, nbits: int, interpret: bool):
    F = RowCtx(p, L)
    R = 1 << (LIMB_BITS * L)
    one_limbs = tuple(
        ((R % p) >> (LIMB_BITS * k)) & LIMB_MASK for k in range(L)
    )
    kernel = partial(_fp_pow_kernel, F, one_limbs, nbits)
    bits_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    @jax.jit
    def run(bits, a):
        M = a.shape[1]
        ts = _tile_ts(M)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, M, 128), jnp.uint32),
            grid=(M // ts,),
            in_specs=[bits_spec, _spec(L, ts)],
            out_specs=_spec(L, ts),
            interpret=interpret,
            compiler_params=None if interpret else _VMEM_LIMIT,
        )(bits, a)

    return run


def _cfg(spec) -> Tuple[int, int, int, int, str]:
    p = spec.p
    beta_neg = (p - spec.beta) % p
    assert 0 < beta_neg < 256, "tower beta is not a small negative residue"
    xi0, xi1 = spec.xi
    assert xi1 == 1 and 0 <= xi0 < 256
    L = -(-(p.bit_length() + 2) // LIMB_BITS)
    return p, L, beta_neg, xi0, spec.twist


def miller_pallas(spec, xP, yP, Qx, Qy, bits: np.ndarray, interpret=False):
    """Full Miller loop as one kernel launch.

    xP, yP: (..., L, B); Qx, Qy: (..., 2, L, B); bits MSB-first (static).
    Returns (f, T): (..., 2, 3, 2, L, B) and (..., 3, 2, L, B).
    """
    p, L, beta_neg, xi0, twist = _cfg(spec)
    lanes = jnp.broadcast_shapes(xP.shape[-1:], Qx.shape[-1:])
    lead = jnp.broadcast_shapes(xP.shape[:-2], Qx.shape[:-3])
    xP = jnp.broadcast_to(xP, lead + (L,) + lanes)
    yP = jnp.broadcast_to(yP, lead + (L,) + lanes)
    Qx = jnp.broadcast_to(Qx, lead + (2, L) + lanes)
    Qy = jnp.broadcast_to(Qy, lead + (2, L) + lanes)
    # move rows to front: (L, lead*B), (2L, lead*B)
    xp2, tot = _flatten(jnp.moveaxis(xP, -2, 0), L)
    yp2, _ = _flatten(jnp.moveaxis(yP, -2, 0), L)
    qx2, _ = _flatten(
        jnp.moveaxis(Qx, (-3, -2), (0, 1)).reshape((2 * L,) + lead + lanes), 2 * L
    )
    qy2, _ = _flatten(
        jnp.moveaxis(Qy, (-3, -2), (0, 1)).reshape((2 * L,) + lead + lanes), 2 * L
    )
    bits_arr = jnp.asarray(np.asarray(bits, dtype=np.uint32))
    f3, t3 = _build_miller(p, L, beta_neg, xi0, twist, len(bits), interpret)(
        bits_arr, xp2, yp2, qx2, qy2
    )
    M = f3.shape[1]
    f = f3.reshape(12 * L, M * 128)[:, :tot].reshape((2, 3, 2, L) + lead + lanes)
    t = t3.reshape(6 * L, M * 128)[:, :tot].reshape((3, 2, L) + lead + lanes)
    nl = len(lead)
    f = jnp.moveaxis(f, (0, 1, 2, 3), (nl, nl + 1, nl + 2, nl + 3))
    t = jnp.moveaxis(t, (0, 1, 2), (nl, nl + 1, nl + 2))
    return f, t


def add_step_pallas(spec, f, T, Qx, Qy, xP, yP, interpret=False):
    """(f, T) -> (f * l_{T,Q}(P), T + Q) as one kernel launch."""
    p, L, beta_neg, xi0, twist = _cfg(spec)
    lanes = f.shape[-1:]
    lead = f.shape[:-5]
    Qx = jnp.broadcast_to(Qx, lead + (2, L) + lanes)
    Qy = jnp.broadcast_to(Qy, lead + (2, L) + lanes)
    xP = jnp.broadcast_to(xP, lead + (L,) + lanes)
    yP = jnp.broadcast_to(yP, lead + (L,) + lanes)
    f2_, tot = _flatten(
        jnp.moveaxis(f, (-5, -4, -3, -2), (0, 1, 2, 3)).reshape(
            (12 * L,) + lead + lanes
        ),
        12 * L,
    )
    t2_, _ = _flatten(
        jnp.moveaxis(T, (-4, -3, -2), (0, 1, 2)).reshape((6 * L,) + lead + lanes),
        6 * L,
    )
    qx2, _ = _flatten(
        jnp.moveaxis(Qx, (-3, -2), (0, 1)).reshape((2 * L,) + lead + lanes), 2 * L
    )
    qy2, _ = _flatten(
        jnp.moveaxis(Qy, (-3, -2), (0, 1)).reshape((2 * L,) + lead + lanes), 2 * L
    )
    xp2, _ = _flatten(jnp.moveaxis(xP, -2, 0).reshape((L,) + lead + lanes), L)
    yp2, _ = _flatten(jnp.moveaxis(yP, -2, 0).reshape((L,) + lead + lanes), L)
    f3, t3 = _build_add_step(p, L, beta_neg, xi0, twist, interpret)(
        f2_, t2_, qx2, qy2, xp2, yp2
    )
    M = f3.shape[1]
    fo = f3.reshape(12 * L, M * 128)[:, :tot].reshape((2, 3, 2, L) + lead + lanes)
    to = t3.reshape(6 * L, M * 128)[:, :tot].reshape((3, 2, L) + lead + lanes)
    nl = len(lead)
    fo = jnp.moveaxis(fo, (0, 1, 2, 3), (nl, nl + 1, nl + 2, nl + 3))
    to = jnp.moveaxis(to, (0, 1, 2), (nl, nl + 1, nl + 2))
    return fo, to


def f12_pow_pallas(spec, f, bits: np.ndarray, cyclo=False, interpret=False):
    """f**e with e's MSB-first bits static — one launch per exponentiation.

    ``cyclo=True`` uses Granger-Scott cyclotomic squaring (only valid for
    unitary f — everything after the final-exp easy part), halving the
    squaring cost.  Backs the final-exp x-chains (ops/tower.py
    f12_final_exp; reference seam: the FinalExponentiation call at
    bls12381/bls12-381.go:466-468).
    """
    p, L, beta_neg, xi0, twist = _cfg(spec)
    lanes = f.shape[-1:]
    lead = f.shape[:-5]
    f2_, tot = _flatten(
        jnp.moveaxis(f, (-5, -4, -3, -2), (0, 1, 2, 3)).reshape(
            (12 * L,) + lead + lanes
        ),
        12 * L,
    )
    bits_msb = np.asarray(bits, dtype=np.uint32)
    out = _build_f12_pow(
        p, L, beta_neg, xi0, twist, len(bits_msb), cyclo, interpret
    )(jnp.asarray(bits_msb), f2_)
    M = out.shape[1]
    fo = out.reshape(12 * L, M * 128)[:, :tot].reshape(
        (2, 3, 2, L) + lead + lanes
    )
    nl = len(lead)
    return jnp.moveaxis(fo, (0, 1, 2, 3), (nl, nl + 1, nl + 2, nl + 3))


def fp_pow_pallas(p: int, L: int, a, bits: np.ndarray, interpret=False):
    """a**e over (..., L, B) limb arrays, e's MSB-first bits static.

    One launch instead of ~nbits scan steps; backs FpCtx.pow_bits (inverse
    and sqrt chains — the linknamed `inverse`/`sqrt` seams at
    driver/kilic/custom.go:113-123)."""
    lead = a.shape[:-2]
    a2, tot = _flatten(jnp.moveaxis(a, -2, 0).reshape((L, -1)), L)
    bits_msb = np.asarray(bits, dtype=np.uint32)
    out = _build_fp_pow(p, L, len(bits_msb), interpret)(
        jnp.asarray(bits_msb), a2
    )
    M = out.shape[1]
    res = out.reshape(L, M * 128)[:, :tot].reshape((L,) + a.shape[:-2] + a.shape[-1:])
    return jnp.moveaxis(res, 0, -2)
