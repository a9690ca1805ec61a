"""Batched tower-field arithmetic on device: Fp2, Fp6, Fp12.

Layout (lane batch B last, limbs on sublanes):
    Fp2:  (..., 2, L, B)          c0 + c1*u,  u^2 = beta
    Fp6:  (..., 3, 2, L, B)       a0 + a1*v + a2*v^2,  v^3 = xi
    Fp12: (..., 2, 3, 2, L, B)    b0 + b1*w,  w^2 = v

Matches the host tower (host/fields.py), which is the exactness oracle.
Multiplications are aggressively *stacked*: a full Fp12 Karatsuba multiply
flattens to a single width-18 Fp2 multiply = a single width-54 base-field
Montgomery multiply — one Pallas launch on TPU.

Replaces the reference's per-backend extension-field code reached through
gnark/kilic (e.g. driver/gurvy/bls12381/bls12-381.go:448-468 pairing path).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.params import CurveSpec
from ..host.fields import get_tower as get_host_tower
from .field import LIMB_BITS
from .field import FpCtx, get_fp_ctx, bits_of

Array = jax.Array


class TowerCtx:
    def __init__(self, spec: CurveSpec):
        self.spec = spec
        self.fp: FpCtx = get_fp_ctx(spec.p, spec.name)
        self.host = get_host_tower(spec)
        p = spec.p
        self.beta = spec.beta  # int mod p (a small negative residue)
        x0, x1 = spec.xi
        assert x1 == 1, "tower assumes xi = x0 + u"
        self.xi0 = x0
        # Frobenius constants gamma[n][j][k] for coefficient (v^j w^k),
        # n in {1,2,3}: (v^j w^k)^(p^n) = gamma * v^j w^k; computed on the
        # exact host tower.
        t = self.host
        self.frob_gamma = {}
        for n in (1, 2, 3):
            gam = np.empty((3, 2), dtype=object)
            for j in range(3):
                for k in range(2):
                    # basis element v^j w^k as f12
                    c6 = [[(0, 0)] * 3 for _ in range(2)]
                    c6[k][j] = (1, 0)
                    e = (tuple(map(tuple, c6[0])), tuple(map(tuple, c6[1])))
                    fe = t.f12_frob(e, n)
                    coef = fe[k][j]
                    gam[j, k] = coef
            self.frob_gamma[n] = gam

    # ---------------------------------------------------------------- Fp2 ---
    def f2_encode(self, a: Tuple[int, int]) -> np.ndarray:
        return np.stack([self.fp.encode(a[0]), self.fp.encode(a[1])])

    def f2_decode(self, arr) -> list:
        """(2, L, B) -> list of (c0, c1) host pairs."""
        d = self.fp.decode(np.asarray(arr))  # (2, B)
        return [(d[0][i], d[1][i]) for i in range(d.shape[-1])]

    @property
    def f2_one(self) -> np.ndarray:
        return self.f2_encode((1, 0))

    @property
    def f2_zero(self) -> np.ndarray:
        return self.f2_encode((0, 0))

    def _c(self, a: Array, i: int) -> Array:
        return a[..., i, :, :]

    def f2_add(self, a, b):
        return self.fp.add(a, b)  # elementwise over the (2,) axis

    def f2_sub(self, a, b):
        return self.fp.sub(a, b)

    def f2_neg(self, a):
        return self.fp.neg(a)

    def f2_conj(self, a):
        return jnp.stack(
            [self._c(a, 0), self.fp.neg(self._c(a, 1))], axis=-3
        )

    def f2_mul(self, a, b):
        """Karatsuba: 3 base muls, stacked into one call."""
        fp = self.fp
        a0, a1 = self._c(a, 0), self._c(a, 1)
        b0, b1 = self._c(b, 0), self._c(b, 1)
        lhs = jnp.stack([a0, a1, fp.add(a0, a1)], axis=-3)
        rhs = jnp.stack([b0, b1, fp.add(b0, b1)], axis=-3)
        m = fp.mont_mul(lhs, rhs)
        t0, t1, t2 = m[..., 0, :, :], m[..., 1, :, :], m[..., 2, :, :]
        c0 = fp.add(t0, fp.mul_int(t1, self.beta))
        c1 = fp.sub(t2, fp.add(t0, t1))
        return jnp.stack([c0, c1], axis=-3)

    def f2_sqr(self, a):
        return self.f2_mul(a, a)

    def f2_mul_fp(self, a, s):
        """a * s with s a base-field element (..., L, B)."""
        return self.fp.mont_mul(a, s[..., None, :, :])

    def f2_mul_xi(self, a):
        """a * (xi0 + u):  (xi0*a0 + beta*a1, xi0*a1 + a0)."""
        fp = self.fp
        a0, a1 = self._c(a, 0), self._c(a, 1)
        c0 = fp.add(fp.mul_int(a0, self.xi0), fp.mul_int(a1, self.beta))
        c1 = fp.add(fp.mul_int(a1, self.xi0), a0)
        return jnp.stack([c0, c1], axis=-3)

    def f2_inv(self, a):
        """1/a via the norm: (a0 - a1 u)/(a0^2 - beta a1^2)."""
        fp = self.fp
        a0, a1 = self._c(a, 0), self._c(a, 1)
        sq = fp.sqr(jnp.stack([a0, a1], axis=-3))
        norm = fp.sub(
            sq[..., 0, :, :], fp.mul_int(sq[..., 1, :, :], self.beta)
        )
        ninv = fp.inv(norm)
        m = fp.mont_mul(jnp.stack([a0, a1], axis=-3), ninv[..., None, :, :])
        return jnp.stack(
            [m[..., 0, :, :], fp.neg(m[..., 1, :, :])], axis=-3
        )

    def f2_is_zero(self, a):
        return jnp.logical_and(
            self.fp.is_zero(self._c(a, 0)), self.fp.is_zero(self._c(a, 1))
        )

    def f2_eq(self, a, b):
        return self.f2_is_zero(self.f2_sub(a, b))

    def f2_select(self, mask, a, b):
        return jnp.where(mask[..., None, None, :], a, b)

    def f2_mul_const(self, a, c: Tuple[int, int]):
        """a * (c0 + c1 u) for a host constant (general Fp2 constant)."""
        const = jnp.asarray(self.f2_encode(c))
        return self.f2_mul(a, const)

    # ---------------------------------------------------------------- Fp6 ---
    def _v(self, a: Array, i: int) -> Array:
        return a[..., i, :, :, :]

    def f6_encode(self, a) -> np.ndarray:
        return np.stack([self.f2_encode(c) for c in a])

    @property
    def f6_zero(self):
        return self.f6_encode(((0, 0),) * 3)

    @property
    def f6_one(self):
        return self.f6_encode(((1, 0), (0, 0), (0, 0)))

    def f6_add(self, a, b):
        return self.fp.add(a, b)

    def f6_sub(self, a, b):
        return self.fp.sub(a, b)

    def f6_neg(self, a):
        return self.fp.neg(a)

    def f6_mul(self, a, b):
        """Toom/Karatsuba: 6 Fp2 muls, stacked into one f2_mul call."""
        f2a, f2s = self.f2_add, self.f2_sub
        a0, a1, a2 = (self._v(a, i) for i in range(3))
        b0, b1, b2 = (self._v(b, i) for i in range(3))
        lhs = jnp.stack(
            [a0, a1, a2, f2a(a1, a2), f2a(a0, a1), f2a(a0, a2)], axis=-4
        )
        rhs = jnp.stack(
            [b0, b1, b2, f2a(b1, b2), f2a(b0, b1), f2a(b0, b2)], axis=-4
        )
        m = self.f2_mul(lhs, rhs)
        t0, t1, t2, m12, m01, m02 = (m[..., i, :, :, :] for i in range(6))
        c0 = f2a(t0, self.f2_mul_xi(f2s(f2s(m12, t1), t2)))
        c1 = f2a(f2s(f2s(m01, t0), t1), self.f2_mul_xi(t2))
        c2 = f2a(f2s(f2s(m02, t0), t2), t1)
        return jnp.stack([c0, c1, c2], axis=-4)

    def f6_sqr(self, a):
        return self.f6_mul(a, a)

    def f6_mul_v(self, a):
        """a * v: (xi*a2, a0, a1)."""
        return jnp.stack(
            [self.f2_mul_xi(self._v(a, 2)), self._v(a, 0), self._v(a, 1)],
            axis=-4,
        )

    def f6_inv(self, a):
        m, s, mx = self.f2_mul, self.f2_sub, self.f2_mul_xi
        a0, a1, a2 = (self._v(a, i) for i in range(3))
        c0 = s(m(a0, a0), mx(m(a1, a2)))
        c1 = s(mx(m(a2, a2)), m(a0, a1))
        c2 = s(m(a1, a1), m(a0, a2))
        norm = self.f2_add(
            m(a0, c0), mx(self.f2_add(m(a2, c1), m(a1, c2)))
        )
        ninv = self.f2_inv(norm)
        stack = jnp.stack([c0, c1, c2], axis=-4)
        return self.f2_mul(stack, ninv[..., None, :, :, :])

    # --------------------------------------------------------------- Fp12 ---
    def f12_encode(self, a) -> np.ndarray:
        return np.stack([self.f6_encode(c) for c in a])

    def f12_decode(self, arr) -> list:
        """(2, 3, 2, L, B) -> list of host Fp12 tuples.

        One C-speed bytes pass per coefficient (int.from_bytes + a single
        Montgomery-exit mulmod) instead of the per-limb Python loop of
        fp.decode — the grouped pairing check decodes G products per
        call, so this sits on the serving path."""
        a = np.asarray(arr)
        if (a >> LIMB_BITS).any():
            # redundant (>16-bit) limbs: exact slow path
            d = self.fp.decode(a)  # (2, 3, 2, B)
            return [
                tuple(
                    tuple((d[h, j, 0, i], d[h, j, 1, i]) for j in range(3))
                    for h in range(2)
                )
                for i in range(d.shape[-1])
            ]
        L, B = a.shape[-2:]
        p = self.fp.p
        rinv = pow(self.fp.R, -1, p)
        # (B, 2, 3, 2, L) row-major -> per-coefficient 2L-byte LE strings
        buf = np.moveaxis(a, -1, 0).astype("<u2").tobytes()
        step = 2 * L
        vals = [
            int.from_bytes(buf[k * step : (k + 1) * step], "little")
            * rinv
            % p
            for k in range(B * 12)
        ]
        out = []
        for i in range(B):
            base = i * 12
            out.append(
                tuple(
                    tuple(
                        (
                            vals[base + (h * 3 + j) * 2],
                            vals[base + (h * 3 + j) * 2 + 1],
                        )
                        for j in range(3)
                    )
                    for h in range(2)
                )
            )
        return out

    @property
    def f12_one(self):
        return self.f12_encode(self.host.F12_ONE)

    @property
    def f12_zero(self):
        return self.f12_encode(self.host.F12_ZERO)

    def _h(self, a, i):
        return a[..., i, :, :, :, :]

    def f12_add(self, a, b):
        return self.fp.add(a, b)

    def f12_sub(self, a, b):
        return self.fp.sub(a, b)

    def f12_neg(self, a):
        return self.fp.neg(a)

    def f12_conj(self, a):
        return jnp.stack(
            [self._h(a, 0), self.f6_neg(self._h(a, 1))], axis=-5
        )

    def f12_mul(self, a, b):
        """Karatsuba over Fp6: 3 f6 muls, stacked into one f6_mul call."""
        a0, a1 = self._h(a, 0), self._h(a, 1)
        b0, b1 = self._h(b, 0), self._h(b, 1)
        lhs = jnp.stack([a0, a1, self.f6_add(a0, a1)], axis=-5)
        rhs = jnp.stack([b0, b1, self.f6_add(b0, b1)], axis=-5)
        m = self.f6_mul(lhs, rhs)
        t0, t1, ts = (m[..., i, :, :, :, :] for i in range(3))
        c0 = self.f6_add(t0, self.f6_mul_v(t1))
        c1 = self.f6_sub(ts, self.f6_add(t0, t1))
        return jnp.stack([c0, c1], axis=-5)

    def f12_sqr(self, a):
        """Complex squaring over Fp6: (a0 + a1 w)^2 with w^2 = v.

        c1 = 2 a0 a1;  c0 = (a0 + a1)(a0 + v a1) - t - v t  with t = a0 a1.
        12 Fp2 multiplies (vs 18 for a general multiply), issued as one
        stacked f6_mul call.
        """
        a0, a1 = self._h(a, 0), self._h(a, 1)
        va1 = self.f6_mul_v(a1)
        lhs = jnp.stack([a0, self.f6_add(a0, a1)], axis=-5)
        rhs = jnp.stack([a1, self.f6_add(a0, va1)], axis=-5)
        m = self.f6_mul(lhs, rhs)
        t, m1 = m[..., 0, :, :, :, :], m[..., 1, :, :, :, :]
        c0 = self.f6_sub(self.f6_sub(m1, t), self.f6_mul_v(t))
        c1 = self.f6_add(t, t)
        return jnp.stack([c0, c1], axis=-5)

    def f12_inv(self, a):
        a0, a1 = self._h(a, 0), self._h(a, 1)
        sq = self.f6_sqr(jnp.stack([a0, a1], axis=-5))
        norm = self.f6_sub(
            sq[..., 0, :, :, :, :], self.f6_mul_v(sq[..., 1, :, :, :, :])
        )
        ninv = self.f6_inv(norm)
        m = self.f6_mul(
            jnp.stack([a0, self.f6_neg(a1)], axis=-5),
            jnp.broadcast_to(
                ninv[..., None, :, :, :, :],
                a.shape,
            ),
        )
        return m

    def f12_is_one(self, a):
        diff = self.f12_sub(a, jnp.asarray(self.f12_one))
        return jnp.all(
            jnp.logical_or(
                jnp.all(diff == 0, axis=-2),
                jnp.all(diff == jnp.asarray(self.fp.p_limbs), axis=-2),
            ),
            axis=(-4, -3, -2),
        )

    def f12_select(self, mask, a, b):
        return jnp.where(mask[..., None, None, None, None, :], a, b)

    def f12_frob(self, a, n: int = 1):
        """a^(p^n) for n in {1,2,3}: conjugate coefficients (n odd) and
        scale coefficient (j,k) by gamma[n][j][k] (host-derived)."""
        assert n in (1, 2, 3)
        gam = self.frob_gamma[n]
        out_coeffs = []
        for k in range(2):  # w-power
            row = []
            for j in range(3):  # v-power
                c = a[..., k, j, :, :, :]
                if n % 2 == 1:
                    c = self.f2_conj(c)
                row.append(self.f2_mul_const(c, tuple(gam[j, k])))
            out_coeffs.append(jnp.stack(row, axis=-4))
        return jnp.stack(out_coeffs, axis=-5)

    def f12_pow_bits(self, a, bits: np.ndarray):
        """a**e via square-and-multiply scan (bits little-endian, static)."""
        one = jnp.broadcast_to(jnp.asarray(self.f12_one), a.shape)
        bits_arr = jnp.asarray(bits[::-1].copy())

        def body(acc, bit):
            acc = self.f12_sqr(acc)
            hit = self.f12_mul(acc, a)
            acc = jnp.where(jnp.bool_(bit), hit, acc)
            return acc, None

        out, _ = jax.lax.scan(body, one, bits_arr)
        return out

    def f12_pow_scalars(self, a, scalars, nbits: Optional[int] = None):
        """a**k with per-lane scalars (..., S, B) of plain 16-bit limbs.

        Data-dependent exponent (the Gt.Exp surface, math.go:620-624):
        fixed trip count, masked multiply per bit.
        """
        from .field import LIMB_BITS

        nbits = nbits or self.spec.r.bit_length()
        one = jnp.broadcast_to(jnp.asarray(self.f12_one), a.shape)

        def body(acc, t):
            idx = nbits - 1 - t
            word = jnp.take(scalars, idx // LIMB_BITS, axis=-2)
            bit = ((word >> (idx % LIMB_BITS)) & 1).astype(bool)  # (..., B)
            acc = self.f12_sqr(acc)
            hit = self.f12_mul(acc, a)
            acc = self.f12_select(bit, hit, acc)
            return acc, None

        out, _ = jax.lax.scan(body, one, jnp.arange(nbits))
        return out

    def _f12_exp_pos(self, a, e: int):
        """a**e for a static positive int, unrolled square-and-multiply.

        Used for the sparse curve-parameter exponent |x| in the BLS12
        final-exp chain (hamming weight ~6, so the unrolled graph is small
        and does no wasted masked multiplies)."""
        bits = bin(e)[2:]
        acc = a
        for bit in bits[1:]:
            acc = self.f12_sqr(acc)
            if bit == "1":
                acc = self.f12_mul(acc, a)
        return acc

    # -------------------------------------------------------- final exp -----
    def f12_final_exp(self, f):
        """Pairing final exponentiation, matching the host engine
        (host/fields.py f12_final_exp): easy part by conj/inv/frobenius,
        then the hard part.

        BLS12 curves use the x-chain for the factor-3 convention, via the
        integer identity (verified against the curve polynomials)
            3 (p^4 - p^2 + 1)/r = (x-1)^2 (x + p) (x^2 + p^2 - 1) + 3,
        costing ~4 exponentiations by the sparse |x| on the cyclotomic
        subgroup (where inversion is conjugation).  Other conventions fall
        back to a generic base-p multi-exponentiation with shared
        squarings (table lookups on device)."""
        from .field import _pallas_enabled

        if _pallas_enabled():
            # TPU: the whole final exp (easy part incl. the Fp12 inversion
            # + the 5 hard-part x-chains) as ONE fused kernel launch
            from .kernels.pairing_pallas import final_exp_pallas

            out = final_exp_pallas(self.spec, f)
            if out is not None:
                return out

        # easy part: f^(p^6-1) then ^(p^2+1)
        t = self.f12_mul(self.f12_conj(f), self.f12_inv(f))
        f = self.f12_mul(self.f12_frob(t, 2), t)

        spec = self.spec
        from ..curves.params import Family

        if spec.family == Family.BLS12 and spec.fexp_factor == 3:
            assert (
                (spec.x - 1) ** 2 * (spec.x + spec.p) * (spec.x**2 + spec.p**2 - 1)
                + 3
                == spec.hard_part_exp
            )
            ax = abs(spec.x)
            neg = spec.x < 0
            ax_bits = bits_of(ax)
            from .field import _pallas_enabled

            if _pallas_enabled():
                from .kernels.pairing_pallas import f12_pow_pallas

                # MSB-first static bits; whole chain = one fused launch.
                # Post-easy-part values are unitary, so the kernel uses
                # Granger-Scott cyclotomic squaring (half the muls).
                msb = ax_bits[::-1].copy()

                def exp_x(a):
                    r = f12_pow_pallas(spec, a, msb, cyclo=True)
                    return self.f12_conj(r) if neg else r

            else:

                def exp_x(a):  # a^x (cyclotomic: inverse = conjugate)
                    r = self.f12_pow_bits(a, ax_bits)  # scan: small graph
                    return self.f12_conj(r) if neg else r

            def exp_xm1(a):  # a^(x-1)
                return self.f12_mul(exp_x(a), self.f12_conj(a))

            y = exp_xm1(exp_xm1(f))  # f^((x-1)^2)
            y = self.f12_mul(exp_x(y), self.f12_frob(y, 1))  # ^(x+p)
            y = self.f12_mul(  # ^(x^2 + p^2 - 1)
                self.f12_mul(exp_x(exp_x(y)), self.f12_frob(y, 2)),
                self.f12_conj(y),
            )
            f3 = self.f12_mul(self.f12_sqr(f), f)
            return self.f12_mul(y, f3)

        p = self.spec.p
        e = self.spec.hard_part_exp
        digits = []
        while e:
            digits.append(e % p)
            e //= p
        nd = len(digits)
        assert nd <= 5, "unexpectedly many base-p digits"

        from .field import _pallas_enabled

        if _pallas_enabled() and nd <= 4:
            # fused path: one cyclotomic pow-chain kernel per base-p digit
            # (f is unitary after the easy part), combined with Frobenius:
            # f^e = prod_i frob^i(f^{d_i})
            from .kernels.pairing_pallas import f12_pow_pallas

            acc = None
            for i, d in enumerate(digits):
                part = f12_pow_pallas(spec, f, bits_of(d)[::-1].copy(), cyclo=True)
                if i:
                    part = self.f12_frob(part, i)
                acc = part if acc is None else self.f12_mul(acc, part)
            return acc
        # bases: f^(p^i) via frobenius
        bases = [f]
        for _ in range(nd - 1):
            bases.append(self.f12_frob(bases[-1], 1))
        # table of all subset products: table[s] = prod_{i in s} bases[i]
        table = [jnp.broadcast_to(jnp.asarray(self.f12_one), f.shape)]
        for i in range(nd):
            bit = 1 << i
            table = table + [self.f12_mul(table[s], bases[i]) for s in range(bit)]
        table_arr = jnp.stack(table, axis=0)  # (2^nd, ..., 2,3,2,L,B)

        nbits = max(d.bit_length() for d in digits)
        # per-step subset index, MSB first
        idx = np.zeros(nbits, dtype=np.int32)
        for i in range(nbits):
            bitpos = nbits - 1 - i
            s = 0
            for j, d in enumerate(digits):
                if (d >> bitpos) & 1:
                    s |= 1 << j
            idx[i] = s
        idx_arr = jnp.asarray(idx)

        def body(acc, s):
            acc = self.f12_sqr(acc)
            acc = self.f12_mul(acc, jnp.take(table_arr, s, axis=0))
            return acc, None

        acc0 = jnp.take(table_arr, idx_arr[0], axis=0)
        acc, _ = jax.lax.scan(body, acc0, idx_arr[1:])
        return acc


@lru_cache(maxsize=None)
def get_tower_ctx(spec: CurveSpec) -> TowerCtx:
    return TowerCtx(spec)
