"""Batched G1 group law in Jacobian coordinates over limb arrays.

A point batch is a ``(..., 3, L)`` uint32 array stacking (X, Y, Z) limb
vectors (Montgomery form).  Infinity is encoded as Z == 0 (with X = Y = 1 so
formulas stay non-degenerate).  All group ops are branchless — exceptional
cases (infinity inputs, P == Q, P == -Q) are resolved with select masks so
one traced program covers every input, as required for jit/scan/shard_map.

Replaces the reference's per-backend point code (driver/gurvy/bls12381/
bls12-381.go:230-280 pooled Jacobian ops, driver/kilic/bls12-381.go:20-106)
with one CurveSpec-generic batched implementation.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.params import CurveSpec
from .field import FpCtx, get_fp_ctx, int_to_limbs, LIMB_BITS, LIMB_MASK

Array = jax.Array


class G1Ctx:
    def __init__(self, spec: CurveSpec):
        self.spec = spec
        self.fp: FpCtx = get_fp_ctx(spec.p, spec.name)
        self.fr: FpCtx = get_fp_ctx(spec.r, spec.name + "_fr")
        fp = self.fp
        self.b_mont = fp.encode(spec.b)
        # generator / infinity as (3, L) host constants
        gx, gy = spec.g1_gen
        self.gen = np.stack([fp.encode(gx), fp.encode(gy), fp.encode(1)])
        self.inf = np.stack([fp.encode(1), fp.encode(1), fp.encode(0)])
        self.nbits = spec.r.bit_length()

    # ------------------------------------------------------------ host <-> --
    def encode_point(self, P: Optional[Tuple[int, int]]) -> np.ndarray:
        """Affine host point (or None for infinity) -> (3, L) Jacobian."""
        if P is None:
            return self.inf.copy()
        x, y = P
        return np.stack([self.fp.encode(x), self.fp.encode(y), self.fp.encode(1)])

    def encode_points(self, pts) -> np.ndarray:
        return np.stack([self.encode_point(P) for P in pts])

    def decode_point(self, arr) -> Optional[Tuple[int, int]]:
        """(3, L) Jacobian -> affine host point or None."""
        arr = np.asarray(arr)
        fp, p = self.fp, self.spec.p
        X, Y, Z = (fp.decode(arr[i]) for i in range(3))
        if Z == 0:
            return None
        zi = pow(Z, p - 2, p)
        return (X * zi * zi % p, Y * zi * zi * zi % p)

    def decode_points(self, arr):
        return [self.decode_point(a) for a in np.asarray(arr)]

    def encode_scalars(self, scalars) -> np.ndarray:
        """Host ints -> (..., S) plain (non-Montgomery) 16-bit limbs mod r."""
        S = self.fr.L
        xs = np.asarray(scalars, dtype=object)
        out = np.empty(xs.shape + (S,), dtype=np.uint32)
        for idx in np.ndindex(xs.shape):
            out[idx] = int_to_limbs(int(xs[idx]) % self.spec.r, S)
        return out

    # ------------------------------------------------------------ predicates
    def is_inf(self, P: Array) -> Array:
        return self.fp.is_zero(P[..., 2, :])

    def eq(self, P: Array, Q: Array) -> Array:
        """Projective equality: X1 Z2^2 == X2 Z1^2 and Y1 Z2^3 == Y2 Z1^3."""
        fp = self.fp
        z1s, z2s = fp.sqr(P[..., 2, :]), fp.sqr(Q[..., 2, :])
        x_eq = fp.eq(fp.mont_mul(P[..., 0, :], z2s), fp.mont_mul(Q[..., 0, :], z1s))
        y_eq = fp.eq(
            fp.mont_mul(P[..., 1, :], fp.mont_mul(z2s, Q[..., 2, :])),
            fp.mont_mul(Q[..., 1, :], fp.mont_mul(z1s, P[..., 2, :])),
        )
        both_inf = jnp.logical_and(self.is_inf(P), self.is_inf(Q))
        one_inf = jnp.logical_xor(self.is_inf(P), self.is_inf(Q))
        return jnp.where(
            both_inf, True, jnp.where(one_inf, False, jnp.logical_and(x_eq, y_eq))
        )

    def select(self, mask: Array, P: Array, Q: Array) -> Array:
        return jnp.where(mask[..., None, None], P, Q)

    # ------------------------------------------------------------- group law
    def neg(self, P: Array) -> Array:
        return P.at[..., 1, :].set(self.fp.neg(P[..., 1, :]))

    def double(self, P: Array) -> Array:
        """dbl-2009-l (a = 0).  Z==0 and Y==0 both flow to Z3 == 0."""
        fp = self.fp
        X, Y, Z = P[..., 0, :], P[..., 1, :], P[..., 2, :]
        A = fp.sqr(X)
        B = fp.sqr(Y)
        C = fp.sqr(B)
        D = fp.sub(fp.sqr(fp.add(X, B)), fp.add(A, C))
        D = fp.add(D, D)
        E = fp.add(fp.add(A, A), A)
        F = fp.sqr(E)
        X3 = fp.sub(F, fp.add(D, D))
        Y3 = fp.sub(fp.mont_mul(E, fp.sub(D, X3)), fp.mul_int(C, 8))
        Z3 = fp.mont_mul(fp.add(Y, Y), Z)
        return jnp.stack([X3, Y3, Z3], axis=-2)

    def add(self, P: Array, Q: Array) -> Array:
        """Complete (branchless) Jacobian addition.

        Computes the generic-add and the doubling results and selects per
        lane; cf. the formula cases gnark's G1Jac.AddAssign branches over.
        """
        fp = self.fp
        X1, Y1, Z1 = P[..., 0, :], P[..., 1, :], P[..., 2, :]
        X2, Y2, Z2 = Q[..., 0, :], Q[..., 1, :], Q[..., 2, :]
        Z1Z1 = fp.sqr(Z1)
        Z2Z2 = fp.sqr(Z2)
        U1 = fp.mont_mul(X1, Z2Z2)
        U2 = fp.mont_mul(X2, Z1Z1)
        S1 = fp.mont_mul(fp.mont_mul(Y1, Z2), Z2Z2)
        S2 = fp.mont_mul(fp.mont_mul(Y2, Z1), Z1Z1)
        H = fp.sub(U2, U1)
        Rr = fp.sub(S2, S1)
        HH = fp.sqr(H)
        HHH = fp.mont_mul(H, HH)
        V = fp.mont_mul(U1, HH)
        X3 = fp.sub(fp.sub(fp.sqr(Rr), HHH), fp.add(V, V))
        Y3 = fp.sub(fp.mont_mul(Rr, fp.sub(V, X3)), fp.mont_mul(S1, HHH))
        Z3 = fp.mont_mul(fp.mont_mul(Z1, Z2), H)
        R3 = jnp.stack([X3, Y3, Z3], axis=-2)

        inf1 = self.is_inf(P)
        inf2 = self.is_inf(Q)
        same_x = jnp.logical_and(
            fp.is_zero(H), jnp.logical_not(jnp.logical_or(inf1, inf2))
        )
        same_p = jnp.logical_and(same_x, fp.is_zero(Rr))
        opp_p = jnp.logical_and(same_x, jnp.logical_not(same_p))

        out = self.select(opp_p, jnp.broadcast_to(jnp.asarray(self.inf), R3.shape), R3)
        out = self.select(same_p, self.double(P), out)
        out = self.select(inf2, jnp.broadcast_to(P, out.shape), out)
        out = self.select(inf1, jnp.broadcast_to(Q, out.shape), out)
        return out

    def sub(self, P: Array, Q: Array) -> Array:
        return self.add(P, self.neg(Q))

    # ---------------------------------------------------------- scalar mul --
    def _scalar_bit(self, scalars: Array, bit_index) -> Array:
        """Bit ``bit_index`` (traced scalar) of batched scalar limbs (..., S)."""
        limb = bit_index // LIMB_BITS
        shift = bit_index % LIMB_BITS
        word = jnp.take(scalars, limb, axis=-1)
        return (word >> shift) & 1

    def scalar_mul(self, P: Array, scalars: Array) -> Array:
        """[k]P, batched; fixed trip count = r.bit_length() (constant-time
        shape, like the double-and-add at driver/kilic/bls12-381.go:40-50
        but with no data-dependent branching)."""
        nbits = self.nbits
        acc0 = jnp.broadcast_to(jnp.asarray(self.inf), P.shape)

        def body(acc, t):
            bit = self._scalar_bit(scalars, nbits - 1 - t)
            acc = self.double(acc)
            added = self.add(acc, P)
            acc = self.select(bit.astype(bool), added, acc)
            return acc, None

        acc, _ = jax.lax.scan(body, acc0, jnp.arange(nbits))
        return acc

    def mul2(self, P: Array, e: Array, Q: Array, f: Array) -> Array:
        """[e]P + [f]Q via shared doublings (Strauss-Shamir, the batched
        analogue of bls12381/bls12-381.go:869-937)."""
        nbits = self.nbits
        PQ = self.add(P, Q)
        acc0 = jnp.broadcast_to(jnp.asarray(self.inf), P.shape)

        def body(acc, t):
            be = self._scalar_bit(e, nbits - 1 - t).astype(bool)
            bf = self._scalar_bit(f, nbits - 1 - t).astype(bool)
            acc = self.double(acc)
            addend = self.select(
                jnp.logical_and(be, bf),
                jnp.broadcast_to(PQ, acc.shape),
                self.select(be, jnp.broadcast_to(P, acc.shape),
                            jnp.broadcast_to(Q, acc.shape)),
            )
            acc = self.select(jnp.logical_or(be, bf), self.add(acc, addend), acc)
            return acc, None

        acc, _ = jax.lax.scan(body, acc0, jnp.arange(nbits))
        return acc

    # ------------------------------------------------------------- affine ---
    def to_affine(self, P: Array) -> Tuple[Array, Array]:
        """Batched Jacobian -> affine (x, y); infinity maps to (0, 0)."""
        fp = self.fp
        Z = P[..., 2, :]
        zi = fp.inv(Z)
        zi2 = fp.sqr(zi)
        x = fp.mont_mul(P[..., 0, :], zi2)
        y = fp.mont_mul(P[..., 1, :], fp.mont_mul(zi2, zi))
        inf = self.is_inf(P)
        zero = jnp.zeros_like(x)
        return fp.select(~inf, x, zero), fp.select(~inf, y, zero)

    def sum_reduce(self, P: Array, axis: int = 0) -> Array:
        """Tree-reduce a batch of points along ``axis`` with point addition."""
        n = P.shape[axis]
        P = jnp.moveaxis(P, axis, 0)
        while n > 1:
            half = n // 2
            even = P[: 2 * half : 2]
            odd = P[1 : 2 * half : 2]
            combined = self.add(even, odd)
            if n % 2:
                combined = jnp.concatenate([combined, P[2 * half :]], axis=0)
            P = combined
            n = P.shape[0]
        return P[0]


@lru_cache(maxsize=None)
def get_g1_ctx(spec: CurveSpec) -> G1Ctx:
    return G1Ctx(spec)
