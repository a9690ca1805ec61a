"""Batched G1 group law in homogeneous projective coordinates.

A point batch is a ``(..., 3, L, B)`` uint32 array stacking (X, Y, Z) limb
planes (Montgomery, relaxed form) with the element batch B on the lane
axis.  Infinity is (0 : 1 : 0).  The group law is the complete RCB formula
set (ops/weier.py) — one branchless straight-line program for every input,
replacing the reference's per-case Jacobian code
(driver/gurvy/bls12381/bls12-381.go:230-280, driver/kilic/bls12-381.go:
20-106) with a CurveSpec-generic batched kernel.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.params import CurveSpec
from . import field, weier
from .field import FpCtx, get_fp_ctx, int_to_limbs, LIMB_BITS

Array = jax.Array


class FpAdapter(weier.FieldAdapter):
    """weier.FieldAdapter over a base-field FpCtx (stack axis -3)."""

    def __init__(self, fp: FpCtx, b: int):
        self.fp = fp
        self.b3 = (3 * b) % fp.p

    def add(self, a, b):
        return self.fp.add(a, b)

    def sub(self, a, b):
        return self.fp.sub(a, b)

    def _zip(self, xs, ys):
        xs = list(jnp.broadcast_arrays(*xs)) if len(xs) > 1 else list(xs)
        ys = list(jnp.broadcast_arrays(*ys)) if len(ys) > 1 else list(ys)
        a = jnp.stack(xs, axis=-3)
        b = jnp.stack(ys, axis=-3)
        a, b = jnp.broadcast_arrays(a, b)
        return a, b

    def mul_many(self, xs, ys):
        a, b = self._zip(xs, ys)
        out = self.fp.mont_mul(a, b)
        return tuple(out[..., i, :, :] for i in range(len(xs)))

    def add_many(self, xs, ys):
        a, b = self._zip(xs, ys)
        out = self.fp.add(a, b)
        return tuple(out[..., i, :, :] for i in range(len(xs)))

    def sub_many(self, xs, ys):
        a, b = self._zip(xs, ys)
        out = self.fp.sub(a, b)
        return tuple(out[..., i, :, :] for i in range(len(xs)))

    def mul_b3(self, a):
        return self.fp.mul_int(a, self.b3)


class G1Ctx:
    def __init__(self, spec: CurveSpec):
        self.spec = spec
        self.fp: FpCtx = get_fp_ctx(spec.p, spec.name)
        self.fr: FpCtx = get_fp_ctx(spec.r, spec.name + "_fr")
        self.F = FpAdapter(self.fp, spec.b)
        fp = self.fp
        gx, gy = spec.g1_gen
        self.gen = np.stack([fp.encode(gx), fp.encode(gy), fp.encode(1)])  # (3, L, 1)
        self.inf = np.stack([fp.encode(0), fp.encode(1), fp.encode(0)])
        self.nbits = spec.r.bit_length()

    # ------------------------------------------------------------ host <-> --
    def encode_point(self, P: Optional[Tuple[int, int]]) -> np.ndarray:
        """Affine host point (or None for infinity) -> (3, L, 1) projective."""
        if P is None:
            return self.inf.copy()
        x, y = P
        return np.stack([self.fp.encode(x), self.fp.encode(y), self.fp.encode(1)])

    def encode_points(self, pts) -> np.ndarray:
        """List of N host points -> (3, L, N)."""
        return np.concatenate([self.encode_point(P) for P in pts], axis=-1)

    def encode_points_affine(self, pts) -> np.ndarray:
        """List of N host affine points -> (2, L, N) affine rows.

        Infinity encodes as (0, 0); MSM callers must zero its scalars
        (the affine bucket pipeline has no absorbing representation)."""
        L = self.fp.L
        out = np.zeros((2, L, len(pts)), dtype=np.uint32)
        for i, P in enumerate(pts):
            if P is None:
                continue
            out[0, :, i] = self.fp.encode(P[0])[:, 0]
            out[1, :, i] = self.fp.encode(P[1])[:, 0]
        return out

    def decode_point(self, arr) -> Optional[Tuple[int, int]]:
        """(3, L) / (3, L, 1) projective -> affine host point or None."""
        arr = np.asarray(arr)
        if arr.ndim == 2:
            arr = arr[..., None]
        return self.decode_points(arr)[0]

    def decode_points(self, arr):
        """(..., 3, L, B) -> flat list of host points (lane-major)."""
        arr = np.asarray(arr)
        fp, p = self.fp, self.spec.p
        coords = fp.decode(arr)  # (..., 3, B) object
        flat = coords.reshape(-1, 3, coords.shape[-1])
        out = []
        for blk in flat:
            for i in range(blk.shape[-1]):
                X, Y, Z = blk[0][i], blk[1][i], blk[2][i]
                if Z == 0:
                    out.append(None)
                elif Z == 1:
                    out.append((X, Y))
                else:
                    zi = pow(Z, p - 2, p)
                    out.append((X * zi % p, Y * zi % p))
        return out

    def decode_points_affine(self, xy) -> list:
        """Device to_affine output (..., 2, L, B) -> host points; (0, 0)
        decodes to infinity (not a curve point for b != 0 curves).  Host
        cost is limb recomposition only — no per-point modular inverse."""
        arr = np.asarray(xy)
        coords = self.fp.decode(arr)  # (..., 2, B) object
        flat = coords.reshape(-1, 2, coords.shape[-1])
        out = []
        for blk in flat:
            for i in range(blk.shape[-1]):
                X, Y = blk[0][i], blk[1][i]
                out.append(None if X == 0 and Y == 0 else (X, Y))
        return out

    def encode_scalars(self, scalars) -> np.ndarray:
        """Host ints shape S -> S[:-1] + (SL, S[-1]) plain 16-bit limbs mod r."""
        SL = self.fr.L
        xs = np.asarray(scalars, dtype=object)
        assert xs.ndim >= 1
        out = np.empty(xs.shape[:-1] + (SL, xs.shape[-1]), dtype=np.uint32)
        for idx in np.ndindex(xs.shape):
            out[idx[:-1] + (slice(None), idx[-1])] = int_to_limbs(
                int(xs[idx]) % self.spec.r, SL
            )
        return out

    # ------------------------------------------------------------ predicates
    def is_inf(self, P: Array) -> Array:
        return self.fp.is_zero(P[..., 2, :, :])

    def eq(self, P: Array, Q: Array) -> Array:
        """Projective equality: X1 Z2 == X2 Z1 and Y1 Z2 == Y2 Z1."""
        fp = self.fp
        a, b, c, d = self.F.mul_many(
            [P[..., 0, :, :], Q[..., 0, :, :], P[..., 1, :, :], Q[..., 1, :, :]],
            [Q[..., 2, :, :], P[..., 2, :, :], Q[..., 2, :, :], P[..., 2, :, :]],
        )
        return jnp.logical_and(fp.eq(a, b), fp.eq(c, d))

    def select(self, mask: Array, P: Array, Q: Array) -> Array:
        """mask (..., B) ? P : Q."""
        return jnp.where(mask[..., None, None, :], P, Q)

    # ------------------------------------------------------------- group law
    def neg(self, P: Array) -> Array:
        return P.at[..., 1, :, :].set(self.fp.neg(P[..., 1, :, :]))

    def _unstack(self, P: Array):
        return P[..., 0, :, :], P[..., 1, :, :], P[..., 2, :, :]

    def double(self, P: Array) -> Array:
        if field._pallas_enabled():
            from .kernels.g1_pallas import double_pallas

            return double_pallas(self.spec.p, self.fp.L, self.F.b3, P)
        X3, Y3, Z3 = weier.double_complete(self.F, self._unstack(P))
        return jnp.stack([X3, Y3, Z3], axis=-3)

    def add(self, P: Array, Q: Array) -> Array:
        if field._pallas_enabled():
            from .kernels.g1_pallas import add_pallas

            return add_pallas(self.spec.p, self.fp.L, self.F.b3, P, Q)
        X3, Y3, Z3 = weier.add_complete(self.F, self._unstack(P), self._unstack(Q))
        return jnp.stack([X3, Y3, Z3], axis=-3)

    def dbl_add_select(self, P: Array, Q: Array, sel: Array) -> Array:
        """select(sel, 2P + Q, 2P) — the scalar-mul inner step, fused on TPU."""
        if field._pallas_enabled():
            from .kernels.g1_pallas import dbladd_pallas

            return dbladd_pallas(self.spec.p, self.fp.L, self.F.b3, P, Q, sel)
        acc = self.double(P)
        return self.select(sel, self.add(acc, Q), acc)

    def add_select(self, P: Array, Q: Array, sel: Array) -> Array:
        """select(sel, P + Q, Q) — the segmented-scan combiner, fused on TPU."""
        if field._pallas_enabled():
            from .kernels.g1_pallas import addsel_pallas

            return addsel_pallas(self.spec.p, self.fp.L, self.F.b3, P, Q, sel)
        return self.select(sel, self.add(P, Q), Q)

    def add_select_neg(self, P: Array, Q: Array, sel: Array, neg: Array) -> Array:
        """select(sel, P + Q', Q') with Q' = (neg ? -Q : Q) — the signed-digit
        MSM combiner; negation fused into the kernel on TPU."""
        if field._pallas_enabled():
            from .kernels.g1_pallas import addselneg_pallas

            return addselneg_pallas(
                self.spec.p, self.fp.L, self.F.b3, P, Q, sel, neg
            )
        Qn = self.select(neg, self.neg(Q), Q)
        return self.select(sel, self.add(P, Qn), Qn)

    def _lift(self, Q: Array) -> Array:
        """Affine (..., 2, L, B) -> projective with Z = 1."""
        one = jnp.broadcast_to(
            jnp.asarray(self.fp.one_mont), Q.shape[:-3] + Q.shape[-2:]
        )
        return jnp.concatenate([Q, one[..., None, :, :]], axis=-3)

    def madd_select(self, P: Array, Q: Array, sel: Array) -> Array:
        """select(sel, P + lift(Q), lift(Q)) with Q AFFINE (..., 2, L, B).

        The mixed-add MSM combiner: a third less gather traffic and one
        fewer field mul than add_select (gnark's MultiExp also banks on
        affine input points, bls12381/bls12-381.go:766-783).  Q must not
        be infinity (MSM keeps infinity contributions in dead buckets)."""
        if field._pallas_enabled():
            from .kernels.g1_pallas import maddsel_pallas

            return maddsel_pallas(self.spec.p, self.fp.L, self.F.b3, P, Q, sel)
        return self.add_select(P, self._lift(Q), sel)

    def madd_select_neg(self, P: Array, Q: Array, sel: Array, neg: Array) -> Array:
        """Mixed-add combiner with fused conditional negation (signed digits)."""
        if field._pallas_enabled():
            from .kernels.g1_pallas import maddselneg_pallas

            return maddselneg_pallas(
                self.spec.p, self.fp.L, self.F.b3, P, Q, sel, neg
            )
        return self.add_select_neg(P, self._lift(Q), sel, neg)

    def sub(self, P: Array, Q: Array) -> Array:
        return self.add(P, self.neg(Q))

    # ---------------------------------------------------------- scalar mul --
    def _scalar_bit(self, scalars: Array, bit_index) -> Array:
        """Bit ``bit_index`` (traced) of batched scalar limbs (..., S, B)."""
        limb = bit_index // LIMB_BITS
        shift = bit_index % LIMB_BITS
        word = jnp.take(scalars, limb, axis=-2)
        return (word >> shift) & 1  # (..., B)

    def _acc_shape(self, P: Array, *scalar_batches) -> tuple:
        lanes = jnp.broadcast_shapes(
            P.shape[-1:], *(s.shape[-1:] for s in scalar_batches)
        )
        lead = jnp.broadcast_shapes(
            P.shape[:-3], *(s.shape[:-2] for s in scalar_batches)
        )
        return lead + P.shape[-3:-1] + lanes

    def scalar_mul(self, P: Array, scalars: Array) -> Array:
        """[k]P, batched; fixed trip count = r.bit_length() (constant-time
        shape, like the double-and-add at driver/kilic/bls12-381.go:40-50
        but with no data-dependent branching).

        On TPU the ENTIRE ladder runs as one fused kernel launch (the
        accumulator never leaves VMEM) instead of nbits dbl_add_select
        launches."""
        nbits = self.nbits
        if field._pallas_enabled():
            from .kernels.g1_pallas import smul_pallas

            return smul_pallas(
                self.spec.p, self.fp.L, self.F.b3, P, scalars, nbits
            )
        acc0 = jnp.broadcast_to(jnp.asarray(self.inf), self._acc_shape(P, scalars))

        def body(acc, t):
            bit = self._scalar_bit(scalars, nbits - 1 - t)
            acc = self.dbl_add_select(acc, P, bit.astype(bool))
            return acc, None

        acc, _ = jax.lax.scan(body, acc0, jnp.arange(nbits))
        return acc

    def mul2(self, P: Array, e: Array, Q: Array, f: Array) -> Array:
        """[e]P + [f]Q via shared doublings (Strauss-Shamir, the batched
        analogue of bls12381/bls12-381.go:869-937)."""
        nbits = self.nbits
        PQ = self.add(P, Q)
        acc0 = jnp.broadcast_to(jnp.asarray(self.inf), self._acc_shape(PQ, e, f))

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
        """Batched projective -> affine (x, y); infinity maps to (0, 0).

        Uses the parallel product-tree batch inversion (~3N muls + one
        pow chain) instead of N independent inversion chains."""
        fp = self.fp
        zi = fp.batch_inv(P[..., 2, :, :])
        x, y = self.F.mul_many([P[..., 0, :, :], P[..., 1, :, :]], [zi, zi])
        inf = self.is_inf(P)
        zero = jnp.zeros_like(x)
        return fp.select(~inf, x, zero), fp.select(~inf, y, zero)

    def to_affine_rows(self, P: Array) -> Array:
        """Projective (..., 3, L, B) -> affine (..., 2, L, B); inf -> (0,0)."""
        x, y = self.to_affine(P)
        return jnp.stack([x, y], axis=-3)

    def sum_reduce(self, P: Array) -> Array:
        """Tree-reduce a point batch along the LANE axis -> (..., 3, L, 1)."""
        n = P.shape[-1]
        while n > 1:
            half = n // 2
            even = P[..., 0 : 2 * half : 2]
            odd = P[..., 1 : 2 * half : 2]
            combined = self.add(even, odd)
            if n % 2:
                combined = jnp.concatenate([combined, P[..., 2 * half :]], axis=-1)
            P = combined
            n = P.shape[-1]
        return P

    def sum_reduce_axis(self, P: Array, axis: int) -> Array:
        """Tree-reduce along a leading batch axis (e.g. device gather dim)."""
        P = jnp.moveaxis(P, axis, 0)
        n = P.shape[0]
        while n > 1:
            half = n // 2
            combined = self.add(P[: 2 * half : 2], P[1 : 2 * half : 2])
            if n % 2:
                combined = jnp.concatenate([combined, P[2 * half :]], axis=0)
            P = combined
            n = P.shape[0]
        return P[0]


@lru_cache(maxsize=None)
def get_g1_ctx(spec: CurveSpec) -> G1Ctx:
    return G1Ctx(spec)
