"""Batched G2 group law on the sextic twist E'(Fp2).

Same complete RCB formulas as G1 (ops/weier.py) instantiated over Fp2: a
point batch is (..., 3, 2, L, B) stacking (X, Y, Z) Fp2 coordinates.
Replaces the reference's per-backend G2 code (driver/kilic/bls12-381.go
G2 section, driver/gurvy/bn254.go:91-160).

On TPU the Fp2 multiplies inside ride the Pallas Montgomery kernel through
TowerCtx.f2_mul (stacked width-3 base muls), so no dedicated G2 kernel is
needed for decent throughput; a fused kernel is a later optimization.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.params import CurveSpec, Fp2Int
from . import weier
from .field import LIMB_BITS, int_to_limbs
from .tower import TowerCtx, get_tower_ctx

Array = jax.Array


class Fp2Adapter(weier.FieldAdapter):
    """weier.FieldAdapter over Fp2 (stack axis -4)."""

    def __init__(self, tw: TowerCtx, b2: Fp2Int):
        self.tw = tw
        p = tw.spec.p
        self.b3 = ((3 * b2[0]) % p, (3 * b2[1]) % p)

    def add(self, a, b):
        return self.tw.f2_add(a, b)

    def sub(self, a, b):
        return self.tw.f2_sub(a, b)

    def _zip(self, xs, ys):
        xs = list(jnp.broadcast_arrays(*xs)) if len(xs) > 1 else list(xs)
        ys = list(jnp.broadcast_arrays(*ys)) if len(ys) > 1 else list(ys)
        a = jnp.stack(xs, axis=-4)
        b = jnp.stack(ys, axis=-4)
        a, b = jnp.broadcast_arrays(a, b)
        return a, b

    def mul_many(self, xs, ys):
        a, b = self._zip(xs, ys)
        out = self.tw.f2_mul(a, b)
        return tuple(out[..., i, :, :, :] for i in range(len(xs)))

    def add_many(self, xs, ys):
        a, b = self._zip(xs, ys)
        out = self.tw.f2_add(a, b)
        return tuple(out[..., i, :, :, :] for i in range(len(xs)))

    def sub_many(self, xs, ys):
        a, b = self._zip(xs, ys)
        out = self.tw.f2_sub(a, b)
        return tuple(out[..., i, :, :, :] for i in range(len(xs)))

    def mul_b3(self, a):
        return self.tw.f2_mul_const(a, self.b3)


class G2Ctx:
    def __init__(self, spec: CurveSpec):
        self.spec = spec
        self.tw: TowerCtx = get_tower_ctx(spec)
        self.fp = self.tw.fp
        from .field import get_fp_ctx

        self.fr = get_fp_ctx(spec.r, spec.name + "_fr")
        self.F = Fp2Adapter(self.tw, spec.b2)
        # fused Pallas kernels need beta == -1 and a small twist constant
        # (BLS12-381: b3 = (12, 12)); other curves ride the stacked-f2 path
        self._pallas_b3 = (
            tuple(self.F.b3)
            if spec.beta == spec.p - 1
            and all(0 <= c < 256 for c in self.F.b3)
            and any(self.F.b3)
            else None
        )
        t = self.tw
        gx, gy = spec.g2_gen
        self.gen = np.stack([t.f2_encode(gx), t.f2_encode(gy), t.f2_encode((1, 0))])
        self.inf = np.stack(
            [t.f2_encode((0, 0)), t.f2_encode((1, 0)), t.f2_encode((0, 0))]
        )
        self.nbits = spec.r.bit_length()

    # ------------------------------------------------------------ host <-> --
    def encode_point(self, P) -> np.ndarray:
        """Affine host ((x0,x1),(y0,y1)) or None -> (3, 2, L, 1)."""
        if P is None:
            return self.inf.copy()
        x, y = P
        t = self.tw
        return np.stack([t.f2_encode(x), t.f2_encode(y), t.f2_encode((1, 0))])

    def encode_points(self, pts) -> np.ndarray:
        return np.concatenate([self.encode_point(P) for P in pts], axis=-1)

    def decode_points(self, arr):
        arr = np.asarray(arr)
        t, p = self.tw, self.spec.p
        out = []
        flat = arr.reshape((-1,) + arr.shape[-4:]) if arr.ndim > 4 else arr[None]
        for blk in flat:
            X = t.f2_decode(blk[0])
            Y = t.f2_decode(blk[1])
            Z = t.f2_decode(blk[2])
            for i in range(len(X)):
                if Z[i] == (0, 0):
                    out.append(None)
                else:
                    zi = t.host.f2_inv(Z[i])
                    out.append((t.host.f2_mul(X[i], zi), t.host.f2_mul(Y[i], zi)))
        return out

    def decode_point(self, arr):
        return self.decode_points(np.asarray(arr))[0]

    def encode_scalars(self, scalars) -> np.ndarray:
        SL = self.fr.L
        xs = np.asarray(scalars, dtype=object)
        out = np.empty(xs.shape[:-1] + (SL, xs.shape[-1]), dtype=np.uint32)
        for idx in np.ndindex(xs.shape):
            out[idx[:-1] + (slice(None), idx[-1])] = int_to_limbs(
                int(xs[idx]) % self.spec.r, SL
            )
        return out

    # ------------------------------------------------------------ group law -
    def is_inf(self, P: Array) -> Array:
        return self.tw.f2_is_zero(P[..., 2, :, :, :])

    def eq(self, P: Array, Q: Array) -> Array:
        a, b, c, d = self.F.mul_many(
            [P[..., 0, :, :, :], Q[..., 0, :, :, :],
             P[..., 1, :, :, :], Q[..., 1, :, :, :]],
            [Q[..., 2, :, :, :], P[..., 2, :, :, :],
             Q[..., 2, :, :, :], P[..., 2, :, :, :]],
        )
        return jnp.logical_and(self.tw.f2_eq(a, b), self.tw.f2_eq(c, d))

    def select(self, mask: Array, P: Array, Q: Array) -> Array:
        """mask (..., B) ? P : Q over (..., 3, 2, L, B) point batches."""
        return jnp.where(mask[..., None, None, None, :], P, Q)

    def neg(self, P: Array) -> Array:
        return P.at[..., 1, :, :, :].set(self.tw.f2_neg(P[..., 1, :, :, :]))

    def _unstack(self, P: Array):
        return P[..., 0, :, :, :], P[..., 1, :, :, :], P[..., 2, :, :, :]

    def double(self, P: Array) -> Array:
        from .field import _pallas_enabled

        if self._pallas_b3 and _pallas_enabled():
            from .kernels.g2_pallas import double_pallas

            return double_pallas(self.spec.p, self.fp.L, self._pallas_b3, P)
        X3, Y3, Z3 = weier.double_complete(self.F, self._unstack(P))
        return jnp.stack([X3, Y3, Z3], axis=-4)

    def add(self, P: Array, Q: Array) -> Array:
        from .field import _pallas_enabled

        if self._pallas_b3 and _pallas_enabled():
            from .kernels.g2_pallas import add_pallas

            return add_pallas(self.spec.p, self.fp.L, self._pallas_b3, P, Q)
        X3, Y3, Z3 = weier.add_complete(self.F, self._unstack(P), self._unstack(Q))
        return jnp.stack([X3, Y3, Z3], axis=-4)

    def add_select(self, P: Array, Q: Array, sel: Array) -> Array:
        """select(sel, P + Q, Q) — fused on TPU."""
        from .field import _pallas_enabled

        if self._pallas_b3 and _pallas_enabled():
            from .kernels.g2_pallas import addsel_pallas

            return addsel_pallas(self.spec.p, self.fp.L, self._pallas_b3, P, Q, sel)
        return self.select(sel, self.add(P, Q), Q)

    def dbl_add_select(self, P: Array, Q: Array, sel: Array) -> Array:
        """select(sel, 2P + Q, 2P) — the scalar-mul inner step, fused on TPU."""
        from .field import _pallas_enabled

        if self._pallas_b3 and _pallas_enabled():
            from .kernels.g2_pallas import dblsel_pallas

            return dblsel_pallas(self.spec.p, self.fp.L, self._pallas_b3, P, Q, sel)
        acc = self.double(P)
        return self.select(sel, self.add(acc, Q), acc)

    def sub(self, P: Array, Q: Array) -> Array:
        return self.add(P, self.neg(Q))

    # ---------------------------------------------------------- scalar mul --
    def _scalar_bit(self, scalars: Array, bit_index) -> Array:
        limb = bit_index // LIMB_BITS
        shift = bit_index % LIMB_BITS
        word = jnp.take(scalars, limb, axis=-2)
        return (word >> shift) & 1

    def scalar_mul(self, P: Array, scalars: Array) -> Array:
        from .field import _pallas_enabled

        nbits = self.nbits
        if self._pallas_b3 and _pallas_enabled():
            # whole ladder in ONE fused kernel launch
            from .kernels.g2_pallas import g2_smul_pallas

            return g2_smul_pallas(
                self.spec.p, self.fp.L, self._pallas_b3, P, scalars, nbits
            )
        lanes = jnp.broadcast_shapes(P.shape[-1:], scalars.shape[-1:])
        lead = jnp.broadcast_shapes(P.shape[:-4], scalars.shape[:-2])
        acc0 = jnp.broadcast_to(
            jnp.asarray(self.inf), lead + P.shape[-4:-1] + lanes
        )

        def body(acc, t):
            bit = self._scalar_bit(scalars, nbits - 1 - t)
            return self.dbl_add_select(acc, P, bit.astype(bool)), None

        acc, _ = jax.lax.scan(body, acc0, jnp.arange(nbits))
        return acc

    def to_affine(self, P: Array) -> Tuple[Array, Array]:
        t = self.tw
        zi = t.f2_inv(P[..., 2, :, :, :])
        x, y = self.F.mul_many(
            [P[..., 0, :, :, :], P[..., 1, :, :, :]], [zi, zi]
        )
        inf = self.is_inf(P)
        zero = jnp.zeros_like(x)
        return (
            t.f2_select(~inf, x, zero),
            t.f2_select(~inf, y, zero),
        )

    def sum_reduce(self, P: Array) -> Array:
        n = P.shape[-1]
        while n > 1:
            half = n // 2
            combined = self.add(P[..., 0 : 2 * half : 2], P[..., 1 : 2 * half : 2])
            if n % 2:
                combined = jnp.concatenate([combined, P[..., 2 * half :]], axis=-1)
            P = combined
            n = P.shape[-1]
        return P


@lru_cache(maxsize=None)
def get_g2_ctx(spec: CurveSpec) -> G2Ctx:
    return G2Ctx(spec)
