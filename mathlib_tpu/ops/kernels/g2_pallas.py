"""Fused Pallas kernels for the complete G2 group law on the twist E'(Fp2).

Same shape as g1_pallas.py one level up the tower: one kernel launch = one
full RCB point operation with all Fp2 multiplies (3 base Montgomery muls
each, Karatsuba) and every intermediate in VMEM/vector registers.  Replaces
the stacked-XLA path that round 1 shipped (ops/g2.py docstring called the
fused kernel "a later optimization" — this is it).

Points are (3, 2, L, B) uint32 (projective, Fp2 = Fp[u]/(u^2 + 1) pairs,
Montgomery limbs, relaxed [0,2p)); kernels view them as (3, 2L, M, 128)
tiles.  Requires beta = -1 (all supported BN/BLS12 curves).  Formulas are
RCB (eprint 2015/1060, Algs 7 & 9, a=0) — identical math to ops/weier.py
through the Fp2Adapter, so kernels are bit-compatible with the XLA path.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Tuple

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fp_rows import RowCtx
from .g1_pallas import _mm_serial, _mm_stacked, _stacked_env

TILE_SUBLANES = 8
TILE = TILE_SUBLANES * 128


class Row2Ctx:
    """Fp2 arithmetic on pairs of limb-row vectors (beta = -1).

    ``mul_many`` runs a LEVEL of independent Fp2 multiplies through one
    mul-many strategy (g1_pallas): each Fp2 product is 3 Karatsuba base
    muls, so k Fp2 muls stack into (3k*8, 128) CIOS rows under the
    stacked strategy — the pipeline-filling transform from the pairing
    kernel, one tower level up."""

    def __init__(self, p: int, L: int, b3: Tuple[int, int], mm=_mm_serial):
        self.F = RowCtx(p, L)
        self.L = L
        assert all(0 < c < 256 or c == 0 for c in b3) and any(b3)
        self.b3 = b3
        self.mm = mm
        # lazy Fp2 reduction (same bound story as the pairing tower,
        # beta = -1 here by construction): 5L^2 multiplies per Fp2 mul
        # instead of 6L^2 when 8p <= R
        from .pairing_pallas import _LAZY_F2

        self.lazy = 8 * p <= (1 << (16 * L)) and _LAZY_F2
        if self.lazy:
            off = 4 * p * p
            self.off_4p2 = tuple(
                (off >> (16 * k)) & 0xFFFF for k in range(2 * L)
            )

    # an Fp2 element is (rows_c0, rows_c1)
    def add(self, a, b):
        F = self.F
        return (F.add(a[0], b[0]), F.add(a[1], b[1]))

    def sub(self, a, b):
        F = self.F
        return (F.sub(a[0], b[0]), F.sub(a[1], b[1]))

    def mul_many(self, pairs):
        """A level of independent Fp2 products (Karatsuba, u^2 = -1).

        Lazy towers route through MulBatch.push_f2 (3 unreduced stacked
        products + 2 stacked REDCs per Fp2 mul)."""
        F = self.F
        if self.lazy:
            from .pairing_pallas import MulBatch

            mb = MulBatch(F)
            ks = [mb.push_f2(a, b, self.off_4p2) for a, b in pairs]
            o = mb.run()
            return [o.f2v[k] for k in ks]
        base = []
        for a, b in pairs:
            base.append((a[0], b[0]))
            base.append((a[1], b[1]))
            base.append((F.add(a[0], a[1]), F.add(b[0], b[1])))
        outs = self.mm(F, base)
        res = []
        for i in range(len(pairs)):
            t0, t1, t2 = outs[3 * i : 3 * i + 3]
            re = F.sub(t0, t1)
            im = F.sub(t2, F.add(t0, t1))
            res.append((re, im))
        return res

    def mul(self, a, b):
        """Karatsuba over u^2 = -1: 3 base muls."""
        return self.mul_many([(a, b)])[0]

    def sqr_many(self, items):
        """A level of independent Fp2 squarings: 2 base muls each."""
        F = self.F
        base = []
        for a in items:
            base.append((F.add(a[0], a[1]), F.sub(a[0], a[1])))
            base.append((a[0], a[1]))
        outs = self.mm(F, base)
        res = []
        for i in range(len(items)):
            re, im = outs[2 * i : 2 * i + 2]
            res.append((re, F.add(im, im)))
        return res

    def sqr(self, a):
        """(a0+a1)(a0-a1) + 2 a0 a1 u: 2 base muls."""
        return self.sqr_many([a])[0]

    def mul_b3(self, a):
        """a * (c0 + c1 u) for the small twist constant 3*b2."""
        F = self.F
        c0, c1 = self.b3
        if c1 == 0:
            return (F.mul_small(a[0], c0), F.mul_small(a[1], c0))
        if c0 == 0:
            return (F.sub(self._zero(a), F.mul_small(a[1], c1)), F.mul_small(a[0], c1))
        if c0 == c1:
            s = F.mul_small(F.sub(a[0], a[1]), c0)
            t = F.mul_small(F.add(a[0], a[1]), c0)
            return (s, t)
        return (
            F.sub(F.mul_small(a[0], c0), F.mul_small(a[1], c1)),
            F.add(F.mul_small(a[1], c0), F.mul_small(a[0], c1)),
        )

    def _zero(self, a):
        return [jnp.zeros_like(a[0][0]) for _ in range(self.L)]


def _read_point(ref, L):
    """(3, 2L, TS, 128) ref -> 3 Fp2 coords as (rows0, rows1) pairs."""
    return tuple(
        ([ref[c, i] for i in range(L)], [ref[c, L + i] for i in range(L)])
        for c in range(3)
    )


def _write_point(ref, P, L):
    for c in range(3):
        for i in range(L):
            ref[c, i] = P[c][0][i]
            ref[c, L + i] = P[c][1][i]


def _rcb_add(F: Row2Ctx, P, Q):
    """RCB Algorithm 7 (a=0) over Fp2; two 6-mul dependency levels."""
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    t0, t1, t2, s3, s4, s5 = F.mul_many(
        [
            (X1, X2),
            (Y1, Y2),
            (Z1, Z2),
            (F.add(X1, Y1), F.add(X2, Y2)),
            (F.add(Y1, Z1), F.add(Y2, Z2)),
            (F.add(X1, Z1), F.add(X2, Z2)),
        ]
    )
    t3 = F.sub(s3, F.add(t0, t1))
    t4 = F.sub(s4, F.add(t1, t2))
    ln = F.sub(s5, F.add(t0, t2))
    t0_3 = F.add(F.add(t0, t0), t0)
    t2b = F.mul_b3(t2)
    lnb = F.mul_b3(ln)
    z3t = F.add(t1, t2b)
    t1m = F.sub(t1, t2b)
    xa, xb, ya, yb, za, zb = F.mul_many(
        [(t3, t1m), (t4, lnb), (t1m, z3t), (lnb, t0_3), (z3t, t4), (t0_3, t3)]
    )
    return (F.sub(xa, xb), F.add(ya, yb), F.add(za, zb))


def _rcb_double(F: Row2Ctx, P):
    """RCB Algorithm 9 (a=0) over Fp2; 4+4 mul levels (squares ride the
    general Karatsuba so each level is ONE stacked call)."""
    X1, Y1, Z1 = P
    t0, t1, zz, xy = F.mul_many(
        [(Y1, Y1), (Y1, Z1), (Z1, Z1), (X1, Y1)]
    )
    z3t = (F.F.mul_small(t0[0], 8), F.F.mul_small(t0[1], 8))
    t2 = F.mul_b3(zz)
    y3t = F.add(t0, t2)
    t2_3 = F.add(F.add(t2, t2), t2)
    t0m = F.sub(t0, t2_3)
    dxa, dya, dyb, dz = F.mul_many(
        [(t0m, xy), (t2, z3t), (t0m, y3t), (t1, z3t)]
    )
    return (F.add(dxa, dxa), F.add(dya, dyb), dz)


def _add_kernel(F: Row2Ctx, p_ref, q_ref, o_ref):
    L = F.L
    _write_point(o_ref, _rcb_add(F, _read_point(p_ref, L), _read_point(q_ref, L)), L)


def _double_kernel(F: Row2Ctx, p_ref, o_ref):
    L = F.L
    _write_point(o_ref, _rcb_double(F, _read_point(p_ref, L)), L)


def _addsel_kernel(F: Row2Ctx, p_ref, q_ref, sel_ref, o_ref):
    """out = select(sel, P + Q, Q) — segmented-scan combiner."""
    L = F.L
    P = _read_point(p_ref, L)
    Q = _read_point(q_ref, L)
    A = _rcb_add(F, P, Q)
    sel = sel_ref[0] != 0
    out = tuple(
        (
            [jnp.where(sel, a[0][i], b[0][i]) for i in range(L)],
            [jnp.where(sel, a[1][i], b[1][i]) for i in range(L)],
        )
        for a, b in zip(A, Q)
    )
    _write_point(o_ref, out, L)


def _dblsel_kernel(F: Row2Ctx, p_ref, q_ref, sel_ref, o_ref):
    """out = select(sel, 2P + Q, 2P) — the scalar-mul inner step."""
    L = F.L
    D = _rcb_double(F, _read_point(p_ref, L))
    A = _rcb_add(F, D, _read_point(q_ref, L))
    sel = sel_ref[0] != 0
    out = tuple(
        (
            [jnp.where(sel, a[0][i], d[0][i]) for i in range(L)],
            [jnp.where(sel, a[1][i], d[1][i]) for i in range(L)],
        )
        for a, d in zip(A, D)
    )
    _write_point(o_ref, out, L)


def _point_spec(L):
    return pl.BlockSpec(
        (3, 2 * L, TILE_SUBLANES, 128), lambda g: (0, 0, g, 0), memory_space=pltpu.VMEM
    )


@lru_cache(maxsize=None)
def _build(
    p: int, L: int, b3: Tuple[int, int], which: str, stacked: bool,
    interpret: bool,
):
    F = Row2Ctx(p, L, b3, _mm_stacked if stacked else _mm_serial)
    spec = _point_spec(L)
    sel_spec = pl.BlockSpec(
        (1, TILE_SUBLANES, 128), lambda g: (0, g, 0), memory_space=pltpu.VMEM
    )

    if which == "add":
        kernel = partial(_add_kernel, F)
        specs = [spec, spec]
    elif which == "double":
        kernel = partial(_double_kernel, F)
        specs = [spec]
    elif which == "addsel":
        kernel = partial(_addsel_kernel, F)
        specs = [spec, spec, sel_spec]
    elif which == "dblsel":
        kernel = partial(_dblsel_kernel, F)
        specs = [spec, spec, sel_spec]
    else:  # pragma: no cover
        raise ValueError(which)

    @jax.jit
    def run(*args):
        M = args[0].shape[2]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(args[0].shape, jnp.uint32),
            grid=(M // TILE_SUBLANES,),
            in_specs=specs,
            out_specs=spec,
            interpret=interpret,
        )(*args)

    return run


def _to_tiles(P):
    """(..., 3, 2, L, B) -> ((3, 2L, M, 128), restore_fn)."""
    shape = P.shape
    lead = shape[:-4]
    B = shape[-1]
    L = shape[-2]
    # fold the Fp2 pair axis into rows: (..., 3, 2L, B)
    P2 = jnp.moveaxis(P, (-4, -3, -2), (0, 1, 2)).reshape(3, 2 * L, -1)
    tot = P2.shape[-1]
    pad = (-tot) % TILE
    if pad:
        P2 = jnp.pad(P2, [(0, 0), (0, 0), (0, pad)])
    M = P2.shape[-1] // 128
    P3 = P2.reshape(3, 2 * L, M, 128)

    def restore(out):
        out = out.reshape(3, 2 * L, M * 128)[..., :tot]
        out = out.reshape((3, 2, L) + lead + (B,))
        return jnp.moveaxis(out, (0, 1, 2), (-4, -3, -2))

    return P3, restore


def _sel_tiles(sel, P):
    sel = jnp.broadcast_to(sel, P.shape[:-4] + P.shape[-1:])
    s2 = sel.reshape(1, -1).astype(jnp.uint32)
    pad = (-s2.shape[-1]) % TILE
    if pad:
        s2 = jnp.pad(s2, [(0, 0), (0, pad)])
    return s2.reshape(1, -1, 128)


def add_pallas(p, L, b3, P, Q, interpret=False):
    P, Q = jnp.broadcast_arrays(P, Q)
    P3, restore = _to_tiles(P)
    Q3, _ = _to_tiles(Q)
    return restore(_build(p, L, b3, "add", _stacked_env(), interpret)(P3, Q3))


def double_pallas(p, L, b3, P, interpret=False):
    P3, restore = _to_tiles(P)
    return restore(_build(p, L, b3, "double", _stacked_env(), interpret)(P3))


def addsel_pallas(p, L, b3, P, Q, sel, interpret=False):
    P, Q = jnp.broadcast_arrays(P, Q)
    P3, restore = _to_tiles(P)
    Q3, _ = _to_tiles(Q)
    s3 = _sel_tiles(sel, P)
    return restore(_build(p, L, b3, "addsel", _stacked_env(), interpret)(P3, Q3, s3))


def dblsel_pallas(p, L, b3, P, Q, sel, interpret=False):
    P, Q = jnp.broadcast_arrays(P, Q)
    P3, restore = _to_tiles(P)
    Q3, _ = _to_tiles(Q)
    s3 = _sel_tiles(sel, P)
    return restore(_build(p, L, b3, "dblsel", _stacked_env(), interpret)(P3, Q3, s3))


# ---------------------------------------------------------------------------
# fused G2 scalar-mul chain kernels (whole ladder per launch) — the G2
# analogue of g1_pallas._smul_kernel; backs G2Ctx.scalar_mul and the
# hash-to-G2 endomorphism cofactor ladders.
# ---------------------------------------------------------------------------


def _g2_smul_kernel(
    F: Row2Ctx, one_limbs, nbits: int, s_ref, q_ref, o_ref
):
    """out = [k] Q (projective over Fp2) with per-lane scalar bits."""
    L = F.L
    Q = _read_point(q_ref, L)
    zero_r = [jnp.zeros_like(Q[0][0][0]) for _ in range(L)]
    one_r = [jnp.full_like(Q[0][0][0], v) for v in one_limbs]

    def sel_pt(bit, A, D):
        return tuple(
            (
                [jnp.where(bit, a[0][i], d[0][i]) for i in range(L)],
                [jnp.where(bit, a[1][i], d[1][i]) for i in range(L)],
            )
            for a, d in zip(A, D)
        )

    def body(i, acc):
        D = _rcb_double(F, acc)
        A = _rcb_add(F, D, Q)
        idx = nbits - 1 - i
        word = s_ref[idx // 16]
        bit = ((word >> (idx % 16)) & 1) != 0
        return sel_pt(bit, A, D)

    inf = (
        (list(zero_r), list(zero_r)),
        (list(one_r), list(zero_r)),
        (list(zero_r), list(zero_r)),
    )
    acc = jax.lax.fori_loop(0, nbits, body, inf)
    _write_point(o_ref, acc, L)


def _g2_smul_static_kernel(
    F: Row2Ctx, one_limbs, nbits: int, bits_ref, q_ref, o_ref
):
    """out = [k] Q for one static MSB-first bit array (cofactor ladders)."""
    L = F.L
    Q = _read_point(q_ref, L)
    zero_r = [jnp.zeros_like(Q[0][0][0]) for _ in range(L)]
    one_r = [jnp.full_like(Q[0][0][0], v) for v in one_limbs]
    _write_point(
        o_ref,
        ((zero_r, zero_r), (one_r, zero_r), (zero_r, zero_r)),
        L,
    )

    def body(i, _):
        acc = _read_point(o_ref, L)
        _write_point(o_ref, _rcb_double(F, acc), L)

        @pl.when(bits_ref[i] != 0)
        def _():
            acc = _read_point(o_ref, L)
            _write_point(o_ref, _rcb_add(F, acc, Q), L)

        return 0

    jax.lax.fori_loop(0, nbits, body, 0)


@lru_cache(maxsize=None)
def _build_g2_smul(
    p: int, L: int, b3: Tuple[int, int], nbits: int, S: int, static: bool,
    stacked: bool, interpret: bool,
):
    F = Row2Ctx(p, L, b3, _mm_stacked if stacked else _mm_serial)
    R = 1 << (16 * L)
    one_limbs = tuple(((R % p) >> (16 * k)) & 0xFFFF for k in range(L))
    spec = _point_spec(L)
    if static:
        kernel = partial(_g2_smul_static_kernel, F, one_limbs, nbits)
        first_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    else:
        kernel = partial(_g2_smul_kernel, F, one_limbs, nbits)
        first_spec = pl.BlockSpec(
            (S, TILE_SUBLANES, 128), lambda g: (0, g, 0),
            memory_space=pltpu.VMEM,
        )

    @jax.jit
    def run(first, q):
        M = q.shape[2]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((3, 2 * L, M, 128), jnp.uint32),
            grid=(M // TILE_SUBLANES,),
            in_specs=[first_spec, spec],
            out_specs=spec,
            interpret=interpret,
            compiler_params=None
            if interpret
            else pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        )(first, q)

    return run


def g2_smul_pallas(p, L, b3, Q, scalars, nbits, interpret=False):
    """[k] Q for projective G2 (..., 3, 2, L, B) and per-lane scalars."""
    lanes = jnp.broadcast_shapes(Q.shape[-1:], scalars.shape[-1:])
    lead = jnp.broadcast_shapes(Q.shape[:-4], scalars.shape[:-2])
    Q = jnp.broadcast_to(Q, lead + (3, 2) + Q.shape[-2:-1] + lanes)
    S = scalars.shape[-2]
    scalars = jnp.broadcast_to(scalars, lead + (S,) + lanes)
    Q3, restore = _to_tiles(Q)
    s2 = jnp.moveaxis(scalars, -2, 0).reshape(S, -1)
    tot = s2.shape[-1]
    pad = (-tot) % TILE
    if pad:
        s2 = jnp.pad(s2, [(0, 0), (0, pad)])
    s3 = s2.reshape(S, -1, 128)
    out = _build_g2_smul(
        p, L, tuple(b3), nbits, S, False, _stacked_env(), interpret
    )(s3, Q3)
    return restore(out)


def g2_smul_static_pallas(p, L, b3, Q, bits, interpret=False):
    """[k] Q for one static MSB-first bit array."""
    Q3, restore = _to_tiles(Q)
    bits_arr = jnp.asarray(np.asarray(bits, dtype=np.uint32))
    out = _build_g2_smul(
        p, L, tuple(b3), len(bits), 0, True, _stacked_env(), interpret
    )(bits_arr, Q3)
    return restore(out)
