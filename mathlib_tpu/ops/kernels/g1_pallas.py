"""Fused Pallas kernels for the complete projective group law.

One kernel launch = one full RCB point addition (or doubling): all 12 field
multiplies, the REDC reductions, and every intermediate stay in VMEM /
vector registers.  Compared to composing per-op kernels this removes ~30
HBM round-trips per point operation, which is what makes the MSM bucket
accumulation compute-bound.

Points are (3, L, B) uint32 (projective, Montgomery, relaxed [0,2p)),
reshaped to (3, L, M, 128) tiles for the grid.  Formulas are RCB
(eprint 2015/1060, Algs 7 & 9, a=0) — identical math to ops/weier.py, so
the kernel is bit-compatible with the XLA path.
"""

from __future__ import annotations

import os
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fp_rows import RowCtx

TILE_SUBLANES = 8
TILE = TILE_SUBLANES * 128


def _read_point(ref, L):
    return tuple([ref[c, i] for i in range(L)] for c in range(3))


def _write_point(ref, P, L):
    for c in range(3):
        for i in range(L):
            ref[c, i] = P[c][i]


# ---------------------------------------------------------------------------
# mul-many strategies: every RCB formula below routes its field multiplies
# through one of these, taking a list of (a, b) row pairs per dependency
# level.  `serial` runs them as independent (TS, 128) multiplies; `stacked`
# concatenates the level along the sublane axis and runs ONE multiply on
# (k*TS, 128) rows — k independent CIOS chains interleave in the VPU
# pipeline instead of one dependent chain (the same transform that took the
# pairing kernel 10x, BENCH_NOTES round 3).
# ---------------------------------------------------------------------------


# max muls stacked into one RowCtx.mul — bounds the accumulator rows so
# the unrolled CIOS fits VMEM (same cap as pairing_pallas.MUL_CHUNK)
_STACK_CHUNK = 12


def _mm_serial(F: RowCtx, pairs):
    return [F.mul(a, b) for a, b in pairs]


def _mm_stacked(F: RowCtx, pairs):
    L = F.L
    out = []
    for lo in range(0, len(pairs), _STACK_CHUNK):
        chunk = pairs[lo : lo + _STACK_CHUNK]
        if len(chunk) == 1:
            out.append(F.mul(*chunk[0]))
            continue
        TS = chunk[0][0][0].shape[0]
        A = [
            jnp.concatenate([pr[0][i] for pr in chunk], axis=0)
            for i in range(L)
        ]
        B = [
            jnp.concatenate([pr[1][i] for pr in chunk], axis=0)
            for i in range(L)
        ]
        O = F.mul(A, B)
        out.extend(
            [o[m * TS : (m + 1) * TS] for o in O] for m in range(len(chunk))
        )
    return out


def _stacked_env() -> bool:
    # default ON: measured 94.5M vs 77.4M pts/s (73% vs 60% of VPU SoL)
    # for the maddsel combiner on v5e, bitwise-identical results
    # (tools/profile_stacked.py, round 4)
    return os.environ.get("MATHLIB_G1_STACKED", "1") != "0"


# ---------------------------------------------------------------------------
# shared RCB formulas (eprint 2015/1060, a=0) on limb rows
# ---------------------------------------------------------------------------


def _rcb_add_rows(F, b3, P, Q, mm=_mm_serial):
    """RCB Alg 7 complete addition; two 6-mul dependency levels."""
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    t0, t1, t2, s3, s4, s5 = mm(
        F,
        [
            (X1, X2),
            (Y1, Y2),
            (Z1, Z2),
            (F.add(X1, Y1), F.add(X2, Y2)),
            (F.add(Y1, Z1), F.add(Y2, Z2)),
            (F.add(X1, Z1), F.add(X2, Z2)),
        ],
    )
    t3 = F.sub(s3, F.add(t0, t1))
    t4 = F.sub(s4, F.add(t1, t2))
    ln = F.sub(s5, F.add(t0, t2))
    t0_3 = F.add(F.add(t0, t0), t0)
    t2b = F.mul_small(t2, b3)
    lnb = F.mul_small(ln, b3)
    z3t = F.add(t1, t2b)
    t1m = F.sub(t1, t2b)
    xa, xb, ya, yb, za, zb = mm(
        F,
        [(t3, t1m), (t4, lnb), (t1m, z3t), (lnb, t0_3), (z3t, t4), (t0_3, t3)],
    )
    return F.sub(xa, xb), F.add(ya, yb), F.add(za, zb)


def _rcb_dbl_rows(F, b3, P, mm=_mm_serial):
    """RCB Alg 9 exception-free doubling; 4+4 mul levels."""
    X1, Y1, Z1 = P
    t0, t1, zz, xy = mm(F, [(Y1, Y1), (Y1, Z1), (Z1, Z1), (X1, Y1)])
    z3t = F.mul_small(t0, 8)
    t2 = F.mul_small(zz, b3)
    y3t = F.add(t0, t2)
    t2_3 = F.add(F.add(t2, t2), t2)
    t0m = F.sub(t0, t2_3)
    dxa, dya, dyb, dz = mm(F, [(t0m, xy), (t2, z3t), (t0m, y3t), (t1, z3t)])
    return F.add(dxa, dxa), F.add(dya, dyb), dz


def _madd_rows(F, b3, P, Qa, mm=_mm_serial):
    """RCB complete MIXED addition (Alg 7 specialized to Z2 = 1): the
    gathered MSM point is affine, so t2 = Z1 and two cross terms collapse
    to one mul + one add each — 11 full muls instead of 12 and a third
    less gather traffic.  Complete in P (including infinity and P == Q);
    Q must not be infinity (MSM sentinel lanes never reach a bucket)."""
    X1, Y1, Z1 = P
    X2, Y2 = Qa
    t0, t1, s3, zy, zx = mm(
        F,
        [
            (X1, X2),
            (Y1, Y2),
            (F.add(X1, Y1), F.add(X2, Y2)),
            (Z1, Y2),
            (Z1, X2),
        ],
    )
    t3 = F.sub(s3, F.add(t0, t1))
    t4 = F.add(zy, Y1)  # (Y1+Z1)(Y2+1) - t1 - t2
    ln = F.add(zx, X1)
    t0_3 = F.add(F.add(t0, t0), t0)
    t2b = F.mul_small(Z1, b3)
    lnb = F.mul_small(ln, b3)
    z3t = F.add(t1, t2b)
    t1m = F.sub(t1, t2b)
    xa, xb, ya, yb, za, zb = mm(
        F,
        [(t3, t1m), (t4, lnb), (t1m, z3t), (lnb, t0_3), (z3t, t4), (t0_3, t3)],
    )
    return F.sub(xa, xb), F.add(ya, yb), F.add(za, zb)


def _add_kernel(ctx: RowCtx, b3: int, p_ref, q_ref, o_ref, *, mm=_mm_serial):
    """RCB Algorithm 7 (a=0), complete addition."""
    L = ctx.L
    P = _read_point(p_ref, L)
    Q = _read_point(q_ref, L)
    _write_point(o_ref, _rcb_add_rows(ctx, b3, P, Q, mm), L)


def _double_kernel(ctx: RowCtx, b3: int, p_ref, o_ref, *, mm=_mm_serial):
    """RCB Algorithm 9 (a=0), exception-free doubling."""
    L = ctx.L
    P = _read_point(p_ref, L)
    _write_point(o_ref, _rcb_dbl_rows(ctx, b3, P, mm), L)


def _dbladd_kernel(
    ctx: RowCtx, b3: int, p_ref, q_ref, sel_ref, o_ref, *, mm=_mm_serial
):
    """Fused scalar-mul step: out = select(sel, 2*P + Q, 2*P).

    Saves a full kernel launch + point round-trip per scalar bit.
    """
    F = ctx
    L = ctx.L
    P = _read_point(p_ref, L)
    D = _rcb_dbl_rows(F, b3, P, mm)
    Q = _read_point(q_ref, L)
    A = _rcb_add_rows(F, b3, D, Q, mm)

    sel = sel_ref[0] != 0  # (TS, 128) bool
    out = tuple(
        [jnp.where(sel, A[c][i], D[c][i]) for i in range(L)] for c in range(3)
    )
    _write_point(o_ref, out, L)


def _addsel_kernel(
    ctx: RowCtx, b3: int, p_ref, q_ref, sel_ref, o_ref, *, mm=_mm_serial
):
    """Fused segmented-scan step: out = select(sel, P + Q, Q).

    The MSM bucket-accumulation combiner (msm._segment_scan) in one launch.
    """
    F = ctx
    L = ctx.L
    P = _read_point(p_ref, L)
    Q = _read_point(q_ref, L)
    A = _rcb_add_rows(F, b3, P, Q, mm)

    sel = sel_ref[0] != 0
    out = tuple(
        [jnp.where(sel, A[c][i], Q[c][i]) for i in range(L)] for c in range(3)
    )
    _write_point(o_ref, out, L)


def _addselneg_kernel(
    ctx: RowCtx, b3: int, p_ref, q_ref, sel_ref, neg_ref, o_ref, *, mm=_mm_serial
):
    """out = select(sel, P + Q', Q') with Q' = (neg ? -Q : Q).

    The signed-digit MSM combiner (Q is the freshly gathered point): the
    point negation (one masked field subtract) rides inside the kernel,
    so signed digits cost no extra HBM round trips versus _addsel_kernel
    (negating in XLA between kernel launches measured 1.33x slower
    end-to-end on v5e).
    """
    F = ctx
    L = ctx.L
    P = _read_point(p_ref, L)
    X2, Y2raw, Z2 = _read_point(q_ref, L)
    ng = neg_ref[0] != 0
    zero = [jnp.zeros_like(Y2raw[0])] * L
    Y2n = F.sub(zero, Y2raw)
    Y2 = [jnp.where(ng, Y2n[i], Y2raw[i]) for i in range(L)]
    Q = (X2, Y2, Z2)
    A = _rcb_add_rows(F, b3, P, Q, mm)

    sel = sel_ref[0] != 0
    out = tuple(
        [jnp.where(sel, A[c][i], Q[c][i]) for i in range(L)] for c in range(3)
    )
    _write_point(o_ref, out, L)


def _read_affine(ref, L):
    return ([ref[0, i] for i in range(L)], [ref[1, i] for i in range(L)])


def _maddsel_kernel(
    ctx: RowCtx, b3: int, one_limbs, p_ref, q_ref, sel_ref, o_ref, *, mm=_mm_serial
):
    """out = select(sel, P + lift(Q), lift(Q)) with Q affine (2, L) rows.

    The mixed-add MSM segmented-scan combiner: gathers move 2L-word rows
    instead of 3L."""
    F = ctx
    L = ctx.L
    P = _read_point(p_ref, L)
    X2, Y2 = _read_affine(q_ref, L)
    one = [jnp.full_like(X2[0], v) for v in one_limbs]
    AX, AY, AZ = _madd_rows(F, b3, P, (X2, Y2), mm)
    sel = sel_ref[0] != 0
    out = tuple(
        [jnp.where(sel, A[i], B[i]) for i in range(L)]
        for A, B in ((AX, X2), (AY, Y2), (AZ, one))
    )
    _write_point(o_ref, out, L)


def _maddselneg_kernel(
    ctx: RowCtx, b3: int, one_limbs, p_ref, q_ref, sel_ref, neg_ref, o_ref,
    *, mm=_mm_serial,
):
    """Mixed-add combiner with fused conditional negation (signed digits)."""
    F = ctx
    L = ctx.L
    P = _read_point(p_ref, L)
    X2, Y2raw = _read_affine(q_ref, L)
    ng = neg_ref[0] != 0
    zero = [jnp.zeros_like(Y2raw[0])] * L
    Y2n = F.sub(zero, Y2raw)
    Y2 = [jnp.where(ng, Y2n[i], Y2raw[i]) for i in range(L)]
    one = [jnp.full_like(X2[0], v) for v in one_limbs]
    AX, AY, AZ = _madd_rows(F, b3, P, (X2, Y2), mm)
    sel = sel_ref[0] != 0
    out = tuple(
        [jnp.where(sel, A[i], B[i]) for i in range(L)]
        for A, B in ((AX, X2), (AY, Y2), (AZ, one))
    )
    _write_point(o_ref, out, L)


def _point_spec(L):
    return pl.BlockSpec(
        (3, L, TILE_SUBLANES, 128), lambda g: (0, 0, g, 0), memory_space=pltpu.VMEM
    )


def _affine_spec(L):
    return pl.BlockSpec(
        (2, L, TILE_SUBLANES, 128), lambda g: (0, 0, g, 0), memory_space=pltpu.VMEM
    )


@lru_cache(maxsize=None)
def _build(p: int, L: int, b3: int, which: str, stacked: bool, interpret: bool):
    ctx = RowCtx(p, L)
    spec = _point_spec(L)
    aspec = _affine_spec(L)
    sel_spec = pl.BlockSpec(
        (1, TILE_SUBLANES, 128), lambda g: (0, g, 0), memory_space=pltpu.VMEM
    )
    R = 1 << (16 * L)
    one_limbs = tuple(((R % p) >> (16 * k)) & 0xFFFF for k in range(L))
    mm = _mm_stacked if stacked else _mm_serial

    if which == "add":
        kernel = partial(_add_kernel, ctx, b3, mm=mm)
        specs = [spec, spec]
    elif which == "double":
        kernel = partial(_double_kernel, ctx, b3, mm=mm)
        specs = [spec]
    elif which == "dbladd":
        kernel = partial(_dbladd_kernel, ctx, b3, mm=mm)
        specs = [spec, spec, sel_spec]
    elif which == "addsel":
        kernel = partial(_addsel_kernel, ctx, b3, mm=mm)
        specs = [spec, spec, sel_spec]
    elif which == "addselneg":
        kernel = partial(_addselneg_kernel, ctx, b3, mm=mm)
        specs = [spec, spec, sel_spec, sel_spec]
    elif which == "maddsel":
        kernel = partial(_maddsel_kernel, ctx, b3, one_limbs, mm=mm)
        specs = [spec, aspec, sel_spec]
    elif which == "maddselneg":
        kernel = partial(_maddselneg_kernel, ctx, b3, one_limbs, mm=mm)
        specs = [spec, aspec, sel_spec, sel_spec]
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
    """(..., 3, L, B) -> ((3, L, M, 128), restore_fn)."""
    shape = P.shape
    lead = shape[:-3]
    B = shape[-1]
    P2 = jnp.moveaxis(P, (-3, -2), (0, 1)).reshape(shape[-3], shape[-2], -1)
    tot = P2.shape[-1]
    pad = (-tot) % TILE
    if pad:
        P2 = jnp.pad(P2, [(0, 0), (0, 0), (0, pad)])
    M = P2.shape[-1] // 128
    P3 = P2.reshape(shape[-3], shape[-2], M, 128)

    def restore(out):
        out = out.reshape(shape[-3], shape[-2], M * 128)[..., :tot]
        return jnp.moveaxis(out.reshape(shape[-3:-1] + lead + (B,)), (0, 1), (-3, -2))

    return P3, restore


def add_pallas(p, L, b3, P, Q, interpret=False):
    P, Q = jnp.broadcast_arrays(P, Q)
    P3, restore = _to_tiles(P)
    Q3, _ = _to_tiles(Q)
    return restore(_build(p, L, b3, "add", _stacked_env(), interpret)(P3, Q3))


def double_pallas(p, L, b3, P, interpret=False):
    P3, restore = _to_tiles(P)
    return restore(_build(p, L, b3, "double", _stacked_env(), interpret)(P3))


def _sel_tiles(sel, P):
    sel = jnp.broadcast_to(sel, P.shape[:-3] + P.shape[-1:])
    s2 = sel.reshape(1, -1).astype(jnp.uint32)
    pad = (-s2.shape[-1]) % TILE
    if pad:
        s2 = jnp.pad(s2, [(0, 0), (0, pad)])
    return s2.reshape(1, -1, 128)


def dbladd_pallas(p, L, b3, P, Q, sel, interpret=False):
    """select(sel, 2P + Q, 2P) for sel (..., B) bool."""
    P, Q = jnp.broadcast_arrays(P, Q)
    P3, restore = _to_tiles(P)
    Q3, _ = _to_tiles(Q)
    s3 = _sel_tiles(sel, P)
    return restore(_build(p, L, b3, "dbladd", _stacked_env(), interpret)(P3, Q3, s3))


def addsel_pallas(p, L, b3, P, Q, sel, interpret=False):
    """select(sel, P + Q, Q) for sel (..., B) bool."""
    P, Q = jnp.broadcast_arrays(P, Q)
    P3, restore = _to_tiles(P)
    Q3, _ = _to_tiles(Q)
    s3 = _sel_tiles(sel, P)
    return restore(_build(p, L, b3, "addsel", _stacked_env(), interpret)(P3, Q3, s3))


def addselneg_pallas(p, L, b3, P, Q, sel, neg, interpret=False):
    """select(sel, P + Q', Q') with Q' = (neg ? -Q : Q), sel/neg (..., B)."""
    P, Q = jnp.broadcast_arrays(P, Q)
    P3, restore = _to_tiles(P)
    Q3, _ = _to_tiles(Q)
    s3 = _sel_tiles(sel, P)
    n3 = _sel_tiles(neg, P)
    return restore(_build(p, L, b3, "addselneg", _stacked_env(), interpret)(P3, Q3, s3, n3))


def _to_tiles_affine(Q):
    """(..., 2, L, B) -> (2, L, M, 128) (no restore needed: inputs only)."""
    shape = Q.shape
    Q2 = jnp.moveaxis(Q, (-3, -2), (0, 1)).reshape(2, shape[-2], -1)
    tot = Q2.shape[-1]
    pad = (-tot) % TILE
    if pad:
        Q2 = jnp.pad(Q2, [(0, 0), (0, 0), (0, pad)])
    M = Q2.shape[-1] // 128
    return Q2.reshape(2, shape[-2], M, 128)


def maddsel_pallas(p, L, b3, P, Q, sel, interpret=False):
    """select(sel, P + lift(Q), lift(Q)), Q affine (..., 2, L, B)."""
    P3, restore = _to_tiles(P)
    Q3 = _to_tiles_affine(jnp.broadcast_to(Q, P.shape[:-3] + (2,) + P.shape[-2:]))
    s3 = _sel_tiles(sel, P)
    return restore(_build(p, L, b3, "maddsel", _stacked_env(), interpret)(P3, Q3, s3))


def maddselneg_pallas(p, L, b3, P, Q, sel, neg, interpret=False):
    """Mixed-add combiner with fused negation; Q affine (..., 2, L, B)."""
    P3, restore = _to_tiles(P)
    Q3 = _to_tiles_affine(jnp.broadcast_to(Q, P.shape[:-3] + (2,) + P.shape[-2:]))
    s3 = _sel_tiles(sel, P)
    n3 = _sel_tiles(neg, P)
    return restore(_build(p, L, b3, "maddselneg", _stacked_env(), interpret)(P3, Q3, s3, n3))


# ---------------------------------------------------------------------------
# fused scalar-mul chain kernels: the ENTIRE double-and-add ladder in one
# launch (acc lives in VMEM across all bits), replacing nbits separate
# dbl_add_select launches.  Backs G1Ctx.scalar_mul (the reference ladder at
# driver/kilic/bls12-381.go:40-50) and the hash-to-curve cofactor clearing.
# ---------------------------------------------------------------------------


def _smul_kernel(
    ctx: RowCtx, b3: int, one_limbs, nbits: int, s_ref, q_ref, o_ref,
    *, mm=_mm_serial,
):
    """out = [k] Q with per-lane scalars (dynamic bits), Q projective.

    s_ref: (S, TS, 128) plain 16-bit scalar limbs.  The body is RCB
    double + complete add + per-lane select; acc starts at infinity, so
    the ladder is exception-free for every scalar and point (incl. Q at
    infinity).
    """
    F = ctx
    L = ctx.L
    Q = _read_point(q_ref, L)
    zero = [jnp.zeros_like(Q[0][0])] * L
    one = [jnp.full_like(Q[0][0], v) for v in one_limbs]

    def body(i, acc):
        D = _rcb_dbl_rows(F, b3, acc, mm)
        AX, AY, AZ = _rcb_add_rows(F, b3, D, Q, mm)
        idx = nbits - 1 - i
        word = s_ref[idx // 16]
        bit = ((word >> (idx % 16)) & 1) != 0
        return (
            [jnp.where(bit, AX[k], D[0][k]) for k in range(L)],
            [jnp.where(bit, AY[k], D[1][k]) for k in range(L)],
            [jnp.where(bit, AZ[k], D[2][k]) for k in range(L)],
        )

    acc = jax.lax.fori_loop(0, nbits, body, (list(zero), list(one), list(zero)))
    _write_point(o_ref, acc, L)


def _smul_static_kernel(
    ctx: RowCtx, b3: int, one_limbs, nbits: int, bits_ref, q_ref, o_ref,
    *, mm=_mm_serial,
):
    """out = [k] Q (projective) for ONE static scalar (SMEM bits,
    MSB-first): the double runs every step, the complete add only under
    pl.when(bit) — the cofactor-clearing shape (h_eff has tiny weight)."""
    F = ctx
    L = ctx.L
    Q = _read_point(q_ref, L)
    zero = [jnp.zeros_like(Q[0][0])] * L
    one = [jnp.full_like(Q[0][0], v) for v in one_limbs]
    _write_point(o_ref, (zero, one, zero), L)

    def body(i, _):
        acc = _read_point(o_ref, L)
        _write_point(o_ref, _rcb_dbl_rows(F, b3, acc, mm), L)

        @pl.when(bits_ref[i] != 0)
        def _():
            acc = _read_point(o_ref, L)
            _write_point(o_ref, _rcb_add_rows(F, b3, acc, Q, mm), L)

        return 0

    jax.lax.fori_loop(0, nbits, body, 0)


@lru_cache(maxsize=None)
def _build_smul(
    p: int, L: int, b3: int, nbits: int, S: int, stacked: bool, interpret: bool
):
    from jax.experimental.pallas import tpu as _pltpu

    ctx = RowCtx(p, L)
    R = 1 << (16 * L)
    one_limbs = tuple(((R % p) >> (16 * k)) & 0xFFFF for k in range(L))
    mm = _mm_stacked if stacked else _mm_serial
    kernel = partial(_smul_kernel, ctx, b3, one_limbs, nbits, mm=mm)
    sspec = pl.BlockSpec(
        (S, TILE_SUBLANES, 128), lambda g: (0, g, 0), memory_space=pltpu.VMEM
    )

    @jax.jit
    def run(s, q):
        M = q.shape[2]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((3, L, M, 128), jnp.uint32),
            grid=(M // TILE_SUBLANES,),
            in_specs=[sspec, _point_spec(L)],
            out_specs=_point_spec(L),
            interpret=interpret,
            compiler_params=None
            if interpret
            else _pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        )(s, q)

    return run


@lru_cache(maxsize=None)
def _build_smul_static(
    p: int, L: int, b3: int, nbits: int, stacked: bool, interpret: bool
):
    from jax.experimental.pallas import tpu as _pltpu

    ctx = RowCtx(p, L)
    R = 1 << (16 * L)
    one_limbs = tuple(((R % p) >> (16 * k)) & 0xFFFF for k in range(L))
    mm = _mm_stacked if stacked else _mm_serial
    kernel = partial(_smul_static_kernel, ctx, b3, one_limbs, nbits, mm=mm)
    bits_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    @jax.jit
    def run(bits, q):
        M = q.shape[2]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((3, L, M, 128), jnp.uint32),
            grid=(M // TILE_SUBLANES,),
            in_specs=[bits_spec, _point_spec(L)],
            out_specs=_point_spec(L),
            interpret=interpret,
            compiler_params=None
            if interpret
            else _pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        )(bits, q)

    return run


def smul_pallas(p, L, b3, Q, scalars, nbits, interpret=False):
    """[k] Q for projective Q (..., 3, L, B) and per-lane scalars
    (..., S, B); whole ladder in one launch."""
    lanes = jnp.broadcast_shapes(Q.shape[-1:], scalars.shape[-1:])
    lead = jnp.broadcast_shapes(Q.shape[:-3], scalars.shape[:-2])
    Q = jnp.broadcast_to(Q, lead + (3,) + Q.shape[-2:-1] + lanes)
    S = scalars.shape[-2]
    scalars = jnp.broadcast_to(scalars, lead + (S,) + lanes)
    Q3, _restore = _to_tiles(Q)
    s2 = jnp.moveaxis(scalars, -2, 0).reshape(S, -1)
    tot = s2.shape[-1]
    pad = (-tot) % TILE
    if pad:
        s2 = jnp.pad(s2, [(0, 0), (0, pad)])
    s3 = s2.reshape(S, -1, 128)
    out = _build_smul(p, L, b3, nbits, S, _stacked_env(), interpret)(s3, Q3)
    M = out.shape[2]
    out = out.reshape(3, L, M * 128)[..., :tot]
    res = out.reshape((3, L) + lead + lanes)
    return jnp.moveaxis(res, (0, 1), (-3, -2))


def smul_static_pallas(p, L, b3, Q, bits, interpret=False):
    """[k] Q (projective) for a static MSB-first bit array (cofactors)."""
    Q3, restore = _to_tiles(Q)
    bits_arr = jnp.asarray(np.asarray(bits, dtype=np.uint32))
    out = _build_smul_static(p, L, b3, len(bits), _stacked_env(), interpret)(
        bits_arr, Q3
    )
    return restore(out)
