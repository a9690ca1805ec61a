"""Fused hash-to-G1 Pallas kernel: SSWU + isogeny + cofactor in ONE launch.

Round 3 moved every algebraic hash-to-curve stage onto the device
(ops/hash.py), but as ~30 XLA-level launches (two inversion chains, two
sqrt chains, Horner glue, the cofactor ladder ...).  Measured end-to-end
that path runs at 23.9K hashes/s @4096 — the launch/dispatch glue, not
the math, dominates (the same disease the pairing had before its fused
kernel, BENCH_NOTES round 3).  This kernel runs the whole map for a
(8, 128) lane tile in one Mosaic program:

  * both SSWU maps (u0, u1), each with the exceptional-case select
    (RFC 9380 F.2; inv(0) = 0 handled by one canonical-zero test),
  * the two inverse chains STACKED into one (16, 128) square-and-multiply
    over the SMEM bit string of p-2, and the four candidate square roots
    stacked into one (32, 128) chain over (p+1)/4 bits  (p = 3 mod 4),
  * sgn0 sign fix — RFC parity or the kilic BBS big-endian variant
    (sign(z) = -z >= z, reference driver/kilic/custom.go:99-105),
  * the 11-isogeny evaluated projectively by Horner with the Montgomery
    coefficients baked as per-limb scalar immediates,
  * the RCB complete add of the two mapped points, and
  * the [h_eff] cofactor double-and-add ladder over SMEM bits with the
    add under pl.when (h_eff = 1 - x has tiny Hamming weight).

Reference seams: kilic SSWU driver/kilic/bls12-381.go:423-434 and the
BBS map custom.go:134-237; both run on CPU there — the batched one-launch
form is the TPU-native replacement.

Gate: p % 4 == 3 and G1 isogeny data present (BLS12-381 family), same as
ops/hash.py's HashG1Ctx.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fp_rows import LIMB_BITS, LIMB_MASK, RowCtx
from .g1_pallas import (
    TILE_SUBLANES,
    _mm_serial,
    _mm_stacked,
    _rcb_add_rows,
    _rcb_dbl_rows,
    _read_point,
    _stacked_env,
    _write_point,
)

TILE = TILE_SUBLANES * 128


def _limbs(v: int, L: int):
    return tuple((v >> (LIMB_BITS * k)) & LIMB_MASK for k in range(L))


def _crows(limbs):
    """Constant as scalar-broadcast 'rows' (Mosaic folds the scalars)."""
    return [np.uint32(v) for v in limbs]


def _is_zero(F: RowCtx, a):
    """a == 0 mod p for relaxed [0, 2p) rows -> (TS, 128) bool."""
    c = F.canon(a)
    ok = c[0] == 0
    for k in range(1, F.L):
        ok = jnp.logical_and(ok, c[k] == 0)
    return ok


def _eq(F: RowCtx, a, b):
    """a == b mod p for relaxed rows."""
    ca, cb = F.canon(a), F.canon(b)
    ok = ca[0] == cb[0]
    for k in range(1, F.L):
        ok = jnp.logical_and(ok, ca[k] == cb[k])
    return ok


def _sel(mask, a, b):
    return [jnp.where(mask, x, y) for x, y in zip(a, b)]


def _pow_ref(F: RowCtx, one_limbs, base, bits_ref, nbits, acc_ref, S):
    """base ** bits (MSB-first, 4-bit fixed window) on (S, 128) rows.

    Per window: 4 squarings (dedicated ``sqr``, ~23% cheaper than mul)
    and ONE unconditional multiply by a value SELECTED from the 16-entry
    power table (table[0] = 1) — data selects instead of 15 pl.when
    branches keeps the loop body small and the schedule static.  The
    caller pads ``bits_ref`` to a multiple of 4 with leading zeros
    (acc = 1 absorbs them).  acc lives in the (L, Smax, 128) VMEM
    scratch; the table entries are loop-invariant values."""
    L = F.L
    like = base[0]
    one = [jnp.full_like(like, v) for v in one_limbs]
    # power table base^0 .. base^15
    tab = [one, base]
    for _ in range(14):
        tab.append(F.mul(tab[-1], base))

    def _select(d, hi):
        m = tab[hi]
        for t in range(hi - 1, -1, -1):
            m = [jnp.where(d == t, tab[t][k], m[k]) for k in range(L)]
        return m

    # leading nbits % 4 bits: acc == 1 there, so acc = base^(head value)
    head = nbits % 4
    if head:
        d0 = bits_ref[0]
        for i in range(1, head):
            d0 = d0 * 2 + bits_ref[i]
        init = _select(d0, (1 << head) - 1)
    else:
        init = one
    for k in range(L):
        acc_ref[k, :S] = init[k]

    def body(g, _):
        acc = [acc_ref[k, :S] for k in range(L)]
        for _ in range(4):
            acc = F.sqr(acc)
        i0 = head + 4 * g
        d = (
            bits_ref[i0] * 8
            + bits_ref[i0 + 1] * 4
            + bits_ref[i0 + 2] * 2
            + bits_ref[i0 + 3]
        )
        acc = F.mul(acc, _select(d, 15))
        for k in range(L):
            acc_ref[k, :S] = acc[k]
        return 0

    jax.lax.fori_loop(0, (nbits - head) // 4, body, 0)
    return [acc_ref[k, :S] for k in range(L)]


def _from_mont(F: RowCtx, a):
    """Montgomery -> canonical standard rows (one mul by literal 1)."""
    one = [np.uint32(1)] + [np.uint32(0)] * (F.L - 1)
    return F.canon(F.mul(a, one))


def _parity(F: RowCtx, a):
    return _from_mont(F, a)[0] & 1


def _le_neg(F: RowCtx, a):
    """BBS big-endian sign: canonical(a) <= p - canonical(a)?
    (kilic custom.go:99-105: sign(z) = (-z >= z), 0 counted positive)."""
    std = _from_mont(F, a)
    # p - std limbwise: v = p_k + 0xFFFF + carry - s_k with carry seeded
    # to 1 (the "add R-1, propagate carry" subtraction; std < p so the
    # final carry is always 1 and is dropped)
    neg = []
    carry = jnp.ones_like(std[0])
    for k in range(F.L):
        v = np.uint32(F.p_limbs[k] + LIMB_MASK) + carry - std[k]
        neg.append(v & LIMB_MASK)
        carry = v >> LIMB_BITS
    # std <= neg  <=>  (neg - std) does not borrow.  Pure arithmetic
    # ripple — no boolean vectors as select DATA (Mosaic cannot lower
    # i8->i1 vector truncations).  std == 0 -> neg == p: no borrow,
    # positive, matching sign(0) in the reference.
    carry = jnp.ones_like(std[0])
    for k in range(F.L):
        v = neg[k] + np.uint32(LIMB_MASK) + carry - std[k]
        carry = v >> LIMB_BITS
    return carry > 0


def _sswu_body(
    F, C, inv_nbits, sqrt_nbits, invbits_ref, sqrtbits_ref, u0, u1, pow_ref, mm
):
    """Both SSWU maps with shared stacked chains; returns two (x, y)."""
    TS = u0[0].shape[0]
    one_l = C["one_limbs"]

    def pre(u):
        t1 = F.mul(F.mul(u, u), _crows(C["Z"]))
        t2 = F.add(F.mul(t1, t1), t1)
        return t1, t2

    t1a, t2a = pre(u0)
    t1b, t2b = pre(u1)

    # one stacked inversion chain for both t2's
    t2s = [jnp.concatenate([t2a[k], t2b[k]], axis=0) for k in range(F.L)]
    invs = _pow_ref(F, one_l, t2s, invbits_ref, inv_nbits, pow_ref, 2 * TS)

    def mid(u, t1, t2, inv_t2):
        x1 = F.mul(F.add(inv_t2, _crows(one_l)), _crows(C["negB_over_A"]))
        z2 = _is_zero(F, t2)
        x1 = [
            jnp.where(z2, np.uint32(C["B_over_ZA"][k]), x1[k])
            for k in range(F.L)
        ]
        gx1 = F.add(
            F.mul(F.add(F.mul(x1, x1), _crows(C["A"])), x1), _crows(C["B"])
        )
        x2 = F.mul(t1, x1)
        gx2 = F.mul(gx1, F.mul(t1, F.mul(t1, t1)))
        return x1, x2, gx1, gx2

    x1a, x2a, g1a, g2a = mid(u0, t1a, t2a, [r[:TS] for r in invs])
    x1b, x2b, g1b, g2b = mid(u1, t1b, t2b, [r[TS:] for r in invs])

    # one stacked sqrt chain for all four candidates
    gs = [
        jnp.concatenate([g1a[k], g2a[k], g1b[k], g2b[k]], axis=0)
        for k in range(F.L)
    ]
    ys = _pow_ref(F, one_l, gs, sqrtbits_ref, sqrt_nbits, pow_ref, 4 * TS)

    def post(u, x1, x2, gx1, y1c, y2c):
        is_sq = _eq(F, F.mul(y1c, y1c), gx1)
        x = _sel(is_sq, x1, x2)
        y = _sel(is_sq, y1c, y2c)
        if C["sign"] == "parity":
            flip = _parity(F, u) != _parity(F, y)
        else:  # "be"
            flip = _le_neg(F, u) != _le_neg(F, y)
        zero = [jnp.zeros_like(y[0])] * F.L
        return x, _sel(flip, F.sub(zero, y), y)

    xa, ya = post(
        u0, x1a, x2a, g1a,
        [r[0 * TS : 1 * TS] for r in ys], [r[1 * TS : 2 * TS] for r in ys],
    )
    xb, yb = post(
        u1, x1b, x2b, g1b,
        [r[2 * TS : 3 * TS] for r in ys], [r[3 * TS : 4 * TS] for r in ys],
    )
    return (xa, ya), (xb, yb)


def _iso_project(F, C, x, y, mm):
    """Rational 11-isogeny E' -> E, projectivized (no inversions):
    X = xn*yd, Y = y*yn*xd, Z = xd*yd."""
    evals = []
    for coeffs in C["iso"]:  # (xn, xd, yn, yd), low-degree-first
        acc = [jnp.full_like(x[0], v) for v in coeffs[-1]]
        for c in reversed(coeffs[:-1]):
            acc = F.add(F.mul(acc, x), _crows(c))
        evals.append(acc)
    xn, xd, yn, yd = evals
    X, Z = mm(F, [(xn, yd), (xd, yd)])
    Y = F.mul(y, F.mul(yn, xd))
    return (X, Y, Z)


def _hash_g1_kernel(
    F: RowCtx,
    b3: int,
    C: dict,
    inv_nbits: int,
    sqrt_nbits: int,
    h_nbits: int,
    h_neg: bool,
    mm,
    invbits_ref,
    sqrtbits_ref,
    hbits_ref,
    u0_ref,
    u1_ref,
    o_ref,
    pow_ref,
):
    L = F.L
    u0 = [u0_ref[k] for k in range(L)]
    u1 = [u1_ref[k] for k in range(L)]

    (xa, ya), (xb, yb) = _sswu_body(
        F, C, inv_nbits, sqrt_nbits, invbits_ref, sqrtbits_ref, u0, u1,
        pow_ref, mm,
    )
    Pa = _iso_project(F, C, xa, ya, mm)
    Pb = _iso_project(F, C, xb, yb, mm)
    P = _rcb_add_rows(F, b3, Pa, Pb, mm)

    # cofactor ladder over SMEM bits (MSB-first, bits[0] == 1): acc in o_ref
    _write_point(o_ref, P, L)

    def body(i, _):
        acc = _read_point(o_ref, L)
        _write_point(o_ref, _rcb_dbl_rows(F, b3, acc, mm), L)

        @pl.when(hbits_ref[i] != 0)
        def _():
            acc = _read_point(o_ref, L)
            _write_point(o_ref, _rcb_add_rows(F, b3, acc, P, mm), L)

        return 0

    jax.lax.fori_loop(1, h_nbits, body, 0)

    if h_neg:
        X, Y, Z = _read_point(o_ref, L)
        zero = [jnp.zeros_like(Y[0])] * L
        _write_point(o_ref, (X, F.sub(zero, Y), Z), L)


def _row_spec(nrows: int):
    return pl.BlockSpec(
        (nrows, TILE_SUBLANES, 128), lambda g: (0, g, 0),
        memory_space=pltpu.VMEM,
    )


_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


@lru_cache(maxsize=None)
def _build(spec_name: str, sign: str, stacked: bool, interpret: bool):
    from ...curves.params import get_spec
    from ..hash import get_hash_g1_ctx

    spec = get_spec(spec_name)
    ctx = get_hash_g1_ctx(spec)
    p, L = spec.p, ctx.fp.L
    F = RowCtx(p, L)
    R = 1 << (LIMB_BITS * L)

    def as_limbs(mont_arr):
        """(L, 1) device constant -> limb int tuple."""
        a = np.asarray(mont_arr).reshape(L)
        return tuple(int(v) for v in a)

    C = {
        "sign": sign,
        "one_limbs": _limbs(R % p, L),
        "Z": as_limbs(ctx.Z),
        "A": as_limbs(ctx.A),
        "B": as_limbs(ctx.B),
        "negB_over_A": as_limbs(ctx.negB_over_A),
        "B_over_ZA": as_limbs(ctx.B_over_ZA),
        "iso": tuple(
            tuple(as_limbs(c) for c in coeffs) for coeffs in ctx.iso
        ),
    }
    b3 = ctx.g1.F.b3
    inv_bits = np.array([int(b) for b in bin(p - 2)[2:]], dtype=np.uint32)
    sqrt_bits = np.array(
        [int(b) for b in bin((p + 1) // 4)[2:]], dtype=np.uint32
    )
    h_bits = np.asarray(ctx.h_bits, dtype=np.uint32)
    mm = _mm_stacked if stacked else _mm_serial

    kernel = partial(
        _hash_g1_kernel, F, b3, C, len(inv_bits), len(sqrt_bits),
        len(h_bits), ctx.h_neg, mm,
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    @jax.jit
    def run(invb, sqrtb, hb, u0, u1):
        M = u0.shape[1]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((3, L, M, 128), jnp.uint32),
            grid=(M // TILE_SUBLANES,),
            in_specs=[smem, smem, smem, _row_spec(L), _row_spec(L)],
            out_specs=pl.BlockSpec(
                (3, L, TILE_SUBLANES, 128), lambda g: (0, 0, g, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((L, 4 * TILE_SUBLANES, 128), jnp.uint32),
            ],
            interpret=interpret,
            compiler_params=None if interpret else _VMEM_LIMIT,
        )(invb, sqrtb, hb, u0, u1)

    # NUMPY bits in the cache, converted per call: caching jnp arrays in
    # an lru_cache leaks tracers when the first call happens inside an
    # outer trace (jnp.asarray under tracing yields a traced constant)
    return run, (inv_bits, sqrt_bits, h_bits)


def hash_g1_pallas(spec, u0, u1, sign: str = "parity", interpret=False):
    """(u0, u1) Montgomery (L, B) field batches -> (3, L, B) projective
    G1 points, the whole SSWU+isogeny+cofactor map as ONE kernel launch.

    Returns None when the curve is outside the gate (no isogeny data or
    p % 4 != 3) — callers fall back to the ops/hash.py XLA pipeline."""
    from ...curves import isogeny_data as iso

    if iso.G1.get(spec.name) is None or spec.p % 4 != 3:
        return None
    L = u0.shape[-2]
    B = u0.shape[-1]
    pad = (-B) % TILE
    if pad:
        u0 = jnp.pad(u0, [(0, 0), (0, pad)])
        u1 = jnp.pad(u1, [(0, 0), (0, pad)])
    M = (B + pad) // 128
    u0t = u0.reshape(L, M, 128)
    u1t = u1.reshape(L, M, 128)
    run, bits = _build(spec.name, sign, _stacked_env(), interpret)
    out = run(*(jnp.asarray(b) for b in bits), u0t, u1t)
    return out.reshape(3, L, M * 128)[..., :B]
