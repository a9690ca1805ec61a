"""Differential tests for the fused pairing kernels (ops/kernels/pairing_pallas.py).

Strategy mirrors test_pallas_kernels.py: the kernel *bodies* are trace-time
Python over uint32 rows, so the step functions (dbl_step, add_step, sparse
Fp12 mul, Fp12 sqr/mul) run on numpy arrays against the exact host tower —
full coverage of the math on every curve at millisecond cost.  The
fori_loop/pl.when plumbing of the full Miller kernel is exercised once in
interpret mode (slow) and on the real chip by tools/perf_report.py, which
asserts device == host pairing before timing.

Oracle notes: the kernel's doubling/addition produce different projective
REPRESENTATIVES than the host engine (denominators cleared differently),
so point outputs are compared in affine coordinates and line coefficients
against the same formulas evaluated on host integers.
"""

import random

import numpy as np
import pytest

import mathlib_tpu.ops.kernels.fp_rows as fp_rows_mod
import mathlib_tpu.ops.kernels.pairing_pallas as pp_mod
from mathlib_tpu.curves.params import get_spec
from mathlib_tpu.host.engine import get_engine
from mathlib_tpu.host.fields import get_tower
from mathlib_tpu.ops.kernels.pairing_pallas import MulBatch, RowTower

CURVES = ["BLS12_381", "BLS12_377", "BN254", "FP256BN"]


class _Ref:
    """numpy-backed stand-in for a pl.Ref (same as test_pallas_kernels)."""

    def __init__(self, arr):
        self.arr = arr

    def __getitem__(self, idx):
        return self.arr[idx]

    def __setitem__(self, idx, val):
        self.arr[idx] = val

    @property
    def shape(self):
        return self.arr.shape

    @property
    def dtype(self):
        return self.arr.dtype


class _FakePl:
    """pl.when on numpy: condition is a concrete bool."""

    @staticmethod
    def when(cond):
        def deco(f):
            if bool(cond):
                f()

        return deco

    @staticmethod
    def program_id(axis):
        return 0

    @staticmethod
    def num_programs(axis):
        return 1


class _FakeLax:
    @staticmethod
    def fori_loop(lo, hi, body, init):
        v = init
        for i in range(lo, hi):
            v = body(i, v)
        return v

    @staticmethod
    def broadcasted_iota(dtype, shape, dimension):
        n = shape[dimension]
        ar = np.arange(n, dtype=dtype)
        src = ar.reshape(
            [n if d == dimension else 1 for d in range(len(shape))]
        )
        return np.broadcast_to(src, shape)


class _FakeJax:
    lax = _FakeLax


class _FakePltpu:
    @staticmethod
    def roll(a, shift, axis):
        return np.roll(a, shift, axis=axis)


@pytest.fixture
def numpy_kernel_env(monkeypatch):
    monkeypatch.setattr(fp_rows_mod, "jnp", np)
    monkeypatch.setattr(pp_mod, "jnp", np)


@pytest.fixture
def numpy_kernel_env_full(monkeypatch):
    """Shim for whole kernel BODIES: numpy rows + python control flow.

    Covers init, fori_loop iteration, the pl.when add branch, and SMEM bit
    reads — everything except Mosaic lowering itself (validated on the
    real chip by tools/perf_report.py's pre-check)."""
    monkeypatch.setattr(fp_rows_mod, "jnp", np)
    monkeypatch.setattr(pp_mod, "jnp", np)
    monkeypatch.setattr(pp_mod, "pl", _FakePl)
    monkeypatch.setattr(pp_mod, "jax", _FakeJax)
    monkeypatch.setattr(pp_mod, "pltpu", _FakePltpu)


def _cfg(spec):
    return pp_mod._cfg(spec)


def _enc(vals, p, L):
    """list of ints -> fp rows: list of L (1, B) uint32 arrays (Montgomery)."""
    R = 1 << (16 * L)
    out = np.empty((L, len(vals)), dtype=np.uint32)
    for j, v in enumerate(vals):
        m = (v % p) * R % p
        for k in range(L):
            out[k, j] = (m >> (16 * k)) & 0xFFFF
    return [out[k][None, :] for k in range(L)]


def _dec(rows, p, L):
    Rinv = pow(1 << (16 * L), p - 2, p)
    B = rows[0].shape[-1]
    out = []
    for j in range(B):
        v = sum(int(rows[k][0, j]) << (16 * k) for k in range(L))
        out.append(v * Rinv % p)
    return out


def _enc2(pairs, p, L):
    """list of (c0, c1) -> f2 rows pair."""
    return (_enc([a for a, _ in pairs], p, L), _enc([b for _, b in pairs], p, L))


def _dec2(e, p, L):
    return list(zip(_dec(e[0], p, L), _dec(e[1], p, L)))


def _enc12(vals12, p, L):
    """list of host Fp12 -> row f12 structure (batched on lanes)."""
    return tuple(
        tuple(
            _enc2([v[h][j] for v in vals12], p, L) for j in range(3)
        )
        for h in range(2)
    )


def _dec12(f, p, L):
    n = f[0][0][0][0].shape[-1]
    cs = [[_dec2(f[h][j], p, L) for j in range(3)] for h in range(2)]
    return [
        tuple(tuple(cs[h][j][i] for j in range(3)) for h in range(2))
        for i in range(n)
    ]


def _rand_f12(t, rng):
    return tuple(
        tuple(
            (rng.randrange(t.p), rng.randrange(t.p)) for _ in range(3)
        )
        for _ in range(2)
    )


def _line12(t, spec, A, DmB, negC):
    """Assemble the sparse line into a host Fp12 (ops/pairing.py slots)."""
    z = (0, 0)
    if spec.twist == "M":
        return ((z, z, A), (DmB, negC, z))
    return ((A, z, z), (negC, DmB, z))


@pytest.mark.parametrize("name", CURVES)
def test_f12_ops_vs_host(name, numpy_kernel_env):
    spec = get_spec(name)
    p, L, bn, xi0, twist = _cfg(spec)
    tw = RowTower(p, L, bn, xi0, twist)
    t = get_tower(spec)
    rng = random.Random(7)
    fa = [_rand_f12(t, rng) for _ in range(3)]
    fb = [_rand_f12(t, rng) for _ in range(3)]
    ra, rb = _enc12(fa, p, L), _enc12(fb, p, L)

    got = _dec12(tw.f12_sqr(ra), p, L)
    want = [t.f12_sqr(x) for x in fa]
    assert got == want, "f12_sqr mismatch"

    got = _dec12(tw.f12_mul(ra, rb), p, L)
    want = [t.f12_mul(x, y) for x, y in zip(fa, fb)]
    assert got == want, "f12_mul mismatch"

    # sparse line mul vs dense host mul of the assembled line
    A = [(rng.randrange(p), rng.randrange(p)) for _ in range(3)]
    B0 = [(rng.randrange(p), rng.randrange(p)) for _ in range(3)]
    B1 = [(rng.randrange(p), rng.randrange(p)) for _ in range(3)]
    got = _dec12(
        tw.f12_sparse_mul(
            ra, _enc2(A, p, L), _enc2(B0, p, L), _enc2(B1, p, L)
        ),
        p,
        L,
    )
    # both twists: args are the line coefficients (A, D-B, -C); placement
    # per _line12 == ops/pairing.py _line_f12
    want = [
        t.f12_mul(x, _line12(t, spec, a, b0, b1))
        for x, a, b0, b1 in zip(fa, A, B0, B1)
    ]
    assert got == want, "f12_sparse_mul mismatch"


@pytest.mark.parametrize("name", CURVES)
def test_miller_steps_vs_host(name, numpy_kernel_env):
    """dbl_step/add_step: line coefficients == the same formulas on host
    ints; point outputs == host group law in affine coordinates."""
    spec = get_spec(name)
    p, L, bn, xi0, twist = _cfg(spec)
    tw = RowTower(p, L, bn, xi0, twist)
    t = get_tower(spec)
    eng = get_engine(spec)
    rng = random.Random(13)

    # random G2 multiples (host affine), random projective scalings
    Qs = [eng.g2.mul(eng.gen_g2, rng.randrange(2, spec.r)) for _ in range(3)]
    Ts = []
    for m in (5, 9, 77):
        x, y = eng.g2.mul(eng.gen_g2, m)
        z = (rng.randrange(1, p), rng.randrange(p))
        Ts.append((t.f2_mul(x, z), t.f2_mul(y, z), z))
    Ps = [eng.g1.mul(eng.gen_g1, rng.randrange(2, spec.r)) for _ in range(3)]

    X = _enc2([T[0] for T in Ts], p, L)
    Y = _enc2([T[1] for T in Ts], p, L)
    Z = _enc2([T[2] for T in Ts], p, L)
    xP = _enc([P[0] for P in Ps], p, L)
    yP = _enc([P[1] for P in Ps], p, L)

    (A, DmB, negC), (Xn, Yn, Zn) = tw.dbl_step((X, Y, Z), xP, yP)
    for i, (T, P) in enumerate(zip(Ts, Ps)):
        Xh, Yh, Zh = T
        # host-side same line formulas: A=2YZ^2*yP, B=2Y^2Z, C=3X^2Z*xP, D=3X^3
        YZ = t.f2_mul(Yh, Zh)
        X2 = t.f2_sqr(Xh)
        Ah = t.f2_muls(t.f2_mul(t.f2_mul(YZ, Zh), t.f2(P[1])), 2)
        Bh = t.f2_muls(t.f2_mul(Yh, YZ), 2)
        Ch = t.f2_muls(t.f2_mul(t.f2_mul(X2, Zh), t.f2(P[0])), 3)
        Dh = t.f2_muls(t.f2_mul(X2, Xh), 3)
        assert _dec2(A, p, L)[i] == Ah
        assert _dec2(DmB, p, L)[i] == t.f2_sub(Dh, Bh)
        assert _dec2(negC, p, L)[i] == t.f2_neg(Ch)
        # point: affine(T') == double of affine(T)
        zi = t.f2_inv(Zh)
        aff = (t.f2_mul(Xh, zi), t.f2_mul(Yh, zi))
        want = eng.g2.add(aff, aff)
        zni = t.f2_inv(_dec2(Zn, p, L)[i])
        got = (
            t.f2_mul(_dec2(Xn, p, L)[i], zni),
            t.f2_mul(_dec2(Yn, p, L)[i], zni),
        )
        assert got == want, "dbl_step point mismatch"

    Qx = _enc2([Q[0] for Q in Qs], p, L)
    Qy = _enc2([Q[1] for Q in Qs], p, L)
    (A, DmB, negC), (Xn, Yn, Zn) = tw.add_step((X, Y, Z), Qx, Qy, xP, yP)
    for i, (T, Q, P) in enumerate(zip(Ts, Qs, Ps)):
        Xh, Yh, Zh = T
        th = t.f2_sub(Yh, t.f2_mul(Q[1], Zh))
        lam = t.f2_sub(Xh, t.f2_mul(Q[0], Zh))
        assert _dec2(A, p, L)[i] == t.f2_mul(lam, t.f2(P[1]))
        assert _dec2(DmB, p, L)[i] == t.f2_sub(
            t.f2_mul(th, Q[0]), t.f2_mul(lam, Q[1])
        )
        assert _dec2(negC, p, L)[i] == t.f2_neg(t.f2_mul(th, t.f2(P[0])))
        zi = t.f2_inv(Zh)
        aff = (t.f2_mul(Xh, zi), t.f2_mul(Yh, zi))
        want = eng.g2.add(aff, Q)
        zni = t.f2_inv(_dec2(Zn, p, L)[i])
        got = (
            t.f2_mul(_dec2(Xn, p, L)[i], zni),
            t.f2_mul(_dec2(Yn, p, L)[i], zni),
        )
        assert got == want, "add_step point mismatch"


def _host_dbl_step(t, spec, T, P):
    """The kernel's dbl_step evaluated on host ints (same formulas)."""
    X, Y, Z = T
    S = t.f2_mul(Y, Z)
    X2 = t.f2_sqr(X)
    YS = t.f2_mul(Y, S)
    SZ = t.f2_mul(S, Z)
    S2 = t.f2_sqr(S)
    A = t.f2_muls(t.f2_mul(SZ, t.f2(P[1])), 2)
    C = t.f2_muls(t.f2_mul(t.f2_mul(X2, Z), t.f2(P[0])), 3)
    B = t.f2_muls(YS, 2)
    D = t.f2_muls(t.f2_mul(X2, X), 3)
    W = t.f2_muls(X2, 3)
    Bd = t.f2_mul(X, YS)
    H = t.f2_sub(t.f2_sqr(W), t.f2_muls(Bd, 8))
    Xn = t.f2_muls(t.f2_mul(H, S), 2)
    Yn = t.f2_sub(
        t.f2_mul(W, t.f2_sub(t.f2_muls(Bd, 4), H)), t.f2_muls(t.f2_sqr(YS), 8)
    )
    Zn = t.f2_muls(t.f2_mul(S, S2), 8)
    return (A, t.f2_sub(D, B), t.f2_neg(C)), (Xn, Yn, Zn)


def _host_add_step(t, spec, T, Q, P):
    X, Y, Z = T
    th = t.f2_sub(Y, t.f2_mul(Q[1], Z))
    lam = t.f2_sub(X, t.f2_mul(Q[0], Z))
    A = t.f2_mul(lam, t.f2(P[1]))
    C = t.f2_mul(th, t.f2(P[0]))
    DmB = t.f2_sub(t.f2_mul(th, Q[0]), t.f2_mul(lam, Q[1]))
    l2 = t.f2_sqr(lam)
    l3 = t.f2_mul(l2, lam)
    G = t.f2_mul(X, l2)
    H = t.f2_sub(t.f2_add(l3, t.f2_mul(Z, t.f2_sqr(th))), t.f2_muls(G, 2))
    Xn = t.f2_mul(lam, H)
    Yn = t.f2_sub(t.f2_mul(th, t.f2_sub(G, H)), t.f2_mul(Y, l3))
    Zn = t.f2_mul(Z, l3)
    return (A, DmB, t.f2_neg(C)), (Xn, Yn, Zn)


def _f2_to_rows(e, p, L):
    """f2 rows pair -> stacked (2L, 1, B) numpy array."""
    return np.stack([r[0] for r in e[0]] + [r[0] for r in e[1]])[:, None, :]


@pytest.mark.parametrize("name", ["BLS12_381", "BN254"])
def test_miller_kernel_body_full(name, numpy_kernel_env_full):
    """The ENTIRE _miller_kernel body (init + fori_loop + pl.when add
    branch + SMEM bit reads) on numpy rows with the REAL curve loop bits,
    against (a) the same algorithm simulated on the host tower and (b) the
    true pairing: host final-exp of the Miller value (with conj/BN tail
    applied host-side) == the host engine's pairing.  Mosaic lowering of
    the same body is validated on the real chip by tools/perf_report.py.
    """
    spec = get_spec(name)
    eng = get_engine(spec)
    t = get_tower(spec)
    from mathlib_tpu.ops.pairing import get_pairing_ctx

    ctx = get_pairing_ctx(spec)
    p, L, bn, xi0, twist = _cfg(spec)
    tw = RowTower(p, L, bn, xi0, twist)
    rng = random.Random(3)
    a = rng.randrange(2, spec.r)
    b = rng.randrange(2, spec.r)
    P = eng.g1.mul(eng.gen_g1, a)
    Q = eng.g2.mul(eng.gen_g2, b)

    bits = np.asarray(ctx.loop_bits, dtype=np.uint32)
    xp = np.stack([r[0] for r in _enc([P[0]], p, L)])[:, None, :]
    yp = np.stack([r[0] for r in _enc([P[1]], p, L)])[:, None, :]
    qx = _f2_to_rows(_enc2([Q[0]], p, L), p, L)
    qy = _f2_to_rows(_enc2([Q[1]], p, L), p, L)
    f_out = np.zeros((12 * L, 1, 1), np.uint32)
    t_out = np.zeros((6 * L, 1, 1), np.uint32)
    pp_mod._miller_kernel(
        tw, len(bits), _Ref(bits), _Ref(xp), _Ref(yp), _Ref(qx), _Ref(qy),
        _Ref(f_out), _Ref(t_out),
    )

    def dec_f12(arr):
        rows = tuple(
            tuple(
                (
                    [arr[((h * 3 + j) * 2 + 0) * L + i] for i in range(L)],
                    [arr[((h * 3 + j) * 2 + 1) * L + i] for i in range(L)],
                )
                for j in range(3)
            )
            for h in range(2)
        )
        return _dec12(rows, p, L)[0]

    got_f = dec_f12(f_out)

    # (a) host simulation of the identical algorithm
    fh = ((t.f2(1), t.f2(0), t.f2(0)), (t.f2(0), t.f2(0), t.f2(0)))
    Th = (Q[0], Q[1], t.f2(1))
    for bit in bits:
        (A, DmB, negC), Th = _host_dbl_step(t, spec, Th, P)
        fh = t.f12_mul(t.f12_sqr(fh), _line12(t, spec, A, DmB, negC))
        if bit:
            (A, DmB, negC), Th = _host_add_step(t, spec, Th, Q, P)
            fh = t.f12_mul(fh, _line12(t, spec, A, DmB, negC))
    assert got_f == fh, "kernel Miller value != host simulation"

    # (b) the algorithm itself is a correct Miller loop: finish host-side
    if ctx.conj_end:
        fh = t.f12_conj(fh)
        Th = (Th[0], t.f2_neg(Th[1]), Th[2])
    if ctx.bn_tail:
        Q1 = (
            t.f2_mul(t.f2_conj(Q[0]), ctx.cx1),
            t.f2_mul(t.f2_conj(Q[1]), ctx.cy1),
        )
        Q2 = (
            t.f2_mul(Q[0], ctx.cx2),
            t.f2_neg(t.f2_mul(Q[1], ctx.cy2)),
        )
        (A, DmB, negC), Th = _host_add_step(t, spec, Th, Q1, P)
        fh = t.f12_mul(fh, _line12(t, spec, A, DmB, negC))
        (A, DmB, negC), Th = _host_add_step(t, spec, Th, Q2, P)
        fh = t.f12_mul(fh, _line12(t, spec, A, DmB, negC))
    assert t.f12_final_exp(fh) == eng.pairing(P, Q)


@pytest.mark.parametrize("name", ["BN254"])
def test_add_step_kernel_body(name, numpy_kernel_env_full):
    """_add_step_kernel body (the BN Frobenius-tail seam) on numpy rows."""
    spec = get_spec(name)
    eng = get_engine(spec)
    t = get_tower(spec)
    p, L, bn, xi0, twist = _cfg(spec)
    tw = RowTower(p, L, bn, xi0, twist)
    rng = random.Random(11)
    P = eng.g1.mul(eng.gen_g1, rng.randrange(2, spec.r))
    Q = eng.g2.mul(eng.gen_g2, rng.randrange(2, spec.r))
    T2 = eng.g2.mul(eng.gen_g2, 7)
    zz = (rng.randrange(1, p), rng.randrange(p))
    Th = (t.f2_mul(T2[0], zz), t.f2_mul(T2[1], zz), zz)
    f0 = _rand_f12(t, rng)

    f_in = np.concatenate(
        [
            np.stack([rr[0] for rr in rows])
            for h in range(2)
            for j in range(3)
            for rows in _enc2([f0[h][j]], p, L)
        ]
    )[:, None, :]
    t_in = np.concatenate(
        [np.stack([rr[0] for rr in rows]) for c in range(3)
         for rows in _enc2([Th[c]], p, L)]
    )[:, None, :]
    qx = _f2_to_rows(_enc2([Q[0]], p, L), p, L)
    qy = _f2_to_rows(_enc2([Q[1]], p, L), p, L)
    xp = np.stack([r[0] for r in _enc([P[0]], p, L)])[:, None, :]
    yp = np.stack([r[0] for r in _enc([P[1]], p, L)])[:, None, :]
    f_out = np.zeros_like(f_in)
    t_out = np.zeros_like(t_in)
    pp_mod._add_step_kernel(
        tw, _Ref(f_in), _Ref(t_in), _Ref(qx), _Ref(qy), _Ref(xp), _Ref(yp),
        _Ref(f_out), _Ref(t_out),
    )
    (A, DmB, negC), Tn = _host_add_step(t, spec, Th, Q, P)
    fh = t.f12_mul(f0, _line12(t, spec, A, DmB, negC))
    rows = tuple(
        tuple(
            (
                [f_out[((h * 3 + j) * 2 + 0) * L + i] for i in range(L)],
                [f_out[((h * 3 + j) * 2 + 1) * L + i] for i in range(L)],
            )
            for j in range(3)
        )
        for h in range(2)
    )
    assert _dec12(rows, p, L)[0] == fh
    got_T = tuple(
        (
            _dec([t_out[(2 * c) * L + i] for i in range(L)], p, L)[0],
            _dec([t_out[(2 * c + 1) * L + i] for i in range(L)], p, L)[0],
        )
        for c in range(3)
    )
    assert got_T == Tn


@pytest.mark.parametrize("name", ["BLS12_381"])
def test_pow_kernel_bodies(name, numpy_kernel_env_full):
    """_fp_pow_kernel / _f12_pow_kernel bodies on numpy rows vs host."""
    spec = get_spec(name)
    p, L, bn, xi0, twist = _cfg(spec)
    tw = RowTower(p, L, bn, xi0, twist)
    t = get_tower(spec)
    rng = random.Random(5)
    from mathlib_tpu.ops.kernels.fp_rows import RowCtx

    vals = [rng.randrange(1, p) for _ in range(4)]
    e = 0xD201000000010000
    bits = np.array(
        [int(ch) for ch in bin(e)[2:]], dtype=np.uint32
    )  # MSB-first
    a = np.stack([r[0] for r in _enc(vals, p, L)])[:, None, :]
    out = np.zeros_like(a)
    F = RowCtx(p, L)
    R = 1 << (16 * L)
    one_limbs = tuple(((R % p) >> (16 * k)) & 0xFFFF for k in range(L))
    pp_mod._fp_pow_kernel(F, one_limbs, len(bits), _Ref(bits), _Ref(a), _Ref(out))
    got = _dec([out[i] for i in range(L)], p, L)
    assert got == [pow(v, e, p) for v in vals]

    f0 = _rand_f12(t, rng)
    base = np.concatenate(
        [np.stack([rr[0] for rr in rows]) for h in range(2)
         for j in range(3) for rows in _enc2([f0[h][j]], p, L)]
    )[:, None, :]
    fout = np.zeros_like(base)
    small = 0b1011001
    bits_s = np.array([int(ch) for ch in bin(small)[2:]], dtype=np.uint32)
    pp_mod._f12_pow_kernel(
        tw, len(bits_s), False, _Ref(bits_s), _Ref(base), _Ref(fout)
    )
    rows = tuple(
        tuple(
            (
                [fout[((h * 3 + j) * 2 + 0) * L + i] for i in range(L)],
                [fout[((h * 3 + j) * 2 + 1) * L + i] for i in range(L)],
            )
            for j in range(3)
        )
        for h in range(2)
    )
    assert _dec12(rows, p, L)[0] == t.f12_pow(f0, small)


@pytest.mark.parametrize("name", CURVES)
def test_cyclo_sqr_vs_dense(name, numpy_kernel_env):
    """Granger-Scott cyclotomic squaring == dense f12_sqr on unitary
    elements (made cyclotomic host-side via the easy part f^((p^6-1)(p^2+1)))."""
    spec = get_spec(name)
    p, L, bn, xi0, twist = _cfg(spec)
    tw = RowTower(p, L, bn, xi0, twist)
    t = get_tower(spec)
    rng = random.Random(21)
    fs = []
    for _ in range(2):
        f = _rand_f12(t, rng)
        f = t.f12_pow(f, (p**6 - 1) * (p**2 + 1))
        fs.append(f)
    enc = _enc12(fs, p, L)
    got = _dec12(tw.f12_cyclo_sqr(enc), p, L)
    want = [t.f12_sqr(f) for f in fs]
    assert got == want


@pytest.mark.parametrize("name", ["BLS12_381", "BLS12_377"])
def test_final_exp_kernel_body(name, numpy_kernel_env_full):
    """The whole fused final-exp kernel body (easy part with in-kernel
    Fp12 inversion + BLS12 factor-3 hard-part x-chains) on numpy rows vs
    the host tower's f12_final_exp."""
    spec = get_spec(name)
    p, L, bn, xi0, twist = _cfg(spec)
    tw = RowTower(p, L, bn, xi0, twist)
    t = get_tower(spec)
    gammas = pp_mod.frob_gammas(spec, p, L)
    rng = random.Random(31)
    f0 = _rand_f12(t, rng)

    inv_bits = np.array([int(b) for b in bin(p - 2)[2:]], dtype=np.uint32)
    x_bits = np.array([int(b) for b in bin(abs(spec.x))[2:]], dtype=np.uint32)
    f_in = np.concatenate(
        [np.stack([rr[0] for rr in rows]) for h in range(2)
         for j in range(3) for rows in _enc2([f0[h][j]], p, L)]
    )[:, None, :]
    out = np.zeros_like(f_in)
    acc = np.zeros_like(f_in)
    base = np.zeros_like(f_in)
    pp_mod._final_exp_kernel(
        tw, gammas, len(inv_bits), len(x_bits), spec.x < 0,
        _Ref(inv_bits), _Ref(x_bits), _Ref(f_in), _Ref(out), _Ref(acc),
        _Ref(base),
    )
    rows = tuple(
        tuple(
            (
                [out[((h * 3 + j) * 2 + 0) * L + i] for i in range(L)],
                [out[((h * 3 + j) * 2 + 1) * L + i] for i in range(L)],
            )
            for j in range(3)
        )
        for h in range(2)
    )
    assert _dec12(rows, p, L)[0] == t.f12_final_exp(f0)


@pytest.mark.parametrize("name", ["BLS12_381"])
def test_f12_pow_kernel_cyclo_body(name, numpy_kernel_env_full):
    """cyclo=True pow kernel body on a unitary base vs host f12_pow."""
    spec = get_spec(name)
    p, L, bn, xi0, twist = _cfg(spec)
    tw = RowTower(p, L, bn, xi0, twist)
    t = get_tower(spec)
    rng = random.Random(41)
    f0 = t.f12_pow(_rand_f12(t, rng), (p**6 - 1) * (p**2 + 1))
    base = np.concatenate(
        [np.stack([rr[0] for rr in rows]) for h in range(2)
         for j in range(3) for rows in _enc2([f0[h][j]], p, L)]
    )[:, None, :]
    fout = np.zeros_like(base)
    e = 0xD2013F
    bits = np.array([int(ch) for ch in bin(e)[2:]], dtype=np.uint32)
    pp_mod._f12_pow_kernel(tw, len(bits), True, _Ref(bits), _Ref(base), _Ref(fout))
    rows = tuple(
        tuple(
            (
                [fout[((h * 3 + j) * 2 + 0) * L + i] for i in range(L)],
                [fout[((h * 3 + j) * 2 + 1) * L + i] for i in range(L)],
            )
            for j in range(3)
        )
        for h in range(2)
    )
    assert _dec12(rows, p, L)[0] == t.f12_pow(f0, e)


@pytest.mark.parametrize(
    "name",
    ["BLS12_381", pytest.param("BLS12_377", marks=pytest.mark.slow)],
)
def test_pairing_check_kernel_body(name, numpy_kernel_env_full):
    """The fused one-launch pairing-check body (Miller + conj + pad mask +
    rotation product + final exp + unity test) on numpy rows: the lane
    tile is a full (1, 128) row (the rotation product assumes 128 lanes);
    2 real pairs at lanes 0-1, the rest garbage masked by nlanes."""
    spec = get_spec(name)
    eng = get_engine(spec)
    from mathlib_tpu.ops.pairing import get_pairing_ctx

    ctx = get_pairing_ctx(spec)
    p, L, bn, xi0, twist = _cfg(spec)
    tw = RowTower(p, L, bn, xi0, twist)
    gammas = pp_mod.frob_gammas(spec, p, L)
    rng = random.Random(5)
    a = rng.randrange(2, spec.r)
    P = eng.g1.mul(eng.gen_g1, a)
    Q = eng.g2.mul(eng.gen_g2, rng.randrange(2, spec.r))
    nP = eng.g1.neg(P)

    def run(pairs):
        B = 128
        g1s = [pairs[i % len(pairs)][0] for i in range(B)]
        g2s = [pairs[i % len(pairs)][1] for i in range(B)]
        xp = np.stack([r[0] for r in _enc([pt[0] for pt in g1s], p, L)])[:, None, :]
        yp = np.stack([r[0] for r in _enc([pt[1] for pt in g1s], p, L)])[:, None, :]
        qx = _f2_to_rows(_enc2([q[0] for q in g2s], p, L), p, L)
        qy = _f2_to_rows(_enc2([q[1] for q in g2s], p, L), p, L)
        bits = np.asarray(ctx.loop_bits, dtype=np.uint32)
        inv_bits = np.array([int(b) for b in bin(p - 2)[2:]], dtype=np.uint32)
        x_bits = np.array(
            [int(b) for b in bin(abs(spec.x))[2:]], dtype=np.uint32
        )
        mk = lambda rows: np.zeros((rows * L, 1, B), np.uint32)
        ok = np.zeros((1, B), np.uint32)
        pp_mod._pairing_check_kernel(
            tw, len(bits), gammas, len(inv_bits), len(x_bits), spec.x < 0,
            ctx.conj_end,
            _Ref(bits), _Ref(inv_bits), _Ref(x_bits),
            _Ref(np.array([len(pairs)], dtype=np.int32)),
            _Ref(xp), _Ref(yp), _Ref(qx), _Ref(qy),
            _Ref(ok), _Ref(mk(12)), _Ref(mk(6)), _Ref(mk(12)),
            _Ref(mk(12)), _Ref(mk(12)),
        )
        # every position holds the same verdict after the rotation product
        assert (ok == ok[0, 0]).all()
        return bool(ok[0, 0])

    # e(P,Q) * e(-P,Q) == 1; the 126 garbage lanes are masked out
    assert run([(P, Q), (nP, Q)]) is True
    # e(P,Q)^2 != 1
    assert run([(P, Q), (P, Q)]) is False


@pytest.mark.parametrize(
    "name",
    [
        "BLS12_381",
        "BN254",
        # slow extras: BLS12-377 exercises the lazy-Fp2 path with
        # beta = -5 (wide small-multiple), FP256BN the BN tail on the
        # second BN-family configuration
        pytest.param("BLS12_377", marks=pytest.mark.slow),
        pytest.param("FP256BN", marks=pytest.mark.slow),
    ],
)
def test_pairing_prod_kernel_body(name, numpy_kernel_env_full):
    """Split-mode stage 1 (_pairing_prod_kernel): Miller + mask + rotation
    product WITHOUT final exp.  The product has per-step scale freedom vs
    the host engine, so the comparison applies the HOST final exp to the
    decoded product and checks the reduced value.

    BN254 exercises the in-kernel Frobenius tail (two chord lines with
    Q1 = pi(Q), Q2 = -pi^2(Q); reference bn254.go:247-267)."""
    spec = get_spec(name)
    eng = get_engine(spec)
    from mathlib_tpu.host.fields import get_tower as get_host_tower
    from mathlib_tpu.ops.pairing import get_pairing_ctx

    ctx = get_pairing_ctx(spec)
    p, L, bn, xi0, twist = _cfg(spec)
    tw = RowTower(p, L, bn, xi0, twist)
    ht = get_host_tower(spec)
    rng = random.Random(6)
    P = eng.g1.mul(eng.gen_g1, rng.randrange(2, spec.r))
    Q = eng.g2.mul(eng.gen_g2, rng.randrange(2, spec.r))
    P2 = eng.g1.mul(eng.gen_g1, rng.randrange(2, spec.r))

    tail = None
    if ctx.bn_tail:
        tail = tuple(
            (pp_mod._mont_limbs(p, L, c0), pp_mod._mont_limbs(p, L, c1))
            for (c0, c1) in (ctx.cx1, ctx.cy1, ctx.cx2, ctx.cy2)
        )

    B = 128
    pairs = [(P, Q), (P2, Q)]
    g1s = [pairs[i % 2][0] for i in range(B)]
    g2s = [pairs[i % 2][1] for i in range(B)]
    xp = np.stack([r[0] for r in _enc([pt[0] for pt in g1s], p, L)])[:, None, :]
    yp = np.stack([r[0] for r in _enc([pt[1] for pt in g1s], p, L)])[:, None, :]
    qx = _f2_to_rows(_enc2([q[0] for q in g2s], p, L), p, L)
    qy = _f2_to_rows(_enc2([q[1] for q in g2s], p, L), p, L)
    bits = np.asarray(ctx.loop_bits, dtype=np.uint32)
    mk = lambda rows: np.zeros((rows * L, 1, B), np.uint32)
    prod = mk(12)
    pp_mod._pairing_prod_kernel(
        tw, len(bits), ctx.conj_end, tail,
        _Ref(bits), _Ref(np.array([2], dtype=np.int32)),
        _Ref(xp), _Ref(yp), _Ref(qx), _Ref(qy),
        _Ref(prod), _Ref(mk(12)), _Ref(mk(6)),
    )
    got = ht.f12_final_exp(
        _dec12(pp_mod._ld_f12(_Ref(prod), L), p, L)[0]
    )
    want = ht.f12_mul(eng.pairing(P, Q), eng.pairing(P2, Q))
    assert got == want


@pytest.mark.parametrize("name,seg", [
    ("BLS12_381", 64), ("BN254", 64),
    pytest.param("BLS12_381", 256, marks=pytest.mark.slow),
])
def test_pairing_prod_seg_kernel_body(name, seg, numpy_kernel_env_full):
    """Segmented grouped products (_pairing_prod_seg_kernel): one product
    per ``seg`` consecutive lanes, read at flat positions k*seg + seg - 1
    (np.roll window convention).  Groups: k=0 is a unity product
    (e(P,Q) e(-P,Q) ...), k=1 is not; remaining lanes are pad masked to
    the identity so their groups reduce to 1."""
    spec = get_spec(name)
    eng = get_engine(spec)
    from mathlib_tpu.host.fields import get_tower as get_host_tower
    from mathlib_tpu.ops.pairing import get_pairing_ctx

    ctx = get_pairing_ctx(spec)
    p, L, bn, xi0, twist = _cfg(spec)
    tw = RowTower(p, L, bn, xi0, twist)
    ht = get_host_tower(spec)
    rng = random.Random(7)
    P = eng.g1.mul(eng.gen_g1, rng.randrange(2, spec.r))
    Q = eng.g2.mul(eng.gen_g2, rng.randrange(2, spec.r))
    nP = eng.g1.neg(P)

    tail = None
    if ctx.bn_tail:
        tail = tuple(
            (pp_mod._mont_limbs(p, L, c0), pp_mod._mont_limbs(p, L, c1))
            for (c0, c1) in (ctx.cx1, ctx.cy1, ctx.cx2, ctx.cy2)
        )

    TS = max(1, 2 * seg // 128)      # sublane rows: room for TWO groups
    B = 128
    nlanes = 2 * seg                 # two real groups, rest pad
    g1s, g2s = [], []
    for k in range(TS * B):
        if k < seg:                  # group 0: pairs multiplying to one
            g1s.append(P if k % 2 == 0 else nP)
            g2s.append(Q)
        else:                        # group 1 (+ pad): e(P,Q)^seg != 1
            g1s.append(P)
            g2s.append(Q)
    xp = np.stack(
        [r.reshape(TS, B) for r in
         np.stack([row[0] for row in _enc([pt[0] for pt in g1s], p, L)])]
    )
    yp = np.stack(
        [r.reshape(TS, B) for r in
         np.stack([row[0] for row in _enc([pt[1] for pt in g1s], p, L)])]
    )
    qx = _f2_to_rows(_enc2([q[0] for q in g2s], p, L), p, L).reshape(
        2 * L, TS, B
    )
    qy = _f2_to_rows(_enc2([q[1] for q in g2s], p, L), p, L).reshape(
        2 * L, TS, B
    )
    bits = np.asarray(ctx.loop_bits, dtype=np.uint32)
    mk = lambda rows: np.zeros((rows * L, TS, B), np.uint32)
    prod = mk(12)
    pp_mod._pairing_prod_seg_kernel(
        tw, len(bits), ctx.conj_end, tail, seg,
        _Ref(bits), _Ref(np.array([nlanes], dtype=np.int32)),
        _Ref(xp), _Ref(yp), _Ref(qx), _Ref(qy),
        _Ref(prod), _Ref(mk(12)), _Ref(mk(6)),
    )
    flat = prod.reshape(12 * L, TS * B)
    G = TS * B // seg
    sel = flat[:, np.arange(G) * seg + seg - 1][:, :, None]  # (12L, G, 1)
    rows = tuple(
        tuple(
            (
                [sel[((h * 3 + j) * 2 + 0) * L + i] for i in range(L)],
                [sel[((h * 3 + j) * 2 + 1) * L + i] for i in range(L)],
            )
            for j in range(3)
        )
        for h in range(2)
    )
    def dec_group(k):
        r = tuple(
            tuple(
                (
                    [x[k][None, :] for x in rows[h][j][0]],
                    [x[k][None, :] for x in rows[h][j][1]],
                )
                for j in range(3)
            )
            for h in range(2)
        )
        return _dec12(r, p, L)[0]

    assert ht.f12_final_exp(dec_group(0)) == ht.F12_ONE
    got1 = ht.f12_final_exp(dec_group(1))
    want1 = ht.f12_pow(eng.pairing(P, Q), seg)
    assert got1 == want1
    assert got1 != ht.F12_ONE


@pytest.mark.parametrize("name", ["BLS12_381", "BLS12_377", "FP256BN"])
def test_f12_ops_lazy_vs_host(name, numpy_kernel_env, monkeypatch):
    """The LAZY Fp2 path (MulBatch.push_f2) through the tower ops vs the
    exact host tower — explicit coverage independent of the
    MATHLIB_LAZY_F2 default (OFF until validated on hardware)."""
    monkeypatch.setattr(pp_mod, "_LAZY_F2", True)
    spec = get_spec(name)
    p, L, bn, xi0, twist = _cfg(spec)
    tw = RowTower(p, L, bn, xi0, twist)
    assert tw.lazy, "gate should admit this curve"
    t = get_tower(spec)
    rng = random.Random(11)
    fa = [_rand_f12(t, rng) for _ in range(3)]
    fb = [_rand_f12(t, rng) for _ in range(3)]
    ra, rb = _enc12(fa, p, L), _enc12(fb, p, L)
    assert _dec12(tw.f12_mul(ra, rb), p, L) == [
        t.f12_mul(x, y) for x, y in zip(fa, fb)
    ]
    assert _dec12(tw.f12_sqr(ra), p, L) == [t.f12_sqr(x) for x in fa]
    # dbl/add step through the lazy tower: full line+point agreement is
    # covered curve-by-curve by test_miller_steps_vs_host when the env
    # flag is on; here pin one Fp2 mul chain shape (sparse line mul)
    A = [(rng.randrange(p), rng.randrange(p)) for _ in range(3)]
    B0 = [(rng.randrange(p), rng.randrange(p)) for _ in range(3)]
    B1 = [(rng.randrange(p), rng.randrange(p)) for _ in range(3)]
    got = _dec12(
        tw.f12_sparse_mul(ra, _enc2(A, p, L), _enc2(B0, p, L), _enc2(B1, p, L)),
        p, L,
    )
    want = [
        t.f12_mul(x, _line12(t, spec, a, b0, b1))
        for x, a, b0, b1 in zip(fa, A, B0, B1)
    ]
    assert got == want
