"""Differential tests for the Pallas TPU kernels.

The Mosaic kernels (ops/kernels/*.py) are the production TPU compute path —
the analogue of the reference's ADX Montgomery assembly
(driver/kilic/custom_amd64.go:26-30).  The CPU test suite never takes that
dispatch (``_pallas_enabled()`` is False off-TPU), so the kernels are driven
here explicitly, two ways:

* ``interpret=True`` through the real ``pallas_call`` (grid, BlockSpecs,
  tiling/restore plumbing) — cheap enough for the single-mul field kernel on
  every modulus, and for one fused point kernel (marked slow).
* the kernel *bodies* evaluated with a NumPy-backed Ref shim: the bodies are
  trace-time Python over uint32 arrays, so running them on numpy arrays is
  the identical integer computation (wrap-around, shifts, where) at a
  millisecond cost instead of minutes of interpret-mode compile.  This gives
  all four fused G1 kernels x all four curves differential coverage against
  the exact host group law in the default suite.

bench.py additionally asserts Pallas-vs-XLA consistency on the real TPU
before printing any number.
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

import mathlib_tpu.ops.kernels.fp_rows as fp_rows_mod
import mathlib_tpu.ops.kernels.g1_pallas as g1p_mod
from mathlib_tpu.curves.params import get_spec
from mathlib_tpu.host.engine import get_engine
from mathlib_tpu.ops.field import get_fp_ctx, int_to_limbs
from mathlib_tpu.ops.g1 import get_g1_ctx
from mathlib_tpu.ops.kernels.fp_pallas import mont_mul_pallas
from mathlib_tpu.ops.kernels.fp_rows import RowCtx

CURVES = ["BLS12_381", "BLS12_377", "BN254", "FP256BN"]


def _moduli():
    out = []
    for name in CURVES:
        s = get_spec(name)
        # interpret-mode pallas_call execution cost grows steeply with L:
        # the two 381-bit moduli take ~9 min each cold on XLA:CPU, so they
        # ride the slow lane; the 4 smaller moduli keep interpret-mode
        # plumbing coverage in the default run (the in-kernel MATH is
        # covered for every modulus by the numpy-shim tests below).
        marks = [pytest.mark.slow] if s.p.bit_length() > 300 else []
        out.append(pytest.param(s.p, id=name + "_fp", marks=marks))
        out.append(pytest.param(s.r, id=name + "_fr"))
    return out


def _encode_batch(vals, L):
    """ints -> (L, B) uint32 limbs."""
    return np.stack([int_to_limbs(v, L) for v in vals], axis=-1)


def _decode_batch(arr):
    arr = np.asarray(arr)
    L, B = arr.shape[-2], arr.shape[-1]
    return [
        sum(int(arr[..., k, i]) << (16 * k) for k in range(L)) for i in range(B)
    ]


# ---------------------------------------------------------------------------
# field kernel through real pallas_call (interpret mode)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("p", _moduli())
def test_mont_mul_pallas_matches_xla(p):
    ctx = get_fp_ctx(p, "k%d" % (p % 65521))
    L = ctx.L
    rng = random.Random(p % (2**31))
    # relaxed-domain inputs: [0, 2p) including 0, 1, p-1, p, 2p-1
    vals_a = [0, 1, p - 1, p, 2 * p - 1] + [rng.randrange(2 * p) for _ in range(11)]
    vals_b = [2 * p - 1, p, 1, p - 1, 0] + [rng.randrange(2 * p) for _ in range(11)]
    a = _encode_batch(vals_a, L)
    b = _encode_batch(vals_b, L)
    got = np.asarray(
        mont_mul_pallas(p, L, jnp.asarray(a), jnp.asarray(b), interpret=True)
    )
    want = np.asarray(ctx.mont_mul(jnp.asarray(a), jnp.asarray(b)))
    assert np.array_equal(got, want)
    # and both equal a*b*R^-1 mod p, still in the relaxed domain
    R_inv = pow(1 << (16 * L), p - 2, p)
    for va, vb, vo in zip(vals_a, vals_b, _decode_batch(got)):
        assert vo % p == va * vb * R_inv % p
        assert vo < 2 * p


# ---------------------------------------------------------------------------
# numpy Ref shim for kernel bodies
# ---------------------------------------------------------------------------


class _Ref:
    def __init__(self, arr):
        self.arr = arr

    def __getitem__(self, idx):
        return self.arr[idx]

    def __setitem__(self, idx, val):
        self.arr[idx] = val


@pytest.fixture
def numpy_kernel_env(monkeypatch):
    """Run kernel bodies on numpy: identical uint32 semantics, no XLA."""
    monkeypatch.setattr(fp_rows_mod, "jnp", np)
    monkeypatch.setattr(g1p_mod, "jnp", np)


def _rows(vals, L):
    """ints -> list of L (1, B) uint32 rows (the in-kernel layout)."""
    return [np.asarray(a)[None, :] for a in _encode_batch(vals, L)]


def _unrows(rows):
    return _decode_batch(np.stack([r[0] for r in rows], axis=0))


@pytest.mark.parametrize("name", CURVES)
def test_rowctx_field_ops(name, numpy_kernel_env):
    """RowCtx mul/add/sub/mul_small vs exact integer arithmetic, all curves."""
    spec = get_spec(name)
    for p in (spec.p, spec.r):
        L = get_fp_ctx(p, "rc%d" % (p % 65521)).L
        ctx = RowCtx(p, L)
        rng = random.Random(p % (2**31))
        va = [0, 1, p, 2 * p - 1] + [rng.randrange(2 * p) for _ in range(8)]
        vb = [2 * p - 1, p, 1, 0] + [rng.randrange(2 * p) for _ in range(8)]
        a, b = _rows(va, L), _rows(vb, L)
        R_inv = pow(1 << (16 * L), p - 2, p)
        for got, want in [
            (_unrows(ctx.mul(a, b)), [x * y * R_inv % p for x, y in zip(va, vb)]),
            (_unrows(ctx.sqr(a)), [x * x * R_inv % p for x in va]),
            (_unrows(ctx.sqr(b)), [y * y * R_inv % p for y in vb]),
            (_unrows(ctx.add(a, b)), [(x + y) % p for x, y in zip(va, vb)]),
            (_unrows(ctx.sub(a, b)), [(x - y) % p for x, y in zip(va, vb)]),
            (_unrows(ctx.mul_small(a, 13)), [x * 13 % p for x in va]),
        ]:
            for g, w in zip(got, want):
                assert g % p == w
                assert g < 2 * p


def _sample_points(g1, rng, n):
    """n host points: infinity, generator, random multiples."""
    eng = get_engine(g1.spec)
    pts = [None, eng.gen_g1]
    for _ in range(n - 2):
        pts.append(eng.g1.mul(eng.gen_g1, rng.randrange(1, g1.spec.r)))
    return pts


def _enc4(g1, pts):
    """host points -> (3, L, 1, B) uint32 (one sublane row of B lanes)."""
    return np.asarray(g1.encode_points(pts))[:, :, None, :]


@pytest.mark.parametrize(
    "mm", [g1p_mod._mm_serial, g1p_mod._mm_stacked], ids=["serial", "stacked"]
)
@pytest.mark.parametrize("name", CURVES)
def test_g1_kernel_bodies(name, mm, numpy_kernel_env):
    """All four fused RCB kernels vs the exact host group law, under both
    mul-many strategies (serial per-mul and sublane-stacked levels)."""
    g1 = get_g1_ctx(get_spec(name))
    eng = get_engine(g1.spec)
    p, L, b3 = g1.spec.p, g1.fp.L, g1.F.b3
    ctx = RowCtx(p, L)
    rng = random.Random(0xC0FFEE)
    hostP = _sample_points(g1, rng, 8)
    hostQ = _sample_points(g1, rng, 8)
    # include P+(-P) -> infinity and P+P -> doubling through `add`
    hostQ[6] = None if hostP[6] is None else (hostP[6][0], (-hostP[6][1]) % p)
    hostQ[7] = hostP[7]
    P4, Q4 = _enc4(g1, hostP), _enc4(g1, hostQ)
    sel = np.asarray([1, 0, 1, 1, 0, 1, 1, 1], dtype=np.uint32)[None, :]

    def run(kernel, *refs):
        o = _Ref(np.zeros_like(P4))
        kernel(ctx, b3, *[_Ref(r.copy()) for r in refs], o, mm=mm)
        return g1.decode_points(o.arr[:, :, 0, :])

    addh = lambda a, b: eng.g1.add(a, b)  # noqa: E731
    dblh = lambda a: eng.g1.add(a, a)  # noqa: E731

    got = run(g1p_mod._add_kernel, P4, Q4)
    assert got == [addh(a, b) for a, b in zip(hostP, hostQ)]

    got = run(g1p_mod._double_kernel, P4)
    assert got == [dblh(a) for a in hostP]

    got = run(g1p_mod._dbladd_kernel, P4, Q4, sel)
    want = [
        addh(dblh(a), b) if s else dblh(a)
        for a, b, s in zip(hostP, hostQ, sel[0])
    ]
    assert got == want

    got = run(g1p_mod._addsel_kernel, P4, Q4, sel)
    want = [addh(a, b) if s else b for a, b, s in zip(hostP, hostQ, sel[0])]
    assert got == want

    negm = np.asarray([0, 1, 0, 1, 0, 1, 0, 1], dtype=np.uint32)[None, :]
    got = run(g1p_mod._addselneg_kernel, P4, Q4, sel, negm)
    negh = lambda b: None if b is None else (b[0], (-b[1]) % p)  # noqa: E731
    Qn = [negh(b) if t else b for b, t in zip(hostQ, negm[0])]
    want = [addh(a, b) if s else b for a, b, s in zip(hostP, Qn, sel[0])]
    assert got == want

    # mixed-add combiners: Q affine (2, L) rows, never infinity
    hostQa = [q if q is not None else eng.gen_g1 for q in hostQ]
    Qa4 = np.asarray(g1.encode_points_affine(hostQa))[:, :, None, :]
    R = 1 << (16 * L)
    one_limbs = tuple(((R % p) >> (16 * k)) & 0xFFFF for k in range(L))

    def run_m(kernel, *refs):
        o = _Ref(np.zeros_like(P4))
        kernel(ctx, b3, one_limbs, *[_Ref(r.copy()) for r in refs], o, mm=mm)
        return g1.decode_points(o.arr[:, :, 0, :])

    got = run_m(g1p_mod._maddsel_kernel, P4, Qa4, sel)
    want = [addh(a, b) if s else b for a, b, s in zip(hostP, hostQa, sel[0])]
    assert got == want

    got = run_m(g1p_mod._maddselneg_kernel, P4, Qa4, sel, negm)
    Qan = [negh(b) if t else b for b, t in zip(hostQa, negm[0])]
    want = [addh(a, b) if s else b for a, b, s in zip(hostP, Qan, sel[0])]
    assert got == want


# ---------------------------------------------------------------------------
# one fused kernel through the full pallas_call plumbing (slow: interpret-
# mode compile of the unrolled kernel takes minutes)
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_g1_add_pallas_plumbing():
    g1 = get_g1_ctx(get_spec("BN254"))
    eng = get_engine(g1.spec)
    rng = random.Random(7)
    hostP = _sample_points(g1, rng, 8)
    hostQ = _sample_points(g1, rng, 8)
    P = jnp.asarray(g1.encode_points(hostP))
    Q = jnp.asarray(g1.encode_points(hostQ))
    out = g1p_mod.add_pallas(g1.spec.p, g1.fp.L, g1.F.b3, P, Q, interpret=True)
    got = g1.decode_points(np.asarray(out))
    assert got == [eng.g1.add(a, b) for a, b in zip(hostP, hostQ)]


# ---------------------------------------------------------------------------
# fused G2 kernels (ops/kernels/g2_pallas.py) — numpy-shim body tests vs the
# exact host G2 group law (BLS12-381: the small-b3, beta=-1 gated curve)
# ---------------------------------------------------------------------------


@pytest.fixture
def numpy_g2_kernel_env(monkeypatch):
    import mathlib_tpu.ops.kernels.g2_pallas as g2p_mod
    import mathlib_tpu.ops.kernels.pairing_pallas as pp_mod

    monkeypatch.setattr(fp_rows_mod, "jnp", np)
    monkeypatch.setattr(g2p_mod, "jnp", np)
    # the lazy Fp2 path routes through pairing_pallas.MulBatch, whose
    # concatenates must also run on numpy here (a real-jnp MulBatch on
    # numpy rows dispatches eagerly through JAX — hours, not seconds)
    monkeypatch.setattr(pp_mod, "jnp", np)
    return g2p_mod


def _sample_g2_points(eng, rng, n, p):
    pts = [None, eng.gen_g2]
    for _ in range(n - 2):
        pts.append(eng.g2.mul(eng.gen_g2, rng.randrange(1, eng.spec.r)))
    return pts


@pytest.mark.parametrize("strategy", ["serial", "stacked"])
def test_g2_kernel_bodies(strategy, numpy_g2_kernel_env):
    from mathlib_tpu.ops.g2 import get_g2_ctx

    g2p_mod = numpy_g2_kernel_env
    spec = get_spec("BLS12_381")
    g2 = get_g2_ctx(spec)
    eng = get_engine(spec)
    p, L = spec.p, g2.fp.L
    b3 = g2._pallas_b3
    assert b3 == (12, 12)  # the gate must be open for BLS12-381
    F = g2p_mod.Row2Ctx(
        p, L, b3,
        g1p_mod._mm_stacked if strategy == "stacked" else g1p_mod._mm_serial,
    )
    rng = random.Random(0xBEEF)
    hostP = _sample_g2_points(eng, rng, 8, p)
    hostQ = _sample_g2_points(eng, rng, 8, p)
    neg = lambda Q: (Q[0], tuple((-c) % p for c in Q[1]))  # noqa: E731
    hostQ[6] = None if hostP[6] is None else neg(hostP[6])  # P + (-P)
    hostQ[7] = hostP[7]  # P + P through `add`

    def enc(pts):
        # (3, 2, L, B) -> (3, 2L, 1, B): rows with one sublane
        a = np.asarray(g2.encode_points(pts))
        return a.reshape(3, 2 * L, 1, a.shape[-1])

    P4, Q4 = enc(hostP), enc(hostQ)
    sel = np.asarray([1, 0, 1, 1, 0, 1, 1, 1], dtype=np.uint32)[None, :]

    def run(kernel, *refs):
        o = _Ref(np.zeros_like(P4))
        kernel(F, *[_Ref(r.copy()) for r in refs], o)
        return g2.decode_points(o.arr.reshape(3, 2, L, 1, -1)[:, :, :, 0, :])

    addh = lambda a, b: eng.g2.add(a, b)  # noqa: E731
    dblh = lambda a: eng.g2.add(a, a)  # noqa: E731

    got = run(g2p_mod._add_kernel, P4, Q4)
    assert got == [addh(a, b) for a, b in zip(hostP, hostQ)]

    got = run(g2p_mod._double_kernel, P4)
    assert got == [dblh(a) for a in hostP]

    got = run(g2p_mod._addsel_kernel, P4, Q4, sel)
    want = [addh(a, b) if s else b for a, b, s in zip(hostP, hostQ, sel[0])]
    assert got == want

    got = run(g2p_mod._dblsel_kernel, P4, Q4, sel)
    want = [
        addh(dblh(a), b) if s else dblh(a)
        for a, b, s in zip(hostP, hostQ, sel[0])
    ]
    assert got == want


# ---------------------------------------------------------------------------
# fused scalar-mul chain kernels (whole ladder in one launch)
# ---------------------------------------------------------------------------


class _FakePl2:
    @staticmethod
    def when(cond):
        def deco(f):
            if bool(cond):
                f()

        return deco


class _FakeLax2:
    @staticmethod
    def fori_loop(lo, hi, body, init):
        v = init
        for i in range(lo, hi):
            v = body(i, v)
        return v


class _FakeJax2:
    lax = _FakeLax2


@pytest.mark.parametrize("name", ["BLS12_381", "BN254"])
def test_smul_chain_kernel_bodies(name, numpy_kernel_env, monkeypatch):
    """_smul_kernel / _smul_static_kernel bodies on numpy rows vs the host
    engine ladder, incl. k = 0, k = r-1, and Q = infinity."""
    monkeypatch.setattr(g1p_mod, "pl", _FakePl2)
    monkeypatch.setattr(g1p_mod, "jax", _FakeJax2)
    spec = get_spec(name)
    p = spec.p
    eng = get_engine(spec)
    fpctx = get_fp_ctx(p, "sm%d" % (p % 65521))
    L = fpctx.L
    b3 = (3 * spec.b) % p
    R = 1 << (16 * L)
    one_limbs = tuple(((R % p) >> (16 * k)) & 0xFFFF for k in range(L))
    ctx = RowCtx(p, L)
    rng = random.Random(3)
    nbits = spec.r.bit_length()

    def enc_pt(P):
        """host affine/None -> (3, L, 1, B=1) projective rows."""
        if P is None:
            vals = (0, 1, 0)
        else:
            vals = (P[0], P[1], 1)
        rows = np.zeros((3, L, 1, 1), np.uint32)
        for c, v in enumerate(vals):
            m = (v % p) * R % p
            for k in range(L):
                rows[c, k, 0, 0] = (m >> (16 * k)) & 0xFFFF
        return rows

    def dec_pt(rows):
        Rinv = pow(R, p - 2, p)
        c = [
            sum(int(rows[j, k, 0, 0]) << (16 * k) for k in range(L)) * Rinv % p
            for j in range(3)
        ]
        if c[2] == 0:
            return None
        zi = pow(c[2], p - 2, p)
        return (c[0] * zi % p, c[1] * zi % p)

    G = eng.gen_g1
    cases = [
        (G, 0),
        (G, 1),
        (G, spec.r - 1),
        (G, rng.randrange(2, spec.r)),
        (None, rng.randrange(2, spec.r)),  # infinity base
    ]
    for Q, k in cases:
        q = enc_pt(Q)
        s = np.zeros((fpctx.L if False else (spec.r.bit_length() + 15) // 16, 1, 1), np.uint32)
        S = s.shape[0]
        for j in range(S):
            s[j, 0, 0] = (k >> (16 * j)) & 0xFFFF
        out = np.zeros_like(q)
        g1p_mod._smul_kernel(
            ctx, b3, one_limbs, nbits,
            type("R", (), {"__getitem__": lambda self, i: s[i]})(),
            type("R", (), {"__getitem__": lambda self, i: q[i]})(),
            type("R", (), {"__getitem__": lambda self, i: out[i],
                           "__setitem__": lambda self, i, v: out.__setitem__(i, v)})(),
        )
        want = None if Q is None or k == 0 else eng.g1.mul(Q, k)
        if Q is None:
            want = None
        assert dec_pt(out) == want, f"smul mismatch k={k} Q={'inf' if Q is None else 'G'}"

    # static-bits variant: the hash cofactor shape [h]G
    h = abs(1 - spec.x) if spec.name.startswith("BLS12") else 7
    bits = np.array([int(b) for b in bin(h)[2:]], dtype=np.uint32)
    q = enc_pt(G)
    out = np.zeros_like(q)
    g1p_mod._smul_static_kernel(
        ctx, b3, one_limbs, len(bits),
        type("R", (), {"__getitem__": lambda self, i: bits[i]})(),
        type("R", (), {"__getitem__": lambda self, i: q[i]})(),
        type("R", (), {"__getitem__": lambda self, i: out[i],
                       "__setitem__": lambda self, i, v: out.__setitem__(i, v)})(),
    )
    assert dec_pt(out) == eng.g1.mul(G, h)


def test_g2_smul_chain_kernel_body(numpy_g2_kernel_env, monkeypatch):
    """_g2_smul_kernel / _g2_smul_static_kernel bodies vs the host G2
    ladder (BLS12-381), incl. k = 0 and Q = infinity."""
    import mathlib_tpu.ops.kernels.g2_pallas as g2p_mod2

    monkeypatch.setattr(g2p_mod2, "pl", _FakePl2)
    monkeypatch.setattr(g2p_mod2, "jax", _FakeJax2)
    from mathlib_tpu.ops.g2 import get_g2_ctx

    spec = get_spec("BLS12_381")
    g2 = get_g2_ctx(spec)
    eng = get_engine(spec)
    p, L = spec.p, g2.fp.L
    F = g2p_mod2.Row2Ctx(p, L, g2._pallas_b3)
    R = 1 << (16 * L)
    one_limbs = tuple(((R % p) >> (16 * k)) & 0xFFFF for k in range(L))
    rng = random.Random(17)
    nbits = spec.r.bit_length()

    def enc_pt(P):
        rows = np.zeros((3, 2 * L, 1, 1), np.uint32)
        coords = ((0, 0), (1, 0), (0, 0)) if P is None else (P[0], P[1], (1, 0))
        for c, (v0, v1) in enumerate(coords):
            for j, v in enumerate((v0, v1)):
                m = (v % p) * R % p
                for k in range(L):
                    rows[c, j * L + k, 0, 0] = (m >> (16 * k)) & 0xFFFF
        return rows

    def dec_pt(rows):
        Rinv = pow(R, p - 2, p)
        c = [
            tuple(
                sum(int(rows[ci, j * L + k, 0, 0]) << (16 * k) for k in range(L))
                * Rinv % p
                for j in range(2)
            )
            for ci in range(3)
        ]
        if c[2] == (0, 0):
            return None
        from mathlib_tpu.host.fields import get_tower

        t = get_tower(spec)
        zi = t.f2_inv(c[2])
        return (t.f2_mul(c[0], zi), t.f2_mul(c[1], zi))

    class _R:
        def __init__(s, a): s.a = a
        def __getitem__(s, i): return s.a[i]
        def __setitem__(s, i, v): s.a[i] = v

    G = eng.gen_g2
    for Q, k in ((G, 0), (G, rng.randrange(2, spec.r)), (None, 5)):
        q = enc_pt(Q)
        S = (nbits + 15) // 16
        s = np.zeros((S, 1, 1), np.uint32)
        for j in range(S):
            s[j, 0, 0] = (k >> (16 * j)) & 0xFFFF
        out = np.zeros_like(q)
        g2p_mod2._g2_smul_kernel(F, one_limbs, nbits, _R(s), _R(q), _R(out))
        want = None if (Q is None or k == 0) else eng.g2.mul(Q, k)
        assert dec_pt(out) == want

    h = 0xD20100000001000F
    bits = np.array([int(b) for b in bin(h)[2:]], dtype=np.uint32)
    q = enc_pt(G)
    out = np.zeros_like(q)
    g2p_mod2._g2_smul_static_kernel(F, one_limbs, len(bits), _R(bits), _R(q), _R(out))
    assert dec_pt(out) == eng.g2.mul(G, h)


@pytest.mark.parametrize("name", ["BLS12_381", "BLS12_377", "BN254", "FP256BN"])
def test_rowctx_wide_ops(name, numpy_kernel_env):
    """Lazy-domain primitives (round 5): mul_wide / redc / wide_sub_const /
    wide_sub2_exact / wide_small / add_nored vs exact integer arithmetic.

    Exercises the exact bound pattern of MulBatch.push_f2: operands in
    [0, 2p), Karatsuba sums in [0, 4p), c0 = t0 - n*t1 + 4n*p^2 and the
    middle term t2 - t0 - t1, both REDC'd to [0, 2p)."""
    spec = get_spec(name)
    p = spec.p
    L = get_fp_ctx(p, "wide%d" % (p % 65521)).L
    ctx = RowCtx(p, L)
    R = 1 << (16 * L)
    R_inv = pow(R, p - 2, p)
    rng = random.Random(p % (2**31) ^ 0x5A)
    va = [0, 1, p, 2 * p - 1] + [rng.randrange(2 * p) for _ in range(8)]
    vb = [2 * p - 1, p, 1, 0] + [rng.randrange(2 * p) for _ in range(8)]
    a, b = _rows(va, L), _rows(vb, L)

    def _unwide(rows):
        out = []
        arr = np.stack([r[0] for r in rows], axis=0)
        for j in range(arr.shape[-1]):
            out.append(sum(int(arr[k, j]) << (16 * k) for k in range(len(rows))))
        return out

    # mul_wide: exact integer product (operands up to < 4p via add_nored)
    w = ctx.mul_wide(a, b)
    for g, x, y in zip(_unwide(w), va, vb):
        assert g == x * y
    s = ctx.add_nored(a, b)
    for g, x, y in zip(_unrows(s), va, vb):
        assert g % p == (x + y) % p  # value is the EXACT sum < 4p
    w2 = ctx.mul_wide(s, s)
    for g, x, y in zip(_unwide(w2), va, vb):
        assert g == (x + y) * (x + y)

    # redc on the raw product: Montgomery semantics, [0, 2p)
    r = ctx.redc(w)
    for g, x, y in zip(_unrows(r), va, vb):
        assert g % p == x * y * R_inv % p and g < 2 * p

    # the push_f2 combination pattern, n covering beta in use (1 and 5)
    for n in (1, 5):
        if 4 * (1 + n) * p > R:
            continue
        off = 4 * n * p * p
        off_limbs = tuple((off >> (16 * k)) & 0xFFFF for k in range(2 * L))
        t0 = ctx.mul_wide(a, a)
        t1 = ctx.mul_wide(b, b)
        t2 = ctx.mul_wide(ctx.add_nored(a, b), ctx.add_nored(a, b))
        nt1 = t1 if n == 1 else ctx.wide_small(t1, n)
        c0 = ctx.redc(ctx.wide_sub_const(t0, nt1, off_limbs))
        c1 = ctx.redc(ctx.wide_sub2_exact(t2, t0, t1))
        for g, x, y in zip(_unrows(c0), va, vb):
            assert g % p == (x * x - n * y * y) * R_inv % p and g < 2 * p
        for g, x, y in zip(_unrows(c1), va, vb):
            assert g % p == 2 * x * y * R_inv % p and g < 2 * p
