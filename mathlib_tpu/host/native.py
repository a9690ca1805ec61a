"""ctypes binding for the native C++ host engine (native/engine.cpp).

The reference's per-op API speed comes from native L0 engines (gnark/kilic
assembly field ops, AMCL generated code — SURVEY.md §2.9).  This module is
that layer for the TPU framework's *host* side: a generic Montgomery-limb
C++ engine (one shared library, all four curve families) behind the exact
same HostEngine interface, with the pure-Python engine kept as the
differential oracle and automatic fallback.

The TPU (JAX/Pallas) path remains the batch/throughput engine; this covers
the single-element mathlib-compat API surface (math.go wrapper ops):
G1/G2 group law + scalar mul + host MSM, Miller loop, final exponentiation,
Gt exponentiation.

Build: `make native` (or auto-built on first import when g++ is available).
Set MATHLIB_NATIVE=0 to force the pure-Python engine.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

from ..curves.params import CurveSpec, Family
from .engine import HostEngine

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "engine.cpp")
_SO = os.path.join(_REPO, "native", "_mlt_native.so")

_lib_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _load_lib() -> Optional[ctypes.CDLL]:
    """Load (building if necessary) the native library; None on failure."""
    global _lib, _lib_tried
    with _lib_lock:
        if _lib_tried:
            return _lib
        _lib_tried = True
        try:
            if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
            ):
                # per-PID tmp: concurrent builders (pytest-xdist workers)
                # must not clobber each other's output mid-link — the
                # os.replace of a fully linked .so is atomic either way
                tmp = f"{_SO}.tmp.{os.getpid()}"
                try:
                    subprocess.run(
                        ["g++", "-O2", "-shared", "-fPIC", "-o", tmp, _SRC],
                        check=True,
                        capture_output=True,
                        timeout=300,
                    )
                    os.replace(tmp, _SO)
                finally:
                    if os.path.exists(tmp):
                        os.remove(tmp)
            lib = ctypes.CDLL(_SO)
        except Exception:
            # a concurrent builder may have just replaced the .so under
            # us; one retry on the (now complete) artifact
            try:
                lib = ctypes.CDLL(_SO)
            except Exception:
                return None
        lib.mlt_ctx_new.restype = ctypes.c_int32
        lib.mlt_ctx_new.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        for name, extra in [
            ("mlt_g1_add", [ctypes.c_char_p, ctypes.c_char_p]),
            ("mlt_g2_add", [ctypes.c_char_p, ctypes.c_char_p]),
            ("mlt_f12_mul", [ctypes.c_char_p, ctypes.c_char_p]),
            ("mlt_f12_inv", [ctypes.c_char_p]),
            ("mlt_final_exp", [ctypes.c_char_p]),
        ]:
            fn = getattr(lib, name)
            fn.restype = None
            fn.argtypes = [ctypes.c_int32] + extra + [ctypes.c_char_p]
        lib.mlt_g1_mul.restype = None
        lib.mlt_g1_mul.argtypes = [
            ctypes.c_int32, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int32,
            ctypes.c_char_p,
        ]
        lib.mlt_g2_mul.restype = None
        lib.mlt_g2_mul.argtypes = lib.mlt_g1_mul.argtypes
        lib.mlt_g1_mul2.restype = None
        lib.mlt_g1_mul2.argtypes = [
            ctypes.c_int32, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int32,
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int32, ctypes.c_char_p,
        ]
        lib.mlt_g1_msm.restype = None
        lib.mlt_g1_msm.argtypes = [
            ctypes.c_int32, ctypes.c_int64, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_int32, ctypes.c_char_p,
        ]
        lib.mlt_g2_muln.restype = None
        lib.mlt_g2_muln.argtypes = [
            ctypes.c_int32, ctypes.c_int32, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_int32, ctypes.c_char_p,
        ]
        lib.mlt_miller.restype = None
        lib.mlt_miller.argtypes = [
            ctypes.c_int32, ctypes.c_int32, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_char_p,
        ]
        lib.mlt_f12_pow.restype = None
        lib.mlt_f12_pow.argtypes = [
            ctypes.c_int32, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_char_p,
        ]
        _lib = lib
        return _lib


def _limbs(spec: CurveSpec) -> int:
    return (spec.p.bit_length() + 63) // 64


class _Codec:
    """int/tuple <-> wire bytes for one curve (LE limb encoding)."""

    def __init__(self, spec: CurveSpec):
        self.L = _limbs(spec)
        self.fb = 8 * self.L
        self.p = spec.p
        self.r = spec.r
        self.klen = (spec.r.bit_length() + 7) // 8

    def fp(self, x: int) -> bytes:
        return (x % self.p).to_bytes(self.fb, "little")

    def un_fp(self, b: bytes) -> int:
        return int.from_bytes(b, "little")

    def g1(self, P) -> bytes:
        if P is None:
            return b"\x01" + b"\x00" * (2 * self.fb)
        return b"\x00" + self.fp(P[0]) + self.fp(P[1])

    def un_g1(self, b: bytes):
        if b[0]:
            return None
        return (
            self.un_fp(b[1 : 1 + self.fb]),
            self.un_fp(b[1 + self.fb : 1 + 2 * self.fb]),
        )

    def g2(self, P) -> bytes:
        if P is None:
            return b"\x01" + b"\x00" * (4 * self.fb)
        (x0, x1), (y0, y1) = P
        return b"\x00" + self.fp(x0) + self.fp(x1) + self.fp(y0) + self.fp(y1)

    def un_g2(self, b: bytes):
        if b[0]:
            return None
        f = self.fb
        c = [self.un_fp(b[1 + i * f : 1 + (i + 1) * f]) for i in range(4)]
        return ((c[0], c[1]), (c[2], c[3]))

    def f12(self, a) -> bytes:
        out = []
        for f6 in a:
            for f2 in f6:
                out.append(self.fp(f2[0]))
                out.append(self.fp(f2[1]))
        return b"".join(out)

    def un_f12(self, b: bytes):
        f = self.fb
        vals = [self.un_fp(b[i * f : (i + 1) * f]) for i in range(12)]
        f6s = []
        for i in range(2):
            f6s.append(tuple((vals[6 * i + 2 * j], vals[6 * i + 2 * j + 1]) for j in range(3)))
        return (f6s[0], f6s[1])

    def scalar(self, k: int) -> bytes:
        return (k % self.r).to_bytes(self.klen, "little")


def _build_cfg(spec: CurveSpec, tower) -> bytes:
    co = _Codec(spec)
    L = co.L

    def u32(v):
        return int(v).to_bytes(4, "little")

    def u64(v):
        return int(v).to_bytes(8, "little")

    parts = [
        u32(L),
        u32(0 if spec.family == Family.BLS12 else 1),
        u32(0 if spec.twist == "M" else 1),
        u32(1 if spec.x < 0 else 0),
        u64(abs(spec.x)),
        spec.p.to_bytes(8 * L, "little"),
        co.fp(spec.beta),
        co.fp(spec.xi[0]),
        co.fp(spec.xi[1]),
        co.fp(spec.b),
        co.fp(spec.b2[0]),
        co.fp(spec.b2[1]),
        co.fp(tower.frob_v[0]),
        co.fp(tower.frob_v[1]),
        co.fp(tower.frob_w[0]),
        co.fp(tower.frob_w[1]),
    ]
    # base-p digits of the hard-part exponent (mirrors fields.py:249-257)
    e = spec.hard_part_exp
    digits = []
    while e:
        digits.append(e % spec.p)
        e //= spec.p
    parts.append(u32(len(digits)))
    for d in digits:
        parts.append(d.to_bytes(8 * L, "little"))
    return b"".join(parts)


def _glv_constants(spec: CurveSpec):
    """Candidate (lam, beta) cube roots of unity for the GLV endomorphism
    [lam]P == (beta * x, y) on G1 (matching pair selected empirically on
    the generator by NativeEngine), or None."""
    p, r = spec.p, spec.r
    if r % 3 != 1 or p % 3 != 1:
        return None

    def cube_roots(m):
        # roots of z^2 + z + 1: (-1 +- sqrt(-3)) / 2 mod m
        s = _sqrt_mod(m - 3, m)
        if s is None:
            return []
        inv2 = pow(2, -1, m)
        return [((-1 + s) * inv2) % m, ((-1 - s) * inv2) % m]

    lams = cube_roots(r)
    betas = cube_roots(p)
    if not lams or not betas:
        return None
    return lams, betas


def _glv_lattice(r: int, lam: int):
    """Short lattice basis for the GLV split (GLV 2001, extended Euclid).

    Returns (v1, v2, det) with v = (a, b) satisfying a + b*lam = 0 mod r
    and |a|, |b| ~ sqrt(r); det = v1[0]*v2[1] - v1[1]*v2[0] (= +-r).
    The naive divmod split only balances when r = lam^2 + lam + 1 as
    INTEGERS (BLS12); BN-family roots are ~0.75 r bits, so the lattice
    reduction is what actually delivers ~sqrt(r) halves there.
    """
    import math

    sq = math.isqrt(r)
    # EEA rows: r_i = s_i*r + t_i*lam
    r0, t0 = r, 0
    r1, t1 = lam, 1
    rows = [(r0, t0), (r1, t1)]
    while rows[-1][0] != 0:
        q = rows[-2][0] // rows[-1][0]
        rows.append((rows[-2][0] - q * rows[-1][0], rows[-2][1] - q * rows[-1][1]))
    l = next(i for i in range(len(rows)) if rows[i][0] < sq)
    # v = (r_i, -t_i) is in {(x, y) : x + y*lam = 0 mod r}
    cands = [(rows[i][0], -rows[i][1]) for i in (l - 1, l, min(l + 1, len(rows) - 1))]
    cands.sort(key=lambda v: max(abs(v[0]), abs(v[1])))
    v1, v2 = cands[0], cands[1]
    det = v1[0] * v2[1] - v1[1] * v2[0]
    if det == 0:
        v2 = cands[2]
        det = v1[0] * v2[1] - v1[1] * v2[0]
    return v1, v2, det


def _rnd_div(a: int, b: int) -> int:
    """round(a / b) to nearest (b may be negative)."""
    if b < 0:
        a, b = -a, -b
    return (2 * a + b) // (2 * b)


def _sqrt_mod(a: int, m: int):
    """Tonelli-Shanks square root mod prime m (None if non-residue)."""
    a %= m
    if a == 0:
        return 0
    if pow(a, (m - 1) // 2, m) != 1:
        return None
    if m % 4 == 3:
        return pow(a, (m + 1) // 4, m)
    q, s = m - 1, 0
    while q % 2 == 0:
        q //= 2
        s += 1
    z = 2
    while pow(z, (m - 1) // 2, m) != m - 1:
        z += 1
    c = pow(z, q, m)
    x = pow(a, (q + 1) // 2, m)
    t = pow(a, q, m)
    while t != 1:
        i, tt = 0, t
        while tt != 1:
            tt = tt * tt % m
            i += 1
        b = pow(c, 1 << (s - i - 1), m)
        x = x * b % m
        t = t * b * b % m
        c = b * b % m
        s = i
    return x


def _psi_constants(spec: CurveSpec):
    """(cx, cy): psi(x, y) = (conj(x)*cx, conj(y)*cy) on the twist —
    untwist-Frobenius-retwist, eigenvalue p = x mod r on BLS12 G2."""
    from .fields import get_tower

    t = get_tower(spec)
    fw2 = t.f2_sqr(t.frob_w)
    fw3 = t.f2_mul(fw2, t.frob_w)
    if spec.twist == "M":
        return t.f2_inv(fw2), t.f2_inv(fw3)
    return fw2, fw3


class _NativeGroup:
    """WeierstrassCurve-compatible facade backed by the C++ library.

    Anything not natively implemented falls through to the exact Python
    curve (``pyc``).
    """

    def __init__(self, lib, handle: int, co: _Codec, pyc, g2: bool):
        self._lib = lib
        self._h = handle
        self._co = co
        self._py = pyc
        self._g2 = g2
        self._psz = 1 + (4 if g2 else 2) * co.fb
        self._enc = co.g2 if g2 else co.g1
        self._dec = co.un_g2 if g2 else co.un_g1
        self._fadd = lib.mlt_g2_add if g2 else lib.mlt_g1_add
        self._fmul = lib.mlt_g2_mul if g2 else lib.mlt_g1_mul
        self._glv = None  # (lam, beta), set by NativeEngine for G1
        self._gls = None  # (x_abs, x_neg, psi), set by NativeEngine for G2

    def __getattr__(self, name):
        return getattr(self._py, name)

    def add(self, P, Q):
        out = ctypes.create_string_buffer(self._psz)
        self._fadd(self._h, self._enc(P), self._enc(Q), out)
        return self._dec(out.raw)

    def sub(self, P, Q):
        return self.add(P, self.neg(Q))

    def neg(self, P):
        return self._py.neg(P)

    def double(self, P):
        return self.add(P, P)

    def mul_any(self, P, k: int):
        """Endomorphism-free scalar mul — correct for any twist/curve
        point, not just the r-torsion (see WeierstrassCurve.mul_any)."""
        if k < 0:
            return self.mul_any(self.neg(P), -k)
        if P is None or k == 0:
            return None
        kb = self._co.scalar(k) if k < self._co.r else k.to_bytes(
            (k.bit_length() + 7) // 8, "little"
        )
        out = ctypes.create_string_buffer(self._psz)
        self._fmul(self._h, self._enc(P), kb, len(kb), out)
        return self._dec(out.raw)

    def mul(self, P, k: int):
        if k < 0:
            return self.mul(self.neg(P), -k)
        if self._gls is not None and P is not None and 0 < k < self._co.r:
            # 4-dim GLS: k = sum k_i |x|^i (digits base |x| of k < r <= x^4),
            # [x^i]Q = psi^i(Q), so [k]Q = sum [k_i] (sgn^i) psi^i(Q)
            x_abs, x_neg, psi = self._gls
            digits, kk = [], k
            pts, cur = [], P
            for i in range(4):
                kk, d = divmod(kk, x_abs)
                digits.append(d)
                pts.append(self._py.neg(cur) if (x_neg and i % 2) else cur)
                cur = psi(cur)
            klen = (x_abs.bit_length() + 7) // 8
            ks = b"".join(d.to_bytes(klen, "little") for d in digits)
            ps = b"".join(self._enc(q) for q in pts)
            out = ctypes.create_string_buffer(self._psz)
            self._lib.mlt_g2_muln(self._h, 4, ps, ks, klen, out)
            return self._dec(out.raw)
        if self._glv is not None and P is not None and 0 < k < self._co.r:
            # Babai round-off against the short lattice basis:
            # (k1, k2) = (k, 0) - b1 v1 - b2 v2, |k_i| ~ sqrt(r), signed
            lam, beta, v1, v2, det = self._glv
            b1 = _rnd_div(k * v2[1], det)
            b2 = _rnd_div(-k * v1[1], det)
            k1 = k - b1 * v1[0] - b2 * v2[0]
            k2 = -b1 * v1[1] - b2 * v2[1]
            phiP = (P[0] * beta % self._co.p, P[1])  # [lam]P
            P1 = self._py.neg(P) if k1 < 0 else P
            P2 = self._py.neg(phiP) if k2 < 0 else phiP
            return self.mul2(P1, abs(k1), P2, abs(k2), _plain=True)
        return self.mul_any(P, k)

    def mul2(self, P, e: int, Q, f: int, _plain: bool = False):
        if self._g2 or e < 0 or f < 0:
            return self.add(self.mul(P, e), self.mul(Q, f))
        if not _plain and self._glv is not None and P is not None and Q is not None:
            # GLV both halves: one 4-way joint mul beats two 2-way ones,
            # but two joint calls keep the C seam simple and still halve
            # the doublings.
            return self.add(self.mul(P, e), self.mul(Q, f))
        blen = (max(e, f, 1).bit_length() + 7) // 8
        eb = e.to_bytes(blen, "little")
        fb_ = f.to_bytes(blen, "little")
        out = ctypes.create_string_buffer(self._psz)
        self._lib.mlt_g1_mul2(
            self._h, self._enc(P), eb, len(eb), self._enc(Q), fb_, len(fb_), out
        )
        return self._dec(out.raw)

    def msm(self, points, scalars):
        if self._g2:
            return self._py.msm(points, scalars)
        pts = b"".join(self._enc(P) for P in points)
        ks = b"".join(self._co.scalar(int(s)) for s in scalars)
        out = ctypes.create_string_buffer(self._psz)
        self._lib.mlt_g1_msm(
            self._h, len(points), pts, ks, self._co.klen, out
        )
        return self._dec(out.raw)


class NativeEngine(HostEngine):
    """HostEngine with the hot single-element ops routed to C++.

    Bit-exact contract: differential-tested against the pure-Python
    HostEngine (tests/test_native_engine.py); the Python implementation
    stays authoritative.
    """

    def __init__(self, spec: CurveSpec):
        super().__init__(spec)
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native engine unavailable")
        self._lib = lib
        self._co = _Codec(spec)
        cfg = _build_cfg(spec, self.tw)
        h = lib.mlt_ctx_new(cfg, len(cfg))
        if h < 0:
            raise RuntimeError("native ctx rejected")
        self._h = h
        self.g1 = _NativeGroup(lib, h, self._co, self.g1, g2=False)
        self.g2 = _NativeGroup(lib, h, self._co, self.g2, g2=True)
        # GLV: find the (lam, beta) pairing that matches on the generator,
        # then build the short lattice basis and self-check the split
        roots = _glv_constants(spec)
        if roots:
            lams, betas = roots
            G = spec.g1_gen
            for lam in lams:
                want = self.g1.mul(G, lam)  # plain path (_glv still None)
                beta = next(
                    (b for b in betas if want == (G[0] * b % spec.p, G[1])),
                    None,
                )
                if beta is not None:
                    v1, v2, det = _glv_lattice(spec.r, lam)
                    # sanity: decomposition is exact and short for a probe k
                    k = (spec.r * 2) // 3 + 12345
                    b1 = _rnd_div(k * v2[1], det)
                    b2 = _rnd_div(-k * v1[1], det)
                    k1 = k - b1 * v1[0] - b2 * v2[0]
                    k2 = -b1 * v1[1] - b2 * v2[1]
                    half = 1 << (spec.r.bit_length() // 2 + 3)
                    if (k1 + k2 * lam - k) % spec.r == 0 and abs(k1) < half and abs(k2) < half:
                        self.g1._glv = (lam, beta, v1, v2, det)
                    break
        # GLS on G2 (BLS12 only: psi eigenvalue is exactly the parameter x)
        if spec.family == Family.BLS12:
            from .fields import get_tower

            t = get_tower(spec)
            cx, cy = _psi_constants(spec)

            def psi(Q, _t=t, _cx=cx, _cy=cy):
                return (
                    _t.f2_mul(_t.f2_conj(Q[0]), _cx),
                    _t.f2_mul(_t.f2_conj(Q[1]), _cy),
                )

            G2g = spec.g2_gen
            if self.g2.mul(G2g, spec.x % spec.r) == psi(G2g):
                self.g2._gls = (abs(spec.x), spec.x < 0, psi)

    # -------------------------------------------------------------- pairing —
    def miller_loop(self, pairs):
        co = self._co
        ps = b"".join(co.g1(P) for P, _ in pairs)
        qs = b"".join(co.g2(Q) for _, Q in pairs)
        out = ctypes.create_string_buffer(12 * co.fb)
        self._lib.mlt_miller(self._h, len(pairs), ps, qs, out)
        return co.un_f12(out.raw)

    def final_exp(self, f):
        co = self._co
        out = ctypes.create_string_buffer(12 * co.fb)
        self._lib.mlt_final_exp(self._h, co.f12(f), out)
        return co.un_f12(out.raw)

    # ------------------------------------------------------------------- Gt —
    def gt_exp(self, a, e: int):
        co = self._co
        neg = 1 if e < 0 else 0
        mag = abs(e)
        eb = mag.to_bytes(max(1, (mag.bit_length() + 7) // 8), "little")
        out = ctypes.create_string_buffer(12 * co.fb)
        self._lib.mlt_f12_pow(self._h, co.f12(a), eb, len(eb), neg, out)
        return co.un_f12(out.raw)

    def gt_mul(self, a, b):
        co = self._co
        out = ctypes.create_string_buffer(12 * co.fb)
        self._lib.mlt_f12_mul(self._h, co.f12(a), co.f12(b), out)
        return co.un_f12(out.raw)

    def gt_inv(self, a):
        co = self._co
        out = ctypes.create_string_buffer(12 * co.fb)
        self._lib.mlt_f12_inv(self._h, co.f12(a), out)
        return co.un_f12(out.raw)


def native_available() -> bool:
    return _load_lib() is not None
