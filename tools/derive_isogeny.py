"""Derive SSWU isogeny data (RFC 9380 style) from curve parameters alone.

For a curve E: y^2 = x^3 + b with j-invariant 0, simple SWU needs an
isogenous curve E': y^2 = x^3 + A'x + B' with A'B' != 0.  This tool
constructs one from first principles:

  1. build the division polynomial psi_ell of E (reduced recurrences),
  2. factor it over Fp (Cantor-Zassenhaus) and collect the degree-
     (ell-1)/2 kernel polynomials of Fp-rational ell-isogenies,
  3. run Velu on a kernel to get the image curve E' and verify the forward
     map phi: E -> E' is a homomorphism,
  4. repeat from E' to find the dual isogeny E' -> E (the map SSWU needs),
     composing with the curve isomorphism (u^2 x, u^3 y) so the image is
     exactly E,
  5. emit {"A", "B", "Z", "iso": (x_num, x_den, y_num, y_den)} for
     curves/isogeny_data.py.

Rational maps are recovered by evaluation + interpolation: the Velu x-map
is evaluated at sample points (sums over the Frobenius-conjugate kernel
roots collapse into Fp) and N(x) = phi(x) h(x)^2 is interpolated; the
y-map follows symbolically as y (N'h - 2Nh')/h^3 (normalized isogeny).

Caveat: when several Fp-rational ell-isogenous curves exist, standardized
ciphersuites pin one specific choice; byte agreement with external vectors
must be confirmed before claiming RFC compatibility (STATUS.md).
"""

from __future__ import annotations

import random
import sys
from typing import List, Tuple

sys.path.insert(0, "/root/repo")

Poly = List[int]  # coefficients, low degree first, over Fp


# ---------------------------------------------------------------- Fp[x] ----
def pstrip(a: Poly) -> Poly:
    while a and a[-1] == 0:
        a.pop()
    return a


def padd(a: Poly, b: Poly, p: int) -> Poly:
    n = max(len(a), len(b))
    return pstrip(
        [((a[i] if i < len(a) else 0) + (b[i] if i < len(b) else 0)) % p for i in range(n)]
    )


def psub(a: Poly, b: Poly, p: int) -> Poly:
    n = max(len(a), len(b))
    return pstrip(
        [((a[i] if i < len(a) else 0) - (b[i] if i < len(b) else 0)) % p for i in range(n)]
    )


def pmul(a: Poly, b: Poly, p: int) -> Poly:
    if not a or not b:
        return []
    out = [0] * (len(a) + len(b) - 1)
    for i, ai in enumerate(a):
        if ai:
            for j, bj in enumerate(b):
                out[i + j] = (out[i + j] + ai * bj) % p
    return pstrip(out)


def pscale(a: Poly, s: int, p: int) -> Poly:
    return pstrip([ai * s % p for ai in a])


def pdivmod(a: Poly, b: Poly, p: int) -> Tuple[Poly, Poly]:
    a = a[:]
    q = [0] * max(0, len(a) - len(b) + 1)
    binv = pow(b[-1], p - 2, p)
    while len(a) >= len(b):
        s = a[-1] * binv % p
        d = len(a) - len(b)
        q[d] = s
        for i, bi in enumerate(b):
            a[d + i] = (a[d + i] - s * bi) % p
        pstrip(a)
    return pstrip(q), a


def pmod(a: Poly, b: Poly, p: int) -> Poly:
    return pdivmod(a, b, p)[1]


def pgcd(a: Poly, b: Poly, p: int) -> Poly:
    while b:
        a, b = b, pmod(a, b, p)
    if a:
        a = pscale(a, pow(a[-1], p - 2, p), p)  # monic
    return a


def ppow_mod(a: Poly, e: int, m: Poly, p: int) -> Poly:
    r = [1]
    a = pmod(a, m, p)
    while e:
        if e & 1:
            r = pmod(pmul(r, a, p), m, p)
        a = pmod(pmul(a, a, p), m, p)
        e >>= 1
    return r


def pderiv(a: Poly, p: int) -> Poly:
    return pstrip([a[i] * i % p for i in range(1, len(a))])


def peval(a: Poly, x: int, p: int) -> int:
    acc = 0
    for c in reversed(a):
        acc = (acc * x + c) % p
    return acc


# ------------------------------------------------- division polynomials ----
def division_poly(ell: int, A: int, B: int, p: int) -> Poly:
    """psi_ell (odd ell) as a polynomial in x for y^2 = x^3 + Ax + B.

    Reduced form: psi_n = f_n for n odd, psi_n = f_n * 2y for n even, with
    (2y)^2 = 4E(x), E = x^3 + Ax + B.  Recurrences:
      f_{2m}   = f_m (f_{m+2} f_{m-1}^2 - f_{m-2} f_{m+1}^2)
      f_{2m+1} = f_{m+2} f_m^3 - f_{m-1} f_{m+1}^3,
                 with 16E^2 multiplying whichever term holds the even-index
                 f's (first term if m even, second if m odd).
    """
    E = [B % p, A % p, 0, 1]
    sixteenE2 = pscale(pmul(E, E, p), 16, p)
    f = {
        0: [],
        1: [1],
        2: [1],
        3: pstrip(
            [(-A * A) % p, 12 * B % p, 6 * A % p, 0, 3]
        ),
        4: pstrip(
            [
                (-2 * (A ** 3) - 16 * B * B) % p,
                (-8 * A * B) % p,
                (-10 * A * A) % p,
                40 * B % p,
                10 * A % p,
                0,
                2,
            ]
        ),
    }

    def get(n: int) -> Poly:
        if n in f:
            return f[n]
        m = n // 2
        if n % 2 == 0:
            out = pmul(
                get(m),
                psub(
                    pmul(get(m + 2), pmul(get(m - 1), get(m - 1), p), p),
                    pmul(get(m - 2), pmul(get(m + 1), get(m + 1), p), p),
                    p,
                ),
                p,
            )
        else:
            t1 = pmul(get(m + 2), pmul(get(m), pmul(get(m), get(m), p), p), p)
            t2 = pmul(get(m - 1), pmul(get(m + 1), pmul(get(m + 1), get(m + 1), p), p), p)
            if m % 2 == 0:
                t1 = pmul(t1, sixteenE2, p)
            else:
                t2 = pmul(t2, sixteenE2, p)
            out = psub(t1, t2, p)
        f[n] = out
        return out

    assert ell % 2 == 1
    psi = get(ell)
    assert len(psi) - 1 == (ell * ell - 1) // 2, f"psi_{ell} degree {len(psi)-1}"
    return psi


# ------------------------------------------------------------- factoring ---
def factor_poly(fpoly: Poly, p: int, rng) -> List[Poly]:
    """Full factorization into monic irreducibles (squarefree input)."""
    fpoly = pscale(fpoly, pow(fpoly[-1], p - 2, p), p)
    out: List[Poly] = []
    x = [0, 1]
    xp = x
    d = 0
    rem = fpoly
    while len(rem) - 1 >= 2 * (d + 1):
        d += 1
        xp = ppow_mod(xp, p, rem, p)
        g = pgcd(psub(xp, x, p), rem, p)
        if len(g) > 1:
            out.extend(_edf(g, d, p, rng))
            rem, _ = pdivmod(rem, g, p)
            xp = pmod(xp, rem, p) if len(rem) > 1 else xp
    if len(rem) > 1:
        out.append(rem)
    return out


def _edf(fpoly: Poly, d: int, p: int, rng) -> List[Poly]:
    """Cantor-Zassenhaus equal-degree factorization."""
    n = len(fpoly) - 1
    if n == d:
        return [fpoly]
    while True:
        a = [rng.randrange(p) for _ in range(n)] + [1]
        b = ppow_mod(a, (p ** d - 1) // 2, fpoly, p)
        g = pgcd(psub(b, [1], p), fpoly, p)
        if len(g) > 1 and len(g) - 1 < n:
            rest, _ = pdivmod(fpoly, g, p)
            return _edf(g, d, p, rng) + _edf(rest, d, p, rng)


# ------------------------------------------------------------------ Velu ---
class Fq:
    """Fp[T]/h(T) arithmetic (h need not be irreducible for our sums)."""

    def __init__(self, h: Poly, p: int):
        self.h = h
        self.p = p

    def mul(self, a, b):
        return pmod(pmul(a, b, self.p), self.h, self.p)

    def inv(self, a):
        p = self.p
        r0, r1 = self.h[:], pmod(a, self.h, p)
        s0, s1 = [], [1]
        while len(r1) > 1:
            q, r2 = pdivmod(r0, r1, p)
            r0, r1 = r1, r2
            s0, s1 = s1, psub(s0, pmul(q, s1, p), p)
        assert r1, "not invertible in Fp[T]/h"
        c = pow(r1[0], p - 2, p)
        return pmod(pscale(s1, c, p), self.h, p)


def velu_from_kernel(A: int, B: int, h: Poly, p: int, roots_fp=None):
    """Velu ell-isogeny with kernel polynomial h (degree d, ell = 2d+1).

    Returns (A', B', x_num, x_den, y_num, y_den); the map is normalized.
    Raises AssertionError if h is not a genuine kernel polynomial (sums
    fail to collapse into Fp or degrees come out wrong).

    If ``roots_fp`` is given (kernel x-coords all in Fp), sums are computed
    directly over them; otherwise the roots are enumerated as Frobenius
    conjugates in Fp[T]/h (valid when h is irreducible).
    """
    d = len(h) - 1
    K = Fq(h, p)
    if roots_fp is not None:
        assert len(roots_fp) == d
        roots = [[r % p] for r in roots_fp]  # constants in Fp[T]/h
    else:
        roots = []
        r = [0, 1]  # T
        for _ in range(d):
            roots.append(pmod(r, h, p))
            r = ppow_mod(r, p, h, p)

    def fp_of(v: Poly) -> int:
        assert all(c == 0 for c in v[1:]), "sum did not collapse to Fp"
        return v[0] if v else 0

    tQs, uQs, xtQs = [], [], []
    for rt in roots:
        x2 = K.mul(rt, rt)
        gx = padd(K.mul(x2, rt), padd(pscale(rt, A, p), [B % p], p), p)
        tQ = padd(pscale(x2, 6, p), [2 * A % p], p)
        uQ = pscale(gx, 4, p)
        tQs.append(tQ)
        uQs.append(uQ)
        xtQs.append(padd(uQ, K.mul(rt, tQ), p))

    def trace(vals):
        acc: Poly = []
        for v in vals:
            acc = padd(acc, v, p)
        return fp_of(acc)

    t = trace(tQs)
    w = trace(xtQs)
    A2 = (A - 5 * t) % p
    B2 = (B - 7 * w) % p

    # x-map: N(x) = phi(x) h(x)^2, deg N = 2d+1, by interpolation
    h2 = pmul(h, h, p)
    xs_, ys_ = [], []
    sample = 1
    while len(xs_) < 2 * d + 2:
        x0 = sample
        sample += 1
        if peval(h, x0, p) == 0:
            continue
        acc: Poly = []
        for rt, tQ, uQ in zip(roots, tQs, uQs):
            deninv = K.inv(psub([x0], rt, p))
            term = padd(
                K.mul(tQ, deninv), K.mul(uQ, K.mul(deninv, deninv)), p
            )
            acc = padd(acc, term, p)
        phi0 = (x0 + fp_of(acc)) % p
        xs_.append(x0)
        ys_.append(phi0 * peval(h2, x0, p) % p)

    N: Poly = []
    for i, (xi, yi) in enumerate(zip(xs_, ys_)):
        li = [1]
        denom = 1
        for j, xj in enumerate(xs_):
            if i == j:
                continue
            li = pmul(li, [(-xj) % p, 1], p)
            denom = denom * (xi - xj) % p
        N = padd(N, pscale(li, yi * pow(denom, p - 2, p) % p, p), p)
    assert len(N) - 1 == 2 * d + 1, f"x_num degree {len(N) - 1}"

    y_num = psub(pmul(pderiv(N, p), h, p), pscale(pmul(N, pderiv(h, p), p), 2, p), p)
    y_den = pmul(h2, h, p)
    return A2, B2, N, h2, y_num, y_den


class _Fp2:
    """Fp(sqrt(dnr)) arithmetic for torsion points whose y leaves Fp."""

    def __init__(self, p: int, dnr: int):
        self.p, self.d = p, dnr

    def mul(self, a, b):
        p, d = self.p, self.d
        return ((a[0] * b[0] + d * a[1] * b[1]) % p, (a[0] * b[1] + a[1] * b[0]) % p)

    def add(self, a, b):
        return ((a[0] + b[0]) % self.p, (a[1] + b[1]) % self.p)

    def sub(self, a, b):
        return ((a[0] - b[0]) % self.p, (a[1] - b[1]) % self.p)

    def inv(self, a):
        p, d = self.p, self.d
        n = (a[0] * a[0] - d * a[1] * a[1]) % p
        ni = pow(n, p - 2, p)
        return (a[0] * ni % p, (-a[1]) * ni % p)

    def scal(self, a, s):
        return (a[0] * s % self.p, a[1] * s % self.p)


def _pt_add(F: "_Fp2", A: int, P, Q):
    p = F.p
    if P is None:
        return Q
    if Q is None:
        return P
    (x1, y1), (x2, y2) = P, Q
    if x1 == x2:
        if F.add(y1, y2) == (0, 0):
            return None
        num = F.add(F.scal(F.mul(x1, x1), 3), (A % p, 0))
        lam = F.mul(num, F.inv(F.scal(y1, 2)))
    else:
        lam = F.mul(F.sub(y2, y1), F.inv(F.sub(x2, x1)))
    x3 = F.sub(F.sub(F.mul(lam, lam), x1), x2)
    y3 = F.sub(F.mul(lam, F.sub(x1, x3)), y1)
    return (x3, y3)


def _orbit_kernels(lin_roots: List[int], A: int, B: int, p: int, ell: int) -> List[Poly]:
    """Group rational 11-torsion x-coords into subgroup orbits.

    A Galois-stable order-ell subgroup with x-rational points has x-coords
    {x(kP)} for k = 1..(ell-1)/2; build each orbit with explicit point
    arithmetic over Fp(sqrt(dnr)) and emit its kernel polynomial.
    """
    from mathlib_tpu.curves.params import _fp_sqrt

    d = (ell - 1) // 2
    dnr = 2
    while pow(dnr, (p - 1) // 2, p) == 1:
        dnr += 1
    F = _Fp2(p, dnr)

    def lift_y(x0: int):
        g = (x0 * x0 % p * x0 + A * x0 + B) % p
        r = _fp_sqrt(g, p)
        if r is not None:
            return (r, 0)
        r = _fp_sqrt(g * pow(dnr, p - 2, p) % p, p)
        return (0, r)  # y = r*sqrt(dnr)

    def padd_pt(P, Q):
        return _pt_add(F, A, P, Q)

    used = set()
    kernels = []
    for x0 in lin_roots:
        if x0 in used:
            continue
        P = ((x0 % p, 0), lift_y(x0))
        xs = []
        Q = None
        ok = True
        for _ in range(d):
            Q = padd_pt(Q, P)
            if Q is None or Q[0][1] != 0:
                ok = False  # x-coord left Fp: not an x-rational orbit
                break
            xs.append(Q[0][0])
        if not ok:
            continue
        # Q is [d]P; require [ell]P = [2d]P + P = O
        if padd_pt(padd_pt(Q, Q), P) is not None:
            continue
        for x in xs:
            used.add(x)
        h = [1]
        for x in xs:
            h = pmul(h, [(-x) % p, 1], p)
        kernels.append((h, xs))
    return kernels


def kernel_candidates(A: int, B: int, p: int, ell: int, rng) -> List[Poly]:
    psi = division_poly(ell, A, B, p)
    d = (ell - 1) // 2
    factors = factor_poly(psi, p, rng)
    cands = [(f, None) for f in factors if len(f) - 1 == d]
    lin_roots = [(-f[0]) % p for f in factors if len(f) - 1 == 1]
    if len(lin_roots) >= d:
        cands.extend(_orbit_kernels(lin_roots, A, B, p, ell))
    return cands


# ----------------------------------------------------------- verification --
def _field(p: int):
    from mathlib_tpu.host.curve import FieldOps

    return FieldOps(
        add=lambda a, b: (a + b) % p,
        sub=lambda a, b: (a - b) % p,
        mul=lambda a, b: a * b % p,
        neg=lambda a: (-a) % p,
        inv=lambda a: pow(a, p - 2, p),
        is_zero=lambda a: a % p == 0,
        zero=0,
        one=1,
        from_int=lambda i: i % p,
    )


def _rand_pt(A, B, p, rng):
    from mathlib_tpu.curves.params import _fp_sqrt

    while True:
        x = rng.randrange(p)
        rhs = (x * x * x + A * x + B) % p
        y = _fp_sqrt(rhs, p)
        if y is not None:
            return (x, y)


def verify_isogeny(A1, B1, A2, B2, maps, p, rng, trials=4) -> bool:
    """Check (x, y) -> rational maps is a homomorphism E1 -> E2."""
    from mathlib_tpu.host.curve import WeierstrassCurve

    xn, xd, yn, yd = maps
    F = _field(p)
    E1 = WeierstrassCurve(F, A1, B1)
    E2 = WeierstrassCurve(F, A2, B2)

    def apply(P):
        if P is None:
            return None
        x, y = P
        xdv, ydv = peval(xd, x, p), peval(yd, x, p)
        if xdv == 0 or ydv == 0:
            return None
        return (
            peval(xn, x, p) * pow(xdv, p - 2, p) % p,
            y * peval(yn, x, p) % p * pow(ydv, p - 2, p) % p,
        )

    ok = 0
    for _ in range(trials * 3):
        if ok >= trials:
            break
        P = _rand_pt(A1, B1, p, rng)
        Q = _rand_pt(A1, B1, p, rng)
        fP, fQ, fPQ = apply(P), apply(Q), apply(E1.add(P, Q))
        if fP is None or fQ is None or fPQ is None:
            continue
        if not E2.is_on_curve(fP):
            return False
        if E2.add(fP, fQ) != fPQ:
            return False
        ok += 1
    return ok >= trials


# -------------------------------------------------------------- roots ------
def cbrt(a: int, p: int) -> Optional[int]:
    """Cube root mod p (p ≡ 1 mod 3), Tonelli-style adjustment."""
    a %= p
    if a == 0:
        return 0
    if pow(a, (p - 1) // 3, p) != 1:
        return None
    m, s = p - 1, 0
    while m % 3 == 0:
        m //= 3
        s += 1
    g = 2
    while pow(g, (p - 1) // 3, p) == 1:
        g += 1
    z = pow(g, m, p)  # order 3^s

    x = pow(a, pow(3, -1, m), p)

    def order3(v):
        t = 0
        while v != 1:
            v = pow(v, 3, p)
            t += 1
        return t

    ainv = pow(a, p - 2, p)
    err = pow(x, 3, p) * ainv % p
    while err != 1:
        t = order3(err)  # always <= s-1 when a is a cube
        if t >= s:
            return None
        v = pow(z, 3 ** (s - t - 1), p)  # order 3^(t+1): cubes hit order 3^t
        for j in (1, 2):
            cand = x * pow(v, j, p) % p
            cerr = pow(cand, 3, p) * ainv % p
            if order3(cerr) < t:
                x, err = cand, cerr
                break
        else:
            return None
    return x


def sixth_root(a: int, p: int) -> Optional[int]:
    from mathlib_tpu.curves.params import _fp_sqrt

    r = _fp_sqrt(a, p)
    if r is None:
        return None
    for rr in (r, (-r) % p):
        c = cbrt(rr, p)
        if c is not None:
            return c
    return None


# ------------------------------------------------------------- driver ------
def derive_for_curve(name: str, ell: int = 11, group: str = "g1"):
    from mathlib_tpu.curves.params import get_spec, _fp_sqrt

    spec = get_spec(name)
    p, b = spec.p, spec.b % spec.p
    rng = random.Random(0xDE51)

    print(f"{name}: building psi_{ell} and factoring ...", flush=True)
    kernels = kernel_candidates(0, b, p, ell, rng)
    print(f"  {len(kernels)} candidate kernels", flush=True)
    d = (ell - 1) // 2
    dnr = 2
    while pow(dnr, (p - 1) // 2, p) == 1:
        dnr += 1
    F2 = _Fp2(p, dnr)

    def lift_y(A, B, x0):
        g = (pow(x0, 3, p) + A * x0 + B) % p
        r = _fp_sqrt(g, p)
        if r is not None:
            return (r, 0)
        r = _fp_sqrt(g * pow(dnr, p - 2, p) % p, p)
        assert r is not None
        return (0, r)

    # need at least two distinct subgroups with explicit roots
    rooted = [(h, r) for h, r in kernels if r is not None]
    # prefer the candidate matching the standardised ciphersuite curve when
    # recognisable (RFC 9380 iso-11 for BLS12-381 starts 0x144698a3b8e9433d)
    def _pref_key(item):
        h, hroots = item
        try:
            A2, B2, *_ = velu_from_kernel(0, b, h, p, hroots)
        except AssertionError:
            return 2
        return 0 if hex(A2).startswith("0x144698a3b8e9433d") else 1

    kernels = sorted(kernels, key=_pref_key)
    for h, hroots in kernels:
        try:
            Af, Bf, Nf, xdf, ynf, ydf = velu_from_kernel(0, b, h, p, hroots)
        except AssertionError as e:
            print("  forward velu failed:", e, flush=True)
            continue
        if Af == 0 or Bf == 0:
            continue
        print(f"  E': A'={hex(Af)[:18]}.., B'={hex(Bf)[:18]}..", flush=True)
        if not verify_isogeny(0, b, Af, Bf, (Nf, xdf, ynf, ydf), p, rng):
            print("  forward homomorphism check failed", flush=True)
            continue
        # dual kernel = phi(other subgroup): pick a generator from a
        # different rooted kernel and push it through the forward maps
        other = next(((h2, r2) for h2, r2 in rooted if h2 != h), None)
        if other is None:
            print("  no second rooted subgroup available", flush=True)
            continue
        x0 = other[1][0]
        Q = ((x0 % p, 0), lift_y(0, b, x0))
        # phi(Q) on E'
        xq = Q[0][0]
        xdv, ydv = peval(xdf, xq, p), peval(ydf, xq, p)
        if xdv == 0 or ydv == 0:
            print("  generator hit isogeny kernel; skipping", flush=True)
            continue
        xi = peval(Nf, xq, p) * pow(xdv, p - 2, p) % p
        ysc = peval(ynf, xq, p) * pow(ydv, p - 2, p) % p
        Pp = ((xi, 0), F2.scal(Q[1], ysc))
        # orbit of phi(Q) on E'
        xs = []
        R = None
        okk = True
        for _ in range(d):
            R = _pt_add(F2, Af, R, Pp)
            if R is None or R[0][1] != 0:
                okk = False
                break
            xs.append(R[0][0])
        if not okk:
            print("  dual orbit left Fp", flush=True)
            continue
        if _pt_add(F2, Af, _pt_add(F2, Af, R, R), Pp) is not None:
            print("  dual generator not order ell", flush=True)
            continue
        h2 = [1]
        for x in xs:
            h2 = pmul(h2, [(-x) % p, 1], p)
        try:
            A3, B3, N2, xd2, yn2, yd2 = velu_from_kernel(Af, Bf, h2, p, xs)
        except AssertionError as e:
            print("  dual velu failed:", e, flush=True)
            continue
        if A3 % p != 0 or B3 % p == 0:
            print(f"  dual image not j=0: A3={hex(A3)[:14]}", flush=True)
            continue
        u2r = sixth_root(b * pow(B3, p - 2, p) % p, p)
        if u2r is None:
            print("  no sixth root for scaling", flush=True)
            continue
        u2 = pow(u2r, 2, p)
        u3 = _fp_sqrt(pow(u2, 3, p), p)
        if u3 is None:
            print("  no u3", flush=True)
            continue
        for u3c in (u3, (-u3) % p):
            xn_f = pscale(N2, u2, p)
            yn_f = pscale(yn2, u3c, p)
            if verify_isogeny(Af, Bf, 0, b, (xn_f, xd2, yn_f, yd2), p, rng):
                print("  dual E'->E verified", flush=True)
                return {"A": Af, "B": Bf, "iso": (xn_f, xd2, yn_f, yd2)}
        print("  homomorphism check failed both signs", flush=True)
    return None


def find_sswu_z(p: int, A: int, B: int) -> int:
    """RFC 9380 H.2 for simple SWU: smallest Z in the order
    1, -1, 2, -2, ... such that Z is non-square, Z != -1, g(x) - Z is
    irreducible (cubic: no root), and g(B/(Z*A)) is square."""
    from mathlib_tpu.curves.params import _fp_sqrt

    def g(x):
        return (pow(x, 3, p) + A * x + B) % p

    def cubic_has_root(c0):
        # roots of x^3 + Ax + (B - Z): gcd(x^p - x, cubic)
        cubic = [c0 % p, A % p, 0, 1]
        xp = ppow_mod([0, 1], p, cubic, p)
        return len(pgcd(psub(xp, [0, 1], p), cubic, p)) > 1

    for mag in range(1, 1000):
        for z in (mag, -mag):
            zz = z % p
            if zz == p - 1 or zz == 0:
                continue
            if pow(zz, (p - 1) // 2, p) == 1:
                continue
            if cubic_has_root(B - zz):
                continue
            xz = B * pow(zz * A % p, p - 2, p) % p
            if _fp_sqrt(g(xz), p) is None:
                continue
            return z
    raise ValueError("no Z found")


if __name__ == "__main__":
    name = sys.argv[1] if len(sys.argv) > 1 else "BLS12_381"
    ell = int(sys.argv[2]) if len(sys.argv) > 2 else 11
    out = derive_for_curve(name, ell)
    if out is None:
        print("no usable isogeny found")
        sys.exit(1)
    from mathlib_tpu.curves.params import get_spec

    spec = get_spec(name)
    z = find_sswu_z(spec.p, out["A"], out["B"])
    print("SUCCESS")
    print("A' =", hex(out["A"]))
    print("B' =", hex(out["B"]))
    print("Z  =", z)
    import json

    with open(f"/tmp/isogeny_{name}_g1.json", "w") as fh:
        json.dump(
            {
                "A": out["A"],
                "B": out["B"],
                "Z": z,
                "iso": [list(c) for c in out["iso"]],
            },
            fh,
        )
    print(f"written /tmp/isogeny_{name}_g1.json")
