"""Derive the G2 SSWU 3-isogeny for BLS12-381 from first principles.

The twist E''(Fp2): y^2 = x^3 + b2 (b2 = 4(1+u)) admits a 3-isogenous
curve E': y^2 = x^3 + A'x + B' over Fp2 (the RFC 9380 BLS12381G2 suite
uses exactly such an iso-3).  A 3-isogeny has kernel {O, (x0, ±y0)} with
kernel polynomial h(x) = x - x0 of degree 1: x0 is a root of the 3-division
polynomial psi_3(x) = 3x^4 + 6Ax^2 + 12Bx - A^2 = 3x(x^3 + 4B) for A=0.

Velu (degree-1 kernel, roots explicit in Fp2):
  t = 6 x0^2 + 2A,  u_ = 4(x0^3 + A x0 + B),  w = u_ + x0 t
  A' = A - 5t,  B' = B - 7w
  x-map: x + t/(x - x0) + u_/(x - x0)^2   ->  N(x)/(x - x0)^2, deg N = 3
  y-map: y * (N'h - 2Nh')/h^3

As with G1, the dual E' -> E'' is built by pushing a generator of another
order-3 subgroup through the forward map and running Velu again, then
scaling by a sextic-twist isomorphism u so the codomain is exactly E''.

Everything is over Fp2 (host tower arithmetic).
"""

from __future__ import annotations

import json
import sys
from typing import List, Optional, Tuple

sys.path.insert(0, "/root/repo")

from mathlib_tpu.curves.params import get_spec
from mathlib_tpu.host.fields import get_tower

F2 = Tuple[int, int]


def main(name: str = "BLS12_381"):
    spec = get_spec(name)
    t = get_tower(spec)
    p = spec.p
    b2 = spec.b2

    add, sub, mul, inv = t.f2_add, t.f2_sub, t.f2_mul, t.f2_inv
    sqr = t.f2_sqr

    def muls(a, s):
        return t.f2_muls(a, s)

    def neg(a):
        return t.f2_neg(a)

    zero, one = (0, 0), (1, 0)

    # ---- order-3 x-coordinates: x = 0 or x^3 = -4 b2 ------------------------
    cands: List[F2] = []
    # x = 0: y^2 = b2
    if t.f2_sqrt(b2) is not None:
        cands.append(zero)
    # cube roots of -4 b2 in Fp2 (Fp2* is cyclic of order p^2-1; cube roots
    # exist iff a^((p^2-1)/3) == 1)
    m4b = muls(b2, p - 4)
    q = p * p - 1
    assert q % 3 == 0

    def f2_pow(a, e):
        return t.f2_pow(a, e)

    def cbrt_f2(a) -> Optional[F2]:
        if a == zero:
            return zero
        if f2_pow(a, q // 3) != one:
            return None
        m, s = q, 0
        while m % 3 == 0:
            m //= 3
            s += 1
        # non-cube g in Fp2
        import random

        rng = random.Random(5)
        while True:
            g = (rng.randrange(p), rng.randrange(p))
            if g != zero and f2_pow(g, q // 3) != one:
                break
        z = f2_pow(g, m)
        x = f2_pow(a, pow(3, -1, m))
        ainv = t.f2_inv(a)

        def order3(v):
            k = 0
            while v != one:
                v = mul(mul(v, v), v)
                k += 1
            return k

        err = mul(mul(mul(x, x), x), ainv)
        while err != one:
            k = order3(err)
            if k >= s:
                return None
            v = f2_pow(z, 3 ** (s - k - 1))
            for j in (1, 2):
                cand = mul(x, f2_pow(v, j))
                cerr = mul(mul(mul(cand, cand), cand), ainv)
                if order3(cerr) < k:
                    x, err = cand, cerr
                    break
            else:
                return None
        return x

    r = cbrt_f2(m4b)
    if r is not None:
        # all three cube roots: r * w3^i with w3 a primitive cube root of 1
        w3 = None
        import random

        rng = random.Random(9)
        while w3 is None:
            g = (rng.randrange(p), rng.randrange(p))
            c = f2_pow(g, q // 3)
            if c != one:
                w3 = c
        for i in range(3):
            cands.append(r)
            r = mul(r, w3)
    print(f"{name} G2: {len(cands)} order-3 x-coordinates over Fp2")

    def velu3(A: F2, B: F2, x0: F2):
        """Degree-1-kernel Velu from y^2 = x^3 + Ax + B."""
        tq = add(muls(sqr(x0), 6), muls(A, 2))
        uq = muls(add(mul(sqr(x0), x0), add(mul(A, x0), B)), 4)
        w = add(uq, mul(x0, tq))
        A2 = sub(A, muls(tq, 5))
        B2 = sub(B, muls(w, 7))
        # N(x) = x(x-x0)^2 + t(x-x0) + u  (degree 3, monic)
        # expand: with h = x - x0: N = x*h^2 + t*h + u
        # coefficients low-first in Fp2
        x0n = neg(x0)
        h = [x0n, one]  # x - x0
        h2 = [mul(x0, x0), muls(x0, p - 2), one]
        N = [
            add(mul(x0n, zero), add(mul(tq, x0n), uq)),  # const: t*(-x0) + u
            add(h2[0], tq),  # x coeff: x0^2 + t
            h2[1],  # x^2 coeff: -2x0
            one,  # x^3
        ]
        # y-map numerator: N'h - 2N h' ; denominator h^3
        def pmul2(a, b):
            out = [zero] * (len(a) + len(b) - 1)
            for i, ai in enumerate(a):
                for j, bj in enumerate(b):
                    out[i + j] = add(out[i + j], mul(ai, bj))
            return out

        def pderiv2(a):
            return [muls(a[i], i) for i in range(1, len(a))]

        def psub2(a, b):
            n = max(len(a), len(b))
            return [
                sub(
                    a[i] if i < len(a) else zero,
                    b[i] if i < len(b) else zero,
                )
                for i in range(n)
            ]

        yn = psub2(pmul2(pderiv2(N), h), [muls(c, 2) for c in pmul2(N, pderiv2(h))])
        yd = pmul2(h2, h)
        return A2, B2, N, h2, yn, yd

    def peval2(poly, x):
        acc = zero
        for c in reversed(poly):
            acc = add(mul(acc, x), c)
        return acc

    def on_curve(A, B, P):
        x, y = P
        return sqr(y) == add(mul(sqr(x), x), add(mul(A, x), B))

    def pt_add(A, P, Q):
        if P is None:
            return Q
        if Q is None:
            return P
        (x1, y1), (x2, y2) = P, Q
        if x1 == x2:
            if add(y1, y2) == zero:
                return None
            lam = mul(add(muls(sqr(x1), 3), A), inv(muls(y1, 2)))
        else:
            lam = mul(sub(y2, y1), inv(sub(x2, x1)))
        x3 = sub(sub(sqr(lam), x1), x2)
        return (x3, sub(mul(lam, sub(x1, x3)), y1))

    def apply_iso(maps, P):
        if P is None:
            return None
        xn, xd, yn, yd = maps
        x, y = P
        xdv, ydv = peval2(xd, x), peval2(yd, x)
        if xdv == zero or ydv == zero:
            return None
        return (
            mul(peval2(xn, x), inv(xdv)),
            mul(y, mul(peval2(yn, x), inv(ydv))),
        )

    def verify_hom(A1, B1, A2, B2, maps, trials=4):
        import random

        rng = random.Random(11)
        ok = 0

        def rand_pt():
            while True:
                x = (rng.randrange(p), rng.randrange(p))
                rhs = add(mul(sqr(x), x), add(mul(A1, x), B1))
                y = t.f2_sqrt(rhs)
                if y is not None:
                    return (x, y)

        for _ in range(trials * 4):
            if ok >= trials:
                return True
            P = rand_pt()
            Q = rand_pt()
            fP, fQ, fPQ = apply_iso(maps, P), apply_iso(maps, Q), apply_iso(maps, pt_add(A1, P, Q))
            if fP is None or fQ is None or fPQ is None:
                continue
            if not on_curve(A2, B2, fP):
                print("    [dbg] image off-curve", flush=True)
                return False
            if pt_add(A2, fP, fQ) != fPQ:
                print("    [dbg] additivity mismatch", flush=True)
                return False
            ok += 1
        return ok >= trials

    A0, B0 = zero, b2
    # prefer the standardized ciphersuite model when recognisable
    # (RFC 9380 BLS12381G2: A' = 240*u, B' = 1012*(1+u))
    def _pref(x0):
        Af, Bf, *_ = velu3(A0, B0, x0)
        return 0 if Af == (0, 240) else 1

    cands = sorted(cands, key=_pref)
    for x0 in cands:
        Af, Bf, Nf, xdf, ynf, ydf = velu3(A0, B0, x0)
        if Af == zero or Bf == zero:
            continue
        if not verify_hom(A0, B0, Af, Bf, (Nf, xdf, ynf, ydf)):
            print("  forward hom failed for", x0)
            continue
        print("  E' found: A'=", (hex(Af[0])[:20], hex(Af[1])[:20]), " B'=", (hex(Bf[0])[:12], hex(Bf[1])[:12]))
        # dual kernel x-coordinate: x-map image of another order-3 x0
        # (the kernel points' y may live in Fp4; Velu needs only x)
        other = next((c for c in cands if c != x0), None)
        if other is None:
            continue
        px = mul(peval2(Nf, other), inv(peval2(xdf, other)))
        A3, B3, N2, xd2, yn2, yd2 = velu3(Af, Bf, px)
        if A3 != zero:
            print("  dual image not j=0:", A3)
            continue
        # scale codomain to b2: u^6 = b2 / B3
        ratio = mul(B0, inv(B3))
        sq = t.f2_sqrt(ratio)
        u2 = None
        if sq is not None:
            for sr in (sq, neg(sq)):
                c = cbrt_f2(sr)
                if c is not None:
                    u2 = sqr(c)
                    break
        if u2 is None:
            print("  no sixth root")
            continue
        u3 = t.f2_sqrt(mul(sqr(u2), u2))
        if u3 is None:
            print("  no u3")
            continue
        done = False
        for u3c in (u3, neg(u3)):
            xn_f = [mul(c, u2) for c in N2]
            yn_f = [mul(c, u3c) for c in yn2]
            if verify_hom(Af, Bf, zero, B0, (xn_f, xd2, yn_f, yd2)):
                print("  dual E'->E'' verified")
                out = {
                    "A": list(Af),
                    "B": list(Bf),
                    "iso": [
                        [list(c) for c in xn_f],
                        [list(c) for c in xd2],
                        [list(c) for c in yn_f],
                        [list(c) for c in yd2],
                    ],
                }
                with open(f"/tmp/isogeny_{name}_g2.json", "w") as fh:
                    json.dump(out, fh)
                print(f"  written /tmp/isogeny_{name}_g2.json")
                print("  A' =", [hex(v) for v in Af])
                print("  B' =", [hex(v) for v in Bf])
                done = True
                break
        if done:
            return True
    return False


if __name__ == "__main__":
    ok = main(sys.argv[1] if len(sys.argv) > 1 else "BLS12_381")
    sys.exit(0 if ok else 1)
