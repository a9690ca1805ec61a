"""Device-side hash-to-curve: SSWU map, isogeny evaluation, cofactor mul.

The reference runs hash-to-curve entirely on the CPU (kilic SSWU at
driver/kilic/bls12-381.go:423-434, gnark HashToG1/G2); round-1 of this
framework mirrored that with a host Python path (host/hash_to_curve.py),
which capped BLS sign throughput at host speed.  Here everything
*algebraic* moves onto the TPU as batched (L, B) lane programs:

  host:   expand_message_xmd (RFC 9380 §5.3.1 — SHA-256/BLAKE2b bytes,
          a few µs per message) and the mod-p embedding,
  device: the simplified-SWU map onto the isogenous curve E', the rational
          isogeny evaluation (projectivized — zero inversions), the final
          point add, and the [h_eff] cofactor mul.

Design notes:
  * Both SSWU candidate square roots ride ONE pow-scan: gx1 and gx2 are
    stacked on a leading axis, so the (p+1)/4 chain is shared.
  * The isogeny is evaluated projectively: X = x_num*y_den,
    Y = y*y_num*x_den, Z = x_den*y_den — the kernel's x_den = 0 case lands
    on (0:y:0) = infinity for free, and no field inversion appears
    anywhere in the pipeline.
  * sgn0 / the BBS big-endian sign need the *canonical integer*, so the
    sign fix is the only place a Montgomery decode (one mont_mul + one
    cond-sub) happens.
  * Gate: requires SSWU isogeny data and p ≡ 3 (mod 4) for the device
    sqrt chain — BLS12-381 today; BLS12-377 (p ≡ 1 mod 4) stays on the
    host Tonelli-Shanks path.

Byte-compatibility with the host path (and through it RFC 9380 J.9.1) is
pinned by tests/test_device_hash.py.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.params import CurveSpec, Family
from .field import FpCtx, bits_of
from .g1 import G1Ctx, get_g1_ctx

Array = jax.Array


class HashG1Ctx:
    """Batched device hash-to-G1 for one CurveSpec (SSWU curves only)."""

    def __init__(self, spec: CurveSpec):
        from ..curves import isogeny_data as iso

        d = iso.G1.get(spec.name)
        if d is None:
            raise ValueError(f"{spec.name}: no G1 SSWU isogeny data")
        if spec.p % 4 != 3:
            raise ValueError(f"{spec.name}: p % 4 != 3, no device sqrt chain")
        self.spec = spec
        self.g1: G1Ctx = get_g1_ctx(spec)
        fp = self.g1.fp
        self.fp: FpCtx = fp
        p = spec.p

        A, B, Z = d["A"], d["B"], d["Z"]
        self.A = fp.encode(A)
        self.B = fp.encode(B)
        self.Z = fp.encode(Z)
        self.negB_over_A = fp.encode((-B * pow(A, -1, p)) % p)
        self.B_over_ZA = fp.encode(B * pow(Z * A, -1, p) % p)
        # isogeny coefficients, low-degree-first, Montgomery-encoded
        self.iso = tuple(
            [fp.encode(c) for c in coeffs] for coeffs in d["iso"]
        )
        # effective G1 cofactor: 1-x for BLS12 (kilic/gnark), 1 for BN
        h = 1 - spec.x if spec.family == Family.BLS12 else 1
        self.h_bits = bits_of(abs(h))[::-1].copy()  # MSB first
        self.h_neg = h < 0

    # ------------------------------------------------------------ helpers ---
    def _parity(self, a: Array) -> Array:
        """sgn0 of the canonical integer behind a Montgomery value."""
        std = self.fp.canon(self.fp.from_mont(a))
        return std[..., 0, :] & 1

    def _le_half(self, a: Array) -> Array:
        """BBS big-endian sign: canonical(a) <= p - canonical(a)?

        kilic/custom.go:99-105 defines sign(z) = (-z >= z); equivalently
        z <= p/2 with 0 counted positive."""
        std = self.fp.canon(self.fp.from_mont(a))
        neg = self.fp.canon(self.fp.from_mont(self.fp.neg(a)))
        # lexicographic limb compare, most-significant first
        le = jnp.ones(std.shape[:-2] + std.shape[-1:], dtype=bool)
        decided = jnp.zeros_like(le)
        for k in range(self.fp.L - 1, -1, -1):
            s, n = std[..., k, :], neg[..., k, :]
            le = jnp.where(jnp.logical_and(~decided, s != n), s < n, le)
            decided = jnp.logical_or(decided, s != n)
        return le

    # ---------------------------------------------------------------- SSWU --
    def sswu(self, u: Array, sign: str = "parity") -> Tuple[Array, Array]:
        """map_to_curve_simple_swu onto E': u (L, B) -> affine (x, y).

        ``sign``: "parity" (RFC sgn0) or "be" (the kilic BBS+ variant's
        big-endian sign, custom.go:134-237) or "none" (caller fixes it)."""
        fp = self.fp
        one = jnp.broadcast_to(jnp.asarray(fp.one_mont), u.shape)
        t1 = fp.mont_mul(jnp.asarray(self.Z), fp.sqr(u))  # Z u^2
        t2 = fp.add(fp.sqr(t1), t1)  # Z^2 u^4 + Z u^2
        x1 = fp.mont_mul(
            jnp.asarray(self.negB_over_A), fp.add(one, fp.inv(t2))
        )  # inv(0) = 0: overwritten by the exceptional case below
        x1 = fp.select(fp.is_zero(t2), jnp.broadcast_to(jnp.asarray(self.B_over_ZA), x1.shape), x1)
        gx1 = fp.add(
            fp.mont_mul(fp.add(fp.sqr(x1), jnp.asarray(self.A)), x1),
            jnp.asarray(self.B),
        )
        x2 = fp.mont_mul(t1, x1)
        t13 = fp.mont_mul(t1, fp.sqr(t1))
        gx2 = fp.mont_mul(gx1, t13)  # g(x2) = g(x1) Z^3 u^6

        g = jnp.stack([gx1, gx2], axis=0)  # one shared sqrt chain
        y_cand = fp.sqrt(g)
        is_sq = fp.eq(fp.sqr(y_cand[0]), gx1)
        x = fp.select(is_sq, x1, x2)
        y = fp.select(is_sq, y_cand[0], y_cand[1])

        if sign == "parity":
            flip = self._parity(u) != self._parity(y)
        elif sign == "be":
            flip = self._le_half(u) != self._le_half(y)
        else:
            return x, y
        y = fp.select(flip, fp.neg(y), y)
        return x, y

    # -------------------------------------------------------------- isogeny --
    def _horner(self, coeffs, x: Array) -> Array:
        fp = self.fp
        acc = jnp.broadcast_to(jnp.asarray(coeffs[-1]), x.shape)
        for c in reversed(coeffs[:-1]):
            acc = fp.add(fp.mont_mul(acc, x), jnp.asarray(c))
        return acc

    def iso_project(self, x: Array, y: Array) -> Array:
        """Evaluate the rational isogeny E' -> E, returning (3, L, B)
        projective — X = xn*yd, Y = y*yn*xd, Z = xd*yd (no inversions;
        kernel points land on infinity automatically)."""
        fp = self.fp
        xn, xd, yn, yd = (self._horner(cs, x) for cs in self.iso)
        X = fp.mont_mul(xn, yd)
        Y = fp.mont_mul(y, fp.mont_mul(yn, xd))
        Z = fp.mont_mul(xd, yd)
        return jnp.stack([X, Y, Z], axis=-3)

    # ------------------------------------------------------------- cofactor --
    def clear_cofactor(self, P: Array) -> Array:
        """[h_eff] P by double-and-add over the static cofactor bits."""
        if len(self.h_bits) == 1 and self.h_bits[0] == 1 and not self.h_neg:
            return P
        acc = P

        def body(a, bit):
            sel = jnp.broadcast_to(
                jnp.bool_(bit), a.shape[:-3] + a.shape[-1:]
            )
            return self.g1.dbl_add_select(a, P, sel), None

        acc, _ = jax.lax.scan(body, acc, jnp.asarray(self.h_bits[1:]))
        return self.g1.neg(acc) if self.h_neg else acc

    # ---------------------------------------------------------- entry point --
    def hash_to_g1(self, u0: Array, u1: Array, sign: str = "parity") -> Array:
        """(u0, u1) field-element batches -> (3, L, B) projective points.

        Computes iso(sswu(u0)) + iso(sswu(u1)) (the isogeny is a group
        homomorphism, so mapping each point separately and adding on E
        equals the host's add-on-E'-then-map) followed by the cofactor
        clearing — byte-identical to host/hash_to_curve.py hash_to_g1."""
        x0, y0 = self.sswu(u0, sign)
        x1, y1 = self.sswu(u1, sign)
        P = self.g1.add(self.iso_project(x0, y0), self.iso_project(x1, y1))
        return self.clear_cofactor(P)


@lru_cache(maxsize=None)
def get_hash_g1_ctx(spec: CurveSpec) -> HashG1Ctx:
    return HashG1Ctx(spec)


# ---------------------------------------------------------------------------
# host seam: messages -> device points
# ---------------------------------------------------------------------------

_JIT_CACHE: dict = {}


def hash_to_g1_batch(spec: CurveSpec, msgs, dst: bytes, sign: str = "parity",
                     hash_name: str = "sha256") -> Array:
    """Batched messages -> (3, L, N) projective G1 points on device.

    Host work is exactly the RFC hash_to_field bytes (expand_message_xmd +
    mod-p embedding); the map/isogeny/cofactor pipeline is one jitted
    device program shared across calls of the same batch size."""
    from ..host.hash_to_curve import hash_to_field_fp

    ctx = get_hash_g1_ctx(spec)
    L = 64 if spec.fp_bytes == 48 else 48
    us = [hash_to_field_fp(m, dst, spec.p, 2, L, hash_name) for m in msgs]
    u0 = ctx.fp.encode([u[0] for u in us])
    u1 = ctx.fp.encode([u[1] for u in us])

    key = (spec.name, len(msgs), sign)
    fn = _JIT_CACHE.get(key)
    if fn is None:
        fn = jax.jit(lambda a, b: ctx.hash_to_g1(a, b, sign))
        _JIT_CACHE[key] = fn
    return fn(u0, u1)
