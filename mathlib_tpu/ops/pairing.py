"""Device optimal-ate pairing: Miller loop + final exponentiation.

Reproduces the reference pairing semantics (driver/kilic/bls12-381.go:
260-281, driver/gurvy/bn254.go:247-267) against the exact host engine
(host/engine.py), but TPU-shaped: the loop is a ``lax.scan`` over the
static bit pattern of the curve parameter, T stays in projective Fp2 on
the twist, and line evaluations are denominator-free sparse Fp12 elements.

Line derivation (independent of any reference implementation): with the
untwist Psi(x, y) = (x*wx, y*wy) (wx = w^{-2}, wy = w^{-3} for M-twists;
w^2, w^3 for D-twists), the tangent/chord line through Psi(T) evaluated at
P in G1, scaled by the Fp2 factors 2YZ^2 (resp. X - x2 Z) — legal because
Fp2/Fp6 subfield factors die in the final exponentiation — is

  dbl:  l = A + (D - B)*wy - C*(wx^2/wy)*...  with
        A = 2YZ^2*yP, B = 2Y^2 Z, C = 3X^2 Z*xP, D = 3X^3
  add:  A = E*yP, (D-B) = F*x2 - E*y2, C = F*xP,  E = X - x2 Z, F = Y - y2 Z

placed at Fp6-coefficient slots (after normalizing by an even w-power):
  M-twist: c0 = (0, 0, A),  c1 = (D - B, -C, 0)
  D-twist: c0 = (A, 0, 0),  c1 = (-C, D - B, 0)

BN curves finish with the two Frobenius lines (Q1 = pi(Q), Q2 = -pi^2(Q)),
whose twist-coordinate Frobenius constants are computed on the host tower.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.params import CurveSpec, Family
from ..host.engine import get_engine
from .field import bits_of
from .g1 import G1Ctx, get_g1_ctx
from .g2 import G2Ctx, get_g2_ctx
from .tower import TowerCtx, get_tower_ctx

Array = jax.Array


def _fp2_scalar(host_tower, e12) -> Tuple[int, int]:
    """Assert a host Fp12 element lies in Fp2 and extract it."""
    for k in range(2):
        for j in range(3):
            if (k, j) != (0, 0):
                assert e12[k][j] == (0, 0), "constant is not Fp2-valued"
    return e12[0][0]


class PairingCtx:
    def __init__(self, spec: CurveSpec):
        self.spec = spec
        self.tw: TowerCtx = get_tower_ctx(spec)
        self.g1c: G1Ctx = get_g1_ctx(spec)
        self.g2c: G2Ctx = get_g2_ctx(spec)

        if spec.family == Family.BLS12:
            c = abs(spec.x)
            self.conj_end = spec.x < 0
            self.bn_tail = False
        else:
            m = 6 * spec.x + 2
            c = abs(m)
            self.conj_end = m < 0
            self.bn_tail = True
        # loop bits, MSB-first, skipping the leading 1
        self.loop_bits = np.array(
            [(c >> i) & 1 for i in range(c.bit_length() - 2, -1, -1)],
            dtype=np.uint32,
        )

        if self.bn_tail:
            # Frobenius constants on twist coordinates, from the host engine
            eng = get_engine(spec)
            t = eng.tw
            ux, uy = eng._ux, eng._uy
            inv_ux, inv_uy = t.f12_inv(ux), t.f12_inv(uy)
            self.cx1 = _fp2_scalar(t, t.f12_mul(t.f12_frob(ux, 1), inv_ux))
            self.cy1 = _fp2_scalar(t, t.f12_mul(t.f12_frob(uy, 1), inv_uy))
            self.cx2 = _fp2_scalar(t, t.f12_mul(t.f12_frob(ux, 2), inv_ux))
            self.cy2 = _fp2_scalar(t, t.f12_mul(t.f12_frob(uy, 2), inv_uy))

    # ----------------------------------------------------------- lines ------
    def _line_f12(self, A, DmB, negC):
        """Assemble the sparse line into a full Fp12 element."""
        t = self.tw
        z = jnp.zeros_like(A)
        if self.spec.twist == "M":
            c0 = jnp.stack([z, z, A], axis=-4)
            c1 = jnp.stack([DmB, negC, z], axis=-4)
        else:
            c0 = jnp.stack([A, z, z], axis=-4)
            c1 = jnp.stack([negC, DmB, z], axis=-4)
        return jnp.stack([c0, c1], axis=-5)

    def _dbl_line(self, T, xP, yP):
        """Tangent line at T evaluated at P; returns (line12, 2T)."""
        t = self.tw
        X, Y, Z = self.g2c._unstack(T)
        m1 = t.f2_mul(
            jnp.stack([X, Y, Y], axis=-4), jnp.stack([X, Y, Z], axis=-4)
        )
        X2, Y2, YZ = (m1[..., i, :, :, :] for i in range(3))
        m2 = t.f2_mul(
            jnp.stack([X2, X2, Y2, YZ], axis=-4),
            jnp.stack([X, Z, Z, Z], axis=-4),
        )
        X3, X2Z, Y2Z, YZ2 = (m2[..., i, :, :, :] for i in range(4))
        # A = (2YZ^2)*yP ; C = (3X^2 Z)*xP ; B = 2Y^2 Z ; D = 3X^3
        two_yzz = t.f2_add(YZ2, YZ2)
        c3x2z = t.f2_add(t.f2_add(X2Z, X2Z), X2Z)
        m3 = self.tw.fp.mont_mul(
            jnp.stack([two_yzz, c3x2z], axis=-4),
            jnp.stack([yP, xP], axis=-3)[..., None, :, :],
        )
        A = m3[..., 0, :, :, :]
        C = m3[..., 1, :, :, :]
        B = t.f2_add(Y2Z, Y2Z)
        D = t.f2_add(t.f2_add(X3, X3), X3)
        line = self._line_f12(A, t.f2_sub(D, B), t.f2_neg(C))
        return line, self.g2c.double(T)

    def _add_line(self, T, Qx, Qy, xP, yP):
        """Chord line through T and Q evaluated at P; returns (line12, T+Q)."""
        t = self.tw
        X, Y, Z = self.g2c._unstack(T)
        mz = t.f2_mul(
            jnp.stack([Qx, Qy], axis=-4), jnp.stack([Z, Z], axis=-4)
        )
        E = t.f2_sub(X, mz[..., 0, :, :, :])
        F = t.f2_sub(Y, mz[..., 1, :, :, :])
        m1 = t.f2_mul(
            jnp.stack([F, E], axis=-4), jnp.stack([Qx, Qy], axis=-4)
        )
        DmB = t.f2_sub(m1[..., 0, :, :, :], m1[..., 1, :, :, :])
        m2 = self.tw.fp.mont_mul(
            jnp.stack([E, F], axis=-4),
            jnp.stack([yP, xP], axis=-3)[..., None, :, :],
        )
        A = m2[..., 0, :, :, :]
        C = m2[..., 1, :, :, :]
        Q = jnp.stack(
            [Qx, Qy, jnp.broadcast_to(jnp.asarray(self.tw.f2_one), Qx.shape)],
            axis=-4,
        )
        line = self._line_f12(A, DmB, t.f2_neg(C))
        return line, self.g2c.add(T, Q)

    # ------------------------------------------------------------ miller ----
    def miller_loop(self, xP, yP, Qx, Qy) -> Array:
        """Batched Miller value f_{c,Q}(P); needs final_exp to be a pairing.

        xP, yP: (..., L, B) affine G1 coordinates (Montgomery form);
        Qx, Qy: (..., 2, L, B) affine G2.  Batched pairing products are
        formed by multiplying Miller values before one shared final_exp
        (the Pairing2 seam, math.go:869-871).

        On TPU the whole loop runs as ONE fused Mosaic kernel (f and T
        VMEM-resident across all iterations, kernels/pairing_pallas.py);
        the per-step lines there are scaled by Fp2* factors relative to
        this XLA path, so unreduced Miller values differ by a subfield
        factor that final_exp kills — reduced pairings are identical.
        """
        from .field import _pallas_enabled

        if _pallas_enabled():
            return self._miller_loop_pallas(xP, yP, Qx, Qy)
        return self._miller_loop_xla(xP, yP, Qx, Qy)

    def _miller_loop_pallas(self, xP, yP, Qx, Qy) -> Array:
        from .kernels.pairing_pallas import add_step_pallas, miller_pallas

        t = self.tw
        f, T = miller_pallas(self.spec, xP, yP, Qx, Qy, self.loop_bits)
        if self.conj_end:
            f = t.f12_conj(f)
            T = self.g2c.neg(T)
        if self.bn_tail:
            Q1x = t.f2_mul_const(t.f2_conj(Qx), self.cx1)
            Q1y = t.f2_mul_const(t.f2_conj(Qy), self.cy1)
            Q2x = t.f2_mul_const(Qx, self.cx2)
            Q2y = t.f2_neg(t.f2_mul_const(Qy, self.cy2))
            f, T = add_step_pallas(self.spec, f, T, Q1x, Q1y, xP, yP)
            f, T = add_step_pallas(self.spec, f, T, Q2x, Q2y, xP, yP)
        return f

    def _miller_loop_xla(self, xP, yP, Qx, Qy) -> Array:
        t = self.tw
        g2c = self.g2c
        lanes = jnp.broadcast_shapes(
            xP.shape[-1:], Qx.shape[-1:]
        )
        T0 = jnp.broadcast_to(
            jnp.stack(
                [Qx, Qy, jnp.broadcast_to(jnp.asarray(t.f2_one), Qx.shape)],
                axis=-4,
            ),
            Qx.shape[:-3] + (3, 2, t.fp.L) + lanes,
        )
        f0 = jnp.broadcast_to(
            jnp.asarray(t.f12_one), Qx.shape[:-3] + (2, 3, 2, t.fp.L) + lanes
        )

        def body(carry, bit):
            f, T = carry
            line, T2 = self._dbl_line(T, xP, yP)
            f = t.f12_mul(t.f12_sqr(f), line)
            line_a, Ta = self._add_line(T2, Qx, Qy, xP, yP)
            f_a = t.f12_mul(f, line_a)
            take = jnp.bool_(bit)
            f = jnp.where(take, f_a, f)
            T = jnp.where(take, Ta, T2)
            return (f, T), None

        (f, T), _ = jax.lax.scan(body, (f0, T0), jnp.asarray(self.loop_bits))

        if self.conj_end:
            f = t.f12_conj(f)
            T = g2c.neg(T)

        if self.bn_tail:
            Q1x = t.f2_mul_const(t.f2_conj(Qx), self.cx1)
            Q1y = t.f2_mul_const(t.f2_conj(Qy), self.cy1)
            Q2x = t.f2_mul_const(Qx, self.cx2)
            Q2y = t.f2_neg(t.f2_mul_const(Qy, self.cy2))
            line1, T = self._add_line(T, Q1x, Q1y, xP, yP)
            f = t.f12_mul(f, line1)
            line2, T = self._add_line(T, Q2x, Q2y, xP, yP)
            f = t.f12_mul(f, line2)

        return f

    @property
    def supports_fused_check(self) -> bool:
        """All-device one-launch product check available (BLS12 factor-3 +
        Mosaic)?  Gates the ``check``/``split`` strategies whose device
        final-exp kernel runs the BLS12 x-chain hard part."""
        from .field import _pallas_enabled
        from ..curves.params import Family

        return (
            _pallas_enabled()
            and self.spec.family == Family.BLS12
            and self.spec.fexp_factor == 3
        )

    @property
    def supports_fused_product(self) -> bool:
        """Fused Miller+product kernel available (the default hostfexp
        product-check path)?  BLS12 factor-3 AND BN curves — the kernel
        finishes BN lanes with the two Frobenius tail lines in-launch
        (reference: driver/gurvy/bn254.go:247-267); the single-element
        final exp runs on the host C++ engine either way."""
        from .field import _pallas_enabled
        from ..curves.params import Family

        if not _pallas_enabled():
            return False
        if self.spec.family == Family.BN:
            return True
        return self.spec.family == Family.BLS12 and self.spec.fexp_factor == 3

    def product_check(self, xP, yP, Qx, Qy, n=None) -> Array:
        """prod_i e(P_i, Q_i) == 1, fused (scalar bool).

        Two strategies (MATHLIB_PAIR_FUSED):

        * ``split`` (default) — fused Miller+product kernel, then the
          cached whole-final-exp kernel, then the XLA is-one compare:
          3 device dispatches, each compiling in minutes.
        * ``check`` — the monolithic one-launch kernel
          (pairing_check_pallas) including final exp and unity test;
          saves ~2 dispatch latencies per call but its first compile is
          pathologically slow on the serving stack.

        Only valid when ``supports_fused_check``.  The BLS/BBS+ verify
        hot path (kilic engine.Check, perf_test.go:352-358)."""
        import os

        from .kernels.pairing_pallas import pairing_check_pallas

        if os.environ.get("MATHLIB_PAIR_FUSED", "split") == "check":
            out = pairing_check_pallas(
                self.spec, xP, yP, Qx, Qy, self.loop_bits, self.conj_end,
                n=n,
            )
            assert out is not None, "fused check unsupported for this curve"
            return out
        prod = self.product_miller(xP, yP, Qx, Qy, n=n)
        return self.tw.f12_is_one(self.final_exp(prod))[..., 0]

    def product_miller(self, xP, yP, Qx, Qy, n=None, interpret=False) -> Array:
        """UNREDUCED prod of Miller values as one launch -> (2, 3, 2, L, 1).

        Callers finish with a single-element final exp + unity test — on
        the HOST: that final exp is a serial dependency chain (~550-mul
        Fermat inversion + 5 cyclotomic x-chains) on one element, i.e.
        1/1024 lane occupancy on the VPU.  Measured: ~2.1 ms in the C++
        engine vs ~40 ms as the device kernel.  Only valid when
        ``supports_fused_product``; BN curves run the Frobenius tail
        in-kernel (constants from the host tower, __init__)."""
        from .kernels.pairing_pallas import pairing_product_pallas

        tail = (
            (self.cx1, self.cy1, self.cx2, self.cy2) if self.bn_tail else None
        )
        prod = pairing_product_pallas(
            self.spec, xP, yP, Qx, Qy, self.loop_bits, self.conj_end, n=n,
            interpret=interpret, tail=tail,
        )
        assert prod is not None, "fused product unsupported for this curve"
        return prod

    def products_miller(
        self, xP, yP, Qx, Qy, seg: int, n=None, interpret=False
    ) -> Array:
        """G = lanes/seg UNREDUCED segment products -> (2, 3, 2, L, G).

        The grouped serving form of ``product_miller``: many independent
        product checks (each over ``seg`` consecutive lanes) in ONE
        launch, amortizing the per-dispatch fixed cost.  Same curve
        support as ``supports_fused_product``."""
        from .kernels.pairing_pallas import pairing_products_pallas

        tail = (
            (self.cx1, self.cy1, self.cx2, self.cy2) if self.bn_tail else None
        )
        prods = pairing_products_pallas(
            self.spec, xP, yP, Qx, Qy, self.loop_bits, self.conj_end, seg,
            n=n, interpret=interpret, tail=tail,
        )
        assert prods is not None, "fused products unsupported for this curve"
        return prods

    def final_exp(self, f: Array) -> Array:
        return self.tw.f12_final_exp(f)

    def pairing(self, xP, yP, Qx, Qy, reduce: bool = True) -> Array:
        f = self.miller_loop(xP, yP, Qx, Qy)
        return self.final_exp(f) if reduce else f


@lru_cache(maxsize=None)
def get_pairing_ctx(spec: CurveSpec) -> PairingCtx:
    return PairingCtx(spec)
