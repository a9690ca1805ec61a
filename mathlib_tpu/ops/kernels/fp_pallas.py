"""Pallas TPU kernel for batched Montgomery multiplication.

The XLA-composed mont_mul (ops/field.py) is HBM-bound: the (L, L, B) limb
product tensor and its sheared reductions materialize hundreds of MB per
64k-element batch.  This kernel keeps the entire schoolbook product + REDC
in VMEM: per grid step it loads a (L, TS, 128) tile of each operand, runs
the full non-interleaved Montgomery multiply as straight-line vector code
(Python loops unroll at trace time; every row op is a (TS, 128) vreg
operation with full sublane/lane utilization), and writes one tile back.
Traffic per tile is 3 tiles (~300 KB) against ~6k vector ops — deeply
compute-bound, which is the point.

Bit-compatible with FpCtx.mont_mul: canonical 16-bit limbs in, canonical
limbs of the same relaxed [0, 2p) value out.

Replaces the reference's ADX/BMI2 Montgomery assembly path
(driver/kilic/custom_amd64.go:26-30); the algorithm is the non-interleaved
form of the CIOS routine spelled out at driver/kilic/custom_generic.go:
57-175, restructured for 16-bit limbs on vector lanes.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1

# tile: TS sublane-groups of 128 lanes = TS*128 field elements per grid step
TILE_SUBLANES = 8
TILE = TILE_SUBLANES * 128


def _mont_mul_kernel(L, np_limbs, p_limbs, a_ref, b_ref, o_ref):
    """Non-interleaved Montgomery multiply on one (L, TS, 128) tile.

    np_limbs / p_limbs are python tuples of ints (N' = -p^-1 mod R, p).
    """
    # the & LIMB_MASK is a semantic no-op (values are canonical 16-bit) but
    # tells the compiler the operand range, so products lower to native
    # 16x16->32 multiplies instead of emulated 32x32
    a = [a_ref[i] & LIMB_MASK for i in range(L)]  # each (TS, 128) uint32
    b = [b_ref[i] & LIMB_MASK for i in range(L)]

    # ---- T = a * b (schoolbook, lo/hi split) --------------------------------
    zero = jnp.zeros_like(a[0])
    T = [zero] * (2 * L + 1)
    for i in range(L):
        for j in range(L):
            prod = a[i] * b[j]  # < 2^32, exact in uint32
            T[i + j] = T[i + j] + (prod & LIMB_MASK)
            T[i + j + 1] = T[i + j + 1] + (prod >> LIMB_BITS)
    # accumulators < 2L * 2^16 < 2^22

    # ---- m = (T mod R) * N' mod R ------------------------------------------
    # T_low limbs are redundant (< 2^22): split into lo16 + hi6 parts so all
    # products stay < 2^32.
    m_acc = [zero] * L
    for i in range(L):
        t1 = T[i] & LIMB_MASK
        t2 = T[i] >> LIMB_BITS  # < 2^6
        for j in range(L - i):  # only k = i + j < L matters (mod R)
            npj = np.uint32(np_limbs[j])
            m_acc[i + j] = m_acc[i + j] + (t1 * npj & LIMB_MASK)
            if i + j + 1 < L:
                m_acc[i + j + 1] = (
                    m_acc[i + j + 1] + (t1 * npj >> LIMB_BITS) + (t2 * npj & LIMB_MASK)
                )
            # t2*npj high parts land at i+j+2 and beyond only via the hi
            if i + j + 2 < L:
                m_acc[i + j + 2] = m_acc[i + j + 2] + (t2 * npj >> LIMB_BITS)
    # normalize m to canonical 16-bit (mod R: final carry dropped)
    m = []
    carry = zero
    for k in range(L):
        v = m_acc[k] + carry
        m.append(v & LIMB_MASK)
        carry = v >> LIMB_BITS

    # ---- S = T + m * p; out = S / R ----------------------------------------
    for i in range(L):
        for j in range(L):
            pj = np.uint32(p_limbs[j])
            prod = m[i] * pj
            T[i + j] = T[i + j] + (prod & LIMB_MASK)
            T[i + j + 1] = T[i + j + 1] + (prod >> LIMB_BITS)
    # ripple-normalize; low L digits are zero by construction, so only the
    # carry out of the low half matters
    carry = zero
    for k in range(L):
        carry = (T[k] + carry) >> LIMB_BITS
    for k in range(L):
        v = T[L + k] + carry
        o_ref[k] = v & LIMB_MASK
        carry = v >> LIMB_BITS


@lru_cache(maxsize=None)
def _build_mont_mul(p: int, L: int, interpret: bool):
    R = 1 << (LIMB_BITS * L)
    nprime = (-pow(p, -1, R)) % R
    np_limbs = tuple((nprime >> (LIMB_BITS * k)) & LIMB_MASK for k in range(L))
    p_limbs = tuple((p >> (LIMB_BITS * k)) & LIMB_MASK for k in range(L))

    kernel = partial(_mont_mul_kernel, L, np_limbs, p_limbs)

    @jax.jit
    def run(a, b):
        # a, b: (L, M, 128) with M % TILE_SUBLANES == 0
        M = a.shape[1]
        grid = (M // TILE_SUBLANES,)
        spec = pl.BlockSpec(
            (L, TILE_SUBLANES, 128),
            lambda g: (0, g, 0),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(a.shape, jnp.uint32),
            grid=grid,
            in_specs=[spec, spec],
            out_specs=spec,
            interpret=interpret,
        )(a, b)

    return run


def mont_mul_pallas(p: int, L: int, a, b, interpret: bool = False):
    """Drop-in Montgomery product for (..., L, B) limb arrays."""
    a, b = jnp.broadcast_arrays(a, b)
    shape = a.shape
    lead = shape[:-2]
    B = shape[-1]
    # (..., L, B) -> (L, TOT)
    a2 = jnp.moveaxis(a, -2, 0).reshape(L, -1)
    b2 = jnp.moveaxis(b, -2, 0).reshape(L, -1)
    tot = a2.shape[1]
    pad = (-tot) % TILE
    if pad:
        a2 = jnp.pad(a2, [(0, 0), (0, pad)])
        b2 = jnp.pad(b2, [(0, 0), (0, pad)])
    M = a2.shape[1] // 128
    a3 = a2.reshape(L, M, 128)
    b3 = b2.reshape(L, M, 128)
    out = _build_mont_mul(p, L, interpret)(a3, b3)
    out = out.reshape(L, M * 128)[:, :tot]
    return jnp.moveaxis(out.reshape((L,) + lead + (B,)), 0, -2)
