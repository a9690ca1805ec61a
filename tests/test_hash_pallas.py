"""Differential tests for the fused hash-to-G1 kernel (hash_pallas.py).

The kernel body is trace-time Python over uint32 rows, so running it on
numpy arrays under a Ref shim is the identical integer computation (see
test_pallas_kernels.py).  Expected values come from the XLA device
pipeline ops/hash.py HashG1Ctx.hash_to_g1, itself pinned to the host
path and through it to RFC 9380 J.9.1 (test_device_hash.py,
test_hash_vectors.py).
"""

import random

import numpy as np
import pytest

import mathlib_tpu.ops.kernels.fp_rows as fp_rows_mod
import mathlib_tpu.ops.kernels.g1_pallas as g1p_mod
import mathlib_tpu.ops.kernels.hash_pallas as hp_mod
from mathlib_tpu.curves.params import get_spec
from mathlib_tpu.ops.hash import get_hash_g1_ctx

SPEC = get_spec("BLS12_381")


class _Ref:
    def __init__(self, arr):
        self.arr = arr

    def __getitem__(self, idx):
        return self.arr[idx]

    def __setitem__(self, idx, val):
        self.arr[idx] = val


class _FakePl:
    @staticmethod
    def when(cond):
        def deco(fn):
            if bool(cond):
                fn()

        return deco


class _FakeLax:
    @staticmethod
    def fori_loop(lo, hi, body, init, **kw):
        v = init
        for i in range(lo, hi):
            v = body(i, v)
        return v


class _FakeJax:
    lax = _FakeLax


@pytest.fixture
def numpy_hash_env(monkeypatch):
    monkeypatch.setattr(fp_rows_mod, "jnp", np)
    monkeypatch.setattr(g1p_mod, "jnp", np)
    monkeypatch.setattr(hp_mod, "jnp", np)
    monkeypatch.setattr(hp_mod, "pl", _FakePl)
    monkeypatch.setattr(hp_mod, "jax", _FakeJax)


@pytest.mark.parametrize(
    "sign,mm",
    [
        ("parity", "serial"),
        ("be", "serial"),
        pytest.param("parity", "stacked", marks=pytest.mark.slow),
    ],
)
def test_hash_g1_kernel_body(sign, mm, numpy_hash_env):
    """Fused kernel body vs the XLA pipeline on random + edge inputs."""
    import jax

    ctx = get_hash_g1_ctx(SPEC)
    p, L = SPEC.p, ctx.fp.L
    F = fp_rows_mod.RowCtx(p, L)
    rng = random.Random(0xA5)
    # edge cases: u = 0 (t2 == 0 exceptional branch), 1, p-1, then random
    us0 = [0, 1, p - 1] + [rng.randrange(p) for _ in range(5)]
    us1 = [1, 0, 7] + [rng.randrange(p) for _ in range(5)]
    B = len(us0)

    u0 = np.asarray(ctx.fp.encode(us0))[:, None, :]  # (L, 1, B)
    u1 = np.asarray(ctx.fp.encode(us1))[:, None, :]

    mmf = g1p_mod._mm_serial if mm == "serial" else g1p_mod._mm_stacked
    inv_bits = np.array([int(b) for b in bin(p - 2)[2:]], dtype=np.uint32)
    sqrt_bits = np.array(
        [int(b) for b in bin((p + 1) // 4)[2:]], dtype=np.uint32
    )
    h_bits = np.asarray(ctx.h_bits, dtype=np.uint32)

    R = 1 << (16 * L)

    def as_limbs(mont_arr):
        a = np.asarray(mont_arr).reshape(L)
        return tuple(int(v) for v in a)

    C = {
        "sign": sign,
        "one_limbs": hp_mod._limbs(R % p, L),
        "Z": as_limbs(ctx.Z),
        "A": as_limbs(ctx.A),
        "B": as_limbs(ctx.B),
        "negB_over_A": as_limbs(ctx.negB_over_A),
        "B_over_ZA": as_limbs(ctx.B_over_ZA),
        "iso": tuple(tuple(as_limbs(c) for c in cs) for cs in ctx.iso),
    }

    out = np.zeros((3, L, 1, B), np.uint32)
    hp_mod._hash_g1_kernel(
        F, ctx.g1.F.b3, C, len(inv_bits), len(sqrt_bits), len(h_bits),
        ctx.h_neg, mmf,
        _Ref(inv_bits), _Ref(sqrt_bits), _Ref(h_bits),
        _Ref(u0), _Ref(u1), _Ref(out),
        _Ref(np.zeros((L, 4, B), np.uint32)),
    )
    got = ctx.g1.decode_points(out[:, :, 0, :])

    want_dev = jax.jit(lambda a, b: ctx.hash_to_g1(a, b, sign))(
        np.asarray(ctx.fp.encode(us0)), np.asarray(ctx.fp.encode(us1))
    )
    want = ctx.g1.decode_points(np.asarray(want_dev))
    assert got == want
