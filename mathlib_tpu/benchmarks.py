"""Benchmark harness parity with the reference (perf_test.go, 561 LoC).

The reference benchmarks (run in CI on every push, .github/workflows/
go.yml:29-31) cover: Pedersen-commitment proof-of-knowledge, BLS sign /
verify, sequential and parallel, plus wrapper-overhead isolation.  Here the
"parallel" axis is the device batch (lanes) instead of goroutines
(perf_test.go:265-407), and overhead isolation compares the mathlib-compat
wrapper API against the raw batched engine.

Run:  python -m mathlib_tpu.benchmarks [curve] [batch]
Emits one JSON object per benchmark on stdout.
"""

from __future__ import annotations

import json
import random
import sys
import time
from typing import Dict, List

import numpy as np


def _time(fn, reps=3):
    fn()  # warm / compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def pedersen_pok(be, batch: int) -> Dict:
    """Pedersen commitment proof-of-knowledge round-trip, batched.

    Mirrors Benchmark_Sequential_PedersenCommitmentProofOfKnowledge
    (perf_test.go:111-226): commit C = [x]G + [r]H, prove knowledge with a
    Schnorr-style sigma protocol, verify.
    """
    spec = be.spec
    eng = be.host
    rng = random.Random(7)
    G = eng.gen_g1
    H = eng.g1.mul(G, rng.randrange(2, spec.r))
    xs = [rng.randrange(spec.r) for _ in range(batch)]
    rs = [rng.randrange(spec.r) for _ in range(batch)]

    def run():
        # commitments: C_i = [x_i]G + [r_i]H  (two batched scalar muls)
        cg = be.g1_scalar_mul([G] * batch, xs)
        ch = be.g1_scalar_mul([H] * batch, rs)
        # sigma: t = [u]G + [v]H; challenge c; responses
        us = [rng.randrange(spec.r) for _ in range(batch)]
        vs = [rng.randrange(spec.r) for _ in range(batch)]
        tg = be.g1_scalar_mul([G] * batch, us)
        th = be.g1_scalar_mul([H] * batch, vs)
        c = rng.randrange(1, spec.r)
        zx = [(us[i] + c * xs[i]) % spec.r for i in range(batch)]
        zr = [(vs[i] + c * rs[i]) % spec.r for i in range(batch)]
        # verify: [zx]G + [zr]H == T + [c]C
        lhs_g = be.g1_scalar_mul([G] * batch, zx)
        lhs_h = be.g1_scalar_mul([H] * batch, zr)
        for i in range(batch):
            lhs = eng.g1.add(lhs_g[i], lhs_h[i])
            C = eng.g1.add(cg[i], ch[i])
            T = eng.g1.add(tg[i], th[i])
            rhs = eng.g1.add(T, eng.g1.mul(C, c))
            assert lhs == rhs

    dt = _time(run, reps=2)
    return {
        "benchmark": "pedersen_pok",
        "batch": batch,
        "seconds": dt,
        "proofs_per_sec": batch / dt,
    }


def hash_to_g1(be, batch: int) -> Dict:
    """Hash-to-G1 throughput (cf. the hash/* sub-benchmarks in
    Benchmark_Parallel_IndividualOps*, perf_test.go:429-444).  On SSWU
    curves the map/isogeny/cofactor pipeline runs on device."""
    msgs = [b"msg-%d" % i for i in range(batch)]

    if be._device_hash_ctx() is not None:
        import jax

        run = lambda: jax.block_until_ready(  # noqa: E731
            be.hash_to_g1_batch(msgs, b"BENCH")
        )
    else:
        from .host.hash_to_curve import get_hasher

        hasher = get_hasher(be.spec)
        run = lambda: [hasher.hash_to_g1(m, b"BENCH") for m in msgs]  # noqa: E731
    dt = _time(run)
    return {
        "benchmark": "hash_to_g1",
        "batch": batch,
        "seconds": dt,
        "hashes_per_sec": batch / dt,
    }


def bls_sign(be, batch: int) -> Dict:
    """BLS sign throughput (hash-to-G1 + scalar mul), cf.
    Benchmark_Sequential_BLS_Sign perf_test.go:241-247."""
    msgs = [b"msg-%d" % i for i in range(batch)]
    dt = _time(lambda: be.bls_sign_batch(12345, msgs, dst=b"BENCH"))
    return {
        "benchmark": "bls_sign",
        "batch": batch,
        "seconds": dt,
        "sigs_per_sec": batch / dt,
    }


def bls_verify(be, batch: int) -> Dict:
    """BLS batched verify (random linear combination + 2-pairing check),
    cf. Benchmark_Sequential_BLS_Verify perf_test.go:250-261."""
    sk = 424242
    pk = be.host.g2.mul(be.host.gen_g2, sk)
    msgs = [b"msg-%d" % i for i in range(batch)]
    sigs = be.bls_sign_batch(sk, msgs, dst=b"BENCH")

    def run():
        assert be.bls_verify_batch(pk, sigs, msgs, dst=b"BENCH")

    dt = _time(run)
    return {
        "benchmark": "bls_verify_batch",
        "batch": batch,
        "seconds": dt,
        "verifies_per_sec": batch / dt,
    }


def pairing2(be, batch: int) -> Dict:
    """2-pairing product check throughput (the Pairing2 + FExp + IsUnity
    flow, perf_test.go:409-561 overhead benchmarks)."""
    eng = be.host
    rng = random.Random(9)
    a = rng.randrange(2, be.spec.r)
    P = eng.g1.mul(eng.gen_g1, a)
    Q = eng.g2.mul(eng.gen_g2, rng.randrange(2, be.spec.r))
    g1s = [P, eng.g1.neg(P)] * batch
    g2s = [Q, Q] * batch

    def run():
        assert be.pairing_product_is_one(g1s, g2s)

    dt = _time(run)
    return {
        "benchmark": "pairing2_check",
        "batch": batch,
        "seconds": dt,
        "pairings_per_sec": 2 * batch / dt,
    }


def msm_bench(be, n: int, c: int = 8) -> Dict:
    import jax
    import jax.numpy as jnp

    g1 = be.g1
    nrng = np.random.default_rng(0)
    P = jnp.tile(jnp.asarray(g1.gen), (1, 1, n))
    S = jnp.asarray(nrng.integers(0, 1 << 16, size=(g1.fr.L, n), dtype=np.uint32))

    def run():
        np.asarray(be.g1_msm_device(P, S, c=c))

    dt = _time(run)
    return {
        "benchmark": "g1_msm",
        "n": n,
        "window_bits": c,
        "seconds": dt,
        "points_per_sec": n / dt,
    }


def api_individual_ops(curve_name: str, reps: int = 50) -> List[Dict]:
    """Per-op wrapper-overhead isolation: the mathlib-compat API vs the raw
    engine underneath it (Benchmark_Parallel_IndividualOps* and the
    mathlib-vs-raw-backend baselines, perf_test.go:409-561).

    Single-element ops run on the (native C++ when available) host engine;
    the delta between the two columns is the wrapper cost.
    """
    from .api import Curves
    from .curves.params import get_spec
    from .host.engine import get_engine

    c = next(x for x in Curves if x.spec.name == curve_name)
    spec = get_spec(curve_name)
    eng = get_engine(spec)
    rng = random.Random(13)
    k = rng.randrange(2, spec.r)  # full-width scalar
    zr = c.NewZrFromBytes(k.to_bytes(32, "big"))
    g1k = c.GenG1.Mul(zr)
    g2k = c.GenG2.Mul(zr)
    rows = []

    def row(op, api_fn, raw_fn):
        t_api = _time(lambda: [api_fn() for _ in range(reps)]) / reps
        t_raw = _time(lambda: [raw_fn() for _ in range(reps)]) / reps
        rows.append(
            {
                "benchmark": f"api_op/{op}",
                "api_us": round(t_api * 1e6, 1),
                "raw_engine_us": round(t_raw * 1e6, 1),
                "wrapper_overhead_pct": round(100 * (t_api - t_raw) / max(t_raw, 1e-12), 1),
            }
        )

    raw_g1k = eng.g1.mul(eng.gen_g1, k)
    raw_g2k = eng.g2.mul(eng.gen_g2, k)
    row("g1_mul", lambda: c.GenG1.Mul(zr), lambda: eng.g1.mul(eng.gen_g1, k))
    row("g2_mul", lambda: c.GenG2.Mul(zr), lambda: eng.g2.mul(eng.gen_g2, k))
    row(
        "pairing2_fexp",
        lambda: c.FExp(c.Pairing2(g2k, c.GenG1, c.GenG2, g1k)),
        lambda: eng.final_exp(
            eng.miller_loop([(eng.gen_g1, raw_g2k), (raw_g1k, eng.gen_g2)])
        ),
    )
    if spec.name not in ("FP256BN",):
        row(
            "hash_to_g1",
            lambda: c.HashToG1(b"benchmark message"),
            lambda: __import__(
                "mathlib_tpu.host.hash_to_curve", fromlist=["get_hasher"]
            ).get_hasher(spec).hash_to_g1(b"benchmark message", b"dst"),
        )
    del k
    return rows


def main(argv: List[str]) -> None:
    from .batch import get_batch_engine
    from .curves.params import get_spec

    curve = argv[1] if len(argv) > 1 else "BLS12_381"
    batch = int(argv[2]) if len(argv) > 2 else 8
    be = get_batch_engine(get_spec(curve))
    for fn in (hash_to_g1, bls_sign, bls_verify, pairing2, pedersen_pok):
        print(json.dumps({"curve": curve, **fn(be, batch)}), flush=True)
    print(json.dumps({"curve": curve, **msm_bench(be, 1 << 16)}), flush=True)
    for r in api_individual_ops(curve):
        print(json.dumps({"curve": curve, **r}), flush=True)


if __name__ == "__main__":
    main(sys.argv)
