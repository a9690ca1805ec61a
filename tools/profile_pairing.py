"""Time the pairing product check strategies on the real TPU.

Strategies (MATHLIB_PAIR_FUSED):
  * hostfexp (default) — device Miller+product kernel, single-element
    final exp + unity on the host C++ engine (~2.1 ms): the device
    final-exp kernel runs a serial dependency chain on ONE Fp12 at
    1/1024 lane occupancy (~40 ms measured round 3).
  * split — device Miller+product kernel, device final-exp kernel.
  * check — monolithic one-launch kernel (Miller + product + final exp
    + unity).

Prints wall ms + pairings/s per strategy at n = 64 and 1024 (the BBS+
verify shapes from BASELINE.json).

Usage: python tools/profile_pairing.py [--json out.json] [--strategies hostfexp,split]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from mathlib_tpu.curves.params import get_spec
from mathlib_tpu.batch import get_batch_engine


def _median_time(fn, reps=5):
    """Median wall time with a REAL device fetch per call: on the axon
    serving stack block_until_ready can return before execution
    completes (experimental platform), so fetching the (tiny) result is
    the only reliable completion barrier."""
    out = np.asarray(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = np.asarray(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def bench(rows, be, strategy: str, n: int, reps: int = 5):
    eng = be.host
    import random

    rng = random.Random(42)
    # pairs multiplying to unity: e(P, Q) * e(-P, Q) * ... so the check
    # exercises the true-accept path
    pairs_g1, pairs_g2 = [], []
    for _ in range(n // 2):
        P = eng.g1.mul(eng.gen_g1, rng.randrange(2, be.spec.r))
        Q = eng.g2.mul(eng.gen_g2, rng.randrange(2, be.spec.r))
        pairs_g1 += [P, eng.g1.neg(P)]
        pairs_g2 += [Q, Q]

    if strategy:
        os.environ["MATHLIB_PAIR_FUSED"] = strategy
    else:
        os.environ.pop("MATHLIB_PAIR_FUSED", None)
    label = strategy or "hostfexp"
    t0 = time.time()
    ok = be.pairing_product_is_one(pairs_g1, pairs_g2)
    t_first = time.time() - t0
    assert ok is True, (label, n)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        ok = be.pairing_product_is_one(pairs_g1, pairs_g2)
        ts.append(time.time() - t0)
    t = float(np.median(ts))
    rows.append(
        {"bench": f"pair_check/{label}/n{n}", "ms": round(t * 1e3, 2),
         "pairings_per_s": round(n / t), "first_s": round(t_first, 1)}
    )
    print(
        f"check {label:9s} n={n:5d}  first {t_first:7.1f}s"
        f"  steady {t*1e3:8.1f} ms  {n/t:10,.0f} pairings/s",
        flush=True,
    )


def bench_stages(rows, be, n: int, reps: int = 5):
    """Per-stage decomposition of the product check at batch n:
    host encode | device Miller+product kernel (marginal, in-graph reps)
    | single dispatch wall | host final exp."""
    import random

    import jax.numpy as jnp

    eng = be.host
    rng = random.Random(42)
    pairs_g1, pairs_g2 = [], []
    for _ in range(n // 2):
        P = eng.g1.mul(eng.gen_g1, rng.randrange(2, be.spec.r))
        Q = eng.g2.mul(eng.gen_g2, rng.randrange(2, be.spec.r))
        pairs_g1 += [P, eng.g1.neg(P)]
        pairs_g2 += [Q, Q]

    # stage: host encode
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        packed = be._encode_pairs(pairs_g1, pairs_g2)
        ts.append(time.perf_counter() - t0)
    t_enc = float(np.median(ts))
    rows.append({"bench": f"stage/encode/n{n}", "ms": round(t_enc * 1e3, 2)})
    print(f"stage encode    n={n:5d}  {t_enc*1e3:8.2f} ms", flush=True)

    # stage: Miller+product kernel, marginal cost via in-graph reps
    bucket = max(128, 1 << (n - 1).bit_length())
    padn = bucket - n
    if padn:
        packed = np.pad(packed, [(0, 0), (0, 0), (0, padn)])
    packd = jnp.asarray(packed)

    def make_loop(R):
        @jax.jit
        def many(a):
            # thread the carry through the kernel INPUT so the scan body
            # is loop-variant and XLA cannot hoist the pallas_call
            def body(c, _):
                av, cv = jax.lax.optimization_barrier((a, c))
                xp, yp, qx, qy = be._pair_split_mont(av + (cv & 0))
                prod = be.pair.product_miller(xp, yp, qx, qy, n)
                return cv + prod.astype(jnp.uint32).sum(), None

            acc, _ = jax.lax.scan(
                body, jnp.uint32(0), None, length=R
            )
            return acc

        return lambda: many(packd)

    t1 = _median_time(make_loop(1))
    t4 = _median_time(make_loop(4))
    t_kernel = (t4 - t1) / 3
    rows.append(
        {"bench": f"stage/miller_prod_kernel/n{n}", "bucket": bucket,
         "ms": round(t_kernel * 1e3, 2),
         "single_dispatch_ms": round(t1 * 1e3, 2)}
    )
    print(
        f"stage kernel    n={n:5d}  {t_kernel*1e3:8.2f} ms marginal"
        f"  (1-rep wall {t1*1e3:.2f} ms, bucket {bucket})",
        flush=True,
    )

    # stage: host final exp on one decoded product
    f = jax.jit(
        lambda a: be.pair.product_miller(*be._pair_split_mont(a), n)
    )
    prod = np.asarray(f(packd))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        ok = be._host_finish_product(prod)
        ts.append(time.perf_counter() - t0)
    assert ok is True
    t_fexp = float(np.median(ts))
    rows.append(
        {"bench": f"stage/host_finish/n{n}", "ms": round(t_fexp * 1e3, 2)}
    )
    print(f"stage hostfexp  n={n:5d}  {t_fexp*1e3:8.2f} ms", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--strategies", default="hostfexp,split")
    ap.add_argument("--sizes", default="64,1024")
    ap.add_argument("--stages", action="store_true")
    ap.add_argument("--curve", default="BLS12_381")
    args = ap.parse_args()
    be = get_batch_engine(get_spec(args.curve))
    rows = []
    for n in [int(s) for s in args.sizes.split(",")]:
        if args.stages:
            bench_stages(rows, be, n)
        for strat in args.strategies.split(","):
            strat = "" if strat == "hostfexp" else strat
            bench(rows, be, strat, n)
    os.environ.pop("MATHLIB_PAIR_FUSED", None)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
