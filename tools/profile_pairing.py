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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--strategies", default="hostfexp,split")
    ap.add_argument("--sizes", default="64,1024")
    args = ap.parse_args()
    be = get_batch_engine(get_spec("BLS12_381"))
    rows = []
    for n in [int(s) for s in args.sizes.split(",")]:
        for strat in args.strategies.split(","):
            strat = "" if strat == "hostfexp" else strat
            bench(rows, be, strat, n)
    os.environ.pop("MATHLIB_PAIR_FUSED", None)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
