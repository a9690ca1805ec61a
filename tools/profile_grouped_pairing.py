"""Grouped pairing product checks on the real TPU: the serving metric.

pairing_product_is_one pays a fixed ~29 ms tunnel round trip per call
(measured round 5: tiny dispatch+fetch RTT), so a synchronous single
check can never beat ~30 ms wall regardless of kernel speed.  The
serving shape of BBS+/BLS verification is MANY independent checks;
``BatchEngine.pairing_products_are_one`` runs G checks of S pairs each
as ONE dispatch (segmented Miller products + batched device final exp +
unity compare for BLS12; host C++ final exps for BN254).

Prints, per (curve, S, G):
  * one-call wall (encode + transfer + kernels + fetch of G bools),
  * per-check latency and pairings/s,
  * pipelined throughput over R in-flight calls (the steady serving rate).

Correctness is asserted before any timing: group verdicts must match
per-group host-engine expectations (alternating unity / non-unity
groups).

Usage: python tools/profile_grouped_pairing.py [--json out.json]
       [--configs BLS12_381:64:16,BLS12_381:1024:8,BN254:64:8]
"""

import argparse
import json
import os
import random
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from mathlib_tpu.curves.params import get_spec
from mathlib_tpu.batch import get_batch_engine


def make_groups(be, S: int, G: int, seed: int = 42):
    """G groups of S pairs; even groups multiply to 1, odd groups don't."""
    eng = be.host
    rng = random.Random(seed)
    base_p = eng.g1.mul(eng.gen_g1, rng.randrange(2, be.spec.r))
    base_q = eng.g2.mul(eng.gen_g2, rng.randrange(2, be.spec.r))
    neg_p = eng.g1.neg(base_p)
    g1s, g2s, want = [], [], []
    for k in range(G):
        if k % 2 == 0:  # unity: e(P,Q) e(-P,Q) e(P,Q) e(-P,Q) ...
            for i in range(S):
                g1s.append(base_p if i % 2 == 0 else neg_p)
                g2s.append(base_q)
            want.append(True)
        else:  # e(P,Q)^S != 1
            g1s += [base_p] * S
            g2s += [base_q] * S
            want.append(False)
    return g1s, g2s, want


def bench_cfg(rows, curve: str, S: int, G: int, reps: int = 5, pipeline: int = 8):
    be = get_batch_engine(get_spec(curve))
    g1s, g2s, want = make_groups(be, S, G)

    t0 = time.time()
    got = be.pairing_products_are_one(g1s, g2s, S)
    t_first = time.time() - t0
    assert got == want, (curve, S, G, got[:8], want[:8])

    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        got = be.pairing_products_are_one(g1s, g2s, S)
        ts.append(time.perf_counter() - t0)
    assert got == want
    t = float(np.median(ts))

    # pipelined: the serving loop.  Device executes call i+1's segmented
    # Miller kernel while the host final-exponentiates call i's products
    # (thread pool, ctypes releases the GIL); per-call cost approaches
    # max(device time, host time) instead of their sum.
    n = len(g1s)
    bucket = max(128, 1 << (n - 1).bit_length())
    packed = be._encode_pairs(g1s, g2s)
    padn = bucket - n
    if padn:
        packed = np.pad(packed, [(0, 0), (0, 0), (0, padn)])
    f = be._jit.get(("pair_products", S, bucket))
    t_pipe = None
    if f is not None:
        from concurrent.futures import ThreadPoolExecutor

        def resolve(dev):
            vals = be.tw.f12_decode(np.asarray(dev))[:G]
            with ThreadPoolExecutor(max_workers=4) as pool:
                got = list(
                    pool.map(
                        lambda v: bool(
                            be.host.gt_is_one(be.host.final_exp(v))
                        ),
                        vals,
                    )
                )
            assert got == want
            return got

        def submit():
            dev = f(packed, n)
            try:
                dev.copy_to_host_async()  # overlap the fetch round trip
            except AttributeError:
                pass
            return dev

        resolve(submit())  # warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            pending = None
            for _i in range(pipeline):
                dev = submit()
                if pending is not None:
                    resolve(pending)
                pending = dev
            resolve(pending)
            ts.append((time.perf_counter() - t0) / pipeline)
        t_pipe = float(np.median(ts))

    npairs = S * G
    row = {
        "bench": f"grouped_check/{curve}/S{S}xG{G}",
        "first_s": round(t_first, 1),
        "wall_ms": round(t * 1e3, 2),
        "ms_per_check": round(t * 1e3 / G, 3),
        "pairings_per_s": round(npairs / t),
        "pipelined_ms_per_call": (
            round(t_pipe * 1e3, 2) if t_pipe is not None else None
        ),
        "pipelined_pairings_per_s": (
            round(npairs / t_pipe) if t_pipe is not None else None
        ),
    }
    rows.append(row)
    print(
        f"{curve:10s} S={S:5d} G={G:3d}  first {t_first:6.1f}s"
        f"  wall {t*1e3:8.1f} ms  {t*1e3/G:7.2f} ms/check"
        f"  {npairs/t:10,.0f} pairings/s"
        + (
            f"  | pipelined {t_pipe*1e3:7.1f} ms/call"
            f" {npairs/t_pipe:10,.0f} pairings/s"
            if t_pipe is not None
            else ""
        ),
        flush=True,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument(
        "--configs",
        default="BLS12_381:64:16,BLS12_381:1024:8,BN254:64:8",
    )
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    rows = []
    for cfg in args.configs.split(","):
        curve, S, G = cfg.split(":")
        bench_cfg(rows, curve, int(S), int(G), reps=args.reps)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
