"""A/B the MSM combiner kernels (serial vs sublane-stacked muls) and the
in-kernel DMA gather vs XLA's row gather, on the real TPU.

VERDICT round-3 task 2: lift add_select from 24% toward >=50% of VPU
speed-of-light and attack the 12.2 ns/row gather issue floor.  This
script measures, in order:

  1. maddsel kernel serial vs stacked.  Timing is the MARGINAL cost per
     in-graph repetition — t(100 reps) - t(10 reps) over 90 — so the
     ~24 ms fixed axon-tunnel dispatch cost cancels exactly (measured:
     a single 8192-point launch is 23.8 ms wall, of which ~0.12 ms is
     the kernel).  The two strategies must also agree bitwise.
  2. in-kernel DMA gather vs XLA take() at MSM shapes (128-word rows:
     Mosaic requires HBM slices lane-aligned, and XLA pads a 64-word
     table to 128 lanes anyway, so 128 is what both paths truly move).
  3. end-to-end MSM 2^20 under both kernel strategies.

Usage: python tools/profile_stacked.py [--quick] [--json out.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from mathlib_tpu.curves.params import get_spec
from mathlib_tpu.host.engine import get_engine
from mathlib_tpu.ops.g1 import get_g1_ctx

SPEC = get_spec("BLS12_381")


def _median_time(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _marginal_time(make_loop, lo=10, hi=100):
    """Per-rep device time of an in-graph repeated kernel, fixed dispatch
    cost cancelled: (t[hi reps] - t[lo reps]) / (hi - lo)."""
    t_lo = _median_time(make_loop(lo))
    t_hi = _median_time(make_loop(hi))
    return (t_hi - t_lo) / (hi - lo)


def bench_combiner(rows):
    """maddsel (the production MSM combiner) serial vs stacked."""
    from mathlib_tpu.ops.kernels import g1_pallas as gp

    g1 = get_g1_ctx(SPEC)
    eng = get_engine(SPEC)
    p, L, b3 = SPEC.p, g1.fp.L, g1.F.b3
    n = 65536
    rng = np.random.default_rng(1)
    # random multiples of G encoded projective + affine
    base = [eng.g1.mul(eng.gen_g1, int(k)) for k in rng.integers(1, 2**31, 8)]
    pts = [base[i % 8] for i in range(n)]
    P = jnp.asarray(g1.encode_points(pts))
    Qa = jnp.asarray(g1.encode_points_affine(pts[::-1]))
    sel = jnp.asarray(rng.integers(0, 2, n, dtype=np.uint32).astype(bool))

    P3, restore = gp._to_tiles(P)
    Q3 = gp._to_tiles_affine(
        jnp.broadcast_to(Qa, P.shape[:-3] + (2,) + P.shape[-2:])
    )
    s3 = gp._sel_tiles(sel, P)

    outs = {}
    for stacked in (False, True):
        builder = gp._build(p, L, b3, "maddsel", stacked, False)

        def make_loop(R, b=builder):
            @jax.jit
            def many(P3, Q3, s3):
                def body(c, _):
                    return b(c, Q3, s3), None

                out, _ = jax.lax.scan(body, P3, None, length=R)
                return out

            return lambda: many(P3, Q3, s3)

        outs[stacked] = np.asarray(builder(P3, Q3, s3))
        t = _marginal_time(make_loop)
        rate = n / t
        label = "stacked" if stacked else "serial"
        # SoL model: 11 mont_mul (2L^2+L native mults + ~2L^2 shifts/masks
        # + ~4L^2 adds) + ~25 add/sub (7L each) per point
        vpu_ops = 11 * (8 * L * L + L) + 25 * 7 * L
        ceil = 7.13e12 / vpu_ops
        rows.append(
            {
                "bench": f"maddsel/{label}",
                "n": n,
                "ms": round(t * 1e3, 3),
                "rate": round(rate),
                "pct_sol": round(100 * rate / ceil, 1),
            }
        )
        print(
            f"maddsel {label:8s} {t*1e3:8.3f} ms  {rate:12,.0f} pts/s"
            f"  ({100*rate/ceil:.1f}% of VPU SoL)",
            flush=True,
        )
    same = bool(np.array_equal(outs[False], outs[True]))
    rows.append({"bench": "maddsel/strategies_agree", "equal": same})
    print(f"serial == stacked bitwise: {same}", flush=True)


def bench_gather(rows):
    """XLA row gather vs in-kernel DMA gather at the MSM scan shape."""
    from mathlib_tpu.ops.kernels.gather_pallas import gather_rows_pallas

    N, Wr = 1 << 20, 128  # XLA pads 64/72-word rows to 128 lanes in HBM
    M = 1 << 17  # idx rides in SMEM (1 MB cap): 2^17 x 4B = 512 KB
    rng = np.random.default_rng(2)
    table = jnp.asarray(rng.integers(0, 2**32, (N, Wr), dtype=np.uint32))
    idx = jnp.asarray(rng.integers(0, N, (M,), dtype=np.int32))

    xla = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    t = _median_time(xla, table, idx)
    rows.append(
        {"bench": "gather/xla", "rows": M, "ms": round(t * 1e3, 2),
         "ns_per_row": round(t / M * 1e9, 2)}
    )
    print(f"gather XLA      {t*1e3:8.2f} ms  {t/M*1e9:6.2f} ns/row", flush=True)

    for blk in (256, 1024):
        try:
            fn = jax.jit(lambda t_, i_, b=blk: gather_rows_pallas(t_, i_, blk=b))
            t = _median_time(fn, table, idx)
            got = np.asarray(fn(table, idx)[:256])
            want = np.asarray(table)[np.asarray(idx)[:256]]
            ok = bool(np.array_equal(got, want))
        except Exception as e:
            rows.append({"bench": f"gather/dma_blk{blk}", "error": repr(e)[:200]})
            print(f"gather DMA b{blk}: UNSUPPORTED ({e!r})"[:160], flush=True)
            continue
        rows.append(
            {"bench": f"gather/dma_blk{blk}", "rows": M,
             "ms": round(t * 1e3, 2), "ns_per_row": round(t / M * 1e9, 2),
             "correct": ok}
        )
        print(
            f"gather DMA b{blk:<5d}{t*1e3:8.2f} ms  {t/M*1e9:6.2f} ns/row"
            f"  correct={ok}",
            flush=True,
        )

    # XLA gather + the dense transpose the scan pays today (the full
    # baseline the transposing DMA would replace)
    xla_t = jax.jit(lambda t_, i_: jnp.take(t_, i_, axis=0).T.copy())
    t = _median_time(xla_t, table, idx)
    rows.append(
        {"bench": "gather/xla+transpose", "rows": M, "ms": round(t * 1e3, 2),
         "ns_per_row": round(t / M * 1e9, 2)}
    )
    print(f"gather XLA+T    {t*1e3:8.2f} ms  {t/M*1e9:6.2f} ns/row", flush=True)

    from mathlib_tpu.ops.kernels.gather_pallas import gather_rows_t_pallas

    for blk in (256, 1024):
        try:
            fn = jax.jit(
                lambda t_, i_, b=blk: gather_rows_t_pallas(t_, i_, blk=b)
            )
            t = _median_time(fn, table, idx)
            got = np.asarray(fn(table, idx)[:, :256])
            want = np.asarray(table)[np.asarray(idx)[:256]].T
            ok = bool(np.array_equal(got, want))
        except Exception as e:  # strided-dst DMA may be rejected by Mosaic
            rows.append(
                {"bench": f"gather/dmaT_blk{blk}", "error": repr(e)[:200]}
            )
            print(f"gather DMA-T b{blk}: UNSUPPORTED ({e!r})"[:160], flush=True)
            continue
        rows.append(
            {"bench": f"gather/dmaT_blk{blk}", "rows": M,
             "ms": round(t * 1e3, 2), "ns_per_row": round(t / M * 1e9, 2),
             "correct": ok}
        )
        print(
            f"gather DMA-T b{blk:<4d}{t*1e3:8.2f} ms  {t/M*1e9:6.2f} ns/row"
            f"  correct={ok}",
            flush=True,
        )


def bench_msm(rows, n_log2=20):
    """End-to-end device MSM under both combiner strategies.

    Mirrors bench.py: pre-encoded device arrays, timed jitted msm() only
    (the host bridge's Python encode loop would otherwise dominate)."""
    from mathlib_tpu.ops.msm import msm

    g1 = get_g1_ctx(SPEC)
    n = 1 << n_log2
    rng = np.random.default_rng(3)

    def rand_scalars(count):
        ks = [int.from_bytes(rng.bytes(32), "big") % SPEC.r for _ in range(count)]
        buf = b"".join(k.to_bytes(2 * g1.fr.L, "little") for k in ks)
        return (
            np.frombuffer(buf, np.uint16)
            .reshape(count, g1.fr.L)
            .T.astype(np.uint32)
        )

    nbase = min(n, 8192)
    base = jax.jit(g1.scalar_mul)(
        jnp.asarray(g1.gen), jnp.asarray(rand_scalars(nbase))
    )
    reps = -(-n // nbase)
    points = jnp.tile(base, (1, 1, reps))[..., :n]
    scalars = jnp.asarray(rand_scalars(n))

    for stacked in ("0", "1"):
        os.environ["MATHLIB_G1_STACKED"] = stacked
        # the strategy is read at trace time inside the kernel builders;
        # a fresh jit wrapper forces a retrace under the new env
        f = jax.jit(lambda p, s: msm(g1, p, s, c=16, K=64))
        t0 = time.time()
        out = np.asarray(f(points, scalars))
        t_first = time.time() - t0
        ts = []
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(f(points, scalars))
            ts.append(time.time() - t0)
        t = float(np.median(ts))
        label = "stacked" if stacked == "1" else "serial"
        rows.append(
            {"bench": f"msm2^{n_log2}/{label}", "s": round(t, 3),
             "pts_per_s": round(n / t)}
        )
        print(
            f"MSM 2^{n_log2} {label:8s} first {t_first:6.1f}s"
            f" steady {t:6.3f}s  {n/t:12,.0f} pts/s",
            flush=True,
        )
    os.environ.pop("MATHLIB_G1_STACKED", None)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--json", default=None)
    ap.add_argument("--skip-msm", action="store_true")
    args = ap.parse_args()
    rows = []
    bench_combiner(rows)
    bench_gather(rows)
    if not args.skip_msm and not args.quick:
        bench_msm(rows)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
