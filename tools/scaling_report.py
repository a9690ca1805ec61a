"""Multi-chip scaling report for the sharded MSM strategies.

Runs both parallel/msm.py reduction strategies over virtual CPU meshes of
1/2/4/8 devices at a fixed global problem size (strong scaling) and a
fixed per-device size (weak scaling), and emits SCALING.md with:

  * measured wall times (virtual mesh — structural validation: the same
    SPMD programs run unchanged on a v5e/v5p slice; absolute CPU numbers
    are NOT TPU predictions),
  * the analytic collective-payload model for both strategies on real
    ICI, which is what actually decides the crossover.

Payload model per all-reduce step (ring/butterfly, P = bytes per point):
  point-parallel  : log2(D) steps x 1 point        -> ~log2(D) * P bytes
  bucket-parallel : log2(D) steps x W*2^c points   -> ~log2(D) * W*2^c * P
with the bucket-parallel tail (weighted bucket sum, O(W*2^c) point adds)
running D-way parallel instead of replicated.  On v5e ICI (~45 GB/s/link
bidirectional, 2D torus) a (W=16, c=8) table is 16*256*288 B ~= 1.2 MB
per step — microseconds — while the replicated tail it removes is ~4k
point adds; bucket-parallel wins whenever the tail dominates, i.e. small
N per device or large c.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
       python tools/scaling_report.py [--out SCALING.md]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SCALING.md")
    ap.add_argument("--n-per-dev", type=int, default=64)
    ap.add_argument("--c", type=int, default=4)
    args = ap.parse_args()

    import jax

    # must run before any backend initialization (jax.devices() etc.):
    # the sandbox presets JAX_PLATFORMS=axon at import time
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import numpy as np

    from mathlib_tpu.curves.params import get_spec
    from mathlib_tpu.host.engine import get_engine
    from mathlib_tpu.ops.g1 import get_g1_ctx
    from mathlib_tpu.parallel.msm import (
        make_mesh,
        sharded_msm,
        sharded_msm_buckets,
    )

    spec = get_spec("BLS12_381")
    g1 = get_g1_ctx(spec)
    eng = get_engine(spec)
    rng = np.random.default_rng(3)

    def inputs(n):
        ks = [int.from_bytes(rng.bytes(8), "big") for _ in range(n)]
        pts = g1.encode_points([eng.g1.mul(eng.gen_g1, k) for k in ks])
        scs = np.asarray(
            g1.encode_scalars(
                [int.from_bytes(rng.bytes(8), "big") for _ in range(n)]
            )
        )
        return pts, scs

    ndevs = [d for d in (1, 2, 4, 8) if d <= len(jax.devices())]
    results = []
    nmax = args.n_per_dev * max(ndevs)
    pts_all, scs_all = inputs(nmax)

    for strategy, fn in (
        ("point-parallel", sharded_msm),
        ("bucket-parallel", sharded_msm_buckets),
    ):
        for mode in ("strong", "weak"):
            for d in ndevs:
                n = nmax if mode == "strong" else args.n_per_dev * d
                mesh = make_mesh(d)
                f = jax.jit(
                    lambda p, s, fn=fn, mesh=mesh: fn(g1, p, s, mesh, c=args.c)
                )
                p, s = pts_all[..., :n], scs_all[..., :n]
                r = f(p, s)
                r.block_until_ready()  # compile
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    f(p, s).block_until_ready()
                    ts.append(time.perf_counter() - t0)
                dt = min(ts)
                results.append(
                    {
                        "strategy": strategy,
                        "mode": mode,
                        "devices": d,
                        "n": n,
                        "ms": round(1e3 * dt, 1),
                        "pts_per_sec": round(n / dt),
                    }
                )
                print(results[-1])

    with open(args.out, "w") as f:
        f.write("# Multi-chip scaling report (virtual CPU mesh)\n\n")
        f.write(__doc__.split("Usage:")[0])
        f.write("\n\n## Measurements\n\n")
        f.write("| strategy | mode | devices | n | ms | pts/s |\n|---|---|---|---|---|---|\n")
        for r in results:
            f.write(
                f"| {r['strategy']} | {r['mode']} | {r['devices']} |"
                f" {r['n']} | {r['ms']} | {r['pts_per_sec']} |\n"
            )
        f.write("\n## Efficiency\n\n")
        for strategy in ("point-parallel", "bucket-parallel"):
            base = next(
                r
                for r in results
                if r["strategy"] == strategy
                and r["mode"] == "strong"
                and r["devices"] == 1
            )
            f.write(f"**{strategy}** strong-scaling speedup vs 1 device: ")
            f.write(
                ", ".join(
                    f"{r['devices']}x: {base['ms'] / r['ms']:.2f}"
                    for r in results
                    if r["strategy"] == strategy and r["mode"] == "strong"
                )
                + "\n\n"
            )
        f.write("\nRaw JSON:\n\n```json\n")
        f.write(json.dumps(results, indent=1))
        f.write("\n```\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
