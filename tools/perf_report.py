"""Per-kernel speed-of-light report on the real TPU chip.

Measures the hot kernels (Montgomery Fp mul, fused complete point add/
double/dbl-add, MSM phases, Miller loop) and compares each against an
explicit hardware ceiling model for TPU v5e, emitting PERF_REPORT.md.

Ceiling model (documented so the numbers are auditable):
  * All field arithmetic is u32 limb work on the VPU (the MXU only takes
    bf16/int8 operands; 16-bit limb products need exact 32-bit
    accumulation, so matmul offload would need limb-slicing into int8
    with exact carries — future work, ops/kernels/fp_pallas.py keeps the
    product on the VPU where a 16x16->32 multiply is native).
  * v5e VPU: 8 sublanes x 128 lanes x 4 ALU slots/cycle at 1.74 GHz
    ~= 7.13e12 u32 ops/s per core.  One CIOS mont_mul over L limbs costs ~2*L^2 multiplies
    + ~2*L^2 adds (interleaved reduction), i.e. ~4*L^2 VPU ops if every
    op issued perfectly.
  * HBM roofline: 819 GB/s.  A batched mont_mul streams 3 operands of
    4*L bytes per element (in, in, out), so the bandwidth ceiling is
    819e9 / (12*L) elements/s when VMEM-resident compute is fast enough.

Usage: python tools/perf_report.py [--logn 18] (writes PERF_REPORT.md).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_VPU_OPS = 7.13e12  # u32 ALU ops/s/core (8 sublanes*128 lanes*4 slots*1.74GHz)
V5E_HBM = 819e9  # bytes/s


def _time(f, *args, iters=5):
    """Median wall time of a jitted call (compile excluded).

    Includes one host->device dispatch per call — fine for end-to-end
    phases (MSM), NOT for single-kernel rates; use _time_kernel there.
    """
    import numpy as np

    r = f(*args)
    jtree_block(r)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = f(*args)
        jtree_block(r)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _time_kernel(op, args, reps=100, iters=5):
    """Per-invocation device time of a kernel, dispatch amortized.

    Wraps ``reps`` sequential applications of ``op`` in ONE jitted scan
    (the first operand carries the loop-to-loop data dependency, so XLA
    cannot elide or overlap the repetitions), times the whole program,
    subtracts nothing, divides by reps.  Through the axon tunnel a single
    dispatch costs ~1-5 ms — repeating in-graph is the only way to see
    the kernel itself.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    rest = args[1:]

    def body(carry, _):
        return op(carry, *rest), None

    loop = jax.jit(
        lambda x0: jax.lax.scan(body, x0, None, length=reps)[0]
    )
    r = loop(args[0])
    jtree_block(r)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = loop(args[0])
        jtree_block(r)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / reps


def jtree_block(x):
    """Completion barrier with a REAL (tiny) device->host fetch per leaf:
    on the axon serving stack block_until_ready can return before
    execution completes (measured: a 27 ms pairing launch "blocks" in
    0.06 ms), so timings must read data back."""
    import jax
    import numpy as np

    jax.tree_util.tree_map(
        lambda a: np.asarray(a.ravel()[:1])
        if hasattr(a, "addressable_shards")
        else a, x
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=18)
    ap.add_argument("--out", default="PERF_REPORT.md")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from mathlib_tpu.curves.params import get_spec
    from mathlib_tpu.ops.field import get_fp_ctx
    from mathlib_tpu.ops.g1 import get_g1_ctx

    spec = get_spec("BLS12_381")
    fp = get_fp_ctx(spec.p)
    g1 = get_g1_ctx(spec)
    L = fp.L
    dev = jax.devices()[0]
    n = 1 << args.logn
    rng = np.random.default_rng(0)

    rows = []

    def report(name, batch, secs, work_desc, vpu_ops_per_elem, bytes_per_elem):
        rate = batch / secs
        vpu_ceiling = V5E_VPU_OPS / vpu_ops_per_elem
        hbm_ceiling = V5E_HBM / bytes_per_elem
        sol = min(vpu_ceiling, hbm_ceiling)
        bound = "VPU" if vpu_ceiling < hbm_ceiling else "HBM"
        rows.append(
            {
                "kernel": name,
                "batch": batch,
                "rate": rate,
                "work": work_desc,
                "vpu_ceiling": vpu_ceiling,
                "hbm_ceiling": hbm_ceiling,
                "util_vs_sol": rate / sol,
                "bound": bound,
            }
        )
        print(
            f"{name}: {rate:,.0f}/s  ({100 * rate / sol:.1f}% of"
            f" {bound}-bound speed-of-light {sol:,.0f}/s)"
        )

    # ---- Montgomery mul (Pallas CIOS) --------------------------------------
    a = fp.encode([int(x) % spec.p for x in rng.integers(1, 2**63, n)])
    b = fp.encode([int(x) % spec.p for x in rng.integers(1, 2**63, n)])
    t = _time_kernel(fp.mont_mul, (jnp.asarray(a), jnp.asarray(b)))
    # CIOS: L^2 muls for a*b partials, L^2 for the REDC q*p partials, plus
    # ~2L^2 adds/carries => ~4 L^2 VPU ops; 3 arrays of 4L bytes traffic
    report(
        f"mont_mul Fp{spec.p.bit_length()} (L={L})",
        n,
        t,
        "~4L^2 u32 VPU ops/elem",
        4 * L * L,
        12 * L,
    )

    # ---- fused complete point add ------------------------------------------
    m = n // 4
    from mathlib_tpu.host.engine import get_engine

    eng = get_engine(spec)
    base = g1.encode_points(
        [eng.g1.mul(eng.gen_g1, k) for k in (5, 7, 11, 13)]
    )
    P = jnp.tile(jnp.asarray(base), (1, 1, m // 4))
    Q = jnp.roll(P, 1, axis=-1)
    t = _time_kernel(g1.add, (P, Q))
    # RCB complete add: 12 mont_mul + ~29 field add/sub => ~12*4L^2 + 29*2L
    report(
        "fused G1 add (RCB complete)",
        m,
        t,
        "12 mont_mul + 29 add/sub per point",
        12 * 4 * L * L + 29 * 2 * L,
        3 * (12 * L) * 3,  # 3 point operands (P, Q, out) x 3 coords x 4L bytes
    )

    t = _time_kernel(g1.double, (P,))
    report(
        "fused G1 double",
        m,
        t,
        "~7 mont_mul + adds per point",
        7 * 4 * L * L + 20 * 2 * L,
        2 * (12 * L) * 3,
    )

    # ---- MSM phases ---------------------------------------------------------
    from mathlib_tpu.ops.msm import bucket_table, horner_windows, window_totals

    c = int(os.environ.get("MATHLIB_BENCH_C", "16"))
    scalars = jnp.asarray(
        np.frombuffer(
            b"".join(
                (int.from_bytes(rng.bytes(32), "big") % spec.r).to_bytes(
                    2 * g1.fr.L, "little"
                )
                for _ in range(n)
            ),
            np.uint16,
        )
        .reshape(n, g1.fr.L)
        .T.astype(np.uint32)
    )
    pts = jnp.tile(P, (1, 1, n // m))[..., :n]
    bt = jax.jit(lambda p, s: bucket_table(g1, p, s, c))
    t_bt = _time(bt, pts, scalars, iters=3)
    buckets = bt(pts, scalars)
    wt = jax.jit(lambda b_: window_totals(g1, b_, c))
    t_wt = _time(wt, buckets, iters=3)
    totals = wt(buckets)
    hw = jax.jit(lambda t_: horner_windows(g1, t_, c))
    t_hw = _time(hw, totals, iters=3)
    total = t_bt + t_wt + t_hw
    print(
        f"MSM 2^{args.logn} c={c}: {n / total:,.0f} pts/s"
        f" (bucket {t_bt:.2f}s / totals {t_wt:.2f}s / horner {t_hw:.2f}s)"
    )
    rows.append(
        {
            "kernel": f"MSM 2^{args.logn} c={c} (end-to-end phases)",
            "batch": n,
            "rate": n / total,
            "work": f"bucket {t_bt:.2f}s, totals {t_wt:.2f}s, horner {t_hw:.2f}s",
            "vpu_ceiling": None,
            "hbm_ceiling": None,
            "util_vs_sol": None,
            "bound": "mixed",
        }
    )

    # ---- device hash-to-G1 (SSWU map + isogeny + cofactor on device) -------
    from mathlib_tpu.batch import get_batch_engine

    be = get_batch_engine(spec)
    if be._device_hash_ctx() is not None:
        # UNIFORM-length messages take the fully-fused device-XMD path;
        # mixed lengths fall back to host hashing (~3.5x slower) — the
        # serving shape is uniform (nonces, indices, fixed-size ids)
        msgs = [b"perf-%012d" % i for i in range(4096)]
        h = be.hash_to_g1_batch(msgs, b"PERF")
        jtree_block(h)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jtree_block(be.hash_to_g1_batch(msgs, b"PERF"))
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts))
        rows.append(
            {
                "kernel": "hash_to_g1 (fully-fused device XMD+SSWU+iso+cofactor)",
                "batch": len(msgs),
                "rate": len(msgs) / t,
                "work": "2 sswu maps + 11-isogeny + cofactor mul / point",
                "vpu_ceiling": None,
                "hbm_ceiling": None,
                "util_vs_sol": None,
                "bound": "mixed",
            }
        )
        print(f"hash_to_g1 device: {len(msgs) / t:,.0f}/s")

    # ---- fused pairing kernels (whole Miller loop / final exp per launch) --
    # correctness gate: the fused production path (Miller+product kernel
    # + host C++ final exp) must agree with the host engine on a true
    # AND a false verdict before any number is printed.  (The old gate
    # called pairing_batch([P],[Q]) whose 1-lane device final-exp tile
    # compiles pathologically on the serving stack — >25 min observed.)
    eng2 = eng
    P1 = eng2.g1.mul(eng2.gen_g1, 5)
    Q1 = eng2.g2.mul(eng2.gen_g2, 7)
    assert be.pairing_product_is_one(
        [P1, eng2.g1.neg(P1)], [Q1, Q1]
    ) is True, "fused product check != host engine (unity)"
    assert be.pairing_product_is_one(
        [P1, P1], [Q1, Q1]
    ) is False, "fused product check != host engine (non-unity)"

    for npairs in (64, 1024):
        pair_pts = [(P1, Q1), (eng2.g1.neg(P1), Q1)] * (npairs // 2)
        ok = be.pairing_product_is_one(
            [p for p, _ in pair_pts], [q for _, q in pair_pts]
        )
        assert ok
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            be.pairing_product_is_one(
                [p for p, _ in pair_pts], [q for _, q in pair_pts]
            )
            ts.append(time.perf_counter() - t0)
        t = float(np.min(ts))
        # VPU work model per pairing: Miller ~63*(117 + 6/63*83) base muls
        # + fexp/npairs; one L-limb mul ~ 4L^2 u32 ops.  End-to-end wall
        # includes host encode + tunnel dispatch (fixed ~45 ms/call).
        muls_per_pair = 63 * 125 + (5 * 63 * 18 + 2000) / npairs
        rows.append(
            {
                "kernel": f"pairing product check ({npairs} pairs, fused kernels)",
                "batch": npairs,
                "rate": npairs / t,
                "work": "fused Miller kernel + fused final exp + product tree",
                "vpu_ceiling": V5E_VPU_OPS / (muls_per_pair * 4 * L * L),
                "hbm_ceiling": None,
                "util_vs_sol": (npairs / t)
                / (V5E_VPU_OPS / (muls_per_pair * 4 * L * L)),
                "bound": "VPU",
            }
        )
        print(f"pairing product ({npairs}): {npairs / t:,.0f} pairings/s")

    # ---- BN254 product check (fused kernel incl. Frobenius tail, r5) -------
    be_bn = get_batch_engine(get_spec("BN254"))
    engb = be_bn.host
    Pb = engb.g1.mul(engb.gen_g1, 5)
    Qb = engb.g2.mul(engb.gen_g2, 7)
    nPb = engb.g1.neg(Pb)
    assert be_bn.pairing_product_is_one([Pb, nPb], [Qb, Qb]) is True
    assert be_bn.pairing_product_is_one([Pb, Pb], [Qb, Qb]) is False
    npairs = 1024
    bls = [Pb, nPb] * (npairs // 2)
    qls = [Qb] * npairs
    be_bn.pairing_product_is_one(bls, qls)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        be_bn.pairing_product_is_one(bls, qls)
        ts.append(time.perf_counter() - t0)
    t = float(np.min(ts))
    Lb = be_bn.g1.fp.L
    muls_per_pair = 65 * 125 + 2 * 100 / npairs
    rows.append(
        {
            "kernel": "BN254 pairing product check (1024 pairs, fused + tail)",
            "batch": npairs,
            "rate": npairs / t,
            "work": "fused 6x+2 Miller+product kernel incl. Frobenius tail, host C++ final exp",
            "vpu_ceiling": V5E_VPU_OPS / (muls_per_pair * 4 * Lb * Lb),
            "hbm_ceiling": None,
            "util_vs_sol": (npairs / t)
            / (V5E_VPU_OPS / (muls_per_pair * 4 * Lb * Lb)),
            "bound": "VPU",
        }
    )
    print(f"BN254 pairing product (1024): {npairs / t:,.0f} pairings/s")

    # ---- write report -------------------------------------------------------
    with open(args.out, "w") as f:
        f.write("# Per-kernel speed-of-light report (TPU v5e, 1 chip)\n\n")
        f.write(
            "Ceiling model: VPU 7.13e12 u32 ops/s/core "
            "(8 sublanes x 128 lanes x 4 ALU slots x 1.74 GHz), HBM 819 GB/s. "
            "Each row states its work model; utilization = measured rate / "
            "min(VPU ceiling, HBM ceiling).  Single-kernel rows are timed "
            "as 100 in-graph repetitions inside one jit (median of 5 "
            "runs) so the axon-tunnel dispatch latency is amortized away; "
            "the MSM row is a per-phase end-to-end wall time including "
            "one dispatch per phase.  Product-check and hash rows are "
            "SINGLE-CALL walls: they include one tunnel round trip, "
            "whose latency varies with serving-stack load (~25-50 ms "
            "observed round 5) — BENCH_NOTES.md carries the grouped/"
            "pipelined serving rates that amortize it.\n\n"
        )
        f.write("| kernel | batch | rate/s | bound | % of speed-of-light | work model |\n")
        f.write("|---|---|---|---|---|---|\n")
        for r in rows:
            util = (
                f"{100 * r['util_vs_sol']:.1f}%" if r["util_vs_sol"] is not None else "-"
            )
            f.write(
                f"| {r['kernel']} | {r['batch']} | {r['rate']:,.0f} |"
                f" {r['bound']} | {util} | {r['work']} |\n"
            )
        f.write("\nRaw JSON:\n\n```json\n")
        f.write(json.dumps(rows, indent=1, default=str))
        f.write("\n```\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
