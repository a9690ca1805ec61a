"""Per-stage hash-to-G1 profile on the real TPU (VERDICT r3 weak #5).

Times each stage of the device hash pipeline separately so PERF_REPORT.md
can carry a per-stage table: XMD+embed, SSWU (incl. its inv+sqrt chains),
isogeny+add, cofactor ladder, and the fused end-to-end program; plus
hash_to_g2 and the BBS big-endian variant end-to-end rates.

Usage: python tools/profile_hash.py [--batch 4096] [--json out.json]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax


def _fetch(x):
    """Completion barrier with a REAL (tiny) device->host fetch: on the
    axon serving stack block_until_ready can return before execution
    completes, so timings must read data back."""
    import numpy as _np

    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "addressable_shards"):
            _np.asarray(leaf.ravel()[:1])
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from mathlib_tpu.curves.params import get_spec
from mathlib_tpu.ops.hash import (
    get_hash_g1_ctx,
    hash_to_g1_batch,
    hash_to_g1_bbs_batch,
    hash_to_g2_batch,
)


def _time(fn, *args, reps=10):
    out = fn(*args)
    _fetch(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        _fetch(out)
        ts.append(time.time() - t0)
    return float(np.median(ts))


def _marginal(stage_fn, x, reps=4, iters=5):
    """MARGINAL device cost of one application of stage_fn: wraps
    ``reps`` data-dependent applications in one jit (optimization
    barrier keeps XLA from hoisting), times 1-rep vs reps-rep programs,
    divides the difference.  A single `_time` call would charge every
    stage the full ~29 ms tunnel round trip (VERDICT r4 weak #5: the
    per-stage rows summed to 4x the end-to-end wall)."""
    import jax

    def make(R):
        @jax.jit
        def many(a):
            def body(c, _):
                av, cv = jax.lax.optimization_barrier((a, c))
                out = stage_fn(av)
                leaves = jax.tree_util.tree_leaves(out)
                # full-sum consumer: keeps every lane live (a 1-element
                # slice would let XLA dead-code-eliminate the rest)
                s = sum(l.astype(jnp.uint32).sum() for l in leaves)
                return cv + s, None

            acc, _ = jax.lax.scan(body, jnp.uint32(0), None, length=R)
            return acc

        return lambda: many(x)

    t1 = _time(make(1), reps=iters)
    tr = _time(make(reps), reps=iters)
    return (tr - t1) / (reps - 1), t1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    n = args.batch

    spec = get_spec("BLS12_381")
    ctx = get_hash_g1_ctx(spec)
    fp = ctx.fp
    dst = b"QUUX-V01-CS02-with-BLS12381G1_XMD:SHA-256_SSWU_RO_"
    msgs = [i.to_bytes(8, "big") * 4 for i in range(n)]

    rows = []

    def row(stage, dt, per="hash"):
        rate = n / dt
        rows.append({"stage": stage, "ms": round(dt * 1e3, 2), "rate": round(rate)})
        print(f"{stage:32s} {dt*1e3:9.2f} ms   {rate:12,.0f} /s", flush=True)

    # --- full pipelines (the headline rates) --------------------------------
    def try_row(stage, fn):
        try:
            row(stage, _time(fn))
        except Exception as e:
            rows.append({"stage": stage, "error": repr(e)[:300]})
            print(f"{stage}: FAILED {e!r}"[:200], flush=True)

    try_row("hash_to_g1 end-to-end", lambda: hash_to_g1_batch(spec, msgs, dst))
    try_row(
        "hash_to_g1 BBS end-to-end",
        lambda: hash_to_g1_bbs_batch(spec, msgs, dst),
    )
    try_row("hash_to_g2 end-to-end", lambda: hash_to_g2_batch(spec, msgs, dst))

    # --- pipelined serving throughput ---------------------------------------
    # successive batches submitted without per-call blocking: the device
    # computes batch i+1 while the host packs and fetches batch i — the
    # steady serving rate once the ~29 ms tunnel round trip is amortized
    from mathlib_tpu.ops.xmd import hash_to_field_device, pack_b0_blocks

    L = 64
    blocks_np = pack_b0_blocks(msgs, dst, 2 * L)
    from mathlib_tpu.ops.hash import _JIT_CACHE

    if True:
        fused = lambda _ignored: hash_to_g1_batch(spec, msgs, dst)
        R = 8

        def pipeline(full_fetch):
            """Steady-state ms/call with R calls in flight.

            full_fetch=False: completion barrier only — the consumer is
            ON DEVICE (bls_sign_batch feeds these points straight into
            the scalar-mul ladder; no point bytes cross the tunnel).
            full_fetch=True: every output pulled to host, with
            copy_to_host_async overlapping the ~1.2 MB fetch of call i
            with the kernel of call i+1 — the rate when the caller
            wants host-side bytes for every point."""
            def submit():
                dev = fused(blocks_np)
                if full_fetch:
                    try:
                        dev.copy_to_host_async()
                    except AttributeError:
                        pass
                return dev

            def drain(dev):
                return np.asarray(dev) if full_fetch else _fetch(dev)

            outs = [submit() for _ in range(2)]
            [drain(o) for o in outs]
            ts = []
            for _ in range(3):
                t0 = time.time()
                pend = None
                for _i in range(R):
                    dev = submit()
                    if pend is not None:
                        drain(pend)
                    pend = dev
                drain(pend)
                ts.append((time.time() - t0) / R)
            return float(np.median(ts))

        row("hash_to_g1 pipelined (device consumer)", pipeline(False))
        row("hash_to_g1 pipelined (full host fetch)", pipeline(True))

    # --- stages of the SHIPPED fused program (marginal, in-graph reps) ------
    t0 = time.time()
    blocks0 = pack_b0_blocks(msgs, dst, 2 * L)
    row("host: pack_b0_blocks", time.time() - t0)
    blocks0 = jnp.asarray(blocks0)

    def stage(label, fn, x):
        m, wall1 = _marginal(fn, x)
        rows.append(
            {"stage": label, "marginal_ms": round(m * 1e3, 2),
             "one_dispatch_ms": round(wall1 * 1e3, 2)}
        )
        print(
            f"{label:32s} {m*1e3:9.2f} ms marginal"
            f"   (1-dispatch wall {wall1*1e3:.2f} ms)",
            flush=True,
        )

    stage(
        "device: XMD + embed",
        lambda b: hash_to_field_device(fp, b, dst, 2, L),
        blocks0,
    )
    u0, u1 = jax.jit(lambda b: hash_to_field_device(fp, b, dst, 2, L))(blocks0)

    stage("device: SSWU (one u)", lambda a: ctx.sswu(a, "parity"), u0)

    t2 = fp.mont_mul(jnp.asarray(ctx.Z), fp.sqr(u0))
    stage("device: inv chain (one)", fp.inv, t2)

    g = jnp.stack([u0, u1], axis=0)
    stage("device: sqrt chain (2-stacked)", fp.sqrt, g)

    f_sswu = jax.jit(lambda a: ctx.sswu(a, "parity"))
    x0, y0 = f_sswu(u0)
    x1, y1 = f_sswu(u1)
    stage(
        "device: isogeny x2 + add",
        lambda t4: ctx.g1.add(
            ctx.iso_project(t4[0], t4[1]), ctx.iso_project(t4[2], t4[3])
        ),
        jnp.stack([x0, y0, x1, y1], axis=0),
    )

    P = jax.jit(
        lambda a, b, c, d: ctx.g1.add(ctx.iso_project(a, b), ctx.iso_project(c, d))
    )(x0, y0, x1, y1)
    stage("device: cofactor ladder", ctx.clear_cofactor, P)

    stage(
        "device: WHOLE fused program",
        lambda b: ctx.hash_to_g1(
            *hash_to_field_device(fp, b, dst, 2, L), "parity"
        ),
        blocks0,
    )

    if args.json:
        with open(args.json, "w") as f:
            json.dump({"batch": n, "rows": rows}, f, indent=1)


if __name__ == "__main__":
    main()
