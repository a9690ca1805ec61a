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

    # --- stages -------------------------------------------------------------
    from mathlib_tpu.ops.xmd import hash_to_field_device, pack_b0_blocks

    L = 64
    t0 = time.time()
    blocks0 = pack_b0_blocks(msgs, dst, 2 * L)
    row("host: pack_b0_blocks", time.time() - t0)
    blocks0 = jnp.asarray(blocks0)

    f_xmd = jax.jit(lambda b: hash_to_field_device(fp, b, dst, 2, L))
    t = _time(f_xmd, blocks0)
    row("device: XMD + embed", t)
    u0, u1 = f_xmd(blocks0)
    u0, u1 = jax.device_put(u0), jax.device_put(u1)

    f_sswu = jax.jit(lambda a: ctx.sswu(a, "parity"))
    t = _time(f_sswu, u0)
    row("device: SSWU (one u)", t)

    f_inv = jax.jit(fp.inv)
    t2 = fp.mont_mul(jnp.asarray(ctx.Z), fp.sqr(u0))
    t = _time(f_inv, t2)
    row("device: inv chain (one)", t)

    f_sqrt = jax.jit(fp.sqrt)
    g = jnp.stack([u0, u1], axis=0)
    t = _time(f_sqrt, g)
    row("device: sqrt chain (2-stacked)", t)

    x0, y0 = f_sswu(u0)
    x1, y1 = jax.jit(lambda a: ctx.sswu(a, "parity"))(u1)
    f_iso = jax.jit(
        lambda a, b, c, d: ctx.g1.add(ctx.iso_project(a, b), ctx.iso_project(c, d))
    )
    t = _time(f_iso, x0, y0, x1, y1)
    row("device: isogeny x2 + add", t)

    P = f_iso(x0, y0, x1, y1)
    f_cof = jax.jit(ctx.clear_cofactor)
    t = _time(f_cof, P)
    row("device: cofactor ladder", t)

    if args.json:
        with open(args.json, "w") as f:
            json.dump({"batch": n, "rows": rows}, f, indent=1)


if __name__ == "__main__":
    main()
