"""Decompose the MSM bucket-scan step cost on the real TPU.

BENCH_NOTES attributes ~4.7 ms/step to the fused add_select kernel and
~1 ms/step to gather+transposes+emit at bandwidth, leaving ~7 ms/step
unexplained (scan-carry buffering / scheduling).  This tool times scan
variants that each drop one piece of the body, so the gap can be pinned
to a specific operation instead of guessed at.

Variants (all K steps over the same (W*C)-lane state):
  full        gather rows -> transpose -> add_select -> emit transpose (prod)
  no_emit     same body, scan emits nothing (carry only)
  no_gather   add_select on resident lane-major points (no gather/transpose)
  gather_only gather + transpose, carry passthrough (no kernel)
  emit_only   carry passthrough, emit transpose of carry
  kernel_flat K back-to-back add_select on resident data, no scan carry I/O

Run: LOGN=20 C=16 python tools/profile_scan_step.py
"""

import os
import sys
import time

import jax


def _fetch(x):
    """Real tiny-fetch completion barrier (block_until_ready can return
    early on the axon stack)."""
    import numpy as _np

    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "addressable_shards"):
            _np.asarray(leaf.ravel()[:1])
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from mathlib_tpu.curves.params import get_spec
from mathlib_tpu.ops.g1 import get_g1_ctx


def timed(label, fn, *args, reps=3):
    out = fn(*args)
    _fetch(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        _fetch(out)
        ts.append(time.time() - t0)
    K = int(os.environ.get("K", "64"))
    print(f"{label:14s} {min(ts)*1e3:9.1f} ms   ({min(ts)*1e3/K:6.2f} ms/step)")
    return out


def main():
    logn = int(os.environ.get("LOGN", "20"))
    c = int(os.environ.get("C", "16"))
    K = int(os.environ.get("K", "64"))
    n = 1 << logn
    spec = get_spec("BLS12_381")
    g1 = get_g1_ctx(spec)
    L = g1.fp.L
    R = 3 * L
    nwin = -(-g1.nbits // c)
    W = nwin
    C = n // K
    lanes = W * C
    rng = np.random.default_rng(0)

    print(f"n=2^{logn} c={c} K={K}  W={W} C={C}  lanes/step={lanes}")

    # resident inputs
    points_rows = jnp.asarray(
        rng.integers(0, 1 << 16, size=(n, R), dtype=np.uint32)
    )
    keys_t = jnp.asarray(
        np.sort(rng.integers(0, 1 << c, size=(K, lanes), dtype=np.uint32), axis=0)
    )
    order_t = jnp.asarray(
        rng.integers(0, n, size=(K, lanes), dtype=np.uint32)
    )
    resident_p = jnp.asarray(
        rng.integers(0, 1 << 16, size=(K, 3, L, lanes), dtype=np.uint32)
    )

    init = (
        jnp.full((lanes,), 0xFFFFFFFF, jnp.uint32),
        jnp.broadcast_to(jnp.asarray(g1.inf), (3, L, lanes)),
    )

    def full(keys_t, order_t, prows):
        def body(carry, x):
            ck, cp = carry
            k, o = x
            run = g1.add_select(cp, prows[o].T.reshape(3, L, lanes), k == ck)
            return (k, run), run.reshape(R, lanes).T

        (_, fin), ys = jax.lax.scan(body, init, (keys_t, order_t))
        return fin, ys[-1, 0]

    def no_emit(keys_t, order_t, prows):
        def body(carry, x):
            ck, cp = carry
            k, o = x
            run = g1.add_select(cp, prows[o].T.reshape(3, L, lanes), k == ck)
            return (k, run), None

        (_, fin), _ = jax.lax.scan(body, init, (keys_t, order_t))
        return fin

    def no_gather(keys_t, resident_p):
        def body(carry, x):
            ck, cp = carry
            k, p = x
            run = g1.add_select(cp, p, k == ck)
            return (k, run), None

        (_, fin), _ = jax.lax.scan(body, init, (keys_t, resident_p))
        return fin

    def gather_only(keys_t, order_t, prows):
        def body(carry, x):
            ck, cp = carry
            k, o = x
            p = prows[o].T.reshape(3, L, lanes)
            # cheap combine so the gather isn't dead code
            run = jnp.bitwise_xor(cp, p)
            return (k, run), None

        (_, fin), _ = jax.lax.scan(body, init, (keys_t, order_t))
        return fin

    def emit_only(keys_t, resident_p):
        def body(carry, x):
            ck, cp = carry
            k, p = x
            run = jnp.bitwise_xor(cp, p)
            return (k, run), run.reshape(R, lanes).T

        (_, fin), ys = jax.lax.scan(body, init, (keys_t, resident_p))
        return fin, ys[-1, 0]

    def kernel_flat(p0, sel):
        acc = init[1]
        for i in range(K):
            acc = g1.add_select(acc, p0, sel)
        return acc

    sel = jnp.asarray(rng.integers(0, 2, size=(lanes,), dtype=np.uint32) != 0)
    p0 = resident_p[0]

    timed("kernel_flat", jax.jit(kernel_flat), p0, sel)
    timed("no_gather", jax.jit(no_gather), keys_t, resident_p)
    timed("no_emit", jax.jit(no_emit), keys_t, order_t, points_rows)
    timed("gather_only", jax.jit(gather_only), keys_t, order_t, points_rows)
    timed("emit_only", jax.jit(emit_only), keys_t, resident_p)
    timed("full", jax.jit(full), keys_t, order_t, points_rows)


if __name__ == "__main__":
    main()
