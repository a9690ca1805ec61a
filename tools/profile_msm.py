"""Stage-by-stage MSM profiling on the real TPU (PERF_REPORT.md source).

Times each phase of the Pippenger pipeline separately by compiling staged
sub-programs, so the per-phase budget and the distance to speed-of-light
can be reported per kernel.
"""

import os
import sys
import time

import jax
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
from mathlib_tpu.ops import msm as M


def _block(x):
    """Completion barrier with a REAL (tiny) fetch per leaf: on the axon
    serving stack block_until_ready can return before execution completes
    (commit 23057c1), so timings must read data back."""
    jax.tree_util.tree_map(
        lambda a: np.asarray(a.ravel()[:1])
        if hasattr(a, "addressable_shards")
        else a,
        x,
    )


def timed(label, fn, *args, reps=3):
    out = fn(*args)
    _block(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        _block(out)
        ts.append(time.time() - t0)
    print(f"{label:36s} {min(ts)*1e3:9.1f} ms", flush=True)
    return out


def main():
    logn = int(os.environ.get("LOGN", "20"))
    c = int(os.environ.get("C", "16"))
    n = 1 << logn
    spec = get_spec("BLS12_381")
    g1 = get_g1_ctx(spec)
    rng = np.random.default_rng(0)

    base = jax.jit(g1.scalar_mul)(
        jnp.asarray(g1.gen),
        g1.encode_scalars([int.from_bytes(rng.bytes(31), "big") % spec.r
                           for _ in range(128)]),
    )
    points = jnp.tile(base, (1, 1, n // 128))
    scalars = jnp.asarray(
        rng.integers(0, 1 << 16, size=(g1.fr.L, n), dtype=np.uint32)
    )
    nwin = -(-g1.nbits // c)

    dig = timed("digits", jax.jit(lambda s: M._digits(s, c, nwin)), scalars)

    sort = jax.jit(lambda d: (jnp.argsort(d, axis=1),
                              jnp.sort(d, axis=1)))
    timed("sort (argsort+sort)", sort, dig)

    tbl = timed(
        f"bucket_table (scan, c={c})",
        jax.jit(lambda p, d: M._bucket_table(g1, p, d, c)),
        points, dig,
    )
    tot = timed(
        "weighted_bucket_sum",
        jax.jit(lambda b: M._weighted_bucket_sum(g1, b, c)),
        tbl,
    )

    def horner(totals):
        def step(acc, t_w):
            for _ in range(c):
                acc = g1.double(acc)
            return g1.add(acc, t_w[..., None]), None
        rev = jnp.moveaxis(jnp.flip(totals, axis=-1), -1, 0)
        acc, _ = jax.lax.scan(step, rev[0][..., None], rev[1:])
        return acc

    timed("horner", jax.jit(horner), tot)

    full = jax.jit(lambda p, s: M.msm(g1, p, s, c=c))
    timed("FULL msm", full, points, scalars)

    # raw kernel rates for the report
    L = g1.fp.L
    B = 1 << 17
    a = jnp.asarray(rng.integers(0, 1 << 16, size=(L, B), dtype=np.uint32))
    P = jnp.broadcast_to(jnp.asarray(g1.gen), (3, L, B))
    timed("fp mont_mul 2^17 lanes", jax.jit(g1.fp.mont_mul), a, a)
    timed("g1 add 2^17 lanes", jax.jit(g1.add), P, P)
    sel = jnp.asarray(rng.integers(0, 2, size=(B,), dtype=np.uint32) != 0)
    timed("g1 add_select 2^17 lanes", jax.jit(g1.add_select), P, P, sel)


if __name__ == "__main__":
    main()
