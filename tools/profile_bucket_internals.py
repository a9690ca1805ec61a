"""Attribute EVERY millisecond inside msm.bucket_table (real TPU).

profile_msm round 5: bucket_table = 823.6 ms at 2^20/c=16 while the
scan itself was ~466 ms (r3) — ~350 ms lives in the surrounding stages.
This tool times each stage of the dense-capture path as its own jit
(same shapes/dtypes as production):

  argsort       per-window argsort + key/order takes
  prep          to_steps transposes + point-row transpose + pad
  pos_scatter   the (W*NP -> W*B+1) segment-end scatter for the capture
                gather positions
  scan          the K-step segmented scan with dense emit (gather +
                add_select + carry + ys)
  capture       post-scan bucket-row gather + sentinel where
  carries       cross-chunk fix (_seg_scan_inclusive + patch scatter)

Run: LOGN=20 C=16 python tools/profile_bucket_internals.py
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
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from mathlib_tpu.curves.params import get_spec
from mathlib_tpu.ops.g1 import get_g1_ctx
from mathlib_tpu.ops import msm as M


def _fetch(x):
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "addressable_shards"):
            np.asarray(leaf.ravel()[:1])


def timed(label, fn, *args, reps=3):
    out = fn(*args)
    _fetch(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        _fetch(out)
        ts.append(time.time() - t0)
    print(f"{label:14s} {min(ts)*1e3:9.1f} ms", flush=True)
    return out


def main():
    logn = int(os.environ.get("LOGN", "20"))
    c = int(os.environ.get("C", "16"))
    K = int(os.environ.get("K", "64"))
    n = 1 << logn
    spec = get_spec("BLS12_381")
    g1 = get_g1_ctx(spec)
    rng = np.random.default_rng(0)
    L = g1.fp.L

    base = jax.jit(g1.scalar_mul)(
        jnp.asarray(g1.gen),
        g1.encode_scalars(
            [int.from_bytes(rng.bytes(31), "big") % spec.r for _ in range(128)]
        ),
    )
    points = jnp.tile(base, (1, 1, n // 128))
    scalars = jnp.asarray(
        rng.integers(0, 1 << 16, size=(g1.fr.L, n), dtype=np.uint32)
    )
    nwin = -(-g1.nbits // c)
    W = nwin
    B = 1 << c
    N = n
    NP = N + ((-N) % K)
    C = NP // K
    SENT = M._SENTINEL

    digits = jax.jit(lambda s: M._digits(s, c, nwin))(scalars)

    def stage_sort(d):
        # production path (round 5): argsort for the gather order + a
        # SECOND sort for the keys — take_along_axis costs ~200 ms at
        # this shape (kept in git history as the round-5 finding)
        order = jnp.argsort(d, axis=1)
        keys = jnp.sort(d, axis=1)
        return order, keys

    order, keys = timed("argsort+sort", jax.jit(stage_sort), digits)

    def stage_prep(keys, order, pts):
        pad = NP - N
        if pad:
            keys = jnp.concatenate(
                [keys, jnp.full((W, pad), SENT, keys.dtype)], axis=1
            )
            order = jnp.concatenate(
                [order, jnp.zeros((W, pad), order.dtype)], axis=1
            )

        def to_steps(x):
            return jnp.moveaxis(x.reshape(W, C, K), -1, 0).reshape(K, W * C)

        keys_t = to_steps(keys)
        order_t = to_steps(order)
        rows = pts.reshape(3 * L, N).T
        rp = max(0, 64 - 3 * L)
        if rp:
            rows = jnp.pad(rows, [(0, 0), (0, rp)])
        return keys_t, order_t, rows

    keys_t, order_t, rows = timed(
        "prep", jax.jit(stage_prep), keys, order, points
    )

    # pos scatter: per-bucket capture position from keys alone
    def stage_pos(keys):
        pad = NP - N
        if pad:
            keys = jnp.concatenate(
                [keys, jnp.full((W, pad), SENT, keys.dtype)], axis=1
            )
        win_ids = jnp.broadcast_to(
            jnp.arange(W, dtype=jnp.uint32)[:, None], (W, NP)
        )
        is_last = jnp.concatenate(
            [keys[:, :-1] != keys[:, 1:], jnp.ones((W, 1), dtype=bool)], axis=1
        )
        bucket = jnp.where(keys < B, win_ids * B + keys, W * B)
        i_idx = jnp.arange(NP, dtype=jnp.uint32)
        ys_pos = (i_idx % K)[None, :] * jnp.uint32(W * C) + (
            win_ids * C + (i_idx // K)[None, :]
        )
        return (
            jnp.full((W * B + 1,), SENT, jnp.uint32)
            .at[jnp.where(is_last, bucket, W * B).reshape(-1)]
            .set(ys_pos.reshape(-1))[: W * B]
        )

    pos = timed("pos_scatter", jax.jit(stage_pos), keys)

    # the scan with dense emit (carry + ys) — mirrors _bucket_table body
    inf_row = jnp.asarray(g1.inf).reshape(3 * L)

    # scan + capture as ONE jit: the 8.6 GB ys capture buffer must die
    # inside the program (keeping it alive across separately-timed
    # stages OOMs 16 GB HBM; the production pipeline frees it the same
    # way)
    def stage_scan_cap(keys_t, order_t, rows, pos):
        init = (
            jnp.full((W * C,), SENT, keys_t.dtype),
            jnp.broadcast_to(jnp.asarray(g1.inf), (3, L, W * C)),
        )

        def body(carry, x):
            ck, cp = carry
            k, o = x
            g = rows[o][:, : 3 * L]
            p = g.T.reshape(3, L, g.shape[0])
            run = g1.add_select(cp, p, k == ck)
            return (k, run), run.reshape(3 * L, W * C).T

        (_, final_run), ys = jax.lax.scan(body, init, (keys_t, order_t))
        ys_flat = ys.reshape(K * W * C, 3 * L)
        sel = ys_flat[jnp.minimum(pos, K * W * C - 1)]
        rows_out = jnp.where((pos == SENT)[:, None], inf_row[None, :], sel)
        return final_run, rows_out

    final_run, bucket_rows = timed(
        "scan+capture", jax.jit(stage_scan_cap), keys_t, order_t, rows, pos
    )

    def stage_carries(keys, final_run, bucket_rows):
        keys_c = (
            jnp.concatenate(
                [keys, jnp.full((W, NP - N), SENT, keys.dtype)], axis=1
            )
            if NP != N
            else keys
        ).reshape(W, C, K)
        sum_keys = keys_c[..., -1]
        sum_pts = jnp.moveaxis(final_run.reshape(3, L, W, C), -2, 0)
        inc = M._seg_scan_inclusive(g1, sum_keys, sum_pts, K)
        carry_pt = jnp.roll(inc, 1, axis=-1)
        carry_key = jnp.roll(sum_keys, 1, axis=-1)
        first_key = keys_c[..., 0]
        valid = carry_key == first_key
        valid = valid.at[..., 0].set(False)
        next_first = jnp.concatenate(
            [first_key[:, 1:], jnp.full((W, 1), SENT, keys.dtype)], axis=1
        )
        ends_here = first_key != next_first
        in_range = first_key < B
        fix = jnp.logical_and(jnp.logical_and(valid, ends_here), in_range)
        win_ids = jnp.broadcast_to(
            jnp.arange(W, dtype=jnp.uint32)[:, None], (W, C)
        )
        tgt = jnp.where(fix, win_ids * B + first_key, W * B).reshape(-1)
        cur = bucket_rows[jnp.minimum(tgt, W * B - 1)]
        carry_flat = jnp.moveaxis(carry_pt, 0, -2).reshape(3, L, W * C)
        fixed = g1.add(cur.T.reshape(3, L, W * C), carry_flat)
        return bucket_rows.at[tgt].set(
            fixed.reshape(3 * L, W * C).T, mode="drop"
        )

    timed("carries", jax.jit(stage_carries), keys, final_run, bucket_rows)

    timed(
        "bucket_table",
        jax.jit(lambda p, d: M._bucket_table(g1, p, d, c, K=K)),
        points,
        digits,
    )


if __name__ == "__main__":
    main()
