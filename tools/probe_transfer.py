"""Measure the host<->device tunnel costs that set every batch entry
point's fixed overhead: dispatch round trip, input transfer vs bytes,
output fetch vs bytes.

The hash pipeline's @4096 wall is ~52 ms of which only ~14.5 ms is the
fused kernel (profile_hash marginal row); this probe attributes the
other ~37 ms so the fixed-cost work targets the right component.

Usage: python tools/probe_transfer.py [--json out.json]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def med(fn, reps=10):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    rows = []

    def row(label, ms):
        rows.append({"probe": label, "ms": round(ms, 2)})
        print(f"{label:44s} {ms:9.2f} ms", flush=True)

    dev = jax.devices()[0]

    # dispatch + tiny fetch round trip: y = x + 1 on a (1,) array
    one = jnp.zeros((8, 128), jnp.uint32)
    f_tiny = jax.jit(lambda a: a + 1)
    _ = np.asarray(f_tiny(one))
    row("dispatch+tiny-fetch RTT (8x128 u32)", med(lambda: np.asarray(f_tiny(one))[0, 0]))

    # input transfer: host numpy -> device, barrier via 1-elem fetch of a
    # dependent tiny result (forces the transfer to complete)
    g = jax.jit(lambda a: a.ravel()[:1] + 1)
    for kb in (128, 512, 768, 1536, 3072):
        x = np.zeros((kb * 256,), np.uint32)  # kb KiB
        _ = np.asarray(g(jnp.asarray(x)))
        row(f"h2d {kb:5d} KiB + RTT", med(lambda x=x: np.asarray(g(jax.device_put(x, dev)))))

    # output fetch: device -> host full array.  A FRESH device array per
    # rep (jax.Array caches its host copy after the first np.asarray, so
    # re-fetching the same array times a memcpy, not the tunnel); the
    # tiny-slice fetch is the completion barrier, then the full fetch is
    # timed alone.
    for kb in (128, 512, 1152, 2304):
        n = kb * 256
        fz = jax.jit(lambda s: jnp.full((n,), s, jnp.uint32))

        def one_fetch(j, _box=[0]):
            _box[0] += 1
            y = fz(jnp.uint32(_box[0]))
            np.asarray(y.ravel()[:1])  # barrier (tiny separate array)
            t0 = time.perf_counter()
            np.asarray(y)
            return time.perf_counter() - t0

        one_fetch(0)
        ts = [one_fetch(j) for j in range(8)]
        row(f"d2h {kb:5d} KiB full fetch", float(np.median(ts)) * 1e3)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
