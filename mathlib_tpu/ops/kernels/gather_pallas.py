"""In-kernel DMA row gather (MSM bucket-accumulation feed).

XLA's row gather on v5e issues one row per ~12.2 ns regardless of row
width (measured, BENCH_NOTES round 3) — only ~2.6% of HBM bandwidth at
64-word rows, and it is the larger half of the MSM scan step.  This
kernel tests the alternative: the point table stays in HBM (memory_space
ANY), the sorted row indices ride in as scalar-prefetch SMEM, and the
kernel issues one async DMA per row with hundreds in flight, draining on
a single counting semaphore.

If the DMA path beats the XLA gather, the MSM scan adopts it; if not,
the 12.2 ns/row floor is hardware issue rate, not an XLA artifact
(VERDICT round 3, task 2 asks for exactly this measurement either way).

Reference seam: gnark's MultiExp reads points linearly per bucket pass
(/root/reference/driver/gurvy/bn254.go:239-242); a TPU has no scalar
core in the scan loop, so the gather IS the random-access step.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@lru_cache(maxsize=None)
def _build(N: int, Wr: int, BLK: int, interpret: bool):
    def kernel(idx_ref, table_ref, out_ref, sem):
        g = pl.program_id(0)

        def issue(i, _):
            r = idx_ref[g * BLK + i]
            pltpu.make_async_copy(
                table_ref.at[pl.ds(r, 1), :],
                out_ref.at[pl.ds(i, 1), :],
                sem,
            ).start()
            return 0

        jax.lax.fori_loop(0, BLK, issue, 0)

        def drain(i, _):
            pltpu.make_async_copy(
                table_ref.at[pl.ds(0, 1), :],
                out_ref.at[pl.ds(i, 1), :],
                sem,
            ).wait()
            return 0

        jax.lax.fori_loop(0, BLK, drain, 0)

    @jax.jit
    def run(idx, table):
        M = idx.shape[0]
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(M // BLK,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (BLK, Wr), lambda g, idx: (g, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((M, Wr), jnp.uint32),
            interpret=interpret,
        )(idx, table)

    return run


@lru_cache(maxsize=None)
def _build_t(N: int, Wr: int, BLK: int, interpret: bool):
    """Transposing gather: row r of the table lands in COLUMN i of the
    output block — dst is a strided (Wr,)-element column slice, so one
    DMA descriptor performs the gather AND the point-major -> lane-major
    relayout that the MSM scan currently pays a dense XLA transpose for.
    HBM read side stays a contiguous row; the strided write hits VMEM
    (fine-grained SRAM)."""

    def kernel(idx_ref, table_ref, out_ref, sem):
        g = pl.program_id(0)

        def issue(i, _):
            r = idx_ref[g * BLK + i]
            pltpu.make_async_copy(
                table_ref.at[r],
                out_ref.at[:, i],
                sem,
            ).start()
            return 0

        jax.lax.fori_loop(0, BLK, issue, 0)

        def drain(i, _):
            pltpu.make_async_copy(
                table_ref.at[0],
                out_ref.at[:, i],
                sem,
            ).wait()
            return 0

        jax.lax.fori_loop(0, BLK, drain, 0)

    @jax.jit
    def run(idx, table):
        M = idx.shape[0]
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(M // BLK,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (Wr, BLK), lambda g, idx: (0, g), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((Wr, M), jnp.uint32),
            interpret=interpret,
        )(idx, table)

    return run


def gather_rows_t_pallas(table, idx, blk: int = 512, interpret: bool = False):
    """table[idx].T via transposing per-row DMAs: (N, Wr) x (M,) -> (Wr, M)."""
    N, Wr = table.shape
    M = idx.shape[0]
    assert M % blk == 0, (M, blk)
    return _build_t(N, Wr, blk, interpret)(idx.astype(jnp.int32), table)


def gather_rows_pallas(table, idx, blk: int = 512, interpret: bool = False):
    """table[idx] as an in-kernel DMA gather.

    table: (N, Wr) uint32, Wr a multiple of the lane width is NOT
    required (DMA is byte-addressed) but >= 64 words keeps parity with
    the XLA layout.  idx: (M,) int32/uint32, M padded to ``blk`` by the
    caller.
    """
    N, Wr = table.shape
    M = idx.shape[0]
    assert M % blk == 0, (M, blk)
    return _build(N, Wr, blk, interpret)(idx.astype(jnp.int32), table)
