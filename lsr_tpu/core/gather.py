"""TPU-friendly row gathers.

Measured on the bench workload (2M pixels x 56-lane records, real TPU,
scripts/dbg_gather.py):

    table[flat_idx]  (flat (N,) indices, 2D table)   12 ms
    jnp.take(table, flat_idx, axis=0)                15 ms
    lax.gather 1D-flattened slice form             2,791 ms  (!!)

The 1D-table + slice_sizes=(lanes,) formulation — superficially "layout
proof" — lowers to a slow scalar slice loop on TPU and must never be used.
The fast path is the ordinary row gather, fed FLAT int32 indices (2D index
arrays can also de-optimize the lowering) and reshaped back afterwards.

Layout caveat: the gather is only fast when the table is physically
row-major.  Tables that cross a jit boundary (jit arguments) always are;
tables packed in the same program normally are too (measured: packing fused
with the gather is still 12 ms), but if a regression appears, check the
dumped HLO for a `{0,1}` parameter layout first.
"""

from __future__ import annotations

import jax.numpy as jnp


def take_rows(table, idx):
    """table[idx] for row tables, reshaped to idx.shape + table.shape[1:].

    table: (R, ...) array; idx: any-shape int array of row ids (caller
    guarantees in-range; out-of-range clamps per XLA gather semantics).
    """
    flat_idx = idx.reshape(-1).astype(jnp.int32)
    out = table[flat_idx]
    return out.reshape(idx.shape + table.shape[1:])
