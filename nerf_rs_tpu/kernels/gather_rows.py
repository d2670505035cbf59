"""Hand-written Pallas DMA row gather — the hash-family gather probe.

VERDICT r3 item 4 asked for the one untried lever on the Instant-NGP
gather wall (docs/PERFORMANCE.md "Round 3: second and third field
families"): a hand-written Mosaic kernel doing scalar-driven DMAs from
the HBM-resident hash table, instead of XLA's gather lowering. This
module is that kernel, kept generic: ``gather_rows(table, idx)``
computes ``table[idx]`` for an (R, W) f32 table in HBM and (N,) int32
indices, via a ring of ``depth`` in-flight per-row async copies whose
addresses come from an SMEM-resident index block.

Hardware constraints discovered while building it (each one is a fact
about Mosaic/TPU, worth keeping for the next person):

  * HBM memrefs are tiled. A 2-D f32 table is tiled (1, 128) or
    (8, 128) — so the minimum DMA-addressable random-access granule is
    one 128-lane row (512 B for f32). A (R, 2) table is lane-padded to
    (R, 128) — 64x HBM memory — which is why models/hashgrid.py keeps
    its table flat 1-D. But 1-D memrefs are tiled (1024,), so dynamic
    1-D slices must be 1024-element aligned: fine-grained (F=2) flat
    gathers are NOT DMA-addressable at all. Row granularity (W=128k)
    is therefore the only shape a Pallas gather can take.
  * The issue path is the scalar core: every copy costs an SMEM index
    load, two address computations, a descriptor start and (amortized)
    a semaphore wait. Measured on v5e (benchmarks/ab_hash_encode.py
    --pallas): ~111 ns per (1, 128) row at depth 8, ~flat across
    depth/unroll sweeps — vs XLA's ~74 ns/row for the same row gather
    and ~15.5 ns/element for its flat element gather. XLA's gather
    lowering is already issue-bound on the same engine and wins by
    not paying the in-kernel loop overhead.

Conclusion (measured, see docs/PERFORMANCE.md round 4): the gather
wall is the hardware's DMA issue rate, not XLA's lowering — a
hand-written kernel cannot beat ~15 ns/element for fine-grained random
access, and the TPU-native answer to grid fields remains the
gather-free factored family (models/factored.py). Kept in-tree as the
measured evidence and as a reusable aligned row gather.

Reference anchor: the reference has no gather-based field at all (its
MLP takes raw xyz, src/model.rs:45-67); this probes a capability the
rebuild added beyond the reference (models/hashgrid.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def gather_rows(
    table: jnp.ndarray,
    idx: jnp.ndarray,
    *,
    block: int = 1024,
    depth: int = 8,
    unroll: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """``table[idx]`` via per-row async DMAs.

    table: (R, W) f32 with W a multiple of 128 (the Mosaic HBM tile).
    idx:   (N,) int32, N a multiple of ``block``; values in [0, R).
    Returns (N, W) f32.

    ``block`` rows are gathered per grid step (their indices are
    DMA'd into SMEM by the Pallas pipeline); ``depth`` copies are kept
    in flight; the issue loop is unrolled ``unroll``-fold. Output
    blocks double-buffer through VMEM, so VMEM use is
    ~2 * block * W * 4 bytes.
    """
    N = idx.shape[0]
    R, W = table.shape
    if W % 128 != 0:
        raise ValueError(f"row width {W} not a multiple of 128 lanes")
    if N % block != 0:
        raise ValueError(f"N={N} not a multiple of block={block}")
    depth = min(depth, block)
    # Mosaic's fori_loop lowering supports only unroll=1 or a full
    # unroll (unroll == trip count); full unroll at block>=1024 blows
    # compile time, so clamp everything else to 1
    if unroll not in (1, block):
        unroll = 1

    def kernel(idx_ref, table_ref, out_ref, sems):
        def mk(i, slot):
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(idx_ref[i], 1), :],
                out_ref.at[pl.ds(i, 1), :],
                sems.at[slot],
            )

        def body(i, _):
            # free the ring slot before reusing it (at most one
            # outstanding copy per semaphore)
            @pl.when(i >= depth)
            def _():
                mk(i - depth, jax.lax.rem(i, depth)).wait()

            mk(i, jax.lax.rem(i, depth)).start()
            return 0

        jax.lax.fori_loop(0, block, body, 0, unroll=unroll)

        def drain(j, _):
            i = block - depth + j
            mk(i, jax.lax.rem(i, depth)).wait()
            return 0

        jax.lax.fori_loop(0, depth, drain, 0)

    return pl.pallas_call(
        kernel,
        grid=(N // block,),
        in_specs=[
            pl.BlockSpec((block,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((block, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, W), table.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((depth,))],
        interpret=interpret,
    )(idx, table)


@functools.partial(jax.jit, static_argnames=("block", "depth", "unroll",
                                             "interpret"))
def gather_pairs(
    table_flat: jnp.ndarray,
    fidx: jnp.ndarray,
    *,
    block: int = 1024,
    depth: int = 8,
    unroll: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fine-grained gather ``table_flat[fidx], table_flat[fidx + 1]``
    (adjacent element pairs, e.g. the F=2 features of one hash-table
    entry) built ON TOP of the row granularity: DMA the enclosing
    (1, 128) row, then select the two lanes in-register.

    This is the fairest fine-grained Pallas gather the hardware
    admits — and it fetches 512 B per 8 useful bytes, which is why it
    measures ~4x slower than XLA's element gather (the rigorous
    negative; see module docstring). table_flat: (M,) f32 with M a
    multiple of 128; fidx: (N,) int32 EVEN indices. Returns (N, 2).
    """
    rows = table_flat.reshape(-1, 128)
    gathered = gather_rows(rows, (fidx // 128).astype(jnp.int32),
                           block=block, depth=depth, unroll=unroll,
                           interpret=interpret)  # (N, 128)
    lane = (fidx % 128)[:, None]  # even, so lane+1 stays in-row
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    v0 = jnp.sum(jnp.where(pos == lane, gathered, 0.0), axis=-1)
    v1 = jnp.sum(jnp.where(pos == lane + 1, gathered, 0.0), axis=-1)
    return jnp.stack([v0, v1], axis=-1)
