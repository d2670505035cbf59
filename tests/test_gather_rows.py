"""Parity tests for the Pallas DMA row gather (kernels/gather_rows.py)
in interpret mode — the TPU-semantics/perf side is driven by
benchmarks/ab_hash_encode.py --pallas on the real chip."""

import jax
import jax.numpy as jnp
import pytest

from nerf_rs_tpu.kernels import gather_rows as gr


@pytest.mark.parametrize("n,block,depth,unroll", [
    (256, 64, 4, 1),
    (512, 128, 8, 4),
    (128, 128, 16, 2),  # depth > natural fill, single block
])
def test_gather_rows_parity(n, block, depth, unroll):
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (300, 128), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, 300,
                             jnp.int32)
    out = gr.gather_rows(table, idx, block=block, depth=depth,
                         unroll=unroll, interpret=True)
    assert jnp.array_equal(out, jnp.take(table, idx, axis=0))


def test_gather_rows_repeated_indices():
    # ring-slot reuse with duplicate sources must still land each copy
    table = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128)
    idx = jnp.array([3, 3, 3, 3, 7, 7, 7, 7] * 16, jnp.int32)
    out = gr.gather_rows(table, idx, block=128, depth=4, interpret=True)
    assert jnp.array_equal(out, jnp.take(table, idx, axis=0))


def test_gather_rows_validates_shapes():
    table = jnp.zeros((8, 64), jnp.float32)
    with pytest.raises(ValueError, match="128 lanes"):
        gr.gather_rows(table, jnp.zeros((128,), jnp.int32),
                       interpret=True)
    with pytest.raises(ValueError, match="multiple of block"):
        gr.gather_rows(jnp.zeros((8, 128), jnp.float32),
                       jnp.zeros((100,), jnp.int32), block=64,
                       interpret=True)


def test_gather_pairs_matches_flat_take():
    # the hash-table granularity: adjacent (F=2) element pairs
    table_flat = jax.random.normal(jax.random.PRNGKey(2), (4096,),
                                   jnp.float32)
    base = jax.random.randint(jax.random.PRNGKey(3), (256,), 0, 2048,
                              jnp.int32) * 2  # even
    out = gr.gather_pairs(table_flat, base, block=256, interpret=True)
    ref = jnp.stack([jnp.take(table_flat, base),
                     jnp.take(table_flat, base + 1)], axis=-1)
    assert jnp.allclose(out, ref)
