"""Pallas kernels: interpret-mode correctness vs the XLA reference."""
import jax
import jax.numpy as jnp
import numpy as np

from freerl_tpu.ops.sumtree_pallas import sumtree_descend, sumtree_descend_xla


def _build_tree(cap, seed=0):
    depth = cap.bit_length() - 1
    rng = np.random.RandomState(seed)
    tree = np.zeros(2 * cap)
    tree[cap:] = rng.rand(cap)
    for lvl in range(depth - 1, -1, -1):
        lo, hi = 1 << lvl, 1 << (lvl + 1)
        tree[lo:hi] = tree[2 * lo: 2 * hi: 2] + tree[2 * lo + 1: 2 * hi: 2]
    return jnp.asarray(tree, jnp.float32), depth


def test_descend_matches_xla_interpret():
    for cap_pow in (8, 14, 17):  # below, at, above the VMEM-level split
        cap = 1 << cap_pow
        tree, depth = _build_tree(cap)
        B = 128
        u = jnp.asarray(
            (np.arange(B) + np.random.RandomState(1).rand(B))
            * float(tree[1]) / B, jnp.float32,
        )
        ref = sumtree_descend_xla(tree, u, depth, cap)
        out = sumtree_descend(tree, u, depth, cap, interpret=True)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_descend_respects_priorities():
    cap = 1 << 12
    tree, depth = _build_tree(cap)
    # spike one leaf's priority via direct tree surgery
    tree = tree.at[cap + 77].add(1000.0)
    for lvl in range(depth - 1, -1, -1):
        lo, hi = 1 << lvl, 1 << (lvl + 1)
        tree = tree.at[lo:hi].set(
            tree[2 * lo: 2 * hi: 2] + tree[2 * lo + 1: 2 * hi: 2]
        )
    B = 512
    u = jnp.asarray(
        (np.arange(B) + np.random.RandomState(2).rand(B))
        * float(tree[1]) / B, jnp.float32,
    )
    idx = np.asarray(sumtree_descend(tree, u, depth, cap, interpret=True))
    assert (idx == 77).mean() > 0.2


def test_per_buffer_pallas_flag():
    from freerl_tpu.buffers.per import PERBuffer
    from tests.test_buffers import _batch, _example

    buf = PERBuffer.create(64, _example(), use_pallas=False)
    buf = buf.add(_batch(0, b=32))
    _, idx, w = buf.sample_idx(jax.random.PRNGKey(0), 16)
    assert idx.shape == (16,)
    assert (np.asarray(idx) < 32).all()
