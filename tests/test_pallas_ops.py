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


def test_cumsum_sampler_matches_tree():
    """The cumsum (inverse-CDF) sampler draws the SAME leaves as the
    sum-tree descent for the same stratified u's — they invert the same
    prefix sum in leaf order."""
    cap = 1 << 12
    tree, depth = _build_tree(cap, seed=3)
    leaves = np.asarray(tree[cap:])
    B = 512
    u = jnp.asarray(
        (np.arange(B) + np.random.RandomState(4).rand(B))
        * float(tree[1]) / B, jnp.float32,
    )
    idx_tree = np.asarray(sumtree_descend_xla(tree, u, depth, cap))
    cdf = jnp.cumsum(jnp.asarray(leaves, jnp.float32))
    idx_cdf = np.asarray(jnp.clip(
        jnp.searchsorted(cdf, u, side="left"), 0, cap - 1
    ))
    # float addition order differs between the two reductions, so a u
    # that lands exactly on a boundary can step one leaf; allow <=1%
    assert (idx_tree == idx_cdf).mean() > 0.99, (
        (idx_tree != idx_cdf).sum()
    )


def test_per_buffer_cumsum_sampler():
    """End-to-end PERBuffer parity: tree vs cumsum samplers agree on the
    drawn indices and importance weights from identical state."""
    import jax
    from freerl_tpu.buffers.per import PERBuffer
    from tests.test_buffers import _batch, _example

    bt = PERBuffer.create(256, _example(), sampler="tree")
    bc = PERBuffer.create(256, _example(), sampler="cumsum")
    for i in range(4):
        bt = bt.add(_batch(i, b=32))
        bc = bc.add(_batch(i, b=32))
    # diversify priorities through the public update path
    td = jnp.linspace(0.1, 5.0, 16)
    upd_idx = jnp.arange(16) * 7
    bt = bt.update_priorities(upd_idx, td)
    bc = bc.update_priorities(upd_idx, td)
    _, it, wt = bt.sample_idx(jax.random.PRNGKey(5), 64)
    _, ic, wc = bc.sample_idx(jax.random.PRNGKey(5), 64)
    assert (np.asarray(it) == np.asarray(ic)).mean() > 0.98
    same = np.asarray(it) == np.asarray(ic)
    np.testing.assert_allclose(
        np.asarray(wt)[same], np.asarray(wc)[same], rtol=1e-5
    )
