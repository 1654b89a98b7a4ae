"""Buffer correctness: ring semantics, PER sum-tree invariants, n-step folds."""
import jax
import jax.numpy as jnp
import numpy as np

from freerl_tpu.buffers.nstep import nstep_fold, nstep_sample_range
from freerl_tpu.buffers.per import PERBuffer
from freerl_tpu.buffers.uniform import ReplayBuffer
from freerl_tpu.core.types import Transition


def _example(obs_dim=3):
    return Transition(
        obs=jnp.zeros((obs_dim,)),
        action=jnp.int32(0),
        reward=jnp.float32(0),
        next_obs=jnp.zeros((obs_dim,)),
        done=jnp.bool_(False),
        episode_done=jnp.bool_(False),
    )


def _batch(i, b=4, obs_dim=3):
    ar = jnp.arange(b) + i * b
    return Transition(
        obs=jnp.tile(ar[:, None].astype(jnp.float32), (1, obs_dim)),
        action=ar.astype(jnp.int32),
        reward=ar.astype(jnp.float32),
        next_obs=jnp.tile(ar[:, None].astype(jnp.float32) + 0.5, (1, obs_dim)),
        done=jnp.zeros((b,), jnp.bool_),
        episode_done=jnp.zeros((b,), jnp.bool_),
    )


def test_ring_wraparound():
    buf = ReplayBuffer.create(8, _example())
    for i in range(3):  # 12 adds into capacity 8 -> wraps
        buf = buf.add(_batch(i))
    assert int(buf.size) == 8
    assert int(buf.pos) == 4
    # slots 4..7 hold items 4..7, slots 0..3 hold items 8..11
    np.testing.assert_array_equal(
        np.asarray(buf.data.reward), [8, 9, 10, 11, 4, 5, 6, 7]
    )


def test_uniform_sample_in_range():
    buf = ReplayBuffer.create(64, _example())
    buf = buf.add(_batch(0, b=16))
    batch = buf.sample(jax.random.PRNGKey(0), 32)
    assert batch.obs.shape == (32, 3)
    assert np.asarray(batch.reward).max() < 16


def test_per_tree_invariant_and_priorities():
    buf = PERBuffer.create(16, _example())
    buf = buf.add(_batch(0, b=8))
    tree = np.asarray(buf.tree)
    # root equals sum of leaves
    np.testing.assert_allclose(tree[1], tree[16:].sum(), rtol=1e-6)
    # raise priority of slot 3 hugely; it should dominate sampling
    buf = buf.update_priorities(jnp.array([3]), jnp.array([1000.0]))
    tree = np.asarray(buf.tree)
    np.testing.assert_allclose(tree[1], tree[16:].sum(), rtol=1e-6)
    buf2, idx, w = buf.sample_idx(jax.random.PRNGKey(1), 256)
    counts = np.bincount(np.asarray(idx), minlength=16)
    assert counts[3] > 200  # alpha=0.5: sqrt(1000)~31x the default priority
    assert float(buf2.beta) > float(buf.beta) - 1e-9 + 0  # beta annealed
    # IS weights: max-normalized, in (0, 1]
    w = np.asarray(w)
    assert w.max() <= 1.0 + 1e-6 and w.min() > 0


def test_per_internal_consistency_after_many_updates():
    buf = PERBuffer.create(32, _example())
    key = jax.random.PRNGKey(0)
    for i in range(6):
        buf = buf.add(_batch(i, b=8))
        k1, k2, key = jax.random.split(key, 3)
        buf, idx, w = buf.sample_idx(k1, 16)
        buf = buf.update_priorities(idx, jax.random.uniform(k2, (16,)) * 5)
    tree = np.asarray(buf.tree)
    # every internal node equals sum of children
    for node in range(1, 32):
        np.testing.assert_allclose(
            tree[node], tree[2 * node] + tree[2 * node + 1], rtol=1e-5
        )


def test_nstep_fold_simple_chain():
    """Single env (stride 1): R = r0 + g r1 + g^2 r2, next_obs from step 3."""
    cap, n, gamma = 16, 3, 0.9
    buf = ReplayBuffer.create(cap, _example())
    b = Transition(
        obs=jnp.arange(8, dtype=jnp.float32)[:, None] * jnp.ones((1, 3)),
        action=jnp.arange(8, dtype=jnp.int32),
        reward=jnp.ones((8,)),
        next_obs=(jnp.arange(8, dtype=jnp.float32)[:, None] + 1)
        * jnp.ones((1, 3)),
        done=jnp.zeros((8,), jnp.bool_),
        episode_done=jnp.zeros((8,), jnp.bool_),
    )
    buf = buf.add(b)
    folded, eff_gamma = nstep_fold(buf.data, jnp.array([0, 2]), 1, n, gamma)
    expected_ret = 1 + gamma + gamma**2
    np.testing.assert_allclose(np.asarray(folded.reward),
                               [expected_ret, expected_ret], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(eff_gamma),
                               [gamma**3, gamma**3], rtol=1e-5)
    # next_obs after 3 steps from idx 0 is next_obs of slot 2 (=3.0)
    np.testing.assert_allclose(np.asarray(folded.next_obs[0]), [3, 3, 3])


def test_nstep_fold_cuts_at_episode_end():
    cap, n, gamma = 16, 3, 0.5
    buf = ReplayBuffer.create(cap, _example())
    done = jnp.array([0, 1, 0, 0, 0, 0, 0, 0], jnp.bool_)
    b = Transition(
        obs=jnp.zeros((8, 3)),
        action=jnp.zeros((8,), jnp.int32),
        reward=jnp.ones((8,)),
        next_obs=jnp.ones((8, 3)) * jnp.arange(8)[:, None],
        done=done,
        episode_done=done,
    )
    buf = buf.add(b)
    folded, eff_gamma = nstep_fold(buf.data, jnp.array([0]), 1, n, gamma)
    # episode ends at k=1 -> R = r0 + g*r1 = 1.5, m=2, done=True
    np.testing.assert_allclose(np.asarray(folded.reward), [1.5])
    np.testing.assert_allclose(np.asarray(eff_gamma), [0.25])
    assert bool(folded.done[0])


def test_nstep_sample_range_respects_successors():
    key = jax.random.PRNGKey(0)
    # not full: size 10, stride 2, n 3 -> valid starts < 10 - 4 = 6
    idx = nstep_sample_range(jnp.int32(10), 16, jnp.int32(10), 2, 3, key, 64)
    assert np.asarray(idx).max() < 6
    # full ring: pos 5, capacity 16 -> offsets < 12 from pos
    idx = nstep_sample_range(jnp.int32(16), 16, jnp.int32(5), 2, 3, key, 256)
    d = (np.asarray(idx) - 5) % 16
    assert d.max() < 12


def test_bf16_storage_roundtrip():
    """bf16 ring stores float leaves at half width; samples upcast to f32."""
    ex = Transition(
        obs=jnp.zeros((4,), jnp.float32),
        action=jnp.zeros((), jnp.int32),
        reward=jnp.zeros((), jnp.float32),
        next_obs=jnp.zeros((4,), jnp.float32),
        done=jnp.zeros((), jnp.bool_),
        episode_done=jnp.zeros((), jnp.bool_),
    )
    buf = ReplayBuffer.create(64, ex, bf16_storage=True)
    assert buf.data.obs.dtype == jnp.bfloat16
    assert buf.data.action.dtype == jnp.int32      # non-float untouched
    batch = Transition(
        obs=jnp.full((8, 4), 1.5), action=jnp.arange(8, dtype=jnp.int32),
        reward=jnp.full((8,), -2.25), next_obs=jnp.full((8, 4), 0.125),
        done=jnp.zeros((8,), jnp.bool_), episode_done=jnp.zeros((8,), jnp.bool_),
    )
    buf = buf.add(batch)
    out = buf.sample(jax.random.PRNGKey(0), 16)
    assert out.obs.dtype == jnp.float32 and out.reward.dtype == jnp.float32
    # bf16 represents these values exactly
    assert set(np.unique(np.asarray(out.obs))) <= {0.0, 1.5}
    assert set(np.unique(np.asarray(out.reward))) <= {0.0, -2.25}
