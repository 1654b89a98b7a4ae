"""Env correctness: dynamics vs gymnasium analytic behavior + vmap/scan."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freerl_tpu import envs
from freerl_tpu.envs import make, step_auto_reset, vec_reset, vec_step_auto_reset


ALL_CLASSIC = [
    "CartPole-v1",
    "MountainCar-v0",
    "MountainCarContinuous-v0",
    "Pendulum-v1",
]


@pytest.mark.parametrize("name", ALL_CLASSIC)
def test_reset_step_shapes(name):
    env = make(name)
    key = jax.random.PRNGKey(0)
    state, obs = env.reset(key)
    assert obs.shape == (env.dim_info.obs_dim,)
    if env.dim_info.is_continue:
        action = jnp.zeros((env.dim_info.action_dim,))
    else:
        action = jnp.int32(0)
    state2, obs2, r, term, trunc = env.step(state, action, key)
    assert obs2.shape == obs.shape
    assert r.shape == () and term.shape == () and trunc.shape == ()


def test_cartpole_matches_gymnasium():
    """Step-by-step dynamics parity against gymnasium's CartPole."""
    gym = pytest.importorskip("gymnasium")
    genv = gym.make("CartPole-v1").unwrapped
    genv.reset(seed=0)
    env = make("CartPole-v1")
    # force identical start state
    s0 = np.array(genv.state, dtype=np.float32)
    from freerl_tpu.envs.classic import CartPoleState

    state = CartPoleState(
        jnp.float32(s0[0]), jnp.float32(s0[1]), jnp.float32(s0[2]),
        jnp.float32(s0[3]), jnp.int32(0),
    )
    key = jax.random.PRNGKey(0)
    for t in range(50):
        a = t % 2
        gobs, gr, gterm, gtrunc, _ = genv.step(a)
        state, obs, r, term, trunc = env.step(state, jnp.int32(a), key)
        np.testing.assert_allclose(np.asarray(obs), gobs, rtol=1e-4, atol=1e-5)
        assert float(r) == gr
        assert bool(term) == gterm
        if gterm:
            break


def test_mountaincar_matches_gymnasium():
    gym = pytest.importorskip("gymnasium")
    genv = gym.make("MountainCar-v0").unwrapped
    genv.reset(seed=3)
    s0 = np.array(genv.state, dtype=np.float32)
    from freerl_tpu.envs.classic import MountainCarState

    env = make("MountainCar-v0")
    state = MountainCarState(jnp.float32(s0[0]), jnp.float32(s0[1]),
                             jnp.int32(0))
    key = jax.random.PRNGKey(0)
    for t in range(100):
        a = [0, 2][t % 2]
        gobs, gr, gterm, _, _ = genv.step(a)
        state, obs, r, term, _ = env.step(state, jnp.int32(a), key)
        np.testing.assert_allclose(np.asarray(obs), gobs, rtol=1e-4, atol=1e-6)


def test_pendulum_matches_gymnasium():
    gym = pytest.importorskip("gymnasium")
    genv = gym.make("Pendulum-v1").unwrapped
    genv.reset(seed=1)
    th, thdot = genv.state
    from freerl_tpu.envs.classic import PendulumState

    env = make("Pendulum-v1")
    state = PendulumState(jnp.float32(th), jnp.float32(thdot), jnp.int32(0))
    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(0)
    for _ in range(50):
        a = rng.uniform(-2, 2, size=(1,)).astype(np.float32)
        gobs, gr, _, _, _ = genv.step(a)
        state, obs, r, _, _ = env.step(state, jnp.asarray(a), key)
        np.testing.assert_allclose(np.asarray(obs), gobs, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(float(r), gr, rtol=1e-3, atol=1e-4)


def test_auto_reset_and_truncation():
    env = make("MountainCar-v0")  # truncates at 200
    key = jax.random.PRNGKey(0)
    state, obs = env.reset(key)
    # roll 200 no-op-ish steps; should truncate exactly at t=200
    def body(carry, t):
        state = carry
        out = step_auto_reset(env, state, jnp.int32(1), jax.random.fold_in(key, t))
        return out.state, (out.truncated, out.terminated)

    _, (truncs, terms) = jax.lax.scan(body, state, jnp.arange(200))
    assert bool(truncs[-1]) or bool(terms.any())
    assert not bool(truncs[:-1].any())


def test_vectorized_rollout():
    env = make("CartPole-v1")
    key = jax.random.PRNGKey(0)
    n = 32
    state, obs = vec_reset(env, key, n)
    assert obs.shape == (n, 4)

    def body(carry, t):
        state, obs = carry
        k = jax.random.fold_in(key, t)
        action = jax.random.randint(k, (n,), 0, 2)
        out = vec_step_auto_reset(env, state, action, k, n)
        return (out.state, out.carry_obs), out.reward

    (_, _), rewards = jax.lax.scan(body, (state, obs), jnp.arange(100))
    assert rewards.shape == (100, n)
    assert float(rewards.sum()) == 100 * n  # CartPole: reward 1 every step


def test_dis_to_con_wrapper():
    env = make("Pendulum-v1", dis_to_con=True, n_bins=16)
    assert env.dim_info.action_dim == 16
    assert not env.dim_info.is_continue
    # endpoints map to the box bounds
    a0 = env.to_continuous(jnp.int32(0))
    a15 = env.to_continuous(jnp.int32(15))
    np.testing.assert_allclose(np.asarray(a0), [-2.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(a15), [2.0], atol=1e-6)
    # multi-dim base-k decode: 2 bins x 4 dims = 16 actions
    from freerl_tpu.core.types import DimInfo
    from freerl_tpu.envs.base import DisToConWrapper, Env

    class FakeBox(Env):
        dim_info = DimInfo(obs_dim=3, action_dim=4, is_continue=True,
                           max_action=1.0)
        max_steps = 10

    w = DisToConWrapper(FakeBox(), bins_per_dim=2)
    assert w.dim_info.action_dim == 16
    np.testing.assert_allclose(
        np.asarray(w.to_continuous(jnp.int32(0))), [-1, -1, -1, -1]
    )
    np.testing.assert_allclose(
        np.asarray(w.to_continuous(jnp.int32(15))), [1, 1, 1, 1]
    )
    np.testing.assert_allclose(
        np.asarray(w.to_continuous(jnp.int32(3))), [1, 1, -1, -1]
    )


def test_fixed_reset_wrapper_pins_start_state():
    """FixedResetWrapper: every reset (any key) lands on one start state —
    the reference's env.reset(seed=seed) loop (DQN_file/DQN.py:334)."""
    import jax
    import numpy as np

    from freerl_tpu.envs import make
    from freerl_tpu.envs.base import FixedResetWrapper, vec_step_auto_reset

    env = FixedResetWrapper(make("MountainCar-v0"), seed=3)
    _, o1 = env.reset(jax.random.PRNGKey(0))
    _, o2 = env.reset(jax.random.PRNGKey(999))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    # unwrapped: different keys give different starts
    raw = make("MountainCar-v0")
    _, r1 = raw.reset(jax.random.PRNGKey(0))
    _, r2 = raw.reset(jax.random.PRNGKey(999))
    assert not np.array_equal(np.asarray(r1), np.asarray(r2))
    # auto-reset path flows through the pinned reset too
    import jax.numpy as jnp

    s, o = env.reset(jax.random.PRNGKey(1))
    state = jax.tree.map(lambda x: jnp.broadcast_to(x, (4,) + x.shape), s)
    out = vec_step_auto_reset(env, state, jnp.zeros((4,), jnp.int32),
                              jax.random.PRNGKey(2), 4)
    assert out.next_obs.shape == (4, 2)
