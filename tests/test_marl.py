"""MPE envs + MADDPG/MATD3/MASAC: dynamics, shapes, end-to-end learning."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freerl_tpu.algos.maddpg import MADDPG, MADDPGConfig, MATD3
from freerl_tpu.algos.masac import MASAC, MASACConfig
from freerl_tpu.envs import make
from freerl_tpu.train.marl import MARLConfig, train_marl


@pytest.mark.parametrize(
    "name,n_agents",
    [("simple_spread_v3", 3), ("simple_adversary_v3", 3),
     ("simple_tag_v3", 4)],
)
def test_mpe_shapes_and_rollout(name, n_agents):
    env = make(name)
    assert env.n_agents == n_agents
    key = jax.random.PRNGKey(0)
    s, o = env.reset(key)
    assert o.shape == (n_agents, env.dim_info.obs_dim)
    step = jax.jit(env.step)
    tot = np.zeros(n_agents)
    for t in range(25):
        a = jax.random.uniform(jax.random.fold_in(key, t), (n_agents, 5))
        s, o, r, term, trunc = step(s, a, jax.random.fold_in(key, t))
        assert not bool(jnp.isnan(r).any())
        tot += np.asarray(r)
    assert bool(trunc)  # 25-step truncation, never terminates
    assert not bool(term)


def test_spread_reward_structure():
    """Covering landmarks yields better reward than clustering away."""
    from freerl_tpu.envs.mpe import MPEState, SimpleSpread

    env = SimpleSpread()
    lpos = jnp.array([[0.5, 0.5], [-0.5, 0.5], [0.0, -0.5]])
    on_landmarks = MPEState(
        pos=jnp.concatenate([lpos, lpos]),
        vel=jnp.zeros((6, 2)), goal=jnp.int32(0), t=jnp.int32(0),
    )
    far = MPEState(
        pos=jnp.concatenate([jnp.full((3, 2), -1.0), lpos]),
        vel=jnp.zeros((6, 2)), goal=jnp.int32(0), t=jnp.int32(0),
    )
    r_on = env._rewards(on_landmarks)
    r_far = env._rewards(far)
    assert float(r_on.sum()) > float(r_far.sum())


def test_tag_rewards_are_zero_sum_on_catch():
    from freerl_tpu.envs.mpe import MPEState, SimpleTag

    env = SimpleTag()
    # good agent at origin, one adversary touching it
    pos = jnp.array([
        [0.05, 0.0], [0.9, 0.9], [-0.9, -0.9],   # adversaries
        [0.0, 0.0],                               # good
        [0.5, 0.5], [-0.5, -0.5],                 # obstacles
    ])
    s = MPEState(pos=pos, vel=jnp.zeros((6, 2)), goal=jnp.int32(0),
                 t=jnp.int32(0))
    r = np.asarray(env._rewards(s))
    assert (r[:3] == 10.0).all()
    assert r[3] <= -10.0


def test_heterogeneous_obs_padding():
    env = make("simple_adversary_v3")
    assert env.agent_obs_dims == (8, 10, 10)
    s, o = env.reset(jax.random.PRNGKey(0))
    # adversary obs padded with zeros beyond its true width
    np.testing.assert_array_equal(np.asarray(o[0, 8:]), 0.0)


@pytest.mark.parametrize(
    "algo_fn",
    [
        lambda env: MADDPG(env, MADDPGConfig(batch_size=32,
                                             buffer_size=4096)),
        lambda env: MATD3(env, MADDPGConfig(batch_size=32,
                                            buffer_size=4096)),
        lambda env: MASAC(env, MASACConfig(batch_size=32,
                                           buffer_size=4096)),
    ],
    ids=["maddpg", "matd3", "masac"],
)
@pytest.mark.parametrize("env_name", ["simple_spread_v3",
                                      "simple_adversary_v3"])
def test_marl_learn_step_runs(algo_fn, env_name):
    env = make(env_name)
    algo = algo_fn(env)
    state = algo.init(jax.random.PRNGKey(0))
    from freerl_tpu.train.marl import _example_transition

    buf = algo.make_buffer(_example_transition(env))
    key = jax.random.PRNGKey(1)
    A = env.n_agents
    from freerl_tpu.core.types import Transition

    b = 64
    buf = buf.add(Transition(
        obs=jax.random.normal(key, (b, A, env.dim_info.obs_dim)),
        action=jax.random.uniform(key, (b, A, 5), jnp.float32, -1, 1),
        reward=jax.random.normal(key, (b, A)),
        next_obs=jax.random.normal(key, (b, A, env.dim_info.obs_dim)),
        done=jnp.zeros((b,), jnp.bool_),
        episode_done=jnp.zeros((b,), jnp.bool_),
    ))
    state2, buf2, metrics = jax.jit(
        lambda s, b_, k: algo.learn_step(s, b_, k, 8)
    )(state, buf, key)
    for v in metrics.values():
        assert np.isfinite(float(v))
    # exploration shape + range
    obs = jnp.zeros((4, A, env.dim_info.obs_dim))
    from tests.test_continuous import _ctx

    _, a = algo.explore(state2, obs, jax.random.PRNGKey(3), _ctx(4))
    assert a.shape == (4, A, 5)
    assert float(jnp.abs(a).max()) <= 1.0 + 1e-6


def test_maddpg_learns_simple_spread():
    """600-episode reference protocol, compressed: returns improve
    clearly over the random-policy baseline."""
    env = make("simple_spread_v3")
    algo = MADDPG(env, MADDPGConfig(batch_size=128, buffer_size=100_000,
                                    noise_decay_episodes=300))
    cfg = MARLConfig(num_envs=16, max_episodes=300, start_steps=500,
                     updates_per_burst=2, chunk_size=50)
    _, returns, info = train_marl(env, algo, cfg)
    assert len(returns) >= 250
    first = returns[:30].mean()
    last = returns[-30:].mean()
    assert last > first + 1.0, (first, last)
