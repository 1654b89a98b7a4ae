"""Host-callback env bridge: real gymnasium envs inside the jitted loop."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

gym = pytest.importorskip("gymnasium")

from freerl_tpu.algos.dqn import DQN, DQNConfig
from freerl_tpu.envs.host import HostVecEnv
from freerl_tpu.train.loop import OffPolicyConfig, train_offpolicy


def test_host_bridge_spaces_and_step():
    env = HostVecEnv(lambda: gym.make("CartPole-v1"), num_envs=4)
    assert env.dim_info.obs_dim == 4 and env.dim_info.action_dim == 2
    assert env.max_steps == 500
    key = jax.random.PRNGKey(0)
    state, obs = env.vec_reset(key, 4)
    assert obs.shape == (4, 4)
    import jax.numpy as jnp

    out = env.vec_step_auto_reset(state, jnp.zeros((4,), jnp.int32), key, 4)
    assert out.reward.shape == (4,)
    assert float(out.reward.sum()) == 4.0  # CartPole: 1/step


def test_real_gymnasium_trains_through_jitted_loop():
    """The reference's ACTUAL env implementation (gymnasium CartPole) runs
    through the same jitted driver as the pure-JAX envs and learns."""
    env = HostVecEnv(lambda: gym.make("CartPole-v1"), num_envs=8)
    algo = DQN(env.dim_info, DQNConfig(buffer_size=20_000, batch_size=64))
    cfg = OffPolicyConfig(num_envs=8, max_episodes=300, start_steps=500,
                          updates_per_burst=4, chunk_size=64)
    _, returns, info = train_offpolicy(env, algo, cfg)
    assert len(returns) >= 250
    assert returns[-30:].mean() > 2 * returns[:10].mean(), (
        returns[:10].mean(), returns[-30:].mean()
    )


def test_host_bridge_box2d_lunarlander():
    """Box2D LunarLander (the reference's real env) steps through the
    bridge — the compatibility path for envs we also re-derived."""
    pytest.importorskip("Box2D")
    env = HostVecEnv(lambda: gym.make("LunarLander-v3"), num_envs=2)
    assert env.dim_info.obs_dim == 8 and env.dim_info.action_dim == 4
    key = jax.random.PRNGKey(0)
    state, obs = env.vec_reset(key, 2)
    import jax.numpy as jnp

    for t in range(5):
        out = env.vec_step_auto_reset(
            state, jnp.zeros((2,), jnp.int32), jax.random.fold_in(key, t), 2
        )
        state = out.state
    assert np.isfinite(np.asarray(out.reward)).all()


def test_host_vec_env_multiprocess_workers():
    """num_workers > 1 shards envs over processes (the PPO_cc 'cuda train
    / cpu sample' idea, PPO_advance/PPO_cc.py:44-46) with identical
    protocol semantics."""
    import gymnasium as gym

    from freerl_tpu.envs.host import HostVecEnv

    env = HostVecEnv(lambda: gym.make("CartPole-v1"), num_envs=4,
                     num_workers=2)
    try:
        state, obs = env.vec_reset(jax.random.PRNGKey(0), 4)
        assert obs.shape == (4, 4)
        for t in range(30):
            actions = jnp.asarray(np.random.randint(0, 2, 4))
            out = env.vec_step_auto_reset(state, actions,
                                          jax.random.PRNGKey(t), 4)
            state = out.state
            assert out.next_obs.shape == (4, 4)
            assert np.isfinite(np.asarray(out.reward)).all()
    finally:
        env.close()


def test_host_vec_env_workers_learn_through_driver():
    import gymnasium as gym

    from freerl_tpu.algos import DQN, DQNConfig
    from freerl_tpu.envs.host import HostVecEnv
    from freerl_tpu.train import OffPolicyConfig, train_offpolicy

    env = HostVecEnv(lambda: gym.make("CartPole-v1"), num_envs=4,
                     num_workers=2)
    try:
        algo = DQN(env.dim_info, DQNConfig(buffer_size=4000, batch_size=32,
                                           hidden=(32,)))
        cfg = OffPolicyConfig(num_envs=4, max_episodes=10,
                              max_env_steps=1200, start_steps=200,
                              chunk_size=32)
        _, returns, info = train_offpolicy(env, algo, cfg)
        assert len(returns) >= 1 and np.isfinite(returns).all()
    finally:
        env.close()
