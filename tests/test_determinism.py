"""Determinism as the test fixture (SURVEY §4.1).

The reference pins seeds so two runs are bitwise comparable
(DQN_file/DQN.py:264-271). Here the analogue: the same PRNGKey seed gives
identical training trajectories — everything downstream of the key is
pure, so this holds exactly.
"""
import jax
import numpy as np

from freerl_tpu.algos.dqn import DQN, DQNConfig
from freerl_tpu.envs import make
from freerl_tpu.train.loop import OffPolicyConfig, train_offpolicy
from freerl_tpu.train.onpolicy import OnPolicyConfig, train_onpolicy
from freerl_tpu.algos.ppo import PPO, PPOConfig


def test_offpolicy_training_is_deterministic():
    env = make("CartPole-v1")

    def run():
        algo = DQN(env.dim_info, DQNConfig(buffer_size=4096, batch_size=32))
        cfg = OffPolicyConfig(seed=7, num_envs=4, max_episodes=40,
                              start_steps=200, chunk_size=64)
        _, returns, _ = train_offpolicy(env, algo, cfg)
        return returns

    r1, r2 = run(), run()
    np.testing.assert_array_equal(r1, r2)


def test_onpolicy_training_is_deterministic():
    env = make("Pendulum-v1")

    def run():
        algo = PPO(env.dim_info, PPOConfig(horizon=256, K_epochs=2,
                                           num_envs=4))
        cfg = OnPolicyConfig(seed=3, num_envs=4, max_episodes=16,
                             horizon=256)
        _, returns, _ = train_onpolicy(env, algo, cfg)
        return returns

    np.testing.assert_array_equal(run(), run())


def test_different_seeds_differ():
    env = make("CartPole-v1")

    def run(seed):
        algo = DQN(env.dim_info, DQNConfig(buffer_size=4096, batch_size=32))
        cfg = OffPolicyConfig(seed=seed, num_envs=4, max_episodes=20,
                              start_steps=200, chunk_size=64)
        _, returns, _ = train_offpolicy(env, algo, cfg)
        return returns

    r1, r2 = run(0), run(1)
    n = min(len(r1), len(r2))
    assert not np.array_equal(r1[:n], r2[:n])
