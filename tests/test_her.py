"""HER: goal-conditioned Pendulum + future-strategy relabeling.

Parity surface: DDPG_file/DDPG_simple_try_HER.py (calcu_reward :247-265,
generate_goals :267-279, gene_new_sas :281-286, relabel loop :421-427).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freerl_tpu.algos.ddpg import DDPG, DDPGConfig
from freerl_tpu.core.types import DimInfo
from freerl_tpu.envs.goal import GoalPendulum
from freerl_tpu.train.her import HERConfig, relabel_future, train_her


def test_goal_pendulum_obs_layout():
    env = GoalPendulum()
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (6,)
    # last 3 dims are the goal, first 3 the pendulum obs
    np.testing.assert_allclose(np.asarray(obs[3:]), np.asarray(state.goal))
    # goal distribution: cos in [0,1), sin = sqrt(1-cos^2), w in [0,2)
    goals = jax.vmap(env.sample_goal)(
        jax.random.split(jax.random.PRNGKey(1), 256)
    )
    assert (goals[:, 0] >= 0).all() and (goals[:, 0] < 1).all()
    np.testing.assert_allclose(
        np.asarray(jnp.sqrt(1 - goals[:, 0] ** 2)), np.asarray(goals[:, 1]),
        rtol=1e-5,
    )
    assert (goals[:, 2] >= 0).all() and (goals[:, 2] < 2).all()


def test_binary_reward_matches_reference_formula():
    env = GoalPendulum()
    goal = jnp.array([1.0, 0.0, 0.0])
    # obs exactly at goal -> cost 0 -> reward 0
    at_goal = jnp.array([1.0, 0.0, 0.0, 0.0, 0.0, 0.0])
    assert float(env.goal_reward(goal, at_goal)) == 0.0
    # far: cos=-1 -> cost 4 >= 0.5 -> -1
    far = jnp.array([-1.0, 0.0, 0.0, 0.0, 0.0, 0.0])
    assert float(env.goal_reward(goal, far)) == -1.0
    # just above the 0.5 tolerance: cost = 0.6**2 + 0.1*2**2 = 0.76 -> -1
    near = jnp.array([0.4, 0.0, 2.0, 0, 0, 0])
    assert float(env.goal_reward(goal, near)) == -1.0


def test_step_reward_uses_current_obs():
    """The reference computes calcu_reward(goal, obs, a) on the PRE-step
    obs (:397); the env must preserve that convention."""
    env = GoalPendulum()
    state, obs = env.reset(jax.random.PRNGKey(3))
    # force goal = achieved(current obs): reward must be 0 regardless of
    # where the step lands
    state = state.replace(goal=obs[:3])
    _, _, r, _, _ = env.step(state, jnp.array([2.0]), jax.random.PRNGKey(4))
    assert float(r) == 0.0


def test_relabel_future_window_and_rewards():
    env = GoalPendulum()
    T, k = 8, 4
    key = jax.random.PRNGKey(0)
    obs = jax.random.normal(key, (T, 6))
    next_obs = jax.random.normal(jax.random.fold_in(key, 1), (T, 6))
    action = jnp.zeros((T, 1))
    rel = relabel_future(env, obs, action, next_obs, key, k, sample_range=200)
    assert rel.obs.shape == (T * k, 6)
    # relabeled rewards are recomputed from (new_goal, original obs)
    recomputed = env.goal_reward(rel.obs[:, 3:], rel.obs)
    np.testing.assert_allclose(np.asarray(rel.reward), np.asarray(recomputed))
    # every relabeled goal is an achieved state from the trajectory future:
    achieved = np.asarray(env.achieved(next_obs))
    goals = np.asarray(rel.obs[:, 3:]).reshape(T, k, 3)
    for t in range(T):
        for i in range(k):
            dists = np.abs(achieved[t:] - goals[t, i]).sum(axis=-1)
            assert dists.min() < 1e-6, f"goal at t={t} not from future"
    # done flags cleared on relabeled copies (reference :427 stores False)
    assert not np.asarray(rel.done).any()


def test_her_ddpg_smoke():
    """Short HER-DDPG run: executes end-to-end, returns are sparse."""
    class TinyGoalPendulum(GoalPendulum):
        max_steps = 25

    env = TinyGoalPendulum()
    algo = DDPG(
        env.dim_info,
        DDPGConfig(hidden=(32, 32), batch_size=32, buffer_size=20_000,
                   num_envs=4),
    )
    cfg = HERConfig(num_envs=4, max_episodes=8, start_steps=100,
                    updates_per_episode=5, k_future=4, sample_range=200)
    state, returns, info = train_her(env, algo, cfg)
    assert len(returns) == 8
    # sparse returns are in [-T, 0]
    assert (returns <= 0).all() and (returns >= -25).all()
