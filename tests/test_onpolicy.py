"""PPO (+tricks, Beta) and REINFORCE: unit + end-to-end learning."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freerl_tpu.algos.common import gae
from freerl_tpu.algos.ppo import PPO, PPOConfig, Rollout
from freerl_tpu.algos.reinforce import REINFORCE, REINFORCEConfig
from freerl_tpu.core.types import DimInfo
from freerl_tpu.envs import make
from freerl_tpu.train.onpolicy import OnPolicyConfig, train_onpolicy

DI_C = DimInfo(obs_dim=3, action_dim=1, is_continue=True, max_action=2.0)
DI_D = DimInfo(obs_dim=4, action_dim=2, is_continue=False)


def test_gae_matches_reference_recursion():
    """GAE scan equals the reference python loop (PPO.py:221-233)."""
    T, N = 16, 2
    rng = np.random.RandomState(0)
    rewards = rng.randn(T, N).astype(np.float32)
    vs = rng.randn(T, N).astype(np.float32)
    vs_next = rng.randn(T, N).astype(np.float32)
    done = (rng.rand(T, N) < 0.1).astype(np.float32)
    adv_done = np.maximum(done, (rng.rand(T, N) < 0.1)).astype(np.float32)
    gamma, lam = 0.99, 0.95

    adv_j, vt_j = gae(
        jnp.asarray(rewards), jnp.asarray(vs), jnp.asarray(vs_next),
        jnp.asarray(done), jnp.asarray(adv_done), gamma, lam,
    )
    # reference-style python recursion per env
    adv_ref = np.zeros((T, N), np.float32)
    for n in range(N):
        g = 0.0
        for t in reversed(range(T)):
            delta = rewards[t, n] + gamma * (1 - done[t, n]) * vs_next[t, n] - vs[t, n]
            g = delta + gamma * lam * g * (1 - adv_done[t, n])
            adv_ref[t, n] = g
    np.testing.assert_allclose(np.asarray(adv_j), adv_ref, rtol=1e-4,
                               atol=1e-5)


def _rollout(key, algo, T=32, N=4):
    di = algo.dim_info
    ks = jax.random.split(key, 4)
    if di.is_continue:
        action = jax.random.uniform(ks[0], (T, N, di.action_dim))
        if not algo.cfg.beta_dist:
            action = action * 2 - 1
    else:
        action = jax.random.randint(ks[0], (T, N), 0, di.action_dim)
    return Rollout(
        obs=jax.random.normal(ks[1], (T, N, di.obs_dim)),
        action=action,
        log_pi=jax.random.normal(ks[2], (T, N)) * 0.1 - 1.0,
        reward=jax.random.normal(ks[3], (T, N)),
        next_obs=jax.random.normal(ks[1], (T, N, di.obs_dim)),
        done=jnp.zeros((T, N), jnp.bool_),
        adv_done=jnp.zeros((T, N), jnp.bool_),
    )


@pytest.mark.parametrize(
    "cfg,di",
    [
        (PPOConfig(), DI_C),
        (PPOConfig(), DI_D),
        (PPOConfig(beta_dist=True), DI_C),
        (PPOConfig(adv_norm=True, obs_norm=True, reward_scaling=True,
                   lr_decay=True, orthogonal_init=True, adam_eps=True,
                   tanh=True, num_envs=4), DI_C),
    ],
    ids=["gauss", "discrete", "beta", "all_tricks"],
)
def test_ppo_update_runs(cfg, di):
    algo = PPO(di, cfg)
    state = algo.init(jax.random.PRNGKey(0))
    roll = _rollout(jax.random.PRNGKey(1), algo)
    state2, metrics = jax.jit(
        lambda s, k: algo.update(s, roll, k, episodes=jnp.int32(10))
    )(state, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["adv_mean"]))
    delta = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.actor_params, state2.actor_params,
    )
    assert max(jax.tree.leaves(delta)) > 0


def test_ppo_sample_action_shapes():
    algo = PPO(DI_C, PPOConfig())
    state = algo.init(jax.random.PRNGKey(0))
    obs = jnp.zeros((8, 3))
    env_a, stored, logp = algo.sample_action(state, obs, jax.random.PRNGKey(1))
    assert env_a.shape == (8, 1) and logp.shape == (8,)
    assert float(jnp.abs(env_a).max()) <= 2.0
    # beta actions map into the box
    algo_b = PPO(DI_C, PPOConfig(beta_dist=True))
    sb = algo_b.init(jax.random.PRNGKey(0))
    env_a, stored, logp = algo_b.sample_action(sb, obs, jax.random.PRNGKey(1))
    assert float(env_a.min()) >= -2.0 and float(env_a.max()) <= 2.0
    assert float(stored.min()) >= 0.0 and float(stored.max()) <= 1.0


def test_ppo_learns_cartpole():
    env = make("CartPole-v1")
    algo = PPO(env.dim_info, PPOConfig(horizon=1024, minibatch_size=64,
                                       num_envs=8, adv_norm=True))
    cfg = OnPolicyConfig(num_envs=8, max_episodes=300, horizon=1024)
    _, returns, info = train_onpolicy(env, algo, cfg)
    assert returns[-30:].mean() > 100, returns[-30:].mean()


def test_ppo_learns_pendulum_with_tricks():
    env = make("Pendulum-v1")
    algo = PPO(env.dim_info, PPOConfig(
        horizon=1024, minibatch_size=64, num_envs=8, adv_norm=True,
        obs_norm=True, reward_scaling=True, tanh=False,
        orthogonal_init=True,
    ))
    cfg = OnPolicyConfig(num_envs=8, max_episodes=250, horizon=1024)
    _, returns, info = train_onpolicy(env, algo, cfg)
    assert returns[-20:].mean() > -600, returns[-20:].mean()


def test_reinforce_learns_cartpole():
    # reference cadence: one Adam step per finished episode; window must
    # exceed the env's max episode length so episodes complete in-window
    env = make("CartPole-v1")
    algo = REINFORCE(env.dim_info, REINFORCEConfig(num_envs=1, lr=1e-3))
    cfg = OnPolicyConfig(num_envs=1, max_episodes=400, horizon=1024)
    _, returns, info = train_onpolicy(env, algo, cfg)
    assert returns[-30:].mean() > 80, returns[-30:].mean()


def test_evaluate_action_applies_obs_norm():
    """Offline eval feeds raw obs; with ObsNorm evaluate_action must
    apply the saved running stats (fixed in r3 — raw-obs eval used to
    silently mismatch the trained policy)."""
    import dataclasses

    import jax.numpy as jnp

    env = make("Pendulum-v1")
    algo = PPO(env.dim_info, PPOConfig(obs_norm=True))
    state = algo.init(jax.random.PRNGKey(0))
    # push the running stats far from identity
    big = jnp.full((128, env.dim_info.obs_dim), 100.0)
    state = state.replace(obs_rms=state.obs_rms.update(big))
    raw = jnp.ones((4, env.dim_info.obs_dim)) * 100.0

    a_norm = algo.evaluate_action(state, raw)
    plain = PPO(env.dim_info, PPOConfig(obs_norm=False))
    a_raw = plain.evaluate_action(state, state.obs_rms.normalize(raw))
    assert jnp.allclose(a_norm, a_raw, atol=1e-5)
