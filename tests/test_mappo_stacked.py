"""The stacked (vmap-over-agents) MAPPO fast path must match the
per-agent loop path numerically — same losses, same per-agent keys, same
Adam — on both sampling and the K-epoch update."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freerl_tpu.algos.mappo import MAPPO, MAPPOConfig, MARollout
from freerl_tpu.envs import make


def _rollout(env, algo, state, key, T=8, N=4):
    A = env.n_agents
    k1, k2 = jax.random.split(key)
    obs = jax.random.uniform(
        k1, (T, N, A, env.dim_info.obs_dim), jnp.float32, -1.0, 1.0
    )
    next_obs = jnp.roll(obs, -1, axis=0)
    acts, stores, logps = [], [], []
    for t in range(T):
        _, stored, logp = algo.sample_action(
            state, obs[t], jax.random.fold_in(k2, t)
        )
        stores.append(stored)
        logps.append(logp)
    action = jnp.stack(stores)
    log_pi = jnp.stack(logps)
    reward = jax.random.normal(jax.random.fold_in(k2, 99), (T, N, A))
    done = jnp.zeros((T, N), jnp.bool_)
    return MARollout(obs=obs, action=action, log_pi=log_pi, reward=reward,
                     next_obs=next_obs, done=done, adv_done=done)


@pytest.mark.parametrize("independent", [False, True])
def test_stacked_update_matches_loop(independent):
    env = make("simple_spread_v3")
    cfg = MAPPOConfig(num_envs=4, horizon=32, K_epochs=2,
                      minibatch_size=16, independent=independent,
                      value_clip=True, huber_loss=True)
    algo = MAPPO(env, cfg)
    assert algo._stackable
    state = algo.init(jax.random.PRNGKey(0))
    roll = _rollout(env, algo, state, jax.random.PRNGKey(1))

    s_fast, _ = algo.update(state, roll, jax.random.PRNGKey(2))
    algo._stackable = False                   # force the loop path
    s_loop, _ = algo.update(state, roll, jax.random.PRNGKey(2))

    for fast, loop in (
        (s_fast.actor_params, s_loop.actor_params),
        (s_fast.critic_params, s_loop.critic_params),
    ):
        for pf, pl in zip(fast, loop):
            jax.tree.map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
                ),
                pf, pl,
            )


def test_stacked_sampling_matches_loop():
    env = make("simple_spread_v3")
    algo = MAPPO(env, MAPPOConfig(num_envs=4, horizon=32))
    state = algo.init(jax.random.PRNGKey(0))
    obs = jax.random.uniform(
        jax.random.PRNGKey(3),
        (6, env.n_agents, env.dim_info.obs_dim), jnp.float32, -1.0, 1.0,
    )
    fast = algo.sample_action(state, obs, jax.random.PRNGKey(4))
    algo._stackable = False
    loop = algo.sample_action(state, obs, jax.random.PRNGKey(4))
    for a, b in zip(fast, loop):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
