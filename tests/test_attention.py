"""Attention critics: MAAC, ATT-MADDPG, MAPPO_attention."""
import jax
import jax.numpy as jnp
import numpy as np

from freerl_tpu.algos.maac import MAAC, MAACConfig
from freerl_tpu.algos.maddpg import MADDPG, MADDPGConfig
from freerl_tpu.algos.mappo import MAPPO, MAPPOConfig
from freerl_tpu.core.types import Transition
from freerl_tpu.envs import make
from freerl_tpu.train.marl import MARLConfig, _example_transition, train_marl


def _fill_buffer(algo, env, b=64, discrete=False):
    buf = algo.make_buffer(_example_transition(env))
    key = jax.random.PRNGKey(1)
    A = env.n_agents
    action = (
        jax.random.randint(key, (b, A), 0, 5)
        if discrete
        else jax.random.uniform(key, (b, A, 5), jnp.float32, -1, 1)
    )
    return buf.add(Transition(
        obs=jax.random.normal(key, (b, A, env.dim_info.obs_dim)),
        action=action,
        reward=jax.random.normal(key, (b, A)),
        next_obs=jax.random.normal(key, (b, A, env.dim_info.obs_dim)),
        done=jnp.zeros((b,), jnp.bool_),
        episode_done=jnp.zeros((b,), jnp.bool_),
    ))


def test_maac_learn_step_and_shared_attention():
    env = make("simple_spread_v3", continuous_actions=False)
    algo = MAAC(env, MAACConfig(batch_size=32, buffer_size=4096))
    state = algo.init(jax.random.PRNGKey(0))
    # shared attention params exist once
    assert "attn" in state.critic_params
    buf = _fill_buffer(algo, env, discrete=True)
    state2, _, metrics = jax.jit(
        lambda s, b, k: algo.learn_step(s, b, k, 8)
    )(state, buf, jax.random.PRNGKey(2))
    for v in metrics.values():
        assert np.isfinite(float(v))
    # shared attention received gradient (params changed)
    d = jax.tree.map(
        lambda a, b_: float(jnp.abs(a - b_).max()),
        state.critic_params["attn"], state2.critic_params["attn"],
    )
    assert max(jax.tree.leaves(d)) > 0
    # action API
    obs = jnp.zeros((4, 3, 18))
    a = algo.evaluate_action(state2, obs)
    assert a.shape == (4, 3)


def test_maac_trains_briefly():
    env = make("simple_spread_v3", continuous_actions=False)
    algo = MAAC(env, MAACConfig(batch_size=64, buffer_size=20_000))
    cfg = MARLConfig(num_envs=8, max_episodes=40, start_steps=400,
                     chunk_size=50)
    _, returns, info = train_marl(env, algo, cfg)
    assert len(returns) >= 30 and np.isfinite(returns).all()


def test_att_maddpg_critic():
    env = make("simple_spread_v3")
    algo = MADDPG(env, MADDPGConfig(att_critic=True, batch_size=32,
                                    buffer_size=4096))
    state = algo.init(jax.random.PRNGKey(0))
    buf = _fill_buffer(algo, env)
    state2, _, metrics = jax.jit(
        lambda s, b, k: algo.learn_step(s, b, k, 8)
    )(state, buf, jax.random.PRNGKey(2))
    for v in metrics.values():
        assert np.isfinite(float(v))
    d = jax.tree.map(
        lambda a, b_: float(jnp.abs(a - b_).max()),
        state.actor_params, state2.actor_params,
    )
    assert max(jax.tree.leaves(d)) > 0


def test_mappo_attention_critic():
    env = make("simple_spread_v3")
    algo = MAPPO(env, MAPPOConfig(attention=True, K_epochs=2))
    state = algo.init(jax.random.PRNGKey(0))
    assert state.critic_params[1] == {}  # shared critic lives in slot 0
    from tests.test_marl_onpolicy import _rollout

    roll = _rollout(jax.random.PRNGKey(1), env, algo)
    state2, metrics = jax.jit(
        lambda s, k: algo.update(s, roll, k)
    )(state, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["adv_mean"]))
    d = jax.tree.map(
        lambda a, b_: float(jnp.abs(a - b_).max()),
        state.critic_params[0], state2.critic_params[0],
    )
    assert max(jax.tree.leaves(d)) > 0
