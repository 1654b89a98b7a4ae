"""rMAPPO: recurrent MAPPO with GRU actors/critics + truncated BPTT.

The reference notes recurrent MAPPO as unimplemented (MAPPO_file/
MAPPO.py:82-83); these tests cover the new capability: update mechanics,
hidden-state reset semantics, and an end-to-end memory task an MLP policy
cannot solve (the goal signal is only visible at t=0).
"""
import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from freerl_tpu.algos.rmappo import RIPPO, RMAPPO, RMAPPOConfig
from freerl_tpu.core.types import DimInfo
from freerl_tpu.envs import make
from freerl_tpu.envs.base import Env
from freerl_tpu.train.onpolicy import OnPolicyConfig, train_onpolicy


# ---------------------------------------------------------------------------
# A minimal memory env: the goal bit is observable only at t=0; reward at
# every later step for acting consistently with it. Feedforward policies
# are capped at chance (the informative feature is zero when acting).
# ---------------------------------------------------------------------------
@struct.dataclass
class MemoryState:
    goal: jnp.ndarray   # () int32 in {0, 1}
    t: jnp.ndarray      # () int32


class MemorySignal(Env):
    n_agents = 2
    max_steps = 5
    name = "MemorySignal"

    def __init__(self):
        self.dim_info = DimInfo(obs_dim=3, action_dim=2, is_continue=False)
        self.agent_obs_dims = (3,) * self.n_agents
        self.agent_act_dims = (2,) * self.n_agents

    def _obs(self, state):
        sig = jnp.where(
            state.t == 0, jnp.where(state.goal == 1, 1.0, -1.0), 0.0
        )
        row = jnp.array([1.0, 0.0, 0.0]) * sig + jnp.array(
            [0.0, 1.0, 0.0]
        ) * (state.t / self.max_steps)
        return jnp.broadcast_to(row, (self.n_agents, 3))

    def reset(self, key):
        state = MemoryState(
            goal=jax.random.bernoulli(key).astype(jnp.int32),
            t=jnp.int32(0),
        )
        return state, self._obs(state)

    def step(self, state, action, key):
        # action (A,) ints; reward after t=0 for matching the hidden goal
        correct = (action == state.goal).astype(jnp.float32)
        reward = jnp.where(state.t > 0, correct, 0.0)
        state = state.replace(t=state.t + 1)
        trunc = state.t >= self.max_steps
        return state, self._obs(state), reward, jnp.bool_(False), trunc


def _fake_recurrent_batch(key, env, algo, T=8, N=4):
    """Rollout + extras pytree shaped like the driver's scan output."""
    from freerl_tpu.algos.ppo import Rollout

    A, O = env.n_agents, env.dim_info.obs_dim
    H = algo.cfg.rnn_hidden
    ks = jax.random.split(key, 5)
    roll = Rollout(
        obs=jax.random.normal(ks[0], (T, N, A, O)),
        action=jax.random.randint(ks[1], (T, N, A), 0, 2),
        log_pi=jax.random.normal(ks[2], (T, N, A)) * 0.1 - 0.7,
        reward=jax.random.normal(ks[3], (T, N, A)),
        next_obs=jax.random.normal(ks[0], (T, N, A, O)),
        done=jnp.zeros((T, N), jnp.bool_),
        adv_done=jnp.zeros((T, N), jnp.bool_),
    )
    extras = {
        "h_actor": jax.random.normal(ks[4], (T, N, A, H)) * 0.1,
        "h_critic": jax.random.normal(ks[4], (T, N, A, H)) * 0.1,
        "done_prev": jnp.zeros((T, N), jnp.bool_),
    }
    return roll, extras


def test_rmappo_update_runs_and_moves_params():
    env = MemorySignal()
    algo = RMAPPO(env, RMAPPOConfig(
        K_epochs=2, rnn_hidden=16, hidden=(32,), data_chunk_length=4,
        value_clip=True, huber_loss=True, adv_norm=True,
    ))
    state = algo.init(jax.random.PRNGKey(0))
    roll, extras = _fake_recurrent_batch(jax.random.PRNGKey(1), env, algo)
    state2, metrics = jax.jit(
        lambda s, k: algo.update(s, roll, k, episodes=jnp.int32(3),
                                 extras=extras)
    )(state, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["adv_mean"]))
    delta = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.actor_params, state2.actor_params,
    )
    assert max(jax.tree.leaves(delta)) > 0

    # recurrent sampling protocol: carry advances, extras echo the inputs
    carry = algo.init_policy_carry(4)
    obs = jnp.ones((4, env.n_agents, 3))
    dp = jnp.zeros((4,), jnp.bool_)
    env_a, stored, logp, carry2, ex = algo.sample_action(
        state2, obs, jax.random.PRNGKey(3), carry, dp
    )
    assert logp.shape == (4, env.n_agents)
    assert carry2.h_actor.shape == (4, env.n_agents, 16)
    assert float(jnp.abs(carry2.h_actor).max()) > 0
    assert ex["h_actor"] is carry.h_actor


def test_hidden_reset_on_done_matches_zero_hidden():
    env = MemorySignal()
    algo = RMAPPO(env, RMAPPOConfig(rnn_hidden=16, hidden=(32,)))
    state = algo.init(jax.random.PRNGKey(0))
    obs = jax.random.normal(jax.random.PRNGKey(1), (4, env.n_agents, 3))
    garbage = jax.tree.map(
        lambda x: x + 7.0, algo.init_policy_carry(4)
    )
    done = jnp.ones((4,), jnp.bool_)
    _, _, logp_a, ca, _ = algo.sample_action(
        state, obs, jax.random.PRNGKey(2), garbage, done
    )
    _, _, logp_b, cb, _ = algo.sample_action(
        state, obs, jax.random.PRNGKey(2), algo.init_policy_carry(4),
        jnp.zeros((4,), jnp.bool_),
    )
    np.testing.assert_allclose(
        np.asarray(logp_a), np.asarray(logp_b), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(ca.h_actor), np.asarray(cb.h_actor), rtol=1e-6
    )


def test_rmappo_learns_memory_task():
    """GRU policy must recall the t=0 signal; chance return is 2.0 of a
    4.0 max per agent — require clearly above chance."""
    env = MemorySignal()
    algo = RMAPPO(env, RMAPPOConfig(
        actor_lr=3e-3, K_epochs=5, entropy_coefficient=0.005,
        rnn_hidden=32, hidden=(32,), data_chunk_length=5,
        minibatch_size=200, adv_norm=True, num_envs=16,
    ))
    cfg = OnPolicyConfig(seed=0, num_envs=16, max_episodes=4000,
                         horizon=800)
    _, returns, _ = train_onpolicy(env, algo, cfg)
    late = returns[-300:].mean()
    assert late > 3.0, f"late mean per-agent return {late} (chance 2.0)"


def test_recurrent_evaluate_harness():
    """train/evaluate.py drives a stateful (hidden-carrying) policy."""
    from freerl_tpu.train.evaluate import evaluate

    env = MemorySignal()
    algo = RMAPPO(env, RMAPPOConfig(rnn_hidden=16, hidden=(32,)))
    state = algo.init(jax.random.PRNGKey(0))
    n = 8

    def act(obs, pc):
        a, pc = algo.evaluate_action(
            state, obs, pc, jnp.zeros((obs.shape[0],), jnp.bool_)
        )
        return a, pc

    rets = evaluate(env, act, n_episodes=n, multi_agent=True,
                    carry_init=algo.init_policy_carry(n))
    assert rets.shape == (n, env.n_agents)
    assert np.isfinite(rets).all()


def test_rippo_independent_mode_runs():
    env = make("simple_spread_v3")
    algo = RIPPO(env, RMAPPOConfig(
        K_epochs=2, rnn_hidden=16, hidden=(32,), data_chunk_length=4,
    ))
    state = algo.init(jax.random.PRNGKey(0))
    from freerl_tpu.algos.ppo import Rollout

    T, N, A, O = 8, 2, env.n_agents, env.dim_info.obs_dim
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    roll = Rollout(
        obs=jax.random.normal(ks[0], (T, N, A, O)),
        action=jax.random.uniform(ks[1], (T, N, A, 5), jnp.float32, -1, 1),
        log_pi=jax.random.normal(ks[2], (T, N, A)) * 0.1 - 1.6,
        reward=jax.random.normal(ks[3], (T, N, A)),
        next_obs=jax.random.normal(ks[0], (T, N, A, O)),
        done=jnp.zeros((T, N), jnp.bool_),
        adv_done=jnp.zeros((T, N), jnp.bool_),
    )
    extras = {
        "h_actor": jnp.zeros((T, N, A, 16)),
        "h_critic": jnp.zeros((T, N, A, 16)),
        "done_prev": jnp.zeros((T, N), jnp.bool_),
    }
    state2, _ = jax.jit(
        lambda s, k: algo.update(s, roll, k, episodes=jnp.int32(1),
                                 extras=extras)
    )(state, jax.random.PRNGKey(2))
    delta = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.actor_params, state2.actor_params,
    )
    assert max(jax.tree.leaves(delta)) > 0
