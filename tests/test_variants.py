"""PPO variants, masked MAPPO, tabular envs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freerl_tpu.algos.mappo import MAPPO, MAPPOConfig
from freerl_tpu.algos.ppo import PPO, PPOConfig
from freerl_tpu.envs import make
from freerl_tpu.envs.masked import MaskedSpread
from freerl_tpu.envs.tabular import FrozenLake, Taxi
from freerl_tpu.train.onpolicy import OnPolicyConfig, train_onpolicy


# --------------------------------------------------------------------------
def test_ppo_d_recompute_logp():
    """PPO_d stores no log-pi; first-epoch ratios are exactly 1."""
    from freerl_tpu.core.types import DimInfo
    from tests.test_onpolicy import _rollout

    di = DimInfo(obs_dim=3, action_dim=1, is_continue=True, max_action=2.0)
    algo = PPO(di, PPOConfig(recompute_logp=True, K_epochs=2))
    state = algo.init(jax.random.PRNGKey(0))
    roll = _rollout(jax.random.PRNGKey(1), algo)
    s2, m = jax.jit(lambda s, k: algo.update(s, roll, k))(
        state, jax.random.PRNGKey(2)
    )
    assert np.isfinite(float(m["adv_mean"]))


def test_ppo_std_decay_schedule():
    from freerl_tpu.core.types import DimInfo
    from tests.test_onpolicy import _rollout

    di = DimInfo(obs_dim=3, action_dim=1, is_continue=True, max_action=2.0)
    algo = PPO(di, PPOConfig(std_decay=True, std_init=0.6, std_min=0.1,
                             std_decay_episodes=100, K_epochs=1))
    state = algo.init(jax.random.PRNGKey(0))
    assert float(state.ext_std) == pytest.approx(0.6)
    roll = _rollout(jax.random.PRNGKey(1), algo)
    s2, _ = algo.update(state, roll, jax.random.PRNGKey(2),
                        episodes=jnp.int32(50))
    assert float(s2.ext_std) == pytest.approx(0.35, abs=1e-5)
    s3, _ = algo.update(s2, roll, jax.random.PRNGKey(3),
                        episodes=jnp.int32(1000))
    assert float(s3.ext_std) == pytest.approx(0.1, abs=1e-5)


def test_ppo_no_minibatch_equivalent():
    """PPO_no_minibatch == minibatch_size = horizon (one full batch)."""
    from freerl_tpu.core.types import DimInfo
    from tests.test_onpolicy import _rollout

    di = DimInfo(obs_dim=3, action_dim=1, is_continue=True, max_action=2.0)
    algo = PPO(di, PPOConfig(minibatch_size=32 * 4, K_epochs=2))
    state = algo.init(jax.random.PRNGKey(0))
    roll = _rollout(jax.random.PRNGKey(1), algo)  # T=32, N=4 -> B=128
    s2, m = algo.update(state, roll, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["adv_mean"]))


# --------------------------------------------------------------------------
def test_masked_env_and_mappo_masked():
    env = MaskedSpread()
    assert env.dim_info.obs_dim == 18 + 5
    s, o = env.reset(jax.random.PRNGKey(0))
    # mask tail is 0/1 and noop always available
    mask = np.asarray(o[:, -5:])
    assert set(np.unique(mask)).issubset({0.0, 1.0})
    assert (mask[:, 0] == 1).all()

    algo = MAPPO(env, MAPPOConfig(masked=True, mask_dim=5, K_epochs=2))
    state = algo.init(jax.random.PRNGKey(0))
    obs = jnp.asarray(np.tile(np.asarray(o)[None], (6, 1, 1)))
    env_a, stored, logp = algo.sample_action(state, obs, jax.random.PRNGKey(1))
    assert env_a.shape == (6, 3)
    # sampled actions always respect the mask
    for b in range(6):
        for i in range(3):
            assert mask[i, int(env_a[b, i])] == 1.0

    # masked training runs end-to-end
    cfg = OnPolicyConfig(num_envs=4, max_episodes=30, horizon=200)
    _, returns, _ = train_onpolicy(env, algo, cfg)
    assert np.isfinite(returns).all()


def test_masked_logits_never_sample_invalid():
    """Force an extreme mask; invalid actions must never be drawn."""
    from freerl_tpu.nets.distributions import masked_logits

    logits = jnp.ones((100, 5)) * jnp.array([10.0, 0, 0, 0, 0])
    mask = jnp.tile(jnp.array([0.0, 1, 1, 1, 1]), (100, 1))
    ml = masked_logits(logits, mask)
    a = jax.random.categorical(jax.random.PRNGKey(0), ml)
    assert (np.asarray(a) != 0).all()


# --------------------------------------------------------------------------
def test_frozenlake_dynamics():
    env = FrozenLake(is_slippery=False)
    s, o = env.reset(jax.random.PRNGKey(0))
    assert float(o[0]) == 0.0
    # deterministic: right, right, down, down, down, right -> goal
    path = [2, 2, 1, 1, 1, 2]
    r_total = 0.0
    for a in path:
        s, o, r, term, trunc = env.step(s, jnp.int32(a), jax.random.PRNGKey(1))
        r_total += float(r)
    assert bool(term) and r_total == 1.0


def test_frozenlake_slippery_probs():
    env = FrozenLake(is_slippery=True)
    # from start, action RIGHT: outcomes are up/right/down each 1/3
    p = np.asarray(env.prob[0, 2])
    np.testing.assert_allclose(p, [1 / 3] * 3)


def test_taxi_dynamics():
    env = Taxi()
    # count start states: 25 positions x 4 pass locs x 3 dests (p != d) = 300
    assert len(env.start_states) == 300
    s, o = env.reset(jax.random.PRNGKey(0))
    # illegal pickup gives -10 (unless taxi happens to start on the pass loc)
    s2, o2, r, term, trunc = env.step(s, jnp.int32(5), jax.random.PRNGKey(1))
    assert float(r) in (-10.0,)
    assert not bool(term)


def test_dqn_runs_on_frozenlake_and_taxi():
    """Tabular envs drive the scalar-state DQN pipeline end-to-end.

    (Learning to convergence on FrozenLake takes ~5000 episodes even in the
    reference — DQN_file/DQN.py:225 — so this checks mechanics + that
    exploration reaches the sparse goal, not final performance.)
    """
    from freerl_tpu.algos.dqn import DQN, DQNConfig
    from freerl_tpu.train.loop import OffPolicyConfig, train_offpolicy

    env = make("FrozenLake-v1", is_slippery=False)
    algo = DQN(env.dim_info, DQNConfig(buffer_size=20_000, batch_size=64,
                                       epsilon=0.3))
    cfg = OffPolicyConfig(num_envs=8, max_episodes=400, start_steps=300,
                          updates_per_burst=1, chunk_size=64)
    _, returns, _ = train_offpolicy(env, algo, cfg)
    assert np.isfinite(returns).all()
    assert returns.max() == 1.0  # the goal is reachable and reached

    env2 = make("Taxi-v3")
    algo2 = DQN(env2.dim_info, DQNConfig(buffer_size=20_000, batch_size=64))
    cfg2 = OffPolicyConfig(num_envs=8, max_episodes=40, start_steps=300,
                           updates_per_burst=1, chunk_size=64)
    _, r2, _ = train_offpolicy(env2, algo2, cfg2)
    assert np.isfinite(r2).all()
