"""MAPPO / IPPO / HAPPO / MAT on MPE: unit + end-to-end learning."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freerl_tpu.algos.happo import HAPPO, HAPPOConfig
from freerl_tpu.algos.mappo import IPPO, MAPPO, MAPPOConfig
from freerl_tpu.algos.mat import MAT, MATConfig
from freerl_tpu.algos.ppo import Rollout
from freerl_tpu.envs import make
from freerl_tpu.train.onpolicy import OnPolicyConfig, train_onpolicy


def _rollout(key, env, algo, T=8, N=4):
    A = env.n_agents
    O = env.dim_info.obs_dim
    ks = jax.random.split(key, 4)
    if env.dim_info.is_continue:
        action = jax.random.uniform(ks[0], (T, N, A, 5), jnp.float32, -1, 1)
        logp = jax.random.normal(ks[2], (T, N, A)) * 0.1 - 1.6
        if isinstance(algo, MAT):
            logp = jax.random.normal(ks[2], (T, N, A, 5)) * 0.1 - 1.6
    else:
        action = jax.random.randint(ks[0], (T, N, A), 0, 5)
        logp = jax.random.normal(ks[2], (T, N, A)) * 0.1 - 1.6
    return Rollout(
        obs=jax.random.normal(ks[1], (T, N, A, O)),
        action=action,
        log_pi=logp,
        reward=jax.random.normal(ks[3], (T, N, A)),
        next_obs=jax.random.normal(ks[1], (T, N, A, O)),
        done=jnp.zeros((T, N), jnp.bool_),
        adv_done=jnp.zeros((T, N), jnp.bool_),
    )


@pytest.mark.parametrize(
    "env_name,make_algo",
    [
        ("simple_spread_v3", lambda e: MAPPO(e, MAPPOConfig(K_epochs=2))),
        ("simple_spread_v3", lambda e: MAPPO(e, MAPPOConfig(
            K_epochs=2, adv_norm=True, obs_norm=True, reward_scaling=True,
            orthogonal_init=True, adam_eps=True, lr_decay=True,
            value_clip=True, huber_loss=True, layer_norm=True,
            feature_norm=True, num_envs=4))),
        ("simple_adversary_v3", lambda e: IPPO(e, MAPPOConfig(
            K_epochs=2, independent=True))),
        ("simple_spread_v3", lambda e: HAPPO(e, HAPPOConfig(K_epochs=2))),
    ],
    ids=["mappo", "mappo_12tricks", "ippo_hetero", "happo"],
)
def test_marl_ppo_update_runs(env_name, make_algo):
    env = make(env_name)
    algo = make_algo(env)
    state = algo.init(jax.random.PRNGKey(0))
    roll = _rollout(jax.random.PRNGKey(1), env, algo)
    state2, metrics = jax.jit(
        lambda s, k: algo.update(s, roll, k, episodes=jnp.int32(5))
    )(state, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["adv_mean"]))
    delta = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.actor_params, state2.actor_params,
    )
    assert max(jax.tree.leaves(delta)) > 0
    # action sampling shapes
    obs = jnp.zeros((4, env.n_agents, env.dim_info.obs_dim))
    env_a, stored, logp = algo.sample_action(state2, obs, jax.random.PRNGKey(3))
    assert logp.shape == (4, env.n_agents)


@pytest.mark.parametrize("discrete", [True, False], ids=["disc", "cont"])
def test_mat_update_runs(discrete):
    env = make("simple_spread_v3", continuous_actions=not discrete)
    algo = MAT(env, MATConfig(K_epochs=2))
    state = algo.init(jax.random.PRNGKey(0))
    roll = _rollout(jax.random.PRNGKey(1), env, algo)
    state2, metrics = jax.jit(
        lambda s, k: algo.update(s, roll, k, episodes=jnp.int32(5))
    )(state, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["adv_mean"]))
    obs = jnp.zeros((4, env.n_agents, env.dim_info.obs_dim))
    env_a, stored, logp = algo.sample_action(state2, obs, jax.random.PRNGKey(3))
    if discrete:
        assert stored.shape == (4, 3) and logp.shape == (4, 3)
    else:
        assert stored.shape == (4, 3, 5) and logp.shape == (4, 3, 5)
    det = algo.evaluate_action(state2, obs)
    assert det.shape == stored.shape


def test_mat_autoregressive_consistency():
    """Teacher-forced logp of sampled actions == autoregressive logp."""
    env = make("simple_spread_v3", continuous_actions=False)
    algo = MAT(env, MATConfig())
    state = algo.init(jax.random.PRNGKey(0))
    obs = jax.random.normal(jax.random.PRNGKey(1), (6, 3, 18))
    _, actions, logp_ar = algo.sample_action(state, obs, jax.random.PRNGKey(2))
    params = {"enc": state.enc_params, "dec": state.dec_params}
    logp_tf, _, _ = algo._parallel_logp_ent_v(params, obs, actions)
    np.testing.assert_allclose(
        np.asarray(logp_ar), np.asarray(logp_tf.squeeze(-1)),
        rtol=1e-4, atol=1e-5,
    )


def test_happo_factor_changes_with_updates():
    env = make("simple_spread_v3")
    algo = HAPPO(env, HAPPOConfig(K_epochs=3, actor_lr=1e-3))
    state = algo.init(jax.random.PRNGKey(0))
    roll = _rollout(jax.random.PRNGKey(1), env, algo, T=16, N=4)
    _, metrics = jax.jit(
        lambda s, k: algo.update(s, roll, k)
    )(state, jax.random.PRNGKey(2))
    # factor must move away from exactly 1 after sequential updates
    assert abs(float(metrics["factor_mean"]) - 1.0) > 1e-5


def test_mappo_learns_simple_spread():
    env = make("simple_spread_v3")
    algo = MAPPO(env, MAPPOConfig(num_envs=8, horizon=512, K_epochs=5,
                                  minibatch_size=256, adv_norm=True))
    cfg = OnPolicyConfig(num_envs=8, max_episodes=400, horizon=512)
    _, returns, info = train_onpolicy(env, algo, cfg)
    assert returns.shape[1] == 3
    first = returns[:40].mean()
    last = returns[-40:].mean()
    assert last > first + 0.5, (first, last)


def test_world_comm_heterogeneous_onpolicy():
    """MAPPO/HAPPO/IPPO pad the 9-dim leader action; MAT rejects it."""
    env = make("simple_world_comm_v3")
    A, O, P = env.n_agents, env.dim_info.obs_dim, max(env.agent_act_dims)
    for make_algo in (
        lambda e: MAPPO(e, MAPPOConfig(K_epochs=2)),
        lambda e: HAPPO(e, HAPPOConfig(K_epochs=2)),
        lambda e: IPPO(e, MAPPOConfig(K_epochs=2, independent=True)),
    ):
        algo = make_algo(env)
        state = algo.init(jax.random.PRNGKey(0))
        obs = jax.random.normal(jax.random.PRNGKey(1), (4, A, O))
        env_a, stored, logp = algo.sample_action(
            state, obs, jax.random.PRNGKey(2)
        )
        assert env_a.shape == (4, A, P) and stored.shape == (4, A, P)
        assert logp.shape == (4, A)
        # non-leader action tails are zero padding
        np.testing.assert_array_equal(np.asarray(env_a[:, 1:, 5:]), 0.0)
        det = algo.evaluate_action(state, obs)
        assert det.shape == (4, A, P)
        # one update over a padded rollout
        T, N = 8, 4
        ks = jax.random.split(jax.random.PRNGKey(3), 4)
        roll = Rollout(
            obs=jax.random.normal(ks[0], (T, N, A, O)),
            action=jax.random.uniform(
                ks[1], (T, N, A, P), jnp.float32, -1, 1),
            log_pi=jax.random.normal(ks[2], (T, N, A)) * 0.1 - 1.6,
            reward=jax.random.normal(ks[3], (T, N, A)),
            next_obs=jax.random.normal(ks[0], (T, N, A, O)),
            done=jnp.zeros((T, N), jnp.bool_),
            adv_done=jnp.zeros((T, N), jnp.bool_),
        )
        _, metrics = jax.jit(
            lambda s, k: algo.update(s, roll, k, episodes=jnp.int32(5))
        )(state, jax.random.PRNGKey(4))
        assert np.isfinite(float(metrics["adv_mean"]))

    with pytest.raises(ValueError, match="equal per-agent action dims"):
        MAT(env, MATConfig())


def test_mat_scales_to_many_agents():
    """The scan-based decode keeps trace size O(1) in agent count
    (SURVEY §7.6): a 64-agent MAT must build, sample, and evaluate."""
    import time

    from freerl_tpu.core.types import DimInfo
    from freerl_tpu.envs.base import Env

    class Fake64(Env):
        name = "fake64"
        n_agents = 64
        agent_obs_dims = (12,) * 64
        agent_act_dims = (4,) * 64
        dim_info = DimInfo(obs_dim=12, action_dim=4, is_continue=False)

    algo = MAT(Fake64(), MATConfig(n_embd=32))
    state = algo.init(jax.random.PRNGKey(0))
    obs = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 12))
    t0 = time.time()
    env_a, actions, logp = jax.jit(algo.sample_action)(
        state, obs, jax.random.PRNGKey(2)
    )
    jax.block_until_ready(actions)
    assert actions.shape == (2, 64) and logp.shape == (2, 64)
    det = jax.jit(algo.evaluate_action)(state, obs)
    assert det.shape == (2, 64)
    # the unrolled form would trace 64 decoder forwards; the scan traces 1
    assert time.time() - t0 < 120


# ---------------------------------------------------------------------------
# learning-to-bar tests (VERDICT r2 weak #4): random-policy simple_spread
# sits at ~-24 per-agent; the committed MAPPO golden reaches -19.9 by 600
# episodes. Bars are set from measured seed-0 runs with margin.
def _train_onpolicy_spread(algo_ctor, episodes, horizon=2000):
    from freerl_tpu.train.onpolicy import OnPolicyConfig, train_onpolicy

    env = make("simple_spread_v3")
    algo = algo_ctor(env)
    cfg = OnPolicyConfig(num_envs=8, max_episodes=episodes,
                         horizon=horizon)
    _, r, _ = train_onpolicy(env, algo, cfg)
    return np.asarray(r).mean(axis=-1)


def test_happo_learns_spread():
    from freerl_tpu.algos.happo import HAPPO, HAPPOConfig

    r = _train_onpolicy_spread(
        lambda env: HAPPO(env, HAPPOConfig(num_envs=8, horizon=2000,
                                           actor_lr=5e-4, critic_lr=5e-4)),
        600,
    )
    assert r[-50:].mean() > -23.0, r[-50:].mean()
    assert r[-50:].mean() > r[:20].mean() + 1.0


def test_ippo_learns_spread():
    from freerl_tpu.algos.mappo import IPPO, MAPPOConfig

    r = _train_onpolicy_spread(
        lambda env: IPPO(env, MAPPOConfig(num_envs=8, horizon=2000)), 600,
    )
    assert r[-50:].mean() > -22.0, r[-50:].mean()


def test_mat_learns_spread():
    from freerl_tpu.algos.mat import MAT, MATConfig

    r = _train_onpolicy_spread(
        lambda env: MAT(env, MATConfig(num_envs=8, horizon=2000, lr=5e-4)),
        600,
    )
    # MAT moves slower at these sizes (reference note: 5e-4, others 1e-3);
    # require clear improvement over the random-policy start
    assert r[-50:].mean() > r[:20].mean() + 1.0, (
        r[:20].mean(), r[-50:].mean())
