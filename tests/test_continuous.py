"""DDPG / TD3 / SAC: unit behavior + end-to-end learning on Pendulum."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freerl_tpu.algos.base import ExploreCtx
from freerl_tpu.algos.ddpg import DDPG, DDPGConfig
from freerl_tpu.algos.sac import SAC, SACConfig
from freerl_tpu.algos.td3 import TD3, TD3Config
from freerl_tpu.core.types import DimInfo, Transition
from freerl_tpu.envs import make
from freerl_tpu.train.loop import OffPolicyConfig, train_offpolicy

DI = DimInfo(obs_dim=3, action_dim=1, is_continue=True, max_action=2.0)
DI_DISC = DimInfo(obs_dim=4, action_dim=3, is_continue=False)


def _batch(key, b=32, di=DI):
    ks = jax.random.split(key, 3)
    action = (
        jax.random.uniform(ks[1], (b, di.action_dim), jnp.float32, -1, 1)
        if di.is_continue
        else jax.random.randint(ks[1], (b,), 0, di.action_dim)
    )
    return Transition(
        obs=jax.random.normal(ks[0], (b, di.obs_dim)),
        action=action,
        reward=jax.random.normal(ks[2], (b,)),
        next_obs=jax.random.normal(ks[0], (b, di.obs_dim)),
        done=jnp.zeros((b,), jnp.bool_),
        episode_done=jnp.zeros((b,), jnp.bool_),
    )


def _ctx(b, steps=10**6):
    return ExploreCtx(
        total_env_steps=jnp.int32(steps), episodes=jnp.int32(0),
        done_prev=jnp.zeros((b,), jnp.bool_), random_steps=0,
    )


@pytest.mark.parametrize(
    "make_algo",
    [
        lambda: DDPG(DI, DDPGConfig()),
        lambda: DDPG(DI, DDPGConfig(weight_decay=True, ou_noise=True,
                                    obs_norm=True, net_init=True,
                                    num_envs=8)),
        lambda: DDPG(DI, DDPGConfig(popart=True)),
        lambda: DDPG(DI_DISC, DDPGConfig()),
        lambda: DDPG(DI_DISC, DDPGConfig(discrete_gumbel=True)),
        lambda: TD3(DI, TD3Config()),
        lambda: TD3(DI, TD3Config(clip_double=False, policy_noise=False,
                                  twin_delay=False)),
        lambda: SAC(DI, SACConfig()),
        lambda: SAC(DI_DISC, SACConfig()),
    ],
    ids=["ddpg", "ddpg_full", "ddpg_popart", "ddpg_disc",
         "ddpg_disc_gumbel", "td3", "td3_min", "sac", "sac_disc"],
)
def test_update_steps_and_changes_params(make_algo):
    algo = make_algo()
    state = algo.init(jax.random.PRNGKey(0))
    batch = _batch(jax.random.PRNGKey(1), di=algo.dim_info)
    upd = jax.jit(lambda s, k: algo.update(s, batch, key=k)[0:2])
    s2, metrics = upd(state, jax.random.PRNGKey(2))
    for v in metrics.values():
        assert np.isfinite(float(v))
    delta = jax.tree.map(
        lambda a, b_: float(jnp.abs(a - b_).max()),
        state.critic_params, s2.critic_params,
    )
    assert max(jax.tree.leaves(delta)) > 0
    # explore produces in-range actions
    obs = jnp.zeros((8, algo.dim_info.obs_dim))
    _, a = algo.explore(s2, obs, jax.random.PRNGKey(3), _ctx(8))
    if algo.dim_info.is_continue:
        assert a.shape == (8, algo.dim_info.action_dim)
        assert float(jnp.abs(a).max()) <= algo.dim_info.max_action + 1e-5
    else:
        assert a.shape == (8,)


def test_td3_delayed_actor_update():
    algo = TD3(DI, TD3Config(policy_freq=2))
    state = algo.init(jax.random.PRNGKey(0))
    batch = _batch(jax.random.PRNGKey(1))
    upd = jax.jit(lambda s, k: algo.update(s, batch, key=k)[0])
    s1 = upd(state, jax.random.PRNGKey(2))  # step 0: skip actor
    d01 = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.actor_params, s1.actor_params)))
    s2 = upd(s1, jax.random.PRNGKey(3))      # step 1: actor updates
    d12 = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        s1.actor_params, s2.actor_params)))
    assert d01 == 0.0 and d12 > 0.0


def test_ou_noise_resets_on_done():
    algo = DDPG(DI, DDPGConfig(ou_noise=True, num_envs=4))
    state = algo.init(jax.random.PRNGKey(0))
    obs = jnp.zeros((4, 3))
    ctx = _ctx(4)
    for i in range(10):
        state, _ = algo.explore(state, obs, jax.random.fold_in(
            jax.random.PRNGKey(1), i), ctx)
    assert float(jnp.abs(state.ou_state).sum()) > 0
    done = jnp.array([True, False, False, False])
    ctx2 = ctx.replace(done_prev=done)
    prev = np.asarray(state.ou_state)
    state, _ = algo.explore(state, obs, jax.random.PRNGKey(2), ctx2)
    # env 0's OU state restarted from zero: magnitude collapses vs its prior
    assert abs(np.asarray(state.ou_state)[0, 0] - prev[0, 0]) > 0


def test_sac_alpha_adapts():
    algo = SAC(DI, SACConfig())
    state = algo.init(jax.random.PRNGKey(0))
    batch = _batch(jax.random.PRNGKey(1))
    upd = jax.jit(lambda s, k: algo.update(s, batch, key=k)[0])
    a0 = float(jnp.exp(state.log_alpha))
    for i in range(5):
        state = upd(state, jax.random.fold_in(jax.random.PRNGKey(2), i))
    assert float(jnp.exp(state.log_alpha)) != a0


def test_ddpg_obs_norm_process_obs():
    algo = DDPG(DI, DDPGConfig(obs_norm=True, num_envs=4))
    state = algo.init(jax.random.PRNGKey(0))
    next_obs = jnp.ones((4, 3)) * 5.0
    state, n_obs, c_obs = algo.process_obs(state, next_obs, next_obs)
    assert float(state.obs_rms.count) > 1
    assert float(jnp.abs(n_obs).max()) < 5.0  # normalized


@pytest.mark.parametrize(
    "algo_fn",
    [
        lambda di: DDPG(di, DDPGConfig(buffer_size=50_000, gauss_sigma=0.5,
                                       num_envs=8)),
        lambda di: TD3(di, TD3Config(buffer_size=50_000, gauss_sigma=0.5,
                                     policy_noise_sigma=0.2, num_envs=8)),
        lambda di: SAC(di, SACConfig(buffer_size=50_000, num_envs=8)),
    ],
    ids=["ddpg", "td3", "sac"],
)
def test_learns_pendulum(algo_fn):
    """Pendulum-v1: random policy ~= -1200; must clearly improve."""
    env = make("Pendulum-v1")
    algo = algo_fn(env.dim_info)
    cfg = OffPolicyConfig(
        num_envs=8, max_episodes=120, start_steps=1000, random_steps=1000,
        updates_per_burst=4, chunk_size=100,
    )
    _, returns, info = train_offpolicy(env, algo, cfg)
    assert len(returns) >= 100
    assert returns[-20:].mean() > -500, returns[-20:].mean()


def test_ddpg_discrete_variants_cartpole():
    """Discrete DDPG, both reference variants end-to-end on CartPole.

    The softmax-probability actor (DDPG_simple_add_discrete.py — the
    variant the reference kept) must LEARN. The gumbel-softmax
    straight-through actor (DDPG_simple_add_discrete_gumbel(lose).py)
    runs the same pipeline but plateaus near the random return — the
    reference abandoned it for exactly this reason, and our
    reimplementation reproduces that negative result rather than
    pretending otherwise."""
    from freerl_tpu.envs import make
    from freerl_tpu.train.loop import OffPolicyConfig, train_offpolicy

    env = make("CartPole-v1")
    cfg = OffPolicyConfig(num_envs=8, max_episodes=250, start_steps=500,
                          updates_per_burst=4, chunk_size=128)

    algo = DDPG(env.dim_info, DDPGConfig(
        buffer_size=20_000, batch_size=64, num_envs=8))
    _, returns, _ = train_offpolicy(env, algo, cfg)
    assert returns[-30:].mean() > 40, returns[-30:].mean()

    algo_g = DDPG(env.dim_info, DDPGConfig(
        buffer_size=20_000, batch_size=64, discrete_gumbel=True,
        num_envs=8))
    _, returns_g, info = train_offpolicy(env, algo_g, cfg)
    import numpy as np

    assert np.isfinite(returns_g).all() and info["updates"] > 0
