"""Fake-SMAC masked MAPPO end-to-end (VERDICT r2 missing #4).

The reference's mask-action MAPPO trains on SMACv2
(MAPPO_file/MAPPO_for_mask_action.py:417-493,625-668). The StarCraft
binary is absent here, so a host python env speaking the exact SMAC
protocol (get_obs / get_avail_actions / shared-reward step /
get_env_info) runs through the io_callback bridge, and masked MAPPO must
(a) never emit an unavailable action — counted by the env itself — and
(b) actually learn the masked task.
"""
import numpy as np

from freerl_tpu.algos.mappo import MAPPO, MAPPOConfig
from freerl_tpu.envs.smac import FakeSmacEnv, HostSmacVecEnv
from freerl_tpu.train.onpolicy import OnPolicyConfig, train_onpolicy


def test_fake_smac_protocol():
    e = FakeSmacEnv(n_agents=3, n_actions=5, episode_limit=10, seed=1)
    info = e.get_env_info()
    assert info["n_agents"] == 3 and info["n_actions"] == 5
    e.reset(seed=0)
    avail = e.get_avail_actions()
    assert avail.shape == (3, 5) and (avail[:, 0] == 1).all()
    # best-available actions give reward n_agents, doubled on hidden
    # bonus rounds — the multiplier is visible ONLY in get_state()
    state = e.get_state()
    assert state.shape == (3 * 5 + 1,)
    # the state is strictly richer than the obs: the avail concat plus
    # the hidden multiplier bit no observation carries
    assert np.array_equal(state[:-1].reshape(3, 5), e.get_obs())
    assert state[-1] in (0.0, 1.0)
    mult = 1.0 + state[-1]
    best_a = (avail * np.arange(5)).max(axis=1).astype(int)
    r, done, _ = e.step(best_a)
    assert r == 3.0 * mult and not done
    # an invalid action is counted
    e.reset(seed=0)
    bad = np.where(e.get_avail_actions()[0] == 0)[0]
    if len(bad):
        e.step(np.array([bad[0], 0, 0]))
        assert e.invalid_actions_received == 1


def test_masked_mappo_learns_fake_smac_end_to_end():
    num_envs = 8
    env = HostSmacVecEnv(
        lambda: FakeSmacEnv(n_agents=3, n_actions=5, episode_limit=25),
        num_envs=num_envs,
    )
    algo = MAPPO(env, MAPPOConfig(
        masked=True, mask_dim=5, num_envs=num_envs, horizon=400,
        K_epochs=5, adv_norm=True,
    ))
    cfg = OnPolicyConfig(num_envs=num_envs, max_episodes=400, horizon=400)
    _, returns, _ = train_onpolicy(env, algo, cfg)
    returns = returns.mean(axis=-1)      # per-agent record -> team view

    # (a) the env never saw an action outside its availability mask
    assert env.invalid_actions_received == 0

    # (b) it learns: random-over-valid scores ~1/3 of the ~112 max
    # (25 steps x 3 agents x E[mult]=1.5); require clearly above random
    # and above the starting level
    final = returns[-50:].mean()
    assert final > 67, final
    assert final > returns[:20].mean() + 10, (final, returns[:20].mean())


def test_state_augmented_masked_mappo_end_to_end():
    """The use_state variant (MAPPO_for_mask_action_state.py:661,
    Buffer.py:498): the env's global state — which here carries a hidden
    reward multiplier absent from every obs — feeds the centralized
    critic once per input, actors still see only [raw_obs, mask]."""
    num_envs = 8
    env = HostSmacVecEnv(
        lambda: FakeSmacEnv(n_agents=3, n_actions=5, episode_limit=25),
        num_envs=num_envs, use_state=True,
    )
    assert env.state_dim == 3 * 5 + 1
    algo = MAPPO(env, MAPPOConfig(
        masked=True, mask_dim=5, state_dim=env.state_dim,
        num_envs=num_envs, horizon=400, K_epochs=5, adv_norm=True,
    ))
    # critic consumes per-agent [raw, mask] concat + the state ONCE
    import jax
    st = algo.init(jax.random.PRNGKey(0))
    cin = algo._critic_input(
        np.zeros((2, 3, env.dim_info.obs_dim), np.float32), 0
    )
    assert cin.shape[-1] == 3 * (5 + 5) + env.state_dim

    cfg = OnPolicyConfig(num_envs=num_envs, max_episodes=250, horizon=400)
    _, returns, _ = train_onpolicy(env, algo, cfg)
    returns = returns.mean(axis=-1)
    assert env.invalid_actions_received == 0
    final = returns[-40:].mean()
    assert final > 60, final
    assert final > returns[:20].mean() + 10, (final, returns[:20].mean())


def test_happo_masked_state_smoke():
    """HAPPO inherits the state-augmented layout from MAPPO: its
    sequential update must feed state-STRIPPED obs to actors built on
    stripped input dims (regression: it crashed with a param-shape
    mismatch when state_dim > 0)."""
    from freerl_tpu.algos.happo import HAPPO, HAPPOConfig

    num_envs = 4
    env = HostSmacVecEnv(
        lambda: FakeSmacEnv(n_agents=3, n_actions=5, episode_limit=10),
        num_envs=num_envs, use_state=True,
    )
    algo = HAPPO(env, HAPPOConfig(
        masked=True, mask_dim=5, state_dim=env.state_dim,
        num_envs=num_envs, horizon=80, K_epochs=2, minibatch_size=40,
    ))
    cfg = OnPolicyConfig(num_envs=num_envs, max_episodes=10, horizon=80)
    _, returns, _ = train_onpolicy(env, algo, cfg)
    assert np.isfinite(returns).all()
    assert env.invalid_actions_received == 0
