"""GAIL (imitation) and ENVELOPE (multi-objective) tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freerl_tpu.algos.envelope import Envelope, EnvelopeConfig, random_preference
from freerl_tpu.algos.gail import (
    GAIL,
    GAILConfig,
    ExpertData,
    collect_expert_data,
    init_logging,
    train_gail,
)
from freerl_tpu.algos.ppo import PPOConfig
from freerl_tpu.core.types import Transition
from freerl_tpu.envs import make
from freerl_tpu.train.loop import OffPolicyConfig, train_offpolicy


# --------------------------------------------------------------------------
# GAIL
# --------------------------------------------------------------------------
def _expert(key, n=512, obs_dim=3, act_dim=1):
    ks = jax.random.split(key)
    return ExpertData(
        states=jax.random.normal(ks[0], (n, obs_dim)),
        actions=jnp.tanh(jax.random.normal(ks[1], (n, act_dim))),
    )


@pytest.mark.parametrize("gp", [0.0, 10.0], ids=["vanilla", "wgan_gp"])
def test_discriminator_trains_and_separates(gp):
    env = make("Pendulum-v1")
    gail = GAIL(env.dim_info, PPOConfig(horizon=128, K_epochs=2),
                GAILConfig(gp_coef=gp))
    state = gail.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    expert_s = jax.random.normal(key, (256, 3)) + 2.0   # separable clusters
    expert_a = jnp.ones((256, 1)) * 0.5
    policy_s = jax.random.normal(key, (256, 3)) - 2.0
    policy_a = -jnp.ones((256, 1)) * 0.5
    step = jax.jit(lambda s: gail.train_d(s, expert_s, expert_a,
                                          policy_s, policy_a))
    n_steps = 100 if gp == 0.0 else 400  # the gradient penalty slows D
    for _ in range(n_steps):
        state, metrics = step(state)
    assert float(metrics["expert_prob"]) > 0.7
    assert float(metrics["policy_prob"]) < 0.3
    # GAIL reward favors expert-like pairs
    r_exp = gail.compute_reward(state.d_params, expert_s, expert_a)
    r_pol = gail.compute_reward(state.d_params, policy_s, policy_a)
    assert float(r_exp.mean()) > float(r_pol.mean())


def test_expert_npz_roundtrip(tmp_path):
    data = _expert(jax.random.PRNGKey(0))
    np.savez(tmp_path / "expert.npz", states=np.asarray(data.states),
             actions=np.asarray(data.actions))
    loaded = ExpertData.from_npz(str(tmp_path / "expert.npz"))
    s, a = loaded.sample(jax.random.PRNGKey(1), 32)
    assert s.shape == (32, 3) and a.shape == (32, 1)


def test_collect_expert_and_train_gail_iterations(tmp_path):
    env = make("Pendulum-v1")
    gail = GAIL(env.dim_info, PPOConfig(horizon=256, K_epochs=2,
                                        minibatch_size=64),
                GAILConfig())
    # expert = random policy (just testing the machinery end-to-end)
    expert = collect_expert_data(
        env, lambda obs: jnp.zeros((obs.shape[0], 1)), 512,
        out_path=str(tmp_path / "e.npz"),
    )
    assert expert.states.shape[0] == 512
    state, record, history = train_gail(env, gail, expert,
                                        num_iterations=3, num_envs=4)
    assert len(record) == 3
    assert all(np.isfinite(list(h.values())).all() for h in history)
    run_dir = init_logging(str(tmp_path / "logs"), {"algo": "GAIL"})
    import os

    assert os.path.exists(os.path.join(run_dir, "config.json"))


# --------------------------------------------------------------------------
# ENVELOPE
# --------------------------------------------------------------------------
def test_deep_sea_treasure_dynamics():
    env = make("deep-sea-treasure-v0")
    key = jax.random.PRNGKey(0)
    s, o = env.reset(key)
    np.testing.assert_array_equal(np.asarray(o), [0, 0])
    # dive straight down: first treasure (0.7) at row 1 col 0
    s2, o2, r, term, trunc = env.step(s, jnp.int32(1), key)
    np.testing.assert_allclose(np.asarray(r), [0.7, -1.0])
    assert bool(term)
    # move right along the surface then down to 8.2
    s, o = env.reset(key)
    s, o, r, term, _ = env.step(s, jnp.int32(3), key)   # right
    assert not bool(term)
    s, o, r, term, _ = env.step(s, jnp.int32(1), key)   # down (row1,col1)
    assert not bool(term)
    s, o, r, term, _ = env.step(s, jnp.int32(1), key)   # down (row2,col1)
    np.testing.assert_allclose(np.asarray(r), [8.2, -1.0])
    assert bool(term)


def test_random_preference_is_simplex():
    w = random_preference(jax.random.PRNGKey(0), 2, (64,))
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, rtol=1e-5)
    assert (np.asarray(w) >= 0).all()


def test_envelope_update_and_priority_add():
    env = make("deep-sea-treasure-v0")
    algo = Envelope(env.dim_info, reward_dim=2,
                    cfg=EnvelopeConfig(buffer_size=1024, batch_size=32,
                                       weight_num=3, max_episodes=100))
    state = algo.init(jax.random.PRNGKey(0))
    buf = algo.make_buffer(Transition(
        obs=jnp.zeros((2,)), action=jnp.int32(0), reward=jnp.zeros((2,)),
        next_obs=jnp.zeros((2,)), done=jnp.bool_(False),
        episode_done=jnp.bool_(False),
    ))
    key = jax.random.PRNGKey(1)
    batch = Transition(
        obs=jax.random.normal(key, (64, 2)),
        action=jax.random.randint(key, (64,), 0, 4),
        reward=jax.random.normal(key, (64, 2)),
        next_obs=jax.random.normal(key, (64, 2)),
        done=jnp.zeros((64,), jnp.bool_).at[5].set(True),
        episode_done=jnp.zeros((64,), jnp.bool_).at[5].set(True),
    )
    beta0 = float(state.beta)
    state, buf = jax.jit(algo.add_transition)(state, buf, batch, key)
    assert float(state.beta) > beta0          # homotopy advanced on done
    assert float(buf.priorities[:64].min()) > 0
    state2, buf2, metrics = jax.jit(
        lambda s, b, k: algo.learn_step(s, b, k, 1)
    )(state, buf, key)
    assert np.isfinite(float(metrics["loss"]))


def test_envelope_learns_dst():
    """ENVELOPE on deep-sea-treasure: the preference-conditioned policy
    should find treasures (positive utility) within a short run."""
    env = make("deep-sea-treasure-v0")
    algo = Envelope(env.dim_info, reward_dim=2,
                    cfg=EnvelopeConfig(buffer_size=50_000, batch_size=64,
                                       weight_num=4, max_episodes=400))
    cfg = OffPolicyConfig(num_envs=8, max_episodes=400, start_steps=300,
                          updates_per_burst=2, chunk_size=64)
    algo_state, returns, info = train_offpolicy(env, algo, cfg)
    # returns recorded as component-sum: treasure value minus step count
    assert len(returns) >= 300
    assert np.isfinite(returns).all()
    # utility under a treasure-heavy preference improves over training
    assert returns[-50:].mean() > returns[:50].mean(), (
        returns[:50].mean(), returns[-50:].mean()
    )
    # the preference-conditioned greedy policy reaches a treasure
    from freerl_tpu.train.evaluate import evaluate

    pref = jnp.array([0.9, 0.1])
    rets = evaluate(
        env,
        lambda obs: algo.evaluate_action(algo_state, obs, pref),
        n_episodes=8,
    )
    assert rets.mean() > -100  # not all episodes time out at -100
