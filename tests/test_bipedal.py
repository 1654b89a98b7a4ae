"""BipedalWalker: articulated-body sanity + behavioral calibration."""
import jax
import jax.numpy as jnp
import numpy as np

from freerl_tpu.envs import make
from freerl_tpu.envs.bipedal import LEG_H, TERRAIN_HEIGHT, BipedalWalker


def test_obs_layout_and_reset():
    env = make("BipedalWalker-v3")
    assert env.dim_info.obs_dim == 24 and env.dim_info.action_dim == 4
    s, o = env.reset(jax.random.PRNGKey(0))
    o = np.asarray(o)
    assert abs(o[0]) < 0.1          # hull near upright
    assert (o[14:] <= 1.0).all() and (o[14:] > 0).all()  # lidar fractions
    assert o.shape == (24,)


def test_zero_torque_collapses_like_gym():
    """With zero motor torque the free-jointed walker folds and the hull
    hits the ground for -100 (gym: ~114 steps; ours ~101 with the
    warm-started accumulated-impulse solver)."""
    env = BipedalWalker()
    step = jax.jit(env.step)
    s, o = env.reset(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    tot = 0.0
    for t in range(400):
        s, o, r, term, trunc = step(s, jnp.zeros(4), jax.random.fold_in(key, t))
        tot += float(r)
        if bool(term):
            break
    assert bool(term)
    assert float(r) == -100.0
    assert 20 < t < 300


def test_random_policy_return_matches_gym_scale():
    """Random torques: returns ~ -100..-110 (gym measures -99..-111)."""
    env = BipedalWalker()
    step = jax.jit(env.step)
    rets = []
    for seed in range(3):
        s, o = env.reset(jax.random.PRNGKey(seed))
        key = jax.random.PRNGKey(seed + 50)
        tot = 0.0
        for t in range(400):
            a = jax.random.uniform(jax.random.fold_in(key, t), (4,),
                                   jnp.float32, -1, 1)
            s, o, r, term, trunc = step(s, a, jax.random.fold_in(key, t))
            tot += float(r)
            if bool(term):
                break
        rets.append(tot)
    assert -130 < np.mean(rets) < -80, rets


def test_motor_torque_moves_joints():
    env = BipedalWalker()
    step = jax.jit(env.step)
    s, o = env.reset(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(2)
    # drive both hips forward; relative hip angles must respond
    for t in range(10):
        s, o, r, term, trunc = step(
            s, jnp.array([1.0, 0.0, 1.0, 0.0]), jax.random.fold_in(key, t)
        )
    hip_l = float(o[4])
    s2, o2 = env.reset(jax.random.PRNGKey(0))
    for t in range(10):
        s2, o2, *_ = step(
            s2, jnp.array([-1.0, 0.0, -1.0, 0.0]), jax.random.fold_in(key, t)
        )
    assert hip_l != float(o2[4])
    # knee limit: relative knee angle stays within [-1.6, -0.1] + slack
    assert -1.8 < float(o[6]) < 0.1


def test_terrain_is_flat_on_startpad_then_varies():
    env = BipedalWalker()
    s, _ = env.reset(jax.random.PRNGKey(3))
    terr = np.asarray(s.terrain)
    assert abs(terr[:15] - TERRAIN_HEIGHT).max() < 0.2   # startpad gentle
    assert terr.std() > 0.0


def test_dis_to_con_dqn_smoke():
    """The reference's DQN path: 2**4 = 16 discrete actions."""
    from freerl_tpu.algos.dqn import DQN, DQNConfig
    from freerl_tpu.train.loop import OffPolicyConfig, train_offpolicy

    env = make("BipedalWalker-v3", dis_to_con=True, bins_per_dim=2)
    assert env.dim_info.action_dim == 16
    algo = DQN(env.dim_info, DQNConfig(buffer_size=20_000, batch_size=64))
    cfg = OffPolicyConfig(num_envs=4, max_episodes=12, start_steps=300,
                          chunk_size=64)
    _, returns, _ = train_offpolicy(env, algo, cfg)
    assert len(returns) >= 10 and np.isfinite(returns).all()
