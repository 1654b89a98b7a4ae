"""Offline tooling: evaluation harness, plotting, run dirs, checkpoints."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from freerl_tpu.algos.dqn import DQN, DQNConfig
from freerl_tpu.envs import make
from freerl_tpu.train.evaluate import evaluate, plot_evaluate
from freerl_tpu.train.plotting import (
    aggregate_seeds,
    exp_smooth,
    plot_compare,
    plot_learning_curve,
)
from freerl_tpu.train.runio import (
    MetricsWriter,
    load_checkpoint,
    make_dir,
    save_checkpoint,
    trick_prefix,
)


def test_evaluate_runs_batched_episodes():
    env = make("CartPole-v1")
    algo = DQN(env.dim_info, DQNConfig())
    state = algo.init(jax.random.PRNGKey(0))
    rets = evaluate(env, lambda obs: algo.evaluate_action(state, obs),
                    n_episodes=16)
    assert rets.shape == (16,)
    assert (rets >= 1).all() and (rets <= 500).all()


def test_evaluate_multi_agent():
    env = make("simple_spread_v3")
    from freerl_tpu.algos.maddpg import MADDPG, MADDPGConfig

    algo = MADDPG(env, MADDPGConfig(batch_size=8, buffer_size=64))
    state = algo.init(jax.random.PRNGKey(0))
    rets = evaluate(env, lambda obs: algo.evaluate_action(state, obs),
                    n_episodes=8, multi_agent=True)
    assert rets.shape == (8, 3)
    assert np.isfinite(rets).all()


def test_plotting_artifacts(tmp_path):
    curves = [np.random.RandomState(s).randn(100).cumsum() for s in range(3)]
    sm = exp_smooth(np.asarray(curves[0]))
    assert sm.shape == (100,)
    stacked, mean, std = aggregate_seeds(curves)
    assert stacked.shape == (3, 100)
    p1 = plot_learning_curve(curves, "DQN", str(tmp_path), "CartPole-v1",
                             goal=475)
    assert os.path.exists(p1)
    assert os.path.exists(str(tmp_path) + "/DQN_3_seed.npy")
    p2 = plot_compare({"DQN": curves, "Rainbow": curves}, str(tmp_path),
                      "CartPole-v1")
    assert os.path.exists(p2)
    p3 = plot_evaluate(np.asarray(curves[0]), goal=475.0,
                       out_path=str(tmp_path / "evaluate.png"))
    assert os.path.exists(p3)


def test_make_dir_numbering_and_trick_prefix(tmp_path):
    trick = {"Double": True, "PER": True, "Noisy": False}
    assert trick_prefix("DQN", trick) == "DQN_Double_PER_"
    assert trick_prefix("DQN", None) == "DQN_"
    d1 = make_dir(str(tmp_path), "CartPole-v1", "DQN", trick)
    d2 = make_dir(str(tmp_path), "CartPole-v1", "DQN", trick)
    assert d1.endswith("DQN_Double_PER_1")
    assert d2.endswith("DQN_Double_PER_2")


def test_metrics_writer(tmp_path):
    d = str(tmp_path / "run")
    os.makedirs(d)
    w = MetricsWriter(d, "DQN", seed=0)
    w.log_episodes(np.arange(5.0))
    w.log_scalar("loss", 0.5, 1)
    path = w.save_curve(np.arange(5.0))
    w.close()
    assert os.path.exists(path)
    assert any(f.startswith("events") for f in os.listdir(d))


def test_full_state_checkpoint_roundtrip(tmp_path):
    env = make("CartPole-v1")
    algo = DQN(env.dim_info, DQNConfig())
    state = algo.init(jax.random.PRNGKey(0))
    # advance a step so opt state is non-trivial
    from tests.test_dqn import _batch

    state, _, _ = algo.update(state, _batch(jax.random.PRNGKey(1)))
    path = save_checkpoint(str(tmp_path / "ckpt"), state)
    blank = algo.init(jax.random.PRNGKey(42))
    restored = load_checkpoint(path, blank)
    # params AND optimizer state match bit-exact
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_cadence_in_driver(tmp_path):
    """checkpoint_every_chunks writes a restorable full train state."""
    import os

    from freerl_tpu.algos import DQN, DQNConfig
    from freerl_tpu.envs import make
    from freerl_tpu.train import OffPolicyConfig, train_offpolicy
    from freerl_tpu.train.runio import load_checkpoint

    env = make("CartPole-v1")
    algo = DQN(env.dim_info, DQNConfig(buffer_size=2000, batch_size=32,
                                       hidden=(32,)))
    ck = str(tmp_path / "run")
    cfg = OffPolicyConfig(num_envs=4, max_episodes=20, max_env_steps=1500,
                          start_steps=200, chunk_size=64,
                          checkpoint_dir=ck, checkpoint_every_chunks=1)
    state, returns, info = train_offpolicy(env, algo, cfg)
    assert os.path.exists(f"{ck}/ckpt")
    example = algo.init(jax.random.PRNGKey(0))
    restored = load_checkpoint(f"{ck}/ckpt", example)
    # the saved state is a real mid-training snapshot, not the init
    assert int(restored.step) > 0
