"""CLI (reference L5): flag parsing, trick wiring, artifact set."""
import os

import numpy as np

from freerl_tpu.cli import build, main, run


class _A:
    def __init__(self, **kw):
        self.__dict__.update(dict(
            algo="DQN", env_name="CartPole-v1", trick=[], dis_to_con=False,
            discrete_actions=False, num_envs=4, buffer_size=1024,
            batch_size=32, horizon=256, max_episodes=10,
        ))
        self.__dict__.update(kw)


def test_build_wires_tricks():
    env, algo = build(_A(trick=["Double", "PER", "N_Step"]))
    assert algo.cfg.double and algo.cfg.per and algo.cfg.n_step == 3
    env, algo = build(_A(algo="PPO", env_name="Pendulum-v1",
                         trick=["adv_norm", "tanh", "Beta"]))
    assert algo.cfg.adv_norm and algo.cfg.tanh and algo.cfg.beta_dist
    env, algo = build(_A(algo="MAPPO", env_name="simple_spread_v3",
                         trick=["ValueClip", "huber_loss"]))
    assert algo.cfg.value_clip and algo.cfg.huber_loss
    env, algo = build(_A(algo="MATD3", env_name="simple_spread_v3"))
    assert algo.cfg.twin


def test_build_rejects_unknown_trick():
    import pytest

    with pytest.raises(SystemExit):
        build(_A(trick=["NotATrick"]))


def test_cli_main_exit_code(tmp_path):
    """main() keeps the console exit-code contract (0 on success)."""
    rc = main([
        "--algo", "DQN", "--env_name", "CartPole-v1",
        "--max_episodes", "5", "--num_envs", "4",
        "--buffer_size", "1024", "--results_root", str(tmp_path),
        "--no_tensorboard",
    ])
    assert rc == 0


def test_cli_end_to_end(tmp_path):
    out_dir = run([
        "--algo", "DQN", "--env_name", "CartPole-v1",
        "--max_episodes", "30", "--num_envs", "4",
        "--buffer_size", "2048", "--results_root", str(tmp_path),
        "--no_tensorboard",
    ])
    run_dir = tmp_path / "CartPole-v1" / "DQN_1"
    assert str(run_dir) == out_dir
    assert (run_dir / "DQN_seed_0.npy").exists()
    assert (run_dir / "checkpoint").exists()
    curve = np.load(run_dir / "DQN_seed_0.npy")
    assert len(curve) >= 30


def test_eval_cli_recurrent(tmp_path):
    """eval.py threads the GRU hidden carry through evaluate + gif."""
    out_dir = run([
        "--algo", "RMAPPO", "--env_name", "simple_spread_v3",
        "--max_episodes", "24", "--num_envs", "4", "--horizon", "100",
        "--results_root", str(tmp_path), "--no_tensorboard",
    ])

    from freerl_tpu.eval import main as eval_main

    rc = eval_main([
        "--algo", "RMAPPO", "--env_name", "simple_spread_v3",
        "--model_dir", out_dir, "--n_episodes", "4",
    ])
    assert rc == 0
    import os

    assert os.path.exists(os.path.join(out_dir, "evaluate.png"))
    assert os.path.exists(os.path.join(out_dir, "evaluate.gif"))


def test_eval_cli_envelope(tmp_path):
    """eval.py handles the preference-conditioned ENVELOPE policy
    (ADVICE round 1: --max_episodes/--preference were missing)."""
    out_dir = run([
        "--algo", "ENVELOPE", "--env_name", "deep-sea-treasure-v0",
        "--max_episodes", "12", "--num_envs", "4",
        "--buffer_size", "2048", "--results_root", str(tmp_path),
        "--no_tensorboard",
    ])
    run_dir = tmp_path / "deep-sea-treasure-v0" / "ENVELOPE_1"
    assert str(run_dir) == out_dir

    from freerl_tpu.eval import main as eval_main

    rc = eval_main([
        "--algo", "ENVELOPE", "--env_name", "deep-sea-treasure-v0",
        "--model_dir", str(run_dir), "--n_episodes", "4",
        "--max_episodes", "12", "--preference", "0.7", "0.3", "--no_gif",
    ])
    assert rc == 0
    assert (run_dir / "evaluate.png").exists()


def test_eval_cli_config_roundtrip(tmp_path):
    """eval.py needs only --model_dir: env/algo/tricks come from the
    config.json the training CLI dumps (VERDICT r2 weak #5)."""
    out_dir = run([
        "--algo", "DQN", "--env_name", "CartPole-v1",
        "--trick", "Double", "--max_episodes", "15", "--num_envs", "4",
        "--buffer_size", "2048", "--results_root", str(tmp_path),
        "--no_tensorboard",
    ])
    assert os.path.exists(os.path.join(out_dir, "config.json"))

    from freerl_tpu.eval import main as eval_main

    rc = eval_main(["--model_dir", out_dir, "--n_episodes", "4", "--no_gif"])
    assert rc == 0
    assert os.path.exists(os.path.join(out_dir, "evaluate.png"))


def test_cli_fake_smac_masked_state_route(tmp_path):
    """--env_name fake-smac --use_state drives the masked+state MAPPO
    stack end-to-end through the public CLI (the reference's
    MAPPO_for_mask_action_state.py entry point equivalent)."""
    from freerl_tpu.cli import run as cli_run

    run_dir = cli_run([
        "--algo", "MAPPO", "--env_name", "fake-smac", "--use_state",
        "--max_episodes", "16", "--num_envs", "4", "--horizon", "100",
        "--results_root", str(tmp_path), "--no_tensorboard",
    ])
    import numpy as np
    import os
    curve = np.load(os.path.join(run_dir, "MAPPO_seed_0.npy"))
    assert np.isfinite(curve).all() and len(curve) >= 16
