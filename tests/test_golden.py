"""Golden-curve regression: committed artifacts vs the reference's.

Keeps PARITY.md's learning-curve claims continuously verified (SURVEY §4.2
3-seed protocol, made a regression test).
"""
import numpy as np

from freerl_tpu.train import golden
from freerl_tpu.train.golden import SPECS, GoldenSpec, check_all


def test_golden_curves_hold():
    rows = check_all()
    fails = [r for r in rows if r["status"] == "FAIL"]
    assert not fails, fails
    # every spec must find BOTH artifacts (a silently-missing file would
    # otherwise pass vacuously); specs explicitly flagged pending=True
    # (multi-hour regens that did not fit a round) are reported, not red
    missing = [r for r in rows if r["status"] == "missing"]
    assert not missing, missing
    pending = [r for r in rows if r["status"] == "pending"]
    for r in pending:
        print(f"PENDING golden: {r['env']}/{r['algo']} — {r['note']}")
    # check_all appends the scalar gates (summary-metric claims like the
    # GAIL eval) after the curve specs
    assert len(rows) == len(SPECS) + len(golden.SCALAR_GATES)


def test_golden_regenerate_from_scratch(tmp_path, monkeypatch):
    """The nightly-golden path: a spec with a regen recipe reproduces
    its artifact end-to-end through the CLI (tiny CartPole budget)."""
    monkeypatch.setattr(golden, "OURS_ROOT", str(tmp_path))
    spec = GoldenSpec(
        "CartPole-v1", "DQN_1_seed",
        "DQN_file/learning_curves/CartPole-v1/DQN_3_seed.npy",
        regen=("--algo", "DQN", "--env_name", "CartPole-v1",
               "--max_episodes", "25", "--num_envs", "4",
               "--buffer_size", "2048", "--seed", "{seed}"),
        regen_seeds=(0,),
    )
    path = golden.regenerate(spec, results_root=str(tmp_path / "runs"))
    stacked = np.load(str(tmp_path / "CartPole-v1" / "DQN_1_seed.npy"))
    assert stacked.shape[0] == 1 and stacked.shape[1] >= 25
    assert path.endswith(".png")
