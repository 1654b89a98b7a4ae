"""ENVELOPE MORL end-to-end parity (reference ENVELOPE_MORL_file).

Two stages, matching the reference's protocol:

  1. --train: run ENVELOPE on deep-sea-treasure-v0 through the public
     CLI (reference argparse defaults ENVELOPE_DQN.py:388-416: 5000
     episodes, buffer 1e6, batch 256, start_steps 500, 1 update per env
     step) and commit the training curve.
  2. preference sweep (eval_agent.py:42-101): 100 weights
     w1 = arange(0, 1, .01); for each, roll the deterministic
     preference-conditioned policy from reset and record the scalarized
     return w . R_vec (reward.npy) plus the model's Pareto solutions;
     compute precision/recall/CR against the true DST front (tol 0.3 L1,
     find_in base=2) and the adaptation error AE. The whole sweep is one
     vmapped XLA program over the 100 preferences.

Reference artifacts compared against (committed in the reference repo):
  results/deep-sea-treasure-v0/ENVELOPE_DQN_1/ENVELOPE_seed_0.npy
  results/deep-sea-treasure-v0/ENVELOPE_DQN_1/reward.npy  (mean 12.76)

Usage:
  python scripts/envelope_e2e.py --train          # TPU, ~5000 episodes
  python scripts/envelope_e2e.py --model_dir results/golden_runs/...
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# true DST Pareto front (eval_agent.py:12-14)
TIME = [-1, -3, -5, -7, -8, -9, -13, -14, -17, -19]
TREASURE = [0.7, 8.2, 11.5, 14.0, 15.1, 16.1, 19.6, 20.3, 22.4, 23.7]


def find_in(A, B, tol=0.3):
    """eval_agent.py:110-131 (base=2: absolute L1 tolerance)."""
    import numpy as np

    cnt = 0.0
    for a in A:
        for b in B:
            if np.linalg.norm(a - b, ord=1) < tol:
                cnt += 1.0
                break
    return cnt / len(A)


def sweep(model_dir: str, out_curves: str | None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from freerl_tpu.algos.envelope import Envelope, EnvelopeConfig
    from freerl_tpu.envs import make
    from freerl_tpu.train.runio import load_checkpoint

    env = make("deep-sea-treasure-v0")
    algo = Envelope(env.dim_info, env.reward_dim, EnvelopeConfig())
    example = algo.init(jax.random.PRNGKey(0))
    state = load_checkpoint(os.path.join(model_dir, "checkpoint"), example)

    w1 = np.arange(0, 1, 0.01, dtype=np.float32)
    ws = np.stack([w1, 1.0 - w1], axis=1)                    # (100, 2)

    def run_one(w):
        s, obs = env.reset(jax.random.PRNGKey(0))

        def step(carry, _):
            s, obs, done, ret, vec = carry
            a = algo.evaluate_action(state, obs[None], w)[0]
            s2, obs2, r, term, trunc = env.step(
                s, a, jax.random.PRNGKey(0)
            )
            live = jnp.logical_not(done)
            ret = ret + jnp.where(live, jnp.dot(w, r), 0.0)
            vec = vec + jnp.where(live, r, jnp.zeros_like(r))
            done = jnp.logical_or(done, jnp.logical_or(term, trunc))
            return (s2, obs2, done, ret, vec), None

        (_, _, _, ret, vec), _ = jax.lax.scan(
            step, (s, obs, jnp.bool_(False), jnp.float32(0.0),
                   jnp.zeros((env.reward_dim,), jnp.float32)),
            None, length=env.max_steps,
        )
        return ret, vec

    rets, vecs = jax.jit(jax.vmap(run_one))(jnp.asarray(ws))
    rets, vecs = np.asarray(rets), np.asarray(vecs)

    # Pareto metrics (eval_agent.py:100-140)
    w_e = ws / np.linalg.norm(ws, ord=2, axis=1, keepdims=True)
    realc = (ws * vecs).sum(1, keepdims=True) * w_e          # model solutions
    front = np.stack([np.asarray(TREASURE), np.asarray(TIME)], axis=1)
    ids = np.argmax(ws @ front.T, axis=1)
    realc_dst = (ws * front[ids]).sum(1, keepdims=True) * w_e
    precision = find_in(realc, realc_dst)
    recall = find_in(realc_dst, realc)
    cr = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    base = np.linalg.norm(realc_dst, ord=2, axis=1)
    ae = float((np.linalg.norm(realc_dst - realc, ord=2, axis=1)
                / np.maximum(base, 1e-8)).sum())

    np.save(os.path.join(model_dir, "reward.npy"), rets)
    if out_curves:
        os.makedirs(out_curves, exist_ok=True)
        np.save(os.path.join(out_curves, "ENVELOPE_sweep_1_seed.npy"),
                rets[None])
    summary = {
        "sweep_mean_scalarized_return": float(rets.mean()),
        "reference_sweep_mean": 12.76,
        "precision": precision, "recall": recall, "CR": cr, "AE": ae,
    }
    with open(os.path.join(model_dir, "sweep_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary), flush=True)
    return summary


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--model_dir", default=None)
    ap.add_argument("--max_episodes", type=int, default=5000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--results_root", default="results/golden_runs")
    args = ap.parse_args()

    model_dir = args.model_dir
    if args.train:
        from freerl_tpu.cli import run as cli_run

        model_dir = cli_run([
            "--algo", "ENVELOPE", "--env_name", "deep-sea-treasure-v0",
            "--max_episodes", str(args.max_episodes), "--num_envs", "8",
            "--updates_per_burst", "8", "--batch_size", "256",
            "--buffer_size", "1000000", "--start_steps", "500",
            "--seed", str(args.seed),
            "--results_root", args.results_root, "--no_tensorboard",
        ])
        # commit the training curve in the golden artifact layout
        import numpy as np

        curve = np.load(os.path.join(
            model_dir, f"ENVELOPE_seed_{args.seed}.npy"
        ))
        out = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..", "results",
            "learning_curves", "deep-sea-treasure-v0",
        )
        os.makedirs(out, exist_ok=True)
        np.save(os.path.join(out, "ENVELOPE_1_seed.npy"), curve[None])
    assert model_dir, "--train or --model_dir required"
    out_curves = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "results",
        "learning_curves", "deep-sea-treasure-v0",
    )
    sweep(model_dir, out_curves)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
