"""CEM-GD3PG BipedalWalker-v3 parity run (reference protocol).

The reference commits TWO runs of this config, both seed 0, with wildly
different outcomes — CEM_GD3PG_7 final-50 -110.5 and CEM_GD3PG_8 +189.5
(CEM_GD3PG_file/results/BipedalWalker-v3/) — so the algorithm is itself
a high-variance draw and the golden gate uses the reference's own
across-run spread (the ENVELOPE-sweep precedent).

Protocol (CEM_GD3PG.py argparse defaults + train loop :398-487):
  500 episodes, pop_size 10, sigma_init/damp 1e-3, batch 256, buffer
  1e6, lr 1e-3, gauss_sigma 0.1 decaying x0.999 to 0.05, start_steps
  1000, ONE gradient update per domain-episode env step (full_ratio),
  and — like every reference family — env.reset(seed=args.seed) every
  episode (:368,:374): all fitness evals and rollouts run on ONE fixed
  terrain. FixedResetWrapper reproduces that.

Usage: python scripts/r5_cem_bipedal.py [--runs 2] [--episodes 500]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=500)
    ap.add_argument("--runs", type=int, default=2,
                    help="independent draws (reference committed 2)")
    ap.add_argument("--run_offset", type=int, default=0,
                    help="start draw index (extra draws without redoing "
                         "earlier ones; rng = seed + 1000*(offset+i))")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--random_reset", action="store_true")
    args = ap.parse_args()

    import numpy as np

    from freerl_tpu.algos.cem_gd3pg import (
        CEMGD3PG,
        CEMGD3PGConfig,
        train_cem_gd3pg,
    )
    from freerl_tpu.envs import make
    from freerl_tpu.envs.base import FixedResetWrapper

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(root, "results", "learning_curves",
                           "BipedalWalker-v3")
    os.makedirs(out_dir, exist_ok=True)

    curves = []
    for run in range(args.run_offset, args.run_offset + args.runs):
        env = make("BipedalWalker-v3")
        if not args.random_reset:
            env = FixedResetWrapper(env, seed=args.seed)
        cfg = CEMGD3PGConfig(batch_size=256, buffer_size=1_000_000)
        algo = CEMGD3PG(env.dim_info, cfg)
        t0 = time.time()

        def on_episode(ep, returns, steps, _t0=t0, _run=run):
            if (ep + 1) % 5 == 0:
                last = np.asarray(returns)[-25:]
                print(f"run {_run} ep {ep + 1} last25 {last.mean():.1f} "
                      f"best {np.max(returns):.1f} steps {steps} "
                      f"({time.time() - _t0:.0f}s)", flush=True)

        # independent draws vary the training rng (seed + run), keeping
        # the TERRAIN pinned to --seed like the reference's two runs
        state, returns, info = train_cem_gd3pg(
            env, algo, max_episodes=args.episodes,
            seed=args.seed + 1000 * run, start_steps=1000,
            full_ratio=True, on_episode=on_episode,
        )
        print(f"run {run}: final-50 {returns[-50:].mean():.2f} "
              f"info {info}", flush=True)
        curves.append(returns)
        np.save(os.path.join(out_dir, f"CEM_GD3PG_run{run}_seed_"
                                      f"{args.seed}.npy"), returns)

    T = min(len(c) for c in curves)
    dst = os.path.join(out_dir, f"CEM_GD3PG_{len(curves)}_seed.npy")
    np.save(dst, np.stack([c[:T] for c in curves]))
    print("saved", dst, "per-run final-50",
          [round(float(c[-50:].mean()), 2) for c in curves], flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
