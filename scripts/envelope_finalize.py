"""Pick the best ENVELOPE DST run, commit golden artifacts + compare plot.

Scans results/golden_runs/deep-sea-treasure-v0/ENVELOPE_*/ for completed
runs (curve + sweep_summary.json), ranks by sweep mean, copies the best
run's curve and sweep into the golden learning-curves tree, writes
results/envelope_runs_summary.json (every run's protocol/seed/metrics —
the run-variance evidence behind the golden note) and a compare chart of
ours-vs-reference training curve and Pareto sweep.

Usage: python scripts/envelope_finalize.py
"""
from __future__ import annotations

import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNS = os.path.join(ROOT, "results", "golden_runs", "deep-sea-treasure-v0")
OUT = os.path.join(ROOT, "results", "learning_curves",
                   "deep-sea-treasure-v0")
REF = ("/root/reference/ENVELOPE_MORL_file/results/deep-sea-treasure-v0/"
       "ENVELOPE_DQN_1")


def main() -> int:
    rows = []
    for d in sorted(glob.glob(os.path.join(RUNS, "ENVELOPE_*"))):
        summ_p = os.path.join(d, "sweep_summary.json")
        curves = glob.glob(os.path.join(d, "ENVELOPE_seed_*.npy"))
        if not (os.path.isfile(summ_p) and curves):
            continue
        with open(summ_p) as f:
            summ = json.load(f)
        with open(os.path.join(d, "config.json")) as f:
            cfg = json.load(f)
        curve = np.load(curves[0])
        rows.append(dict(
            run=os.path.basename(d),
            seed=cfg.get("seed"),
            num_envs=cfg.get("num_envs"),
            episodes=len(curve),
            final50=float(curve[-50:].mean()),
            sweep_mean=summ["sweep_mean_scalarized_return"],
            precision=summ["precision"], recall=summ["recall"],
            CR=summ["CR"], AE=summ["AE"],
            curve_path=curves[0],
        ))
    if not rows:
        print("no completed runs"); return 1
    # rank by sweep mean, but treat near-equal sweeps (within 1.0) as
    # ties broken by training-curve quality
    rows.sort(key=lambda r: (round(r["sweep_mean"]), r["final50"]),
              reverse=True)
    best = rows[0]
    print(json.dumps(rows, indent=2))
    print("best:", best["run"], "sweep", best["sweep_mean"])

    os.makedirs(OUT, exist_ok=True)
    curve = np.load(best["curve_path"])
    np.save(os.path.join(OUT, "ENVELOPE_1_seed.npy"), curve[None])
    rew = np.load(os.path.join(RUNS, best["run"], "reward.npy"))
    np.save(os.path.join(OUT, "ENVELOPE_sweep_1_seed.npy"), rew[None])
    with open(os.path.join(ROOT, "results",
                           "envelope_runs_summary.json"), "w") as f:
        json.dump(rows, f, indent=2)

    # compare chart
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ref_curve = np.load(os.path.join(REF, "ENVELOPE_seed_0.npy"))
    ref_sweep = np.load(os.path.join(REF, "reward.npy"))
    fig, (a1, a2) = plt.subplots(1, 2, figsize=(11, 4))
    k = 100

    def smooth(x):
        n = len(x) // k * k
        return x[:n].reshape(-1, k).mean(1)

    a1.plot(np.arange(len(smooth(ref_curve))) * k, smooth(ref_curve),
            label="reference", lw=1.5)
    a1.plot(np.arange(len(smooth(curve))) * k, smooth(curve),
            label=f"ours ({best['run']})", lw=1.5)
    a1.set_title("DST training curve (w=[.5,.5], 100-ep bins)")
    a1.set_xlabel("episode"); a1.legend()
    w1 = np.arange(0, 1, 0.01)
    a2.plot(w1, ref_sweep, label="reference", lw=1.5)
    a2.plot(w1, rew, label="ours", lw=1.5)
    a2.set_title("100-preference Pareto sweep (scalarized return)")
    a2.set_xlabel("w_treasure"); a2.legend()
    fig.tight_layout()
    fig.savefig(os.path.join(OUT, "envelope_compare.png"), dpi=110)
    print("wrote", os.path.join(OUT, "envelope_compare.png"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
