"""Run directories, metric logging and full-train-state checkpointing.

Parity surface (SURVEY §2.7, §5.4-5.6):
  - ``make_dir``: auto-numbered ``results/<env>/<Policy_(tricks)_N>`` run
    dirs with the trick-name prefix convention (DQN_file/DQN.py:173-192,
    Rainbow naming DQN_with_tricks.py:345-353);
  - TensorBoard per-episode reward scalars + console prints + ``.npy``
    curve dumps (DQN_file/DQN.py:276,330,349);
  - checkpointing: the reference saves actor-only state_dicts with NO
    optimizer/buffer state — no true resume (SURVEY §5.4). Here a
    checkpoint is the FULL train state pytree (params, targets, optimizer
    moments, normalizer stats, RNG, step), saved with orbax, so training
    resumes bit-exact.
"""
from __future__ import annotations

import os
import re
from typing import Optional

import jax
import numpy as np


def trick_prefix(policy_name: str, trick: Optional[dict] = None) -> str:
    """Reference naming: ``Policy_`` or ``Policy_TrickA_TrickB_``."""
    if not trick or not any(trick.values()):
        return policy_name + "_"
    prefix = policy_name + "_"
    for key, val in trick.items():
        if val:
            prefix += f"{key}_"
    return prefix


def make_dir(results_root: str, env_name: str, policy_name: str = "DQN",
             trick: Optional[dict] = None) -> str:
    """Auto-numbered run dir: results/<env>/<prefix><n+1>."""
    env_dir = os.path.join(results_root, env_name)
    os.makedirs(env_dir, exist_ok=True)
    prefix = trick_prefix(policy_name, trick)
    pattern = re.compile(rf"^{re.escape(prefix)}\d+$")
    existing = [d for d in os.listdir(env_dir) if pattern.match(d)]
    nums = [int(d.rsplit("_", 1)[-1]) for d in existing]
    model_dir = os.path.join(env_dir, f"{prefix}{max(nums, default=0) + 1}")
    os.makedirs(model_dir)
    return model_dir


class MetricsWriter:
    """TensorBoard scalars + chronological .npy curve dump.

    Mirrors the reference's SummaryWriter('reward', ep) / per-agent
    'reward_<id>' logging and ``<Policy>_seed_<s>.npy`` curve artifact.
    """

    def __init__(self, model_dir: str, policy_name: str, seed: int,
                 use_tensorboard: bool = True, agent_names=None):
        self.model_dir = model_dir
        self.policy_name = policy_name
        self.seed = seed
        self.agent_names = agent_names
        self.writer = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.writer = SummaryWriter(model_dir)
            except Exception:
                self.writer = None

    def log_episodes(self, returns: np.ndarray, start_episode: int = 0):
        if self.writer is None:
            return
        for i, r in enumerate(np.asarray(returns)):
            ep = start_episode + i + 1
            if np.ndim(r) == 0:
                self.writer.add_scalar("reward", float(r), ep)
            else:
                names = self.agent_names or [
                    f"agent_{j}" for j in range(len(r))
                ]
                for name, rj in zip(names, r):
                    self.writer.add_scalar(f"reward_{name}", float(rj), ep)

    def log_scalar(self, tag: str, value: float, step: int):
        if self.writer is not None:
            self.writer.add_scalar(tag, float(value), step)

    def save_curve(self, returns: np.ndarray):
        path = os.path.join(
            self.model_dir, f"{self.policy_name}_seed_{self.seed}.npy"
        )
        np.save(path, np.asarray(returns))
        return path

    def close(self):
        if self.writer is not None:
            self.writer.close()


# ---------------------------------------------------------------------------
def save_checkpoint(path: str, train_state) -> str:
    """Full train-state checkpoint (params + opt + normalizers + RNG)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, train_state, force=True)
    return path


def load_checkpoint(path: str, example_state):
    """Restore into the structure of ``example_state``."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(path, item=example_state)
    return jax.tree.map(lambda ex, r: r, example_state, restored)
