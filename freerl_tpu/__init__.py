"""freerl_tpu — a TPU-native deep reinforcement learning framework.

Built from scratch in JAX (jit / vmap / lax.scan / shard_map / Pallas) with the
capability surface of the PyTorch reference `wild-firefox/FreeRL`
(see SURVEY.md): the DQN trick matrix, DDPG/TD3/SAC, PPO + tricks, REINFORCE,
the multi-agent family (MADDPG/MATD3, MAPPO/HAPPO/IPPO, MAT, MASAC/MAAC),
GAIL, CEM-GD3PG and ENVELOPE multi-objective RL.

Architecture (TPU-first, not a translation):
  - environments are pure-JAX ``step(state, action) -> state'`` functions,
    vmapped over thousands of instances and rolled with ``lax.scan``
    (replaces the single python env loop, reference DQN_file/DQN.py:294-343);
  - replay buffers are HBM-resident jnp arrays (replaces host-numpy ring
    buffers with per-call H2D copies, reference DQN_file/Buffer.py:51-56);
  - updates are fused, jit-compiled kernels; the whole actor-learner step is
    one XLA program;
  - scale-out is a `jax.sharding.Mesh` + shard_map learner with psum gradient
    reduction over ICI (the reference has no distributed backend at all).
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("FREERL_PLATFORM"):
    # Select the JAX backend before anything in the package touches a
    # device. ``jax.config.update`` is used (not the JAX_PLATFORMS env
    # var) because it takes effect even when a site-installed PJRT
    # plugin has already pinned the env var for its own registration.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["FREERL_PLATFORM"])

if _os.environ.get("FREERL_MATMUL_PRECISION"):
    # TPU matmuls default to bfloat16 passes for f32 inputs; set
    # 'float32'/'highest' to force full-precision MXU passes. Parity
    # diagnostics use this: torch CPU baselines compute f32 throughout,
    # and marginally-stable annealing (e.g. ENVELOPE's preference-space
    # Q inflation) can be precision-sensitive.
    import jax as _jax2

    _jax2.config.update("jax_default_matmul_precision",
                        _os.environ["FREERL_MATMUL_PRECISION"])

from freerl_tpu import envs, buffers, nets, algos, train  # noqa: F401
