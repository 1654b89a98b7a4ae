"""Decompose the virtual-mesh DP "scaling efficiency" into host capacity
vs collective cost, and derive the expected real-ICI efficiency.

The r4 sweep (results/dp_scaling.json) shows 9.7k -> 24.4k env-steps/s
for 1 -> 8 virtual devices (31% per-device efficiency) and BASELINE.md
asks for near-linear scaling — but the virtual mesh multiplexes 8
single-threaded XLA device programs onto TWO physical cores, so a
compute-bound program cannot exceed ~2/8 = 25% per-device efficiency
there. This script separates the two effects:

1. HOST-CAPACITY CONTROL — run the UNSHARDED driver at the same
   aggregate env counts (8..64 envs on one device). If 1-device
   throughput at 64 envs ~= the 8-device aggregate at 8 envs/device,
   the sweep's sublinearity is the 2-core host, not the collectives.
2. COLLECTIVE MICRO-COST — time the pmean of a DQN-gradient-sized
   pytree under shard_map on the virtual mesh, and report the analytic
   ICI transfer model for the same bytes (v5e all-reduce: 2(N-1)/N x
   bytes per link at ~45 GB/s + ~1 us/hop latency; the grads are ~70 KiB
   so the sync is LATENCY-bound, not bandwidth-bound).
3. MODEL — project multi-chip efficiency from the measured single-chip
   TPU phase split (PROFILE.md: 44.3 us rollout + 41.2 us update per
   vector step at 4096 envs): rollout and replay are embarrassingly
   parallel (zero collectives, per-device envs/buffers); only the
   update's grad pmean adds cross-chip work.

Usage: python scripts/dp_comm_model.py --out results/dp_comm_model.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/dp_comm_model.json")
    ap.add_argument("--steps", type=int, default=4096)
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp
    import numpy as np

    from freerl_tpu.algos.dqn import DQN, DQNConfig
    from freerl_tpu.distributed.dp import make_mesh, shard_map
    from freerl_tpu.envs import make
    from freerl_tpu.train.loop import OffPolicyConfig, train_offpolicy

    env = make("CartPole-v1")
    out = {}

    # 1. host-capacity control: unsharded driver, same aggregate envs
    control = []
    for num_envs in (8, 16, 32, 64):
        algo = DQN(env.dim_info, DQNConfig(buffer_size=20_000,
                                           batch_size=64))
        cfg = OffPolicyConfig(
            num_envs=num_envs, max_episodes=10**9,
            max_env_steps=num_envs * args.steps,
            start_steps=500, chunk_size=256,
        )
        _, _, info = train_offpolicy(env, algo, cfg)
        control.append(dict(num_envs=num_envs,
                            env_steps_per_s=round(
                                info["env_steps_per_s"], 1)))
        print("control", control[-1], flush=True)
    out["unsharded_control"] = control

    # 2. collective micro-cost: pmean of a DQN-gradient-sized pytree
    # (the HEADLINE config's net: LunarLander 8-128-128-4)
    mesh = make_mesh(8)
    ll = make("LunarLander-v2")
    algo = DQN(ll.dim_info, DQNConfig(hidden=(128, 128)))
    params = algo.init(jax.random.PRNGKey(0)).params
    n_params = sum(x.size for x in jax.tree.leaves(params))
    grad_bytes = 4 * n_params
    from jax.sharding import PartitionSpec as P

    def body(g):
        return jax.tree.map(
            lambda x: jax.lax.pmean(x, "dp"), g
        )

    synced = jax.jit(shard_map(
        body, mesh=mesh, in_specs=P(), out_specs=P(),
    ))
    g = jax.tree.map(lambda x: jnp.ones_like(x), params)
    jax.block_until_ready(synced(g))
    # block every call: chaining hundreds of async 8-way rendezvous on a
    # 2-core host starves a participant past XLA's 40 s fatal timeout
    t0 = time.time()
    reps = 20
    for _ in range(reps):
        jax.block_until_ready(synced(g))
    pmean_us = (time.time() - t0) / reps * 1e6
    out["grad_pytree"] = dict(n_params=int(n_params),
                              bytes=int(grad_bytes),
                              virtual_mesh_pmean_us=round(pmean_us, 1))
    print("pmean", out["grad_pytree"], flush=True)

    # 3. analytic ICI model + projected efficiency
    # v5e: ~45 GB/s per ICI link direction; ring all-reduce moves
    # 2(N-1)/N x bytes; latency ~1 us per hop, 2(N-1) hops.
    for n in (2, 4, 8):
        bw_s = 2 * (n - 1) / n * grad_bytes / 45e9
        lat_s = 2 * (n - 1) * 1e-6
        ici_us = (bw_s + lat_s) * 1e6
        # PROFILE.md single-chip phase split at the headline config
        rollout_us, update_us = 44.3, 41.2
        eff = (rollout_us + update_us) / (rollout_us + update_us + ici_us)
        out[f"ici_model_n{n}"] = dict(
            allreduce_us=round(ici_us, 2),
            projected_efficiency=round(eff, 4),
        )
        print(f"n={n}", out[f"ici_model_n{n}"], flush=True)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print("saved", args.out, flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
