"""PER sampling-backend micro-bench: tree vs tree+pallas vs cumsum.

One full PER learner cycle per iteration — add a 256-env batch, sample
256 with IS weights, write updated priorities — at the reference's 1M
capacity, timed over jitted chunks. The loop is latency-bound on TPU
(PROFILE.md), so op COUNT is the lever: the tree path issues ~60 tiny
scatter/gather rounds per cycle, the cumsum path 3 dense ops.

Usage: python scripts/per_bench.py [--capacity 1048576] [--iters 200]
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
    ap.add_argument("--capacity", type=int, default=1 << 20)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from freerl_tpu.buffers.per import PERBuffer
    from freerl_tpu.core.types import Transition

    example = Transition(
        obs=jnp.zeros((8,)), action=jnp.zeros((), jnp.int32),
        reward=jnp.zeros(()), next_obs=jnp.zeros((8,)),
        done=jnp.zeros((), jnp.bool_), episode_done=jnp.zeros((), jnp.bool_),
    )
    batch = Transition(
        obs=jnp.zeros((args.batch, 8)),
        action=jnp.zeros((args.batch,), jnp.int32),
        reward=jnp.zeros((args.batch,)),
        next_obs=jnp.zeros((args.batch, 8)),
        done=jnp.zeros((args.batch,), jnp.bool_),
        episode_done=jnp.zeros((args.batch,), jnp.bool_),
    )

    results = {}
    for name, kw in (
        ("tree", dict(sampler="tree")),
        ("tree_pallas", dict(sampler="tree", use_pallas=True)),
        ("cumsum", dict(sampler="cumsum")),
    ):
        if kw.get("use_pallas") and jax.default_backend() != "tpu":
            continue
        buf = PERBuffer.create(args.capacity, example, **kw)
        buf = buf.add(batch)

        def cycle(buf, key):
            buf = buf.add(batch)
            buf, _, idx, w = buf.sample(key, args.batch)
            td = w + 0.5
            return buf.update_priorities(idx, td)

        @jax.jit
        def chunk(buf, key):
            def body(i, b):
                return cycle(b, jax.random.fold_in(key, i))
            return jax.lax.fori_loop(0, 20, body, buf)

        buf = chunk(buf, jax.random.PRNGKey(0))
        jax.block_until_ready(buf.tree)
        t0 = time.time()
        n = max(args.iters // 20, 1)
        for i in range(n):
            buf = chunk(buf, jax.random.PRNGKey(i + 1))
        jax.block_until_ready(buf.tree)
        us = (time.time() - t0) / (n * 20) * 1e6
        results[name] = round(us, 1)
        print(f"{name:12s} {us:8.1f} us per add+sample+update cycle",
              flush=True)

    out = {"backend": jax.default_backend(), "capacity": args.capacity,
           "batch": args.batch, "cycle_us": results}
    os.makedirs("results", exist_ok=True)
    with open("results/per_bench.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
