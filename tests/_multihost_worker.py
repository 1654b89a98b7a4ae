"""One process of the multi-host CPU simulation (SURVEY §4.6).

Launched by tests/test_multihost.py as ``python _multihost_worker.py
<process_id> <num_processes> <coordinator>``. Each process owns 2 virtual
CPU devices; together they form one global mesh. The worker:

  1. joins the cluster via freerl_tpu.distributed.multihost.initialize,
  2. builds the global dp mesh over all processes' devices,
  3. computes a gradient from PROCESS-LOCAL data and pmean-syncs it —
     the cross-host collective ride that production training uses,
  4. prints the synced value; the parent asserts every process agrees.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    pid, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    # jax.distributed.initialize must run before ANYTHING touches the XLA
    # backend; importing the freerl_tpu package builds jnp constants, so
    # load the (dependency-free) multihost module standalone first —
    # exactly what a production launcher must do too.
    import importlib.util

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "_mh", os.path.join(root, "freerl_tpu", "distributed",
                            "multihost.py")
    )
    mh = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mh)
    initialize, global_mesh = mh.initialize, mh.global_mesh
    hosts, is_primary = mh.hosts, mh.is_primary

    assert initialize(coord, nproc, pid), "initialize() must report True"

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from freerl_tpu.distributed.dp import shard_map
    assert hosts() == nproc, (hosts(), nproc)
    assert is_primary() == (pid == 0)
    n = jax.device_count()
    assert n == 2 * nproc, (n, nproc)

    mesh = global_mesh()
    sharding = NamedSharding(mesh, P("dp"))
    full = np.arange(1.0, n + 1.0, dtype=np.float32)
    x = jax.make_array_from_callback((n,), sharding, lambda idx: full[idx])

    def grad_sync(xs):
        # d/dw [w * sum(xs_local)] = device-local data sum; pmean over the
        # WHOLE mesh crosses the process boundary
        g = jax.grad(lambda w: jnp.sum(w * xs))(jnp.float32(1.0))
        return jax.lax.pmean(g, "dp")

    f = jax.jit(shard_map(grad_sync, mesh=mesh, in_specs=P("dp"),
                          out_specs=P()))
    y = f(x)
    val = float(jax.device_get(y.addressable_shards[0].data))
    expect = float(full.mean())
    assert abs(val - expect) < 1e-6, (val, expect)
    print(f"RESULT {pid} {val}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
