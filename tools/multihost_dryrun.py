"""Two-process multihost dryrun: exercises `parallel/multihost.py` end to
end on CPU (VERDICT r4 item 7 — the module previously had no test that
actually called `jax.distributed.initialize`).

Orchestrator mode (no args): picks a free port, spawns TWO worker
processes (4 virtual CPU devices each), waits, and exits nonzero if either
worker fails.

Worker mode (--pid N): joins the distributed runtime via
`initialize_multihost`, builds ONE global 8-device mesh across both
processes, replicates deterministic model params
(`make_array_from_process_local_data` with a replicated spec), feeds its
half of the global batch through `feed_sharded`, runs a dp-sharded jit
forward, and asserts its addressable output shards match a locally
computed single-process forward on the same rows.

Run directly:  python tools/multihost_dryrun.py
In CI:         tests/test_multihost.py
Driver hook:   __graft_entry__.dryrun_multichip segment 6.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NPROC = 2
LOCAL_DEVICES = 4
LOCAL_BATCH = 8
MODEL = "resnet20_cifar10"


def worker(coordinator: str, pid: int) -> None:
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={LOCAL_DEVICES}")
    os.environ.setdefault("OMP_NUM_THREADS", "1")
    sys.path.insert(0, REPO)

    import jax
    # The axon sitecustomize force-selects the TPU platform regardless of
    # JAX_PLATFORMS; the config update wins (same trick as tests/conftest).
    jax.config.update("jax_platforms", "cpu")
    # Multi-process CPU needs a cross-process collectives backend; gloo
    # ships in jaxlib (xla_bridge wires it to the distributed client).
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pytorchcv_tpu.parallel.multihost import (feed_sharded,
                                                  initialize_multihost,
                                                  make_global_mesh)

    initialize_multihost(coordinator, NPROC, pid)
    assert jax.process_count() == NPROC, jax.process_count()
    assert len(jax.devices()) == NPROC * LOCAL_DEVICES
    assert len(jax.local_devices()) == LOCAL_DEVICES

    import pytorchcv_tpu as ptc
    model = ptc.get_model(MODEL, init=False)
    # Deterministic init -> every process holds identical params.
    variables = model.module.init(jax.random.PRNGKey(0),
                                  jnp.zeros((1, 32, 32, 3)), train=False)
    np_vars = jax.tree_util.tree_map(np.asarray, variables)

    mesh = make_global_mesh((NPROC * LOCAL_DEVICES,), ("data",))
    replicated = NamedSharding(mesh, P())
    gvars = jax.tree_util.tree_map(
        lambda a: jax.make_array_from_process_local_data(replicated, a),
        np_vars)

    # Both processes generate the same global batch; each feeds its half.
    full = np.random.RandomState(0).randn(
        NPROC * LOCAL_BATCH, 32, 32, 3).astype(np.float32)
    local = full[pid * LOCAL_BATCH:(pid + 1) * LOCAL_BATCH]
    x = feed_sharded(mesh, local)
    assert x.shape[0] == NPROC * LOCAL_BATCH

    fwd = jax.jit(lambda v, xx: model.module.apply(v, xx, train=False),
                  out_shardings=NamedSharding(mesh, P("data")))
    y = fwd(gvars, x)

    # Single-process oracle on this host's rows (plain local jit).
    y_ref = np.asarray(jax.jit(
        lambda v, xx: model.module.apply(v, xx, train=False))(
            variables, jnp.asarray(local)))

    checked_rows = 0
    for shard in y.addressable_shards:
        sl = shard.index[0]
        rows = np.asarray(shard.data)
        ref = y_ref[sl.start - pid * LOCAL_BATCH:
                    sl.stop - pid * LOCAL_BATCH]
        np.testing.assert_allclose(rows, ref, rtol=2e-5, atol=2e-5)
        checked_rows += rows.shape[0]
    assert checked_rows == LOCAL_BATCH, checked_rows
    print(f"worker {pid}: OK ({checked_rows} rows match the local oracle)",
          flush=True)


def orchestrate(timeout_s: int = 600) -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coordinator = f"localhost:{port}"
    procs = []
    for pid in range(NPROC):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.pop("JAX_PLATFORMS", None)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--coordinator", coordinator, "--pid", str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    rc = 0
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=timeout_s)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            rc = 1
        tail = out.decode(errors="replace").strip().splitlines()[-8:]
        print(f"--- worker {pid} (rc={p.returncode}) ---")
        print("\n".join(tail))
        rc = rc or p.returncode
    return rc


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator")
    ap.add_argument("--pid", type=int)
    args = ap.parse_args()
    if args.coordinator is None:
        sys.exit(orchestrate())
    worker(args.coordinator, args.pid)
