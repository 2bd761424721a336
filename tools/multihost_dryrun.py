"""Multi-host DCN dryrun: 2 OS processes, one global SPMD train step.

Exercises `tmdiff_tpu.parallel.mesh.initialize_multihost` for real — the
path the PARITY multi-host claim rests on. Two processes each own 4 virtual
CPU devices (`xla_force_host_platform_device_count=4`); after
`jax.distributed.initialize` the global mesh spans all 8 devices across the
process boundary, the batch is assembled from process-local shards
(`jax.make_array_from_process_local_data`), and ONE jitted train step
(diffusion loss + grad + SGD) runs with the gradient all-reduce crossing
the inter-process channel — the DCN stand-in (on real hardware the same
program rides ICI within a slice and DCN across slices; reference has no
equivalent: its only parallelism is single-process nn.DataParallel,
`GeneralModel/networks.py:88-91`).

Usage:
  python tools/multihost_dryrun.py            # parent: spawns 2 workers
  python tools/multihost_dryrun.py --proc N   # worker (internal)

Prints `MULTIHOST_OK loss=<float>` from each worker on success.
"""
from __future__ import annotations

import os
import subprocess
import sys

PORT = int(os.environ.get("TMDIFF_MULTIHOST_PORT", "52641"))
NPROC = 2
LOCAL_DEVICES = 4


def worker(proc_id: int) -> None:
    # NOTE: nothing may instantiate the jax backend before
    # jax.distributed.initialize — even jax.default_backend() would turn the
    # distributed init into a silent single-process no-op.
    assert os.environ.get("JAX_PLATFORMS") == "cpu"
    import jax
    from tmdiff_tpu.parallel.mesh import initialize_multihost, make_mesh

    n_dev, n_proc = initialize_multihost(
        coordinator_address=f"127.0.0.1:{PORT}",
        num_processes=NPROC,
        process_id=proc_id,
    )
    assert n_proc == NPROC, f"expected {NPROC} processes, got {n_proc}"
    assert n_dev == NPROC * LOCAL_DEVICES, n_dev

    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tmdiff_tpu.diffusion.gaussian import diffusion_loss
    from tmdiff_tpu.diffusion.schedules import NoiseSchedule
    from tmdiff_tpu.models import WavBEST

    mesh = make_mesh(data=n_dev, space=1)  # spans BOTH processes
    model = WavBEST(channels=(8, 8, 8, 8))
    schedule = NoiseSchedule.create("linear", 20)

    B, D, H, W = 8, 4, 16, 16  # global batch; 4 images per process
    rng = np.random.default_rng(0)  # same on both procs; each keeps its half
    full = {
        "Res": rng.standard_normal((B, D, H, W)).astype(np.float32),
        "PAN": rng.standard_normal((B, 1, H, W)).astype(np.float32),
        "MS": rng.standard_normal((B, D, H, W)).astype(np.float32),
    }
    emb = np.zeros((768,), np.float32)
    bsh = NamedSharding(mesh, P("data"))
    lo = proc_id * (B // NPROC)
    batch = {
        k: jax.make_array_from_process_local_data(
            bsh, v[lo : lo + B // NPROC], v.shape
        )
        for k, v in full.items()
    }

    # eager init + replicated device_put (a jitted init with out_shardings
    # compiles for minutes on the multi-process CPU backend)
    params = model.init(
        jax.random.key(0),
        jnp.zeros((1, D, H, W)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 1, H, W)), jnp.zeros((1, D, H, W)),
        jnp.asarray(emb),
    )
    params = jax.device_put(params, NamedSharding(mesh, P()))

    @jax.jit
    def train_step(params, batch):
        def loss_fn(p):
            def denoise(x, t, pan, ms):
                return model.apply(p, x, t, pan, ms, jnp.asarray(emb))

            return diffusion_loss(
                denoise, schedule, jax.random.key(1),
                batch["Res"], batch["PAN"], batch["MS"], "l1",
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        new_params = optax.apply_updates(
            params, jax.tree.map(lambda g: -1e-3 * g, grads)
        )
        return loss, new_params

    loss, params = train_step(params, batch)
    loss = float(loss)  # cross-process allreduce already folded in by SPMD
    assert np.isfinite(loss)
    print(f"MULTIHOST_OK proc={proc_id} nproc={n_proc} ndev={n_dev} "
          f"loss={loss:.4f}", flush=True)


def parent() -> int:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}"
    ).strip()
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", os.path.abspath(__file__), "--proc", str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(NPROC)
    ]
    ok, outputs = True, []
    try:
        for p in procs:
            try:
                out, _ = p.communicate(timeout=600)
            except subprocess.TimeoutExpired:
                p.kill()
                out, _ = p.communicate()
            outputs.append(out)
            ok &= p.returncode == 0 and "MULTIHOST_OK" in out
    finally:
        for p in procs:  # never orphan a worker (CLAUDE.md)
            if p.poll() is None:
                p.kill()
    for i, out in enumerate(outputs):
        sys.stdout.write(f"--- worker {i} ---\n{out}")
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    if "--proc" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--proc") + 1]))
    else:
        sys.exit(parent())
