"""Worker for the 2-process CPU multihost test (run by test_multihost.py).

Each process owns 1 virtual CPU device (dp=2 global), joins a local
jax.distributed cluster, and runs a real ``Trainer.train`` epoch loop on
a dp=2 mesh — exercising ``global_batch_from_local`` feeding and the
process-0 msgpack checkpoint guard end-to-end.

Usage: python _multihost_worker.py <coordinator> <num_procs> <pid> <tmpdir>
"""

import os
import sys


def main():
    coordinator, num_procs, pid, tmpdir = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
        sys.argv[4],
    )
    # 1 device per process (dp=2 global): the multihost semantics under
    # test — per-process feeding, cross-process grad reduction, process-0
    # checkpoint guard — are identical to 2x2 with a smaller SPMD program.
    # Backend opt level 0 skips the expensive LLVM passes: both processes
    # compile simultaneously and uncached on this 1-core host, and the
    # test checks distribution semantics, not codegen quality (measured
    # 110 s -> 65 s for the whole test).
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=1"
        + " --xla_backend_optimization_level=0"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    # Persistent compile cache, but PER-PROCESS directories: a SHARED
    # cache desyncs the pair (one process misses and compiles >30 s while
    # the other hits its freshly written entry), blowing Gloo's 30 s
    # GetKeyValue rendezvous deadline (measured: flaky DEADLINE_EXCEEDED).
    # Separate dirs keep the processes symmetric — both miss on the first
    # suite run, both hit on warm runs — and cut the test's warm cost.
    # The dirs are only symmetric if both are equally warm: a previous run
    # killed between the two processes' cache writes leaves one warm and
    # one cold, reintroducing the >30 s compile desync. Treat the pair as
    # a unit — if MY dir exists but the peer's doesn't, drop mine so both
    # start cold (each process only ever touches its own dir).
    mine = f"/tmp/dquartic_jax_cache_mh{pid}"
    peers = [f"/tmp/dquartic_jax_cache_mh{p}" for p in range(num_procs) if p != pid]
    if os.path.isdir(mine) and not all(os.path.isdir(p) for p in peers):
        import shutil

        shutil.rmtree(mine, ignore_errors=True)
    try:
        jax.config.update("jax_compilation_cache_dir", mine)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=num_procs, process_id=pid
    )
    assert jax.process_count() == num_procs
    assert jax.device_count() == num_procs, jax.devices()
    assert len(jax.local_devices()) == 1

    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from dquartic_tpu.core import DDIMProcess, make_schedule
    from dquartic_tpu.models import UNet1d
    from dquartic_tpu.parallel import make_mesh
    from dquartic_tpu.train import Trainer

    mesh = make_mesh(dp=num_procs, devices=jax.devices())
    # One level: the multihost semantics under test (per-process feeding,
    # cross-process grad reduction, process-0 checkpoint guard) are
    # level-count-independent, and both processes compile the step
    # program uncached on one core — halving the program halves the test.
    model = UNet1d(
        dim=4, channels=1, dim_mults=(1,), conditional=True,
        init_cond_channels=1, attn_cond_channels=1, downsample_dim=16,
    )
    process = DDIMProcess(schedule=make_schedule(10, "cosine", "eps"))
    trainer = Trainer(model, process, mesh=mesh, seed=0, ema_decay=None)

    # Every process samples the SAME global batches (shared seed); the
    # trainer slices out this process's rows internally.
    rng = np.random.default_rng(0)
    b, rt, mz = num_procs, 4, 16
    batches = [
        {
            "ms2_1": rng.uniform(0, 1, (b, rt, mz)).astype(np.float32),
            "ms1_1": rng.uniform(0, 1, (b, rt)).astype(np.float32),
            "ms2_2": rng.uniform(0, 1, (b, rt, mz)).astype(np.float32),
            "ms1_2": rng.uniform(0, 1, (b, rt)).astype(np.float32),
        }
        for _ in range(2)
    ]
    ckpt = os.path.join(tmpdir, "best.ckpt")
    state = trainer.train(
        batches, epochs=2, warmup_epochs=0, learning_rate=1e-4, checkpoint_path=ckpt
    )
    assert int(jax.device_get(state.step)) == 4  # 2 epochs x 2 batches

    from dquartic_tpu.train.checkpoint import latest_path_for

    if pid == 0:
        assert os.path.exists(ckpt), "best checkpoint missing"
        assert os.path.exists(latest_path_for(ckpt)), "latest checkpoint missing"
    print(f"MULTIHOST_OK pid={pid} step={int(jax.device_get(state.step))}")


if __name__ == "__main__":
    main()
