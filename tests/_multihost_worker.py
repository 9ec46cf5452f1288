"""Worker for the two-process jax.distributed integration test.

Runs as a standalone subprocess (one per "host"): initializes the
distributed runtime against a local coordinator, then exercises the real
multi-process branches of mtasr_tpu.parallel.multihost — process_shard,
barrier, host_broadcast — and the stage-6 shard/merge flow (each process
writes its decod.{i}/label.{i} shard, rank 0 merges + scores), mirroring
the reference's NCCL pattern (/root/reference/inference_asr_gpus.py:50-66,
200-277) across genuine process boundaries on the CPU backend (gloo).

Usage: python _multihost_worker.py <pid> <nproc> <coordinator> <outdir>
Prints "WORKER-OK <pid>" on success; any assertion failure exits nonzero.
"""
import os
import sys


def main() -> None:
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    coord, outdir = sys.argv[3], sys.argv[4]
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from mtasr_tpu.parallel import multihost

    multihost.initialize(coordinator_address=coord, num_processes=nproc,
                         process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == pid, jax.process_index()

    # second initialize on the same process must be benign (CLI after
    # harness), not crash — the "already initialized" branch
    multihost.initialize(coordinator_address=coord, num_processes=nproc,
                         process_id=pid)

    # process_shard: contiguous, disjoint, covering
    n_items = 11
    sl = multihost.process_shard(n_items)
    mine = list(range(n_items))[sl]
    assert mine, f"p{pid}: empty shard {sl}"

    # host_broadcast: rank 0's value must reach every process
    x = (np.arange(4.0) + 1.0) if pid == 0 else np.zeros(4)
    y = multihost.host_broadcast(x)
    assert np.array_equal(y, np.arange(4.0) + 1.0), y

    # stage-6 shard files: every row decoded by exactly one process
    with open(os.path.join(outdir, f"decod.{pid}"), "w") as f:
        for i in mine:
            f.write(f"utt{i:02d} hello from {i}\n")
    with open(os.path.join(outdir, f"label.{pid}"), "w") as f:
        for i in mine:
            f.write(f"utt{i:02d} hello from {i}\n")

    # the reference's dist.barrier() before the rank-0 merge: rank 0 must
    # not merge until every shard file is on disk
    multihost.barrier("shards-written")

    if pid == 0:
        from argparse import Namespace

        from mtasr_tpu.cli.inference_asr import merge_and_score

        report = merge_and_score(Namespace(
            num_shards=nproc, output_dir=outdir, char_mode=False))
        with open(os.path.join(outdir, "decod")) as f:
            merged = [ln.split()[0] for ln in f]
        assert merged == [f"utt{i:02d}" for i in range(n_items)], merged
        # decod == label exactly, so the merged score must be 0% error
        assert "Overall" in report and "0.00" in report, report

    multihost.barrier("merged")
    print(f"WORKER-OK {pid}", flush=True)


if __name__ == "__main__":
    main()
