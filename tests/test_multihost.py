"""Two-process multi-host SPMD proof (VERDICT r2 item 2).

Launches two real `jax.distributed` CPU processes (gloo collectives, 4
virtual devices each => one 8-device global mesh) through
tests/multihost_worker.py and asserts:

  - both processes run the full-featured train step and agree bitwise on
    every replicated metric (the gradient all-reduce is synchronized);
  - the 2-process metrics match a single-process 8-device run of the same
    problem (the multi-process branches of make_mesh_for_batch/shard_batch
    compute the same math as the dryrun path);
  - an orbax sharded checkpoint written by both hosts restores and resumes,
    and _prune_orbax_dirs keeps only the newest epoch dir.

Semantics matched: the reference's DDP rank processes + rank-interleaved
sampler (rvc/train/train.py:509-514, rvc/train/data_utils.py:332).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(nproc: int, outdir: str, local_devices: int, port: int):
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, "--pid", str(pid), "--nproc", str(nproc),
             "--port", str(port), "--outdir", outdir,
             "--local-devices", str(local_devices), "--steps", "2"],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(nproc)
    ]
    logs = []
    for p in procs:
        # cold compile cache: the full-featured step takes ~17 min to build
        # on a 1-core host; cached reruns finish in a couple of minutes
        out, _ = p.communicate(timeout=2400)
        logs.append(out.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    return [
        json.load(open(os.path.join(outdir, f"metrics_{pid}.json")))
        for pid in range(nproc)
    ]


def test_two_process_train_step_and_orbax(tmp_path):
    port = _free_port()
    two = _run_workers(2, str(tmp_path / "mh2"), local_devices=4, port=port)
    one = _run_workers(1, str(tmp_path / "mh1"), local_devices=8,
                       port=_free_port())

    assert two[0]["global_devices"] == 8 and one[0]["global_devices"] == 8

    # both ranks see identical replicated metrics at every step
    for m0, m1 in zip(two[0]["metrics"], two[1]["metrics"]):
        assert m0.keys() == m1.keys()
        for k in m0:
            assert m0[k] == m1[k], f"rank metric divergence on {k}"

    # 2-process == 1-process math (same problem, same global batch). gloo
    # reduction order can differ from XLA's single-process schedule at the
    # last float32 bit, so compare to tight tolerance rather than bitwise.
    for mh, sp in zip(two[0]["metrics"], one[0]["metrics"]):
        for k in sp:
            assert np.isfinite(sp[k])
            assert abs(mh[k] - sp[k]) <= 2e-4 * max(1.0, abs(sp[k])), (
                f"{k}: 2-proc {mh[k]} vs 1-proc {sp[k]}"
            )

    # resume-after-restore step produced finite metrics on both paths
    assert all(np.isfinite(v) for v in two[0]["metrics"][-1].values())

    # BucketBatcher rank interleave: both ranks report the trainer-wired
    # shard plan; same step count, and the union of their example ids per
    # bucket partitions the padded global id stream (no overlap, no gap)
    assert two[0]["steps_per_epoch"] == two[1]["steps_per_epoch"]
    assert len(two[0]["batch_plan"]) == two[0]["steps_per_epoch"]
    from collections import Counter

    def ids_by_bucket(plan):
        out = {}
        for frames, idxs in plan:
            out.setdefault(frames, []).extend(idxs)
        return out

    b0, b1 = ids_by_bucket(two[0]["batch_plan"]), ids_by_bucket(two[1]["batch_plan"])
    ref = ids_by_bucket(one[0]["batch_plan"])
    assert set(b0) == set(b1) == set(ref)
    for frames in ref:
        # 2-rank shards together hold exactly the single-process stream
        assert Counter(b0[frames]) + Counter(b1[frames]) == Counter(ref[frames])
    # prune kept only the newest orbax dir on the shared exp tree
    exp = tmp_path / "mh2" / "exp"
    dirs = sorted(d for d in os.listdir(exp) if d.startswith("orbax_"))
    assert dirs == ["orbax_2"]
    assert two[0]["latest_ckpt"] == "orbax_2"
