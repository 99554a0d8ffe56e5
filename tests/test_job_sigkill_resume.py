"""Job-level kill-resume: SIGKILL the REAL ``jobs/route_job.py``
process group mid-run (actual process death including its local Ray
cluster — not a monkeypatched exception), re-submit, and assert the
partitions committed before the kill were skipped and the final sinks
equal a clean run's.  The strongest form of the north-rule
resumability claim."""

import glob
import json
import os
import signal
import subprocess
import sys
import time

import pandas as pd
import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spawn(inp: str, out: str):
    # start_new_session: the job leads its own process group, so
    # SIGKILLing the group also reaps the local Ray cluster it
    # started (gcs/raylet/workers) — no orphaned backend processes
    return subprocess.Popen(
        [sys.executable, "jobs/route_job.py", "--input", inp,
         "--out", out, "--commit-every", "1", "--sink-agg", "none",
         "--cpus", "4"],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True, start_new_session=True,
        env={**os.environ, "RAY_ADDRESS": "local"})


def _sink_doc_ids(out: str, sink: str) -> list[str]:
    files = glob.glob(os.path.join(out, sink, "**", "*.parquet"),
                      recursive=True)
    if not files:
        return []
    return sorted(pd.concat(
        [pq.read_table(f, columns=["doc_id"]).to_pandas()
         for f in files])["doc_id"])


def test_route_job_sigkill_resume(fixture_paths, tmp_path):
    inp = os.path.dirname(fixture_paths[0])

    # clean reference run
    ref_out = str(tmp_path / "ref")
    p = _spawn(inp, ref_out)
    out_txt, _ = p.communicate(timeout=300)
    assert p.returncode == 0, out_txt
    ref = {s: _sink_doc_ids(ref_out, s) for s in ("slow_ops", "errors")}
    n_parts = len(fixture_paths)

    # killed run: SIGKILL the whole group once a partition commits
    out = str(tmp_path / "killed")
    p = _spawn(inp, out)
    mdir = os.path.join(out, "_manifest")
    deadline = time.time() + 240
    committed = 0
    while time.time() < deadline:
        committed = len(glob.glob(os.path.join(mdir, "commit-*.jsonl")))
        if committed >= 1:
            break
        if p.poll() is not None:  # finished before we could kill it
            break
        time.sleep(0.05)
    if p.poll() is None:
        os.killpg(p.pid, signal.SIGKILL)
        p.wait(timeout=60)
    if p.poll() == 0:
        pytest.skip("job finished before the kill window — too fast "
                    "on this machine to exercise mid-run death")
    assert p.returncode != 0  # really died
    # commits may have landed between the poll and the kill — count
    # the on-disk manifest LINES (one per committed partition): the
    # independent ground truth the resume must honor
    committed = 0
    for f in glob.glob(os.path.join(mdir, "commit-*.jsonl")):
        with open(f) as fh:
            committed += sum(1 for line in fh if line.strip())
    assert committed >= 1

    # resume: every pre-kill commit skips, the rest re-run.  route_job
    # derives skipped as len(paths) - routed, so compare BOTH numbers
    # against the independent manifest count, not against each other.
    p2 = _spawn(inp, out)
    out_txt, _ = p2.communicate(timeout=300)
    assert p2.returncode == 0, out_txt
    summary = json.loads(out_txt.strip().splitlines()[-1])
    assert summary["skipped_completed"] == committed
    assert summary["routed_partitions"] == n_parts - committed

    # final sinks identical to the clean run (no dupes, no gaps)
    for s in ("slow_ops", "errors"):
        assert _sink_doc_ids(out, s) == ref[s], s
