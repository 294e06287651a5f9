#!/usr/bin/env python
"""Kill-and-resume drill for the checkpointed iterative pipelines.

For each requested pipeline (coreness, scc — the round-4 additions; cc and
pagerank had this drill in rounds 2-3):

1. run the CLI pipeline UNINTERRUPTED over the cached transcript graph →
   reference output parquet;
2. run it again with --checkpoint-dir, SIGKILL the process mid-run (after
   --kill-after seconds; asserts the checkpoint dir holds ≥1 committed
   round, i.e. the kill really landed mid-run);
3. relaunch the identical command with the same --checkpoint-dir (resume);
4. compare the resumed output to the reference BITWISE (sorted by vid,
   int64-view equality on every column) and the round counters.

Usage:
    python tools/drill_resume.py --transcripts /tmp/ccl_ray_bench/... \
        [--pipelines coreness,scc] [--kill-after 25] [--partitions 32]

Prints one JSON line per pipeline and a final PASS/FAIL summary line.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import signal
import subprocess
import sys
import time


def _run_cli(transcripts, pipeline, out, partitions, ncpu, ck=None):
    cmd = [
        sys.executable, "-m", "ccl_ray.pipelines.run",
        "--transcripts", transcripts,
        "--pipeline", pipeline,
        "--out", out,
        "--partitions", str(partitions),
        "--num-cpus", str(ncpu),
    ]
    if ck:
        cmd += ["--checkpoint-dir", ck]
    return cmd


def _read_sorted(path_glob: str):
    import numpy as np
    import pyarrow.parquet as pq

    files = sorted(glob.glob(path_glob))
    assert files, f"no parquet under {path_glob}"
    import pyarrow as pa

    t = pa.concat_tables([pq.read_table(f) for f in files])
    vid = t.column("vid").to_numpy(zero_copy_only=False)
    order = np.argsort(vid, kind="stable")
    return {
        c: t.column(c).to_numpy(zero_copy_only=False)[order]
        for c in t.column_names
    }


def drill(pipeline: str, transcripts: str, root: str, partitions: int,
          ncpu: int, kill_after: float) -> dict:
    import numpy as np

    ref_out = os.path.join(root, f"{pipeline}_ref")
    res_out = os.path.join(root, f"{pipeline}_res")
    ck = os.path.join(root, f"{pipeline}_ck")
    for d in (ref_out, res_out, ck):
        shutil.rmtree(d, ignore_errors=True)

    t0 = time.perf_counter()
    subprocess.run(
        _run_cli(transcripts, pipeline, ref_out, partitions, ncpu),
        check=True, capture_output=True, text=True,
    )
    ref_wall = time.perf_counter() - t0
    ref_manifest = json.load(open(os.path.join(ref_out, "run_manifest.json")))

    # interrupted run: SIGKILL once ≥2 checkpoint rounds are committed
    # (polling beats a fixed delay — Ray startup time varies), with
    # --kill-after as the minimum grace and 10× it as the give-up bound
    proc = subprocess.Popen(
        _run_cli(transcripts, pipeline, res_out, partitions, ncpu, ck=ck),
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    time.sleep(kill_after)
    deadline = time.monotonic() + 10 * kill_after
    pat = os.path.join(ck, "**", "manifest.json")
    while (
        proc.poll() is None
        and len(glob.glob(pat, recursive=True)) < 2
        and time.monotonic() < deadline
    ):
        time.sleep(1.0)
    killed_mid_run = proc.poll() is None
    if killed_mid_run:
        proc.send_signal(signal.SIGKILL)
        proc.wait()
    # a committed checkpoint round must exist for the drill to mean anything
    rounds_on_disk = len(glob.glob(pat, recursive=True))
    time.sleep(3)  # let the dead cluster's raylet sockets clear

    # resume with the identical command
    t0 = time.perf_counter()
    subprocess.run(
        _run_cli(transcripts, pipeline, res_out, partitions, ncpu, ck=ck),
        check=True, capture_output=True, text=True,
    )
    resume_wall = time.perf_counter() - t0
    res_manifest = json.load(open(os.path.join(res_out, "run_manifest.json")))

    a = _read_sorted(os.path.join(ref_out, pipeline, "*.parquet"))
    b = _read_sorted(os.path.join(res_out, pipeline, "*.parquet"))
    assert sorted(a) == sorted(b), (sorted(a), sorted(b))
    bitwise = all(
        len(a[c]) == len(b[c])
        and bool(
            np.array_equal(
                a[c].view(np.int64) if a[c].dtype.kind == "f" else a[c],
                b[c].view(np.int64) if b[c].dtype.kind == "f" else b[c],
            )
        )
        for c in a
    )
    return {
        "pipeline": pipeline,
        "rows": int(len(a[next(iter(a))])),
        "killed_mid_run": killed_mid_run,
        "checkpoint_rounds_on_disk": rounds_on_disk,
        "bitwise_identical": bitwise,
        "ref_manifest": ref_manifest["tables"].get(pipeline, {}),
        "res_manifest": res_manifest["tables"].get(pipeline, {}),
        "ref_wall_s": round(ref_wall, 1),
        "resume_wall_s": round(resume_wall, 1),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--transcripts", required=True)
    ap.add_argument("--pipelines", default="coreness,scc")
    ap.add_argument("--kill-after", type=float, default=25.0)
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--num-cpus", type=int, default=32)
    ap.add_argument("--root", default="/tmp/ccl_drill")
    args = ap.parse_args()

    os.makedirs(args.root, exist_ok=True)
    ok = True
    results = []
    for p in args.pipelines.split(","):
        r = drill(p, args.transcripts, args.root, args.partitions,
                  args.num_cpus, args.kill_after)
        results.append(r)
        print(json.dumps(r))
        ok &= r["bitwise_identical"] and r["killed_mid_run"] and \
            r["checkpoint_rounds_on_disk"] >= 1
    print("DRILL " + ("PASS" if ok else "FAIL"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
