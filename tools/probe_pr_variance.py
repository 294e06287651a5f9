#!/usr/bin/env python
"""Controlled experiment pinning the PageRank "slow-mode" variance
(BENCH/BASELINE.md variance section): the same code/input measured 196-441M
eps across sessions. Three protocols over the SAME cached bench edges:

  shared : one Ray session, shards built once, REPS reps back-to-back
           (the bench.py baseline protocol).
  fresh  : every rep in its own subprocess = its own Ray session, i.e. the
           plasma object store is RESTARTED between reps. If spread
           collapses here, the slow mode is object-store state
           (fragmentation/placement); if not, it's host-level.
  touch  : one session, shards built once, but every shard ref is read
           (pre-touched) immediately before each timed rep. If spread
           collapses here, the slow mode is cold/evicted pages, not
           fragmentation.

Run from /root/repo:  python tools/probe_pr_variance.py
Child mode (internal): PRV_MODE=shared|touch|fresh_one python tools/probe_pr_variance.py
Prints one JSON line per protocol with rep_eps and spread = (max-min)/max.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

CACHE = os.environ.get("GRAFT_BENCH_CACHE", "/tmp/ccl_ray_bench")
BENCH_CONVS = int(os.environ.get("GRAFT_BENCH_CONVS", "4000000"))
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
P = int(os.environ.get("GRAFT_PARTITIONS", "32"))
REPS = int(os.environ.get("PRV_REPS", "4"))
SALTS = int(os.environ.get("GRAFT_TOOL_SALTS", "256"))


def _edge_cache() -> str:
    path = os.path.join(CACHE, f"edges_{BENCH_CONVS}_s42_salt{SALTS}")
    if not os.path.exists(os.path.join(path, "_DONE")):
        raise SystemExit(f"run bench.py once first to build the edge cache at {path}")
    return path


def _run_reps(mode: str, reps: int) -> list[dict]:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data as rd

    from ccl_ray.config import EngineConfig
    from ccl_ray.stages.pagerank_bsp import pagerank_bsp
    from ccl_ray.state.shards import build_graph_shards

    cfg = EngineConfig(num_partitions=P, dense_ids=True, extra={"tool_salts": SALTS})
    edges = rd.read_parquet(_edge_cache(), columns=["src", "dst"])
    shards = build_graph_shards(edges, P, vertices_ds=None, symmetrize=True, dense=True)

    out = []
    for _ in range(reps):
        if mode == "touch":
            # pre-touch every shard payload so the timed rep never reads a
            # cold/evicted page; ray.get is zero-copy, the strided .sum()
            # forces every backing page in
            import numpy as np

            def _touch(obj):
                if isinstance(obj, ray.ObjectRef):
                    _touch(ray.get(obj))
                elif isinstance(obj, (list, tuple)):
                    for x in obj:
                        _touch(x)
                elif isinstance(obj, dict):
                    for x in obj.values():
                        _touch(x)
                elif isinstance(obj, np.ndarray) and obj.size and obj.dtype.kind in "iuf":
                    _touch.acc += int(obj[:: max(1, obj.size // 65536)].sum() % 7)

            _touch.acc = 0
            t0 = time.perf_counter()
            _touch(shards)
            touch_s = time.perf_counter() - t0
        else:
            touch_s = None
        pr = pagerank_bsp(edges, cfg=cfg, symmetrize=True, shards=shards)
        w = sum(m["wall_s"] for m in pr.metrics)
        e = pr.metrics[-1]["edges"] if pr.metrics else 0
        rec = {"eps": round(e * pr.iterations / w) if w else 0,
               "iter_wall_s": round(w, 2), "iters": pr.iterations}
        if touch_s is not None:
            rec["touch_s"] = round(touch_s, 2)
        out.append(rec)
    ray.shutdown()
    return out


def main():
    mode = os.environ.get("PRV_MODE")
    if mode in ("shared", "touch"):
        print(json.dumps(_run_reps(mode, REPS)))
        return
    if mode == "fresh_one":
        print(json.dumps(_run_reps("shared", 1)))
        return

    here = os.path.abspath(__file__)
    cwd = os.path.dirname(os.path.dirname(here))

    def child(mode: str) -> list[dict]:
        env = dict(os.environ, PRV_MODE=mode)
        r = subprocess.run([sys.executable, here], env=env, capture_output=True,
                           text=True, check=True, cwd=cwd)
        return json.loads(r.stdout.strip().splitlines()[-1])

    results = {}
    for proto in ("shared", "fresh", "touch"):
        if proto == "fresh":
            reps = []
            for _ in range(REPS):
                reps.extend(child("fresh_one"))
        else:
            reps = child(proto)
        eps = [r["eps"] for r in reps]
        results[proto] = {
            "rep_eps": eps,
            "spread": round((max(eps) - min(eps)) / max(eps), 3) if max(eps) else None,
            "reps": reps,
        }
        print(json.dumps({proto: results[proto]}), flush=True)
    print(json.dumps({"summary": {k: v["spread"] for k, v in results.items()}}))


if __name__ == "__main__":
    main()
