"""Per-wave fixed-latency probe for the BSP engines.

Runs connected_components_bsp twice at the same P and cpu count:
once on the bench-scale graph proxy (``--edges`` per shard scale) and
once on a ~1000x smaller graph. Per-iteration wall on the tiny graph is
almost pure fixed cost — task dispatch, exchange object churn, and the
convergence sync — the component that does NOT scale with edge count.

Motivation (BENCH/BASELINE.md round-4 scaling section): at 128M edges
the best CC iteration wall at 32 cpus is ~0.25 s; if the fixed per-wave
floor is ~0.1 s, then ~40% of every iteration is latency that amortizes
away when per-node work grows (the north-rule 100 TB deployment runs
seconds of per-node work per iteration). The probe quantifies the floor
directly instead of inferring it.

Run: python tools/probe_wave_floor.py  [--cpus 32] [--parts 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def random_edges(n_vertices: int, n_edges: int, seed: int) -> pa.Table:
    rng = np.random.RandomState(seed)
    src = rng.randint(0, n_vertices, n_edges).astype(np.int64)
    dst = rng.randint(0, n_vertices, n_edges).astype(np.int64)
    return pa.table({"src": pa.array(src), "dst": pa.array(dst)})


def run_cc(tbl: pa.Table, P: int) -> dict:
    import ray.data as rd

    from ccl_ray.config import EngineConfig
    from ccl_ray.stages.cc_bsp import connected_components_bsp

    cfg = EngineConfig(num_partitions=P)
    edges = rd.from_arrow(tbl).repartition(P).materialize()
    res = connected_components_bsp(edges, cfg=cfg)
    walls = [m["wall_s"] for m in res.metrics]
    e = res.metrics[-1]["edges"] if res.metrics else 0
    return {
        "iters": res.iterations,
        "directed_edges": int(e),
        "mean_iter_wall_s": round(float(np.mean(walls)), 4),
        "min_iter_wall_s": round(float(np.min(walls)), 4),
        "eps_per_iter": round(e / np.mean(walls)) if walls else 0,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--parts", type=int, default=32)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data.context import DataContext

    DataContext.get_current().enable_progress_bars = False

    # tiny: ~128k drawn edges (1000x below bench scale) — wall ≈ pure floor.
    # small: ~4M drawn edges (32x below bench) — shows the transition.
    for name, nv, ne in (("tiny", 16_000, 128_000), ("small", 500_000, 4_000_000)):
        r = run_cc(random_edges(nv, ne, 7), args.parts)
        print(json.dumps({"graph": name, "P": args.parts, "cpus": args.cpus, **r}))

    ray.shutdown()


if __name__ == "__main__":
    main()
