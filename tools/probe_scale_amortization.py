"""Scaling-vs-work-size probe: does the 8->32 cpu efficiency rise when
per-iteration work grows, as the per-wave-floor analysis predicts?

The per-wave floor (tools/probe_wave_floor.py) is ~0.11 s at P=32
regardless of edge count; at the 128M-edge bench scale it is ~45% of the
best 0.25 s CC iteration at 32 cpus, which caps the measured 8->32 ratio
well below the bare-kernel roofline. Prediction: DOUBLE the per-iteration
work and the ratio improves, because the floor amortizes.

Input: the bench edge cache doubled by a disjoint vid-offset copy
(vid + 2^50 — generator vids are num·2^TURN_BITS + turn < 2^43, so the
copy is vertex-disjoint; CC/PR run the identical per-iteration kernels on
2x the edges with the same iteration counts). Run:

    python tools/probe_scale_amortization.py            # parent: 8 then 32
    python tools/probe_scale_amortization.py --child N  # one level
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = os.environ.get("GRAFT_BENCH_CACHE", "/tmp/ccl_ray_bench")
SRC = os.path.join(CACHE, "edges_4000000_s42_salt256")
DBL = os.path.join(CACHE, "edges_4000000_s42_salt256_x2")
P = 32
REPS = int(os.environ.get("GRAFT_BENCH_REPS", "3"))
OFFSET = 1 << 50


def ensure_doubled():
    if os.path.exists(os.path.join(DBL, "_DONE")):
        return
    import ray

    ray.init(address="local", num_cpus=16, include_dashboard=False, logging_level="ERROR")
    import pyarrow as pa
    import ray.data as rd
    from ray.data.context import DataContext

    DataContext.get_current().enable_progress_bars = False
    base = rd.read_parquet(SRC, columns=["src", "dst"])

    def shift(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "src": pc.add(t.column("src"), OFFSET),
                "dst": pc.add(t.column("dst"), OFFSET),
            }
        )

    shifted = rd.read_parquet(SRC, columns=["src", "dst"]).map_batches(
        shift, batch_format="pyarrow"
    )
    base.union(shifted).write_parquet(DBL)
    open(os.path.join(DBL, "_DONE"), "w").write("ok")
    ray.shutdown()


def child(ncpu: int) -> dict:
    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False, logging_level="ERROR")
    import ray.data as rd
    from ray.data.context import DataContext

    DataContext.get_current().enable_progress_bars = False
    from ccl_ray.config import EngineConfig
    from ccl_ray.stages.cc_bsp import connected_components_bsp
    from ccl_ray.stages.pagerank_bsp import pagerank_bsp
    from ccl_ray.state.shards import build_graph_shards

    cfg = EngineConfig(num_partitions=P)
    edges = rd.read_parquet(DBL, columns=["src", "dst"])
    shards = build_graph_shards(edges, P, symmetrize=True, dense=cfg.dense_ids)
    out = {"cpus": ncpu}
    for name, run in (
        ("cc", lambda: connected_components_bsp(edges, cfg=cfg, shards=shards)),
        ("pr", lambda: pagerank_bsp(edges, cfg=cfg, symmetrize=True, shards=shards)),
    ):
        reps = []
        for _ in range(REPS):
            r = run()
            w = sum(m["wall_s"] for m in r.metrics)
            e = r.metrics[-1]["edges"] if r.metrics else 0
            reps.append({"eps": e * r.iterations / w if w else 0, "iters": r.iterations,
                         "edges": e})
        out[name] = {
            "eps_best": max(x["eps"] for x in reps),
            "rep_eps": [round(x["eps"]) for x in reps],
            "iters": reps[0]["iters"],
            "directed_edges": reps[0]["edges"],
        }
    ray.shutdown()
    print(json.dumps(out))
    return out


def main():
    if "--child" in sys.argv:
        child(int(sys.argv[sys.argv.index("--child") + 1]))
        return
    ensure_doubled()
    env = dict(os.environ)

    def run(ncpu):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(ncpu)],
            capture_output=True, text=True, check=True, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        return json.loads(r.stdout.strip().splitlines()[-1])

    lo = run(8)
    time.sleep(int(os.environ.get("GRAFT_SCALE_COOLDOWN_S", "120")))
    hi = run(32)
    eff_cc = hi["cc"]["eps_best"] / lo["cc"]["eps_best"] / 4
    eff_pr = hi["pr"]["eps_best"] / lo["pr"]["eps_best"] / 4
    print(json.dumps({
        "metric": "scale_amortization_8_32",
        "directed_edges": hi["cc"]["directed_edges"],
        "cc_eps": [round(lo["cc"]["eps_best"]), round(hi["cc"]["eps_best"])],
        "pr_eps": [round(lo["pr"]["eps_best"]), round(hi["pr"]["eps_best"])],
        "cc_rep_eps": [lo["cc"]["rep_eps"], hi["cc"]["rep_eps"]],
        "pr_rep_eps": [lo["pr"]["rep_eps"], hi["pr"]["rep_eps"]],
        "eff_cc": round(eff_cc, 3), "eff_pr": round(eff_pr, 3),
    }))


if __name__ == "__main__":
    main()
