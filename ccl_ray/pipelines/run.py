"""CLI pipeline entry — the `ray job submit` surface of the engine.

    python -m ccl_ray.pipelines.run --input /root/testdata/sf0.001 \
        --out /tmp/ccl_out --pipeline flagship [--transcripts DIR] \
        --partitions 16 --checkpoint-dir /tmp/ccl_ck

Writes partitioned Parquet (one directory per result table, files per
shard) plus a run manifest, and checkpoints iterative state so a killed run
resumes. This module OWNS the Ray session (guarded init) — the only places
that do are this CLI, bench.py and the test fixture.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/root/testdata/sf0.001", help="sf dir (events graph)")
    ap.add_argument("--transcripts", default=None, help="transcripts parquet dir instead of events")
    ap.add_argument("--out", required=True)
    ap.add_argument(
        "--pipeline",
        default="flagship",
        choices=["flagship", "cc", "pagerank", "labelprop", "triangles",
                 "hits", "communities", "ktruss", "modularity",
                 "betweenness", "eigenvector", "scc", "walks",
                 "coreness", "matching", "coloring", "katz", "temporal",
                 "curate", "bpe"],
    )
    ap.add_argument("--seed-type", default="signup",
                    help="labelprop: events of this event_type seed their own id")
    ap.add_argument("--walk-len", type=int, default=4,
                    help="walks: steps per walk")
    ap.add_argument("--seed-rate", type=int, default=256,
                    help="walks: hash-select 1/N of vertices as walk seeds")
    ap.add_argument("--seeds", default=None,
                    help="betweenness: comma-separated source vids "
                         "(default: the 4 smallest vertex ids)")
    ap.add_argument("--partitions", type=int, default=16)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args(argv)
    if args.pipeline == "temporal" and args.transcripts:
        ap.error(
            "--pipeline temporal derives edge timestamps from the events "
            "table ({input}/events.parquet) and cannot run on --transcripts"
        )
    if args.pipeline == "labelprop" and args.transcripts:
        ap.error(
            "--pipeline labelprop seeds from the events table "
            "({input}/events.parquet) and cannot run on --transcripts: "
            "event seeds would match no transcript vid and every "
            "seed_label would be null"
        )

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from ccl_ray.config import EngineConfig
    from ccl_ray.state.checkpoint import ShardCheckpoint

    cfg = EngineConfig(
        num_partitions=args.partitions,
        checkpoint_dir=args.checkpoint_dir,
    )

    t0 = time.perf_counter()
    if args.pipeline in ("curate", "bpe"):
        # document pipelines: no graph build (a 100 TB curation run must
        # not pay for an edge table it never reads)
        os.makedirs(args.out, exist_ok=True)
        manifest = {"pipeline": args.pipeline, "partitions": args.partitions,
                    "tables": {}}
        if args.pipeline == "curate":
            from ccl_ray.pipelines.queries import q_curate

            kept = q_curate(args.input)
            path = os.path.join(args.out, "curated_doc_ids")
            kept.write_parquet(path)
            manifest["tables"]["curated_doc_ids"] = {
                "path": path, "rows": kept.count(),
            }
        else:
            import pyarrow.parquet as pq

            import ray.data as rd

            from ccl_ray.stages.bpe import bpe_merges

            docs = rd.read_parquet(
                f"{args.input}/documents.parquet", columns=["text"]
            )
            merges = bpe_merges(docs, n_merges=32)
            path = os.path.join(args.out, "bpe_merges")
            os.makedirs(path, exist_ok=True)
            pq.write_table(merges, os.path.join(path, "merges.parquet"))
            manifest["tables"]["bpe_merges"] = {
                "path": path, "rows": merges.num_rows,
            }
        manifest["wall_s"] = round(time.perf_counter() - t0, 3)
        tmp = os.path.join(args.out, ".manifest.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=2)
        os.replace(tmp, os.path.join(args.out, "run_manifest.json"))
        print(json.dumps(manifest))
        ray.shutdown()
        return 0

    if args.transcripts:
        from ccl_ray.sources.transcripts import (
            build_transcript_edges,
            read_transcripts,
            transcript_vertices,
        )

        ds = read_transcripts(args.transcripts)
        edges = build_transcript_edges(ds, cfg)
        verts = transcript_vertices(ds).select_columns(["vid"]).materialize()
    else:
        from ccl_ray.sources.events_graph import build_event_edges, event_vertices

        edges = build_event_edges(args.input)
        verts = event_vertices(args.input)

    os.makedirs(args.out, exist_ok=True)
    manifest: dict = {"pipeline": args.pipeline, "partitions": args.partitions, "tables": {}}

    def ck(name):
        if not args.checkpoint_dir:
            return None
        col = "score" if name == "scores" else "label"
        return ShardCheckpoint(os.path.join(args.checkpoint_dir, name), col=col)

    edges = edges.materialize()  # lazy build must not re-execute per consumer
    if args.pipeline in ("flagship", "cc", "pagerank"):
        # one shard bundle shared by cc+pagerank; labelprop/triangles build
        # their own (different dedupe/orientation requirements)
        from ccl_ray.state.shards import build_graph_shards

        shards = build_graph_shards(
            edges, args.partitions, vertices_ds=verts, symmetrize=True
        )

    if args.pipeline in ("flagship", "cc"):
        from ccl_ray.stages.cc_bsp import connected_components_bsp

        cc = connected_components_bsp(edges, cfg=cfg, checkpoint=ck("labels"), shards=shards)
        path = os.path.join(args.out, "labels")
        cc.labels.write_parquet(path)
        manifest["tables"]["labels"] = {
            "path": path,
            "rows": cc.labels.count(),
            "iterations": cc.iterations,
            "metrics": cc.metrics[-3:],
        }
    if args.pipeline in ("flagship", "pagerank"):
        from ccl_ray.stages.pagerank_bsp import pagerank_bsp

        pr = pagerank_bsp(edges, cfg=cfg, symmetrize=True, checkpoint=ck("scores"), shards=shards)
        path = os.path.join(args.out, "scores")
        pr.scores.write_parquet(path)
        manifest["tables"]["scores"] = {
            "path": path,
            "rows": pr.scores.count(),
            "iterations": pr.iterations,
            "metrics": pr.metrics[-3:],
        }

    if args.pipeline == "labelprop":
        import pyarrow as pa
        import pyarrow.compute as pc

        import ray.data as rd

        from ccl_ray.stages.labelprop import min_label_propagation

        ev = rd.read_parquet(
            f"{args.input}/events.parquet", columns=["event_id", "event_type"]
        )

        def seed(batch: pa.Table) -> pa.Table:
            sub = batch.filter(pc.equal(batch.column("event_type"), args.seed_type))
            return pa.table({"vid": sub.column("event_id"), "seed": sub.column("event_id")})

        out = min_label_propagation(
            edges, ev.map_batches(seed, batch_format="pyarrow"), vertices=verts, cfg=cfg
        )
        path = os.path.join(args.out, "seed_labels")
        out.write_parquet(path)
        manifest["tables"]["seed_labels"] = {"path": path, "rows": out.count()}
    if args.pipeline == "triangles":
        from ccl_ray.stages.triangles import triangle_counts_per_vertex

        tri = triangle_counts_per_vertex(edges, cfg=cfg)
        path = os.path.join(args.out, "triangles")
        tri.write_parquet(path)
        manifest["tables"]["triangles"] = {"path": path, "rows": tri.count()}

    if args.pipeline == "hits":
        from ccl_ray.stages.hits import hits_fixed

        out = hits_fixed(
            edges.select_columns(["src", "dst"]), iterations=12,
            vertices=verts, cfg=cfg,
        )
        path = os.path.join(args.out, "hits")
        out.write_parquet(path)
        manifest["tables"]["hits"] = {"path": path, "rows": out.count()}

    if args.pipeline == "communities":
        from ccl_ray.stages.lpa import lpa_communities

        out = lpa_communities(edges, iterations=5, vertices=verts, cfg=cfg)
        path = os.path.join(args.out, "communities")
        out.write_parquet(path)
        manifest["tables"]["communities"] = {"path": path, "rows": out.count()}

    if args.pipeline == "ktruss":
        from ccl_ray.stages.triangles import ktruss

        out, rounds = ktruss(edges, 3, cfg=cfg)
        path = os.path.join(args.out, "ktruss")
        out.write_parquet(path)
        manifest["tables"]["ktruss"] = {"path": path, "rows": out.count(),
                                        "rounds": rounds}

    if args.pipeline == "modularity":
        from ccl_ray.stages.aggregates import modularity
        from ccl_ray.stages.lpa import lpa_communities

        comm = lpa_communities(edges, iterations=5, vertices=verts, cfg=cfg).materialize()
        path = os.path.join(args.out, "communities")
        comm.write_parquet(path)
        q = modularity(edges, comm, num_partitions=args.partitions)
        import ray.data as rd

        qpath = os.path.join(args.out, "modularity")
        rd.from_arrow(q).write_parquet(qpath)
        manifest["tables"]["communities"] = {"path": path, "rows": comm.count()}
        manifest["tables"]["modularity"] = {
            "path": qpath, "rows": 1,
            "modularity": float(q.column("modularity")[0].as_py()),
            "n_communities": int(q.column("n_communities")[0].as_py()),
        }

    if args.pipeline == "betweenness":
        from ccl_ray.stages.betweenness import betweenness_sample

        if args.seeds:
            seed_vids = [int(x) for x in args.seeds.split(",")]
        else:
            seed_vids = [
                int(x) for x in
                verts.sort("vid").limit(4).to_pandas()["vid"]
            ]
        out, levels = betweenness_sample(edges, seed_vids, vertices=verts, cfg=cfg)
        path = os.path.join(args.out, "betweenness")
        out.write_parquet(path)
        manifest["tables"]["betweenness"] = {
            "path": path, "rows": out.count(),
            "seeds": seed_vids, "levels_per_seed": levels,
        }

    if args.pipeline == "eigenvector":
        from ccl_ray.stages.hits import eigenvector_centrality

        out, iters = eigenvector_centrality(
            edges.select_columns(["src", "dst"]), vertices=verts, cfg=cfg,
            tol=1e-8, max_iters=100,
        )
        path = os.path.join(args.out, "eigenvector")
        out.write_parquet(path)
        manifest["tables"]["eigenvector"] = {
            "path": path, "rows": out.count(), "iterations": iters,
        }

    if args.pipeline == "scc":
        import numpy as np
        import pyarrow as pa

        from ccl_ray.functions.hashing import stable_hash64_np
        from ccl_ray.stages.scc import strongly_connected_components

        def orient(t: "pa.Table") -> "pa.Table":
            # deterministic vectorized orientation of the canonical
            # undirected edges: hash(src,dst)%3 -> fwd / bwd / both (the
            # bidirectional class seeds nontrivial cycles)
            s = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
            d = t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
            with np.errstate(over="ignore"):
                h = stable_hash64_np(
                    s.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15) + d.view(np.uint64)
                ) % np.uint64(3)
            fs = np.where(h == 1, d, s)
            fd = np.where(h == 1, s, d)
            return pa.table(
                {
                    "src": pa.array(np.concatenate([fs, d[h == 2]])),
                    "dst": pa.array(np.concatenate([fd, s[h == 2]])),
                }
            )

        directed = edges.select_columns(["src", "dst"]).map_batches(
            orient, batch_format="pyarrow"
        )
        res = strongly_connected_components(
            directed, vertices=verts, cfg=cfg, checkpoint_dir=args.checkpoint_dir
        )
        path = os.path.join(args.out, "scc")
        res.labels.write_parquet(path)
        manifest["tables"]["scc"] = {
            "path": path, "rows": res.labels.count(),
            "outer_rounds": res.outer_rounds, "waves": res.waves,
        }

    if args.pipeline == "walks":
        import numpy as np
        import pyarrow as pa

        from ccl_ray.functions.hashing import stable_hash64_np
        from ccl_ray.stages.walks import deterministic_walks

        def pick_seeds(t: "pa.Table") -> "pa.Table":
            v = t.column("vid").to_numpy(zero_copy_only=False)
            keep = (v >= 0) & (
                stable_hash64_np(v.view(np.uint64)) % np.uint64(args.seed_rate) == 0
            )
            return pa.table({"vid": pa.array(v[keep])})

        wseeds = verts.map_batches(pick_seeds, batch_format="pyarrow")
        corpus = deterministic_walks(
            edges.select_columns(["src", "dst"]), wseeds, args.walk_len, cfg=cfg
        )
        path = os.path.join(args.out, "walks")
        corpus.write_parquet(path)
        manifest["tables"]["walks"] = {
            "path": path, "rows": corpus.count(), "walk_len": args.walk_len,
        }

    if args.pipeline == "coreness":
        from ccl_ray.stages.coreness import core_decomposition

        core_ck = None
        if args.checkpoint_dir:
            from ccl_ray.state.checkpoint import StateCheckpoint

            core_ck = StateCheckpoint(
                os.path.join(args.checkpoint_dir, "coreness"), ["c"]
            )
        out, rounds = core_decomposition(
            edges.select_columns(["src", "dst"]), vertices=verts, cfg=cfg,
            checkpoint=core_ck,
        )
        path = os.path.join(args.out, "coreness")
        out.write_parquet(path)
        manifest["tables"]["coreness"] = {
            "path": path, "rows": out.count(), "rounds": rounds,
        }

    if args.pipeline == "matching":
        from ccl_ray.stages.matching import maximal_matching

        out, rounds = maximal_matching(
            edges.select_columns(["src", "dst"]), cfg=cfg
        )
        path = os.path.join(args.out, "matching")
        out.write_parquet(path)
        manifest["tables"]["matching"] = {
            "path": path, "rows": out.count(), "rounds": rounds,
        }

    if args.pipeline == "coloring":
        from ccl_ray.stages.coloring import greedy_coloring

        out, rounds = greedy_coloring(
            edges.select_columns(["src", "dst"]), vertices=verts, cfg=cfg
        )
        path = os.path.join(args.out, "coloring")
        out.write_parquet(path)
        manifest["tables"]["coloring"] = {
            "path": path, "rows": out.count(), "rounds": rounds,
        }

    if args.pipeline == "katz":
        from ccl_ray.stages.katz import katz_centrality

        out, iters, alpha = katz_centrality(
            edges.select_columns(["src", "dst"]), vertices=verts, cfg=cfg
        )
        path = os.path.join(args.out, "katz")
        out.write_parquet(path)
        manifest["tables"]["katz"] = {
            "path": path, "rows": out.count(), "iterations": iters,
            "alpha": alpha,
        }

    if args.pipeline == "temporal":
        import numpy as np
        import pyarrow as pa

        import ray.data as rd

        from ccl_ray.stages.aggregates import partial_sum_agg
        from ccl_ray.stages.exchange import hash_join
        from ccl_ray.stages.temporal import earliest_arrival

        ev = rd.read_parquet(f"{args.input}/events.parquet", columns=["event_id", "ts"])
        dedup = partial_sum_agg(
            edges.select_columns(["src", "dst"]), ["src", "dst"], {}, count_as="_n"
        ).select_columns(["src", "dst"])
        j1 = hash_join(dedup, ev.rename_columns({"event_id": "sv", "ts": "sts"}),
                       left_on="src", right_on="sv", num_partitions=8)
        j2 = hash_join(j1, ev.rename_columns({"event_id": "dv", "ts": "dts"}),
                       left_on="dst", right_on="dv", num_partitions=8)

        def ts_edge(t: "pa.Table") -> "pa.Table":
            s = t.column("sts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            d = t.column("dts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            return pa.table({"src": t.column("src"), "dst": t.column("dst"),
                             "t": pa.array(np.maximum(s, d), pa.int64())})

        def seed_rows(batch: "pa.Table") -> "pa.Table":
            e = batch.column("event_id").to_numpy(zero_copy_only=False)
            ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            keep = e % 97 == 0
            return pa.table({"vid": pa.array(e[keep], pa.int64()),
                             "arr": pa.array(ts[keep], pa.int64())})

        res = earliest_arrival(
            j2.map_batches(ts_edge, batch_format="pyarrow"),
            ev.map_batches(seed_rows, batch_format="pyarrow"),
            vertices=verts, cfg=cfg, dedupe=True,
        )
        path = os.path.join(args.out, "arrivals")
        res.arrivals.write_parquet(path)
        manifest["tables"]["arrivals"] = {
            "path": path, "rows": res.arrivals.count(),
            "iterations": res.iterations,
        }

    manifest["wall_s"] = round(time.perf_counter() - t0, 3)
    tmp = os.path.join(args.out, ".manifest.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2)
    os.replace(tmp, os.path.join(args.out, "run_manifest.json"))
    print(json.dumps(manifest))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
