"""Serial union-find oracle (clean-room; ground truth for all CC tests).

The reference cannot run as shipped (ccl2d.py:174-175 IndentationError), so
exact-agreement checks are against this oracle plus the golden label arrays
embedded in the reference's unit tests (SURVEY.md §5), compared as
*partitions* with canonical min-vid labels.
"""

from __future__ import annotations

import numpy as np


class UnionFind:
    def __init__(self):
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent.setdefault(x, x)
        if p != x:
            root = self.find(p)
            self.parent[x] = root
            return root
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # canonical: smaller id becomes the root (min-vid labels)
            if ra < rb:
                self.parent[rb] = ra
            else:
                self.parent[ra] = rb


def cc_oracle(src: np.ndarray, dst: np.ndarray, vids: np.ndarray | None = None) -> dict[int, int]:
    """vid -> min-vid-of-component for all edge endpoints (∪ explicit vids)."""
    uf = UnionFind()
    for a, b in zip(src.tolist(), dst.tolist()):
        uf.union(int(a), int(b))
    if vids is not None:
        for v in vids.tolist():
            uf.find(int(v))
    # path-compress everything; min-vid canonicalization needs a second pass
    roots: dict[int, int] = {}
    for v in list(uf.parent):
        r = uf.find(v)
        m = roots.get(r)
        if m is None or v < m:
            roots[r] = v
    return {v: roots[uf.find(v)] for v in uf.parent}


def kruskal_oracle(
    src: np.ndarray, dst: np.ndarray, w: np.ndarray
) -> list[tuple[int, int, float]]:
    """The unique minimum spanning forest under the strict total edge order
    (w, min(u,v), max(u,v)) — the same order the Borůvka engine uses, so
    the edge SETS must match exactly. Self-loops drop; parallel edges keep
    the min key. Returns sorted (a, b, w) canonical triples."""
    a = np.minimum(src, dst).astype(np.int64)
    b = np.maximum(src, dst).astype(np.int64)
    keep = a != b
    a, b, w = a[keep], b[keep], np.asarray(w, np.float64)[keep]
    order = np.lexsort((b, a, w))
    uf = UnionFind()
    out: list[tuple[int, int, float]] = []
    for i in order.tolist():
        u, v = int(a[i]), int(b[i])
        if uf.find(u) != uf.find(v):
            uf.union(u, v)
            out.append((u, v, float(w[i])))
    return sorted(out)


def pagerank_oracle(
    src: np.ndarray,
    dst: np.ndarray,
    vids: np.ndarray,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iters: int = 200,
) -> dict[int, float]:
    """Dense numpy power iteration (directed edges src->dst, dangling-aware)."""
    vids = np.asarray(sorted(set(vids.tolist())), dtype=np.int64)
    idx = {int(v): i for i, v in enumerate(vids)}
    n = len(vids)
    s = np.fromiter((idx[int(x)] for x in src), dtype=np.int64, count=len(src))
    d = np.fromiter((idx[int(x)] for x in dst), dtype=np.int64, count=len(dst))
    outdeg = np.bincount(s, minlength=n).astype(np.float64)
    score = np.full(n, 1.0 / n)
    for _ in range(max_iters):
        contrib = np.where(outdeg > 0, score / np.maximum(outdeg, 1), 0.0)
        agg = np.bincount(d, weights=contrib[s], minlength=n)
        dangling = score[outdeg == 0].sum()
        new = (1.0 - damping) / n + damping * (agg + dangling / n)
        l1 = np.abs(new - score).sum()
        score = new
        if l1 < tol:
            break
    return {int(v): float(score[i]) for i, v in enumerate(vids)}


def hits_oracle(
    src: np.ndarray,
    dst: np.ndarray,
    vids: np.ndarray,
    tol: float = 1e-10,
    max_iters: int = 100,
) -> tuple[dict[int, float], dict[int, float], int]:
    """Dense numpy HITS twin of stages/hits.py's converged loop: directed
    deduped loop-free edges, auth then hub half-steps each L1-normalized,
    stop when BOTH vectors' L1 deltas < tol. Returns (auth, hub, iters)."""
    vids = np.asarray(sorted(set(vids.tolist())), dtype=np.int64)
    idx = {int(v): i for i, v in enumerate(vids)}
    n = len(vids)
    pairs = sorted({(idx[int(a)], idx[int(b)]) for a, b in zip(src, dst) if a != b})
    s = np.array([p[0] for p in pairs], np.int64)
    d = np.array([p[1] for p in pairs], np.int64)
    auth = np.ones(n)
    hub = np.ones(n)
    it = 0
    while True:
        a_new = np.bincount(d, weights=hub[s], minlength=n) if len(s) else np.zeros(n)
        t = a_new.sum()
        if t:
            a_new /= t
        h_new = np.bincount(s, weights=a_new[d], minlength=n) if len(s) else np.zeros(n)
        t = h_new.sum()
        if t:
            h_new /= t
        l1 = max(np.abs(a_new - auth).sum(), np.abs(h_new - hub).sum())
        auth, hub = a_new, h_new
        it += 1
        if l1 < tol or it >= max_iters:
            break
    return (
        {int(v): float(auth[i]) for i, v in enumerate(vids)},
        {int(v): float(hub[i]) for i, v in enumerate(vids)},
        it,
    )


def weighted_pagerank_oracle(
    src: np.ndarray,
    dst: np.ndarray,
    w: np.ndarray,
    vids: np.ndarray,
    damping: float = 0.85,
    tol: float = 1e-10,
    max_iters: int = 100,
) -> tuple[dict[int, float], int]:
    """Dense numpy twin of stages/wpagerank.py's converged loop: symmetrized
    deduped (min weight per pair) loop-free edges, transition mass
    w(u,v)/W(u), dangling mass spread uniformly. Returns (scores, iters)."""
    vids = np.asarray(sorted(set(vids.tolist())), dtype=np.int64)
    idx = {int(v): i for i, v in enumerate(vids)}
    n = len(vids)
    best: dict[tuple[int, int], float] = {}
    for a, b, ww in zip(src, dst, w):
        if a == b:
            continue
        for pair in ((idx[int(a)], idx[int(b)]), (idx[int(b)], idx[int(a)])):
            if pair not in best or ww < best[pair]:
                best[pair] = float(ww)
    s = np.array([p[0] for p in best], np.int64)
    d = np.array([p[1] for p in best], np.int64)
    ew = np.array(list(best.values()), np.float64)
    W = np.bincount(s, weights=ew, minlength=n)
    has_edge = W > 0
    score = np.full(n, 1.0 / n)
    it = 0
    while True:
        contrib = score[s] * ew / W[s] if len(s) else np.empty(0)
        agg = np.bincount(d, weights=contrib, minlength=n) if len(s) else np.zeros(n)
        dangling = score[~has_edge].sum()
        new = (1.0 - damping) / n + damping * (agg + dangling / n)
        l1 = np.abs(new - score).sum()
        score = new
        it += 1
        if l1 < tol or it >= max_iters:
            break
    return {int(v): float(score[i]) for i, v in enumerate(vids)}, it


def triangle_oracle(src: np.ndarray, dst: np.ndarray) -> int:
    """Brute-force triangle count on canonical undirected edges."""
    edges = {(min(int(a), int(b)), max(int(a), int(b))) for a, b in zip(src, dst) if a != b}
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    count = 0
    for a, b in edges:
        count += len(adj[a] & adj[b])
    return count // 3


def brandes_oracle(
    src: np.ndarray,
    dst: np.ndarray,
    vids: np.ndarray,
    seeds: list[int],
) -> dict[int, float]:
    """Serial Brandes dependency sums over the seed sample — the numpy twin
    of stages/betweenness.py (same level-synchronous float64 formula:
    sigma by BFS level forward, delta = sigma(v)·Σ (1+delta(w))/sigma(w)
    over level-(d+1) neighbors backward; seeds excluded from their own
    sums; no normalization). MULTIGRAPH semantics, matching the shard
    plans: a parallel edge contributes its multiplicity to both the path
    counts and the dependency sums (the engine reuses CC/PageRank bundles,
    which deliberately keep the edge table's multiset — dedupe the edges
    first for simple-graph betweenness)."""
    from collections import Counter

    vlist = sorted({int(v) for v in vids})
    nbr: dict[int, Counter] = {v: Counter() for v in vlist}
    for a, b in zip(src, dst):
        a, b = int(a), int(b)
        if a != b:
            nbr[a][b] += 1
            nbr[b][a] += 1
    bc = {v: 0.0 for v in vlist}
    for s in seeds:
        s = int(s)
        dist = {s: 0}
        sigma = {v: 0.0 for v in vlist}
        sigma[s] = 1.0
        levels = [[s]]
        while levels[-1]:
            nxt = []
            for u in levels[-1]:
                for w in nbr[u]:
                    if w not in dist:
                        dist[w] = dist[u] + 1
                        nxt.append(w)
            # sigma for the new level: multiplicity-weighted pred sums
            for w in nxt:
                sigma[w] = float(
                    sum(m * sigma[u] for u, m in nbr[w].items()
                        if dist.get(u) == dist[w] - 1)
                )
            levels.append(nxt)
        delta = {v: 0.0 for v in vlist}
        for lvl in range(len(levels) - 2, 0, -1):
            for v in levels[lvl]:
                acc = sum(
                    m * (1.0 + delta[w]) / sigma[w]
                    for w, m in nbr[v].items()
                    if dist.get(w) == lvl + 1
                )
                delta[v] = sigma[v] * acc
        for v in vlist:
            if v != s:
                bc[v] += delta[v]
    return bc


def mis_oracle(src: np.ndarray, dst: np.ndarray, vids: np.ndarray) -> set[int]:
    """Serial twin of stages/mis.py: deterministic Luby-style MIS with the
    injective priority prio(v) = (v * 0x9E3779B97F4A7C15) mod 2^64."""
    K = 0x9E3779B97F4A7C15
    M = 1 << 64
    vlist = sorted({int(v) for v in vids})
    prio = {v: (v * K) % M for v in vlist}
    nbr: dict[int, set[int]] = {v: set() for v in vlist}
    for a, b in zip(src, dst):
        a, b = int(a), int(b)
        if a != b:
            nbr[a].add(b)
            nbr[b].add(a)
    undecided = set(vlist)
    s: set[int] = set()
    while undecided:
        join = {
            v for v in undecided
            if all(prio[v] < prio[u] for u in nbr[v] if u in undecided)
        }
        assert join
        s |= join
        undecided -= join
        undecided -= {u for v in join for u in nbr[v]}
    return s


def eigenvector_oracle(
    src: np.ndarray,
    dst: np.ndarray,
    vids: np.ndarray,
    tol: float = 1e-10,
    max_iters: int = 100,
) -> tuple[dict[int, float], int]:
    """Dense numpy twin of stages/hits.py eigenvector_centrality: shifted
    power iteration x ← (A + I)x / ‖·‖₁ on the undirected deduped
    loop-free graph from a uniform start (the +I shift converges to the
    Perron vector even on bipartite graphs). Returns (scores, iters)."""
    vids = np.asarray(sorted(set(vids.tolist())), dtype=np.int64)
    idx = {int(v): i for i, v in enumerate(vids)}
    n = len(vids)
    pairs = set()
    for a, b in zip(src, dst):
        if a != b:
            pairs.add((idx[int(a)], idx[int(b)]))
            pairs.add((idx[int(b)], idx[int(a)]))
    s = np.array([p[0] for p in pairs], np.int64)
    d = np.array([p[1] for p in pairs], np.int64)
    x = np.full(n, 1.0 / n if n else 0.0)
    it = 0
    while True:
        new = x + (np.bincount(d, weights=x[s], minlength=n) if len(s) else 0.0)
        t = new.sum()
        if t:
            new = new / t
        l1 = np.abs(new - x).sum()
        x = new
        it += 1
        if l1 < tol or it >= max_iters:
            break
    return {int(v): float(x[i]) for i, v in enumerate(vids)}, it


def scc_oracle(
    src: np.ndarray, dst: np.ndarray, vids: np.ndarray | None = None
) -> dict[int, int]:
    """Serial iterative Tarjan SCC → {vid: min vid of its SCC}.

    Directed edges src→dst; ``vids`` adds isolated vertices. Iterative
    (explicit stack) so deep graphs don't hit the recursion limit.
    """
    adj: dict[int, list[int]] = {}
    verts: set[int] = set()
    for a, b in zip(src.tolist(), dst.tolist()):
        if a == b:
            verts.add(a)
            continue
        adj.setdefault(a, []).append(b)
        verts.add(a)
        verts.add(b)
    if vids is not None:
        verts.update(int(v) for v in vids.tolist())

    index: dict[int, int] = {}
    low: dict[int, int] = {}
    on_stack: set[int] = set()
    stack: list[int] = []
    out: dict[int, int] = {}
    counter = [0]

    for root in verts:
        if root in index:
            continue
        # iterative Tarjan: work stack of (vertex, child iterator position)
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            advanced = False
            children = adj.get(v, ())
            while pi < len(children):
                w = children[pi]
                pi += 1
                if w not in index:
                    work[-1] = (v, pi)
                    work.append((w, 0))
                    advanced = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    out[w] = m
            if work:
                pv, _ = work[-1]
                low[pv] = min(low[pv], low[v])
    return out
