"""Exact sequential bridge / 2-edge-connected-component oracle.

Iterative Tarjan low-link (no recursion: explicit stack, safe at any
depth). Used by tests and the ``bridges_close`` gate query to certify the
distributed XOR-tag construction in stages/bridges.py — this is the
"one-shot reference algorithm" role the reference repo's single-process
union-find plays for CC (oracle/unionfind.py:36)."""

from __future__ import annotations

import numpy as np


def bridges_oracle(src, dst):
    """(sorted bridge list [(a, b)...], 2ecc labels dict vid -> min-vid).

    ``src``/``dst``: int arrays of a simple undirected graph (parallel
    copies and self loops tolerated: a parallel pair is never a bridge, a
    self loop never is)."""
    pairs = {}
    for a, b in zip(np.asarray(src).tolist(), np.asarray(dst).tolist()):
        if a == b:
            continue
        k = (min(a, b), max(a, b))
        pairs[k] = pairs.get(k, 0) + 1
    adj: dict = {}
    for (a, b), _m in pairs.items():
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)

    disc: dict = {}
    low: dict = {}
    out = []
    timer = [0]
    for start in sorted(adj):
        if start in disc:
            continue
        # iterative DFS: stack of (v, parent_edge_used, neighbor iterator)
        disc[start] = low[start] = timer[0]
        timer[0] += 1
        stack = [(start, None, iter(adj[start]))]
        while stack:
            v, pedge, it = stack[-1]
            advanced = False
            for w in it:
                e = (min(v, w), max(v, w))
                if w not in disc:
                    disc[w] = low[w] = timer[0]
                    timer[0] += 1
                    stack.append((w, e, iter(adj[w])))
                    advanced = True
                    break
                if e != pedge or pairs[e] > 1:
                    low[v] = min(low[v], disc[w])
            if not advanced:
                stack.pop()
                if stack:
                    u = stack[-1][0]
                    low[u] = min(low[u], low[v])
                    if low[v] > disc[u] and pairs[(min(u, v), max(u, v))] == 1:
                        out.append((min(u, v), max(u, v)))

    # 2ecc: union-find over non-bridge edges
    bset = set(out)
    parent = {v: v for v in adj}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (a, b) in pairs:
        if (a, b) in bset:
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    groups: dict = {}
    for v in adj:
        groups.setdefault(find(v), []).append(v)
    labels = {}
    for vs in groups.values():
        m = min(vs)
        for v in vs:
            labels[v] = m
    return sorted(out), labels
