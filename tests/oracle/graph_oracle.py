"""Single-process numpy reference implementations (FIXTURES.md §4).

These play the role the single-threaded baseline plays in the GMiner
paper's validation (Table 1): slow, obviously-correct ground truth.
"""

from __future__ import annotations

import numpy as np


def _vertices(edges: list[tuple[int, int]]) -> list[int]:
    vs = set()
    for s, d in edges:
        vs.add(s)
        vs.add(d)
    return sorted(vs)


def pagerank(
    edges: list[tuple[int, int]],
    damping: float = 0.85,
    tol: float = 1e-12,
    max_iter: int = 1000,
    num_iter: int | None = None,
) -> dict[int, float]:
    """Directed PageRank, dangling mass redistributed uniformly."""
    vs = _vertices(edges)
    idx = {v: i for i, v in enumerate(vs)}
    n = len(vs)
    out_deg = np.zeros(n)
    for s, _ in edges:
        out_deg[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    iters = num_iter if num_iter is not None else max_iter
    for _ in range(iters):
        contrib = np.zeros(n)
        w = np.zeros(n)
        nz = out_deg > 0
        w[nz] = r[nz] / out_deg[nz]
        for s, d in edges:
            contrib[idx[d]] += w[idx[s]]
        dangling = r[~nz].sum()
        new_r = (1 - damping) / n + damping * (contrib + dangling / n)
        delta = np.abs(new_r - r).sum()
        r = new_r
        if num_iter is None and delta < tol:
            break
    return {v: float(r[idx[v]]) for v in vs}


def pagerank_weighted(
    edges: list[tuple[int, int, float]],
    damping: float = 0.85,
    num_iter: int = 50,
) -> dict[int, float]:
    """Weighted PageRank: contribution = rank * w / out-strength."""
    vs = _vertices([(s, d) for s, d, _ in edges])
    idx = {v: i for i, v in enumerate(vs)}
    n = len(vs)
    strength = np.zeros(n)
    for s, _, w in edges:
        strength[idx[s]] += w
    r = np.full(n, 1.0 / n)
    for _ in range(num_iter):
        contrib = np.zeros(n)
        nz = strength > 0
        for s, d, w in edges:
            contrib[idx[d]] += r[idx[s]] * w / strength[idx[s]]
        dangling = r[~nz].sum()
        r = (1 - damping) / n + damping * (contrib + dangling / n)
    return {v: float(r[idx[v]]) for v in vs}


def ppr(
    edges: list[tuple[int, int]],
    seeds: list[int],
    damping: float = 0.85,
    num_iter: int = 50,
) -> dict[int, float]:
    """Personalized PageRank: teleport + dangling mass → uniform over seeds."""
    vs = _vertices(edges)
    idx = {v: i for i, v in enumerate(vs)}
    n = len(vs)
    out_deg = np.zeros(n)
    for s, _ in edges:
        out_deg[idx[s]] += 1
    reset = np.zeros(n)
    for s in seeds:
        reset[idx[s]] = 1.0 / len(seeds)
    r = reset.copy()
    for _ in range(num_iter):
        contrib = np.zeros(n)
        nz = out_deg > 0
        w = np.zeros(n)
        w[nz] = r[nz] / out_deg[nz]
        for s, d in edges:
            contrib[idx[d]] += w[idx[s]]
        dangling = r[~nz].sum()
        r = (1 - damping) * reset + damping * (contrib + dangling * reset)
    return {v: float(r[idx[v]]) for v in vs}


def cc(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find; component label = min vertex id in component."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        parent.setdefault(s, s)
        parent.setdefault(d, d)
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    return {v: find(v) for v in parent}


def lpa_sync(
    edges: list[tuple[int, int]], num_iter: int = 5
) -> dict[int, int]:
    """Synchronous LPA, undirected, tie-break (count desc, label asc)."""
    nbrs: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        nbrs.setdefault(s, set()).add(d)
        nbrs.setdefault(d, set()).add(s)
    labels = {v: v for v in nbrs}
    for _ in range(num_iter):
        new = {}
        for v in nbrs:
            counts: dict[int, int] = {}
            for u in nbrs[v]:
                lbl = labels[u]
                counts[lbl] = counts.get(lbl, 0) + 1
            if counts:
                new[v] = min(counts, key=lambda l: (-counts[l], l))
            else:
                new[v] = labels[v]
        labels = new
    return labels


def triangles(edges: list[tuple[int, int]]) -> int:
    """Exact triangle count of the undirected simple graph."""
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    count = 0
    for v in adj:
        for u in adj[v]:
            if u > v:
                for w in adj[v] & adj[u]:
                    if w > u:
                        count += 1
    return count


def triangles_per_vertex(edges: list[tuple[int, int]]) -> dict[int, int]:
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    out = {v: 0 for v in adj}
    for v in adj:
        for u in adj[v]:
            if u > v:
                for w in adj[v] & adj[u]:
                    if w > u:
                        out[v] += 1
                        out[u] += 1
                        out[w] += 1
    return out


def sssp(
    edges: list[tuple[int, int]] | list[tuple[int, int, int]],
    sources: list[int],
    directed: bool = False,
) -> dict[int, int]:
    """Dijkstra multi-source; edges optionally (s, d, w) with int w>=0."""
    import heapq

    adj: dict[int, list[tuple[int, int]]] = {}
    for e in edges:
        s, d, w = e if len(e) == 3 else (e[0], e[1], 1)
        if s == d:
            continue
        adj.setdefault(s, []).append((d, w))
        if not directed:
            adj.setdefault(d, []).append((s, w))
    dist: dict[int, int] = {}
    pq = [(0, s) for s in sources if s in adj]
    while pq:
        d0, v = heapq.heappop(pq)
        if v in dist:
            continue
        dist[v] = d0
        for u, w in adj.get(v, []):
            if u not in dist:
                heapq.heappush(pq, (d0 + w, u))
    return dist


def lpa_weighted(
    edges: list[tuple[int, int, int]], num_iter: int = 5
) -> dict[int, int]:
    """Weighted sync LPA; tie-break (weight sum desc, label asc)."""
    nbrs: dict[int, dict[int, int]] = {}
    for s, d, w in edges:
        if s == d:
            continue
        nbrs.setdefault(s, {})[d] = nbrs.setdefault(s, {}).get(d, 0) + w
        nbrs.setdefault(d, {})[s] = nbrs.setdefault(d, {}).get(s, 0) + w
    labels = {v: v for v in nbrs}
    for _ in range(num_iter):
        new = {}
        for v in nbrs:
            counts: dict[int, int] = {}
            for u, w in nbrs[v].items():
                lbl = labels[u]
                counts[lbl] = counts.get(lbl, 0) + w
            new[v] = min(counts, key=lambda l: (-counts[l], l)) if counts else labels[v]
        labels = new
    return labels


def betweenness_sampled(
    edges: list[tuple[int, int]], sources: list[int]
) -> dict[int, float]:
    """Brandes dependency accumulation from a source sample (raw sums,
    undirected adjacency, source excluded per pass)."""
    from collections import deque

    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    bc = {v: 0.0 for v in adj}
    for s in sources:
        if s not in adj:
            continue
        sigma = {s: 1}
        dist = {s: 0}
        order = []
        preds: dict[int, list[int]] = {s: []}
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            for u in adj[v]:
                if u not in dist:
                    dist[u] = dist[v] + 1
                    sigma[u] = 0
                    preds[u] = []
                    q.append(u)
                if dist[u] == dist[v] + 1:
                    sigma[u] += sigma[v]
                    preds[u].append(v)
        delta = {v: 0.0 for v in order}
        for w in reversed(order):
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return bc
