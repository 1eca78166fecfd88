"""DBSCAN on the integer grid — brute-force recount beyond the DuckDB
value oracle: roles, core labels (min-of-component), and border
resolution all reproduced from a sequential reference implementation."""

from __future__ import annotations

import hashlib

import pandas as pd

SF = "/root/testdata/sf0.001"


def _coord(prefix: str, k: int) -> int:
    return int(hashlib.md5(f"{prefix}{k}".encode()).hexdigest()[:4], 16)


def _reference_dbscan(ids, eps, min_pts):
    pts = {i: (_coord("x", i), _coord("y", i)) for i in ids}
    e2 = eps * eps
    nbrs = {
        i: [
            j
            for j in ids
            if j != i
            and (pts[i][0] - pts[j][0]) ** 2 + (pts[i][1] - pts[j][1]) ** 2
            <= e2
        ]
        for i in ids
    }
    cores = {i for i in ids if len(nbrs[i]) + 1 >= min_pts}
    # components of the core-core graph, labeled by min member id
    label = {}
    for seed in sorted(cores):
        if seed in label:
            continue
        comp, stack = [], [seed]
        seen = {seed}
        while stack:
            u = stack.pop()
            comp.append(u)
            for v in nbrs[u]:
                if v in cores and v not in seen:
                    seen.add(v)
                    stack.append(v)
        m = min(comp)
        for u in comp:
            label[u] = m
    border = {}
    for i in ids:
        if i in cores:
            continue
        adj = [label[j] for j in nbrs[i] if j in cores]
        if adj:
            border[i] = min(adj)
    return nbrs, cores, label, border


def test_dbscan_recount(spark):
    from clinical_data_platform_spark.plans.spatial import (
        _DB_EPS,
        _DB_MINPTS,
        dbscan_grid_clusters,
    )

    rows = {r.id: r for r in dbscan_grid_clusters(spark, SF).collect()}
    ids = pd.read_parquet(f"{SF}/customer.parquet").c_custkey.tolist()
    nbrs, cores, label, border = _reference_dbscan(ids, _DB_EPS, _DB_MINPTS)

    assert set(rows) == set(ids)
    for i in ids:
        r = rows[i]
        assert r.n_neighbors == len(nbrs[i]), i
        if i in cores:
            assert r.role == "core", i
            assert r.cluster_id == label[i], i
        elif i in border:
            assert r.role == "border", i
            assert r.cluster_id == border[i], i
        else:
            assert r.role == "noise", i
            assert r.cluster_id is None, i
    # the corpus actually exercises all three roles at this sf
    roles = {r.role for r in rows.values()}
    assert roles == {"core", "border", "noise"}
