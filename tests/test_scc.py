"""Strongly-connected-components correctness on synthetic digraphs
with known SCC partitions, plus the registered transition-graph key."""

from __future__ import annotations

from collections import defaultdict

from php_etl_spark.operators.graph import strongly_connected_components
from php_etl_spark.queries import QUERIES
from tests.conftest import SF_DIR


def _groups(rows):
    g = defaultdict(set)
    for r in rows:
        g[r["scc_id"]].add(r["node"])
    return {frozenset(v) for v in g.values()}


def _run(spark, edges):
    df = spark.createDataFrame(edges, ["s", "d"])
    return _groups(strongly_connected_components(df, "s", "d").collect())


def test_two_cycles_and_chain(spark):
    """Two 3-cycles bridged by one edge plus a transient chain: the
    cycles are SCCs, every chain node is a singleton."""
    edges = [
        (1, 2), (2, 3), (3, 1),          # cycle A
        (4, 5), (5, 6), (6, 4),          # cycle B
        (3, 4),                          # bridge (one-way)
        (7, 8), (8, 9),                  # transient chain
        (6, 7),
    ]
    got = _run(spark, edges)
    assert got == {
        frozenset({1, 2, 3}), frozenset({4, 5, 6}),
        frozenset({7}), frozenset({8}), frozenset({9}),
    }


def test_descending_path_all_singletons(spark):
    """A path in DESCENDING id order is the coloring algorithm's slow
    case (the max node colors everything); components must still come
    out as singletons."""
    edges = [(i + 1, i) for i in range(1, 8)]  # 8->7->...->1
    got = _run(spark, edges)
    assert got == {frozenset({i}) for i in range(1, 9)}


def test_nested_cycles_one_component(spark):
    """Two cycles sharing a node strongly connect into ONE component."""
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3)]
    got = _run(spark, edges)
    assert got == {frozenset({1, 2, 3, 4, 5})}


def test_self_loops_and_duplicates_ignored(spark):
    edges = [(1, 1), (1, 2), (1, 2), (2, 1)]
    got = _run(spark, edges)
    assert got == {frozenset({1, 2})}


def _tarjan(edges):
    """Independent reference implementation (iterative Tarjan)."""
    adj = defaultdict(list)
    verts = set()
    for a, b in edges:
        if a != b:
            adj[a].append(b)
            verts.update((a, b))
    index, low, onstack, st = {}, {}, set(), []
    sccs, counter, work = [], [0], []
    for v0 in sorted(verts):
        if v0 in index:
            continue
        work.append((v0, 0))
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                st.append(v)
                onstack.add(v)
            advanced = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    advanced = True
                    break
                if w in onstack:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            if low[v] == index[v]:
                comp = set()
                while True:
                    w = st.pop()
                    onstack.discard(w)
                    comp.add(w)
                    if w == v:
                        break
                sccs.append(frozenset(comp))
            work.pop()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
    return set(sccs)


def test_scc_random_digraphs_match_tarjan(spark):
    """Property check over random small digraphs (deterministic seed
    sweep — hypothesis-style coverage without per-example Spark
    session churn): the coloring SCC must equal Tarjan exactly."""
    import random

    for seed in range(12):
        rng = random.Random(1000 + seed)
        n = rng.randint(2, 8)
        m = rng.randint(1, 2 * n)
        edges = [
            (rng.randint(1, n), rng.randint(1, n)) for _ in range(m)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        got = _run(spark, edges)
        want = _tarjan(edges)
        assert got == want, (seed, sorted(edges), got, want)


def test_condensation_levels_known_dag(spark):
    """Cycle A -> cycle B -> chain: A at level 0, B at 1, chain nodes
    at increasing levels; member counts match component sizes."""
    from php_etl_spark.operators.graph import condensation_levels

    edges = [
        (1, 2), (2, 3), (3, 1),          # cycle A (scc_id 3)
        (4, 5), (5, 6), (6, 4),          # cycle B (scc_id 6)
        (3, 4), (6, 7), (7, 8),
    ]
    df = spark.createDataFrame(edges, ["s", "d"])
    rows = {r["scc_id"]: (r["level"], r["n_members"])
            for r in condensation_levels(df, "s", "d").collect()}
    assert rows == {3: (0, 3), 6: (1, 3), 7: (2, 1), 8: (3, 1)}


def test_condensation_levels_assign_fast_path(spark):
    """Passing a precomputed SCC assignment must yield exactly the
    default path's result (the `assign` fast path added for callers —
    and the iteration probe — that already hold the assignment)."""
    from php_etl_spark.operators.graph import (
        condensation_levels,
        strongly_connected_components,
    )

    edges = [
        (1, 2), (2, 3), (3, 1),
        (4, 5), (5, 6), (6, 4),
        (3, 4), (6, 7), (7, 8),
    ]
    df = spark.createDataFrame(edges, ["s", "d"])
    assign = strongly_connected_components(df, "s", "d")
    via_assign = {
        r["scc_id"]: (r["level"], r["n_members"])
        for r in condensation_levels(df, "s", "d", assign=assign).collect()
    }
    default = {
        r["scc_id"]: (r["level"], r["n_members"])
        for r in condensation_levels(df, "s", "d").collect()
    }
    assert via_assign == default == {3: (0, 3), 6: (1, 3), 7: (2, 1), 8: (3, 1)}


def test_condensation_levels_registered_vs_python(spark):
    """The registered transition-graph key must match a driver-side
    longest-path recompute over the Tarjan condensation."""
    rows = {r["scc_id"]: (r["level"], r["n_members"])
            for r in QUERIES["graph_condensation_levels"](spark, SF_DIR).collect()}
    ev = sorted(
        spark.read.parquet(f"{SF_DIR}/events.parquet").collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    edges = set()
    prev = {}
    for r in ev:
        u = r["user_id"]
        if u in prev and prev[u] != r["event_type"]:
            edges.add((prev[u], r["event_type"]))
        prev[u] = r["event_type"]
    sccs = _tarjan(edges)
    comp_of = {n: max(c) for c in sccs for n in c}
    cedges = {
        (comp_of[a], comp_of[b]) for a, b in edges
        if comp_of[a] != comp_of[b]
    }
    want = {max(c): 0 for c in sccs}
    for _ in range(len(want) + 1):
        nxt = dict(want)
        for a, b in cedges:
            nxt[b] = max(nxt[b], nxt[a] + 1)
        if nxt == want:
            break
        want = nxt
    sizes = {max(c): len(c) for c in sccs}
    assert rows == {c: (want[c], sizes[c]) for c in want}


def test_registered_transition_scc(spark):
    """Every event type lands in exactly one component, and mutually-
    transitioning types share one."""
    rows = QUERIES["graph_scc"](spark, SF_DIR).collect()
    nodes = [r["node"] for r in rows]
    assert len(nodes) == len(set(nodes)) and nodes
    # verify against a driver-side Tarjan on the same edge set
    ev = sorted(
        spark.read.parquet(f"{SF_DIR}/events.parquet").collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    edges = set()
    prev = {}
    for r in ev:
        u = r["user_id"]
        if u in prev and prev[u] != r["event_type"]:
            edges.add((prev[u], r["event_type"]))
        prev[u] = r["event_type"]
    # iterative Tarjan
    adj = defaultdict(list)
    verts = set()
    for a, b in edges:
        adj[a].append(b)
        verts.update((a, b))
    index, low, onstack, st = {}, {}, set(), []
    sccs, counter, work = [], [0], []
    for v0 in sorted(verts):
        if v0 in index:
            continue
        work.append((v0, 0))
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                st.append(v)
                onstack.add(v)
            advanced = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    advanced = True
                    break
                if w in onstack:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            if low[v] == index[v]:
                comp = set()
                while True:
                    w = st.pop()
                    onstack.discard(w)
                    comp.add(w)
                    if w == v:
                        break
                sccs.append(frozenset(comp))
            work.pop()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
    assert _groups(rows) == set(sccs)
