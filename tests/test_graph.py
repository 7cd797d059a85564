"""Graph analytics (antnre_spark/graph.py) vs brute-force numpy oracles.

Fixture graph: deterministic 24-vertex digraph with every structural
feature the operators must handle — a cycle, chords, a dangling sink
cluster, an isolated reciprocal pair, and hub fan-in — small enough
that adjacency-matrix power iteration / set-based BFS / peeling are
exact oracles.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from antnre_spark import graph

# (src, dst) over vertices "v00".."v23": ring 0..9 with chords, hub v10
# fed by the ring, tail chain 11->12->13 (13 dangling), reciprocal pair
# 14<->15, star 16->{17,18,19}, path into the ring 20->21->0, isolated
# cycle 22->23->22
EDGES = (
    [(i, (i + 1) % 10) for i in range(10)]
    + [(0, 5), (2, 7), (4, 9)]
    + [(i, 10) for i in (1, 3, 5, 7, 9)]
    + [(10, 11), (11, 12), (12, 13)]
    + [(14, 15), (15, 14)]
    + [(16, 17), (16, 18), (16, 19)]
    + [(20, 21), (21, 0)]
    + [(22, 23), (23, 22)]
)
N_V = 24


def vid(i: int) -> str:
    return f"v{i:02d}"


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(
        [(vid(a), vid(b)) for a, b in EDGES], "src string, dst string"
    )


def numpy_pagerank(
    iterations: int,
    damping: float,
    weights: dict | None = None,
    seeds: set | None = None,
) -> np.ndarray:
    """Dense power iteration with teleport-vector dangling mass;
    optional edge weights and personalization (teleport to seeds)."""
    A = np.zeros((N_V, N_V))
    for a, b in EDGES:
        A[a, b] = weights[(a, b)] if weights else 1.0
    outdeg = A.sum(axis=1)
    if seeds is None:
        e = np.full(N_V, 1.0 / N_V)
    else:
        e = np.zeros(N_V)
        e[sorted(seeds)] = 1.0 / len(seeds)
    r = e.copy()
    for _ in range(iterations):
        dm = r[outdeg == 0].sum()
        contrib = np.zeros(N_V)
        for a in range(N_V):
            if outdeg[a]:
                contrib += r[a] / outdeg[a] * A[a]
        r = (1 - damping) * e + damping * (contrib + dm * e)
    return r


class TestPageRank:
    def test_matches_dense_power_iteration(self, edges_df):
        got = {
            r["vertex"]: r["rank"]
            for r in graph.pagerank(edges_df, iterations=7).collect()
        }
        want = numpy_pagerank(7, 0.85)
        assert len(got) == N_V
        for i in range(N_V):
            assert got[vid(i)] == pytest.approx(want[i], abs=1e-12)

    def test_mass_conserved_and_hub_ranked(self, edges_df):
        rows = graph.pagerank(edges_df, iterations=15).collect()
        assert sum(r["rank"] for r in rows) == pytest.approx(1.0, abs=1e-9)
        by_rank = sorted(rows, key=lambda r: -r["rank"])
        # v10 has 5 in-edges (the hub); v13 accumulates the tail chain
        assert by_rank[0]["vertex"] in (vid(10), vid(13))

    def test_empty_graph(self, spark):
        empty = spark.createDataFrame([], "src string, dst string")
        assert graph.pagerank(empty, iterations=2).count() == 0

    def test_weighted_matches_oracle(self, spark):
        # deterministic positive weights: w(a,b) = 1 + (a + 2b) % 5
        w = {(a, b): 1.0 + (a + 2 * b) % 5 for a, b in EDGES}
        df = spark.createDataFrame(
            [(vid(a), vid(b), w[(a, b)]) for a, b in EDGES],
            "src string, dst string, n_evidence double",
        )
        got = {
            r["vertex"]: r["rank"]
            for r in graph.pagerank(
                df, iterations=6, weight_col="n_evidence"
            ).collect()
        }
        want = numpy_pagerank(6, 0.85, weights=w)
        for i in range(N_V):
            assert got[vid(i)] == pytest.approx(want[i], abs=1e-12)
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)

    def test_personalized_matches_oracle(self, edges_df, spark):
        seeds = spark.createDataFrame([(vid(0),), (vid(16),)], "v string")
        got = {
            r["vertex"]: r["rank"]
            for r in graph.pagerank(
                edges_df, iterations=6, seeds=seeds
            ).collect()
        }
        want = numpy_pagerank(6, 0.85, seeds={0, 16})
        for i in range(N_V):
            assert got[vid(i)] == pytest.approx(want[i], abs=1e-12)
        # unreachable-from-seeds vertices (isolated 22<->23 cycle,
        # reciprocal 14<->15, and 20/21 which only point INTO the ring)
        # carry zero rank; seeds and their downstream carry it all
        for i in (14, 15, 20, 21, 22, 23):
            assert got[vid(i)] == 0.0
        assert got[vid(0)] > 0 and got[vid(17)] > 0
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)

    def test_personalized_rejects_foreign_seeds(self, edges_df, spark):
        seeds = spark.createDataFrame([("zz",)], "v string")
        with pytest.raises(ValueError):
            graph.pagerank(edges_df, iterations=1, seeds=seeds)


def numpy_k_core(k: int) -> set[int]:
    edges = set(EDGES)
    while True:
        deg: dict[int, int] = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {v for v, d in deg.items() if d >= k}
        nxt = {(a, b) for a, b in edges if a in keep and b in keep}
        if nxt == edges:
            return {v for e in edges for v in e}
        edges = nxt


class TestKCore:
    @pytest.mark.parametrize("k", [1, 2, 3, 4])
    def test_matches_peeling_oracle(self, edges_df, k):
        got = {r["v"] for r in graph.k_core(edges_df, k).collect()}
        assert got == {vid(i) for i in numpy_k_core(k)}

    def test_k2_drops_star_leaves(self, edges_df):
        got = {r["v"] for r in graph.k_core(edges_df, 2).collect()}
        # star leaves 17/18/19 and their center have degree < 2 after peel
        assert vid(17) not in got and vid(16) not in got
        # the ring survives (each ring vertex has degree >= 2)
        assert {vid(i) for i in range(10)} <= got

    def test_iteration_cap_raises_not_superset(self, spark):
        """r6 ADVICE: hitting max_iterations without a fixpoint must
        RAISE (honest failure), never silently return the partially-
        peeled superset. A 12-vertex path peels one layer per round, so
        2 rounds cannot reach the (empty) 2-core fixpoint."""
        chain = spark.createDataFrame(
            [(f"p{i}", f"p{i+1}") for i in range(12)], ["src", "dst"]
        )
        with pytest.raises(RuntimeError, match="k_core: no fixpoint"):
            graph.k_core(chain, 2, max_iterations=2)
        # with room to converge the same graph resolves (empty 2-core)
        assert graph.k_core(chain, 2).count() == 0


def numpy_n_hop(seeds: set[int], n: int, direction: str) -> dict[int, int]:
    fwd = {}
    for a, b in EDGES:
        if direction in ("out", "both"):
            fwd.setdefault(a, set()).add(b)
        if direction in ("in", "both"):
            fwd.setdefault(b, set()).add(a)
    hop = {s: 0 for s in seeds}
    frontier = set(seeds)
    for h in range(1, n + 1):
        frontier = {
            d for s in frontier for d in fwd.get(s, ()) if d not in hop
        }
        for d in frontier:
            hop[d] = h
        if not frontier:
            break
    return hop


class TestNHop:
    @pytest.mark.parametrize("direction", ["out", "in", "both"])
    def test_matches_bfs_oracle(self, spark, edges_df, direction):
        seeds = spark.createDataFrame([(vid(0),), (vid(16),)], "v string")
        got = {
            r["vertex"]: r["hop"]
            for r in graph.n_hop(edges_df, seeds, 3, direction).collect()
        }
        want = {
            vid(v): h for v, h in numpy_n_hop({0, 16}, 3, direction).items()
        }
        assert got == want

    def test_min_hop_not_first_path(self, spark, edges_df):
        # v05 is reachable from v00 in 1 hop (chord) AND 5 hops (ring);
        # BFS must record the minimum
        seeds = spark.createDataFrame([(vid(0),)], "v string")
        got = {
            r["vertex"]: r["hop"]
            for r in graph.n_hop(edges_df, seeds, 6).collect()
        }
        assert got[vid(5)] == 1
        # isolated 22/23 never reached
        assert vid(22) not in got and vid(23) not in got

    def test_bad_direction(self, spark, edges_df):
        seeds = spark.createDataFrame([(vid(0),)], "v string")
        with pytest.raises(ValueError):
            graph.n_hop(edges_df, seeds, 1, direction="sideways")


class TestConnectedComponents:
    def test_undirected_components_min_label(self, edges_df):
        got = {
            r["vertex"]: r["component"]
            for r in graph.connected_components(edges_df).collect()
        }
        # union-find oracle over the undirected fixture edges
        parent = {vid(i): vid(i) for i in range(N_V)}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in EDGES:
            ra, rb = find(vid(a)), find(vid(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {v: find(v) for v in parent}
        assert got == want
        # the fixture has exactly 4 components
        assert len(set(got.values())) == 4


def closure_scc(edge_list):
    """Oracle: SCCs via full transitive closure — v, w share a
    component iff mutually reachable; label = min member."""
    verts = sorted({v for e in edge_list for v in e})
    reach = {v: {v} for v in verts}
    changed = True
    while changed:
        changed = False
        for a, b in edge_list:
            if a == b:
                continue
            new = reach[b] - reach[a]
            if new:
                reach[a] |= new
                changed = True
    return {
        v: min(w for w in verts if w in reach[v] and v in reach[w])
        for v in verts
    }


class TestSCC:
    def _got(self, df):
        return {r["vertex"]: r["component"] for r in df.collect()}

    def test_fixture_sccs(self, edges_df):
        got = self._got(graph.strongly_connected_components(edges_df))
        want = closure_scc([(vid(a), vid(b)) for a, b in EDGES])
        assert got == want
        # structure: ring 0..9 is ONE SCC; the reciprocal pairs are
        # SCCs; everything else (hub, tail, star, feeders) singleton
        assert got[vid(5)] == vid(0)
        assert got[vid(15)] == vid(14)
        assert got[vid(23)] == vid(22)
        assert sum(c == vid(0) for c in got.values()) == 10

    def test_random_digraph_vs_closure(self, spark):
        rng = np.random.RandomState(7)
        pairs = {
            (f"n{a:02d}", f"n{b:02d}")
            for a, b in rng.randint(0, 40, size=(90, 2))
            if a != b
        }
        df = spark.createDataFrame(
            sorted(pairs), "src string, dst string"
        )
        got = self._got(graph.strongly_connected_components(df))
        assert got == closure_scc(sorted(pairs))

    def test_dag_chain_resolves_by_trim(self, spark):
        # 30-singleton chain: naive FW-BW needs 30 rounds, TRIM one
        chain = [(f"c{i:02d}", f"c{i + 1:02d}") for i in range(29)]
        df = spark.createDataFrame(chain, "src string, dst string")
        got = self._got(
            graph.strongly_connected_components(df, max_rounds=3)
        )
        assert got == {f"c{i:02d}": f"c{i:02d}" for i in range(30)}

    def test_chain_of_cycles_multi_round(self, spark):
        # A(x*) -> B(m*) -> C(z*): ids make round 1 resolve ONLY B
        # (f=b='m0' there), so the loop must iterate — and must not
        # mislabel A (f='m0' but b='x0') or C in round 1.
        edges = [
            ("x0", "x1"), ("x1", "x0"),
            ("m0", "m1"), ("m1", "m0"),
            ("z0", "z1"), ("z1", "z0"),
            ("x0", "m0"), ("m1", "z0"),
        ]
        df = spark.createDataFrame(edges, "src string, dst string")
        got = self._got(graph.strongly_connected_components(df))
        assert got == {
            "x0": "x0", "x1": "x0", "m0": "m0", "m1": "m0",
            "z0": "z0", "z1": "z0",
        }

    def test_self_loops_and_empty(self, spark):
        df = spark.createDataFrame(
            [("a", "a"), ("a", "b"), ("b", "a"), ("q", "q")],
            "src string, dst string",
        )
        # q's only edge is a self-loop -> singleton SCC of itself;
        # a's self-loop must not perturb the {a, b} cycle component
        got = self._got(graph.strongly_connected_components(df))
        assert got == {"a": "a", "b": "a", "q": "q"}
        empty = spark.createDataFrame([], "src string, dst string")
        assert graph.strongly_connected_components(empty).count() == 0

    def test_max_rounds_exceeded_raises(self, spark):
        # adversarial SCC chain that TRIM cannot peel and whose ids
        # resolve one cycle per round from the middle out
        edges = []
        for i, tag in enumerate(["m", "x", "z"]):
            edges += [(f"{tag}0", f"{tag}1"), (f"{tag}1", f"{tag}0")]
        edges += [("x0", "m0"), ("m1", "z0")]
        df = spark.createDataFrame(edges, "src string, dst string")
        with pytest.raises(RuntimeError, match="max_rounds"):
            graph.strongly_connected_components(df, max_rounds=1)


def brute_triangles(edge_list):
    """Per-vertex triangle counts by scanning all vertex triples."""
    und = set()
    for a, b in edge_list:
        if a != b:
            und.add((min(a, b), max(a, b)))
    verts = sorted({v for e in und for v in e})
    count = {}
    for i, u in enumerate(verts):
        for v in verts[i + 1:]:
            if (u, v) not in und:
                continue
            for w in verts:
                if w <= v:
                    continue
                if (u, w) in und and (v, w) in und:
                    for x in (u, v, w):
                        count[x] = count.get(x, 0) + 1
    return count


class TestTriangleCount:
    # K4 on 0..3 (4 triangles, 3 per vertex) + pendant 4 + a separate
    # triangle 5-6-7 + an edge given in BOTH directions (must not
    # double-count) + a self-loop (must be ignored)
    TRI_EDGES = (
        [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
        + [(3, 4)]
        + [(5, 6), (6, 7), (7, 5), (6, 5)]
        + [(8, 8)]
    )

    def test_matches_brute_force(self, spark):
        df = spark.createDataFrame(
            [(vid(a), vid(b)) for a, b in self.TRI_EDGES],
            "src string, dst string",
        )
        got = {
            r["vertex"]: r["n_triangles"]
            for r in graph.triangle_count(df).collect()
        }
        want = {
            vid(v): n for v, n in brute_triangles(self.TRI_EDGES).items()
        }
        assert got == want
        assert got[vid(0)] == 3 and got[vid(5)] == 1
        assert vid(4) not in got and vid(8) not in got

    def test_fixture_graph_triangle_free(self, edges_df):
        # the 24-vertex fixture digraph is triangle-free by construction
        assert graph.triangle_count(edges_df).count() == 0


def brute_lpa(edge_list, n_vertices, iterations):
    """Exact synchronous LPA with (max count, min label) tie-break."""
    neigh: dict[int, list[int]] = {}
    sym = set()
    for a, b in edge_list:
        if a != b:
            sym.add((a, b))
            sym.add((b, a))
    for a, b in sym:
        neigh.setdefault(a, []).append(b)
    labels = {v: v for v in range(n_vertices)}
    for _ in range(iterations):
        nxt = {}
        for v in range(n_vertices):
            ns = neigh.get(v)
            if not ns:
                nxt[v] = labels[v]
                continue
            counts: dict[int, int] = {}
            for u in ns:
                counts[labels[u]] = counts.get(labels[u], 0) + 1
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            # max count, then MIN label (note -label inverts for max())
            nxt[v] = best[0]
        labels = nxt
    return labels


class TestLabelPropagation:
    @pytest.mark.parametrize("iterations", [1, 2, 4])
    def test_matches_synchronous_oracle(self, edges_df, iterations):
        got = {
            r["vertex"]: r["label"]
            for r in graph.label_propagation(
                edges_df, iterations=iterations
            ).collect()
        }
        want = {
            vid(v): vid(l)
            for v, l in brute_lpa(EDGES, N_V, iterations).items()
        }
        assert got == want

    def test_triangle_with_pendant_converges(self, spark):
        # triangle 0-1-2 plus pendant 3 on 0 reaches the all-v00
        # fixpoint by round 4 (a star would 2-cycle — synchronous LPA's
        # documented bipartite oscillation, why iterations is fixed)
        tri = spark.createDataFrame(
            [(vid(0), vid(1)), (vid(1), vid(2)), (vid(2), vid(0)),
             (vid(0), vid(3))],
            "src string, dst string",
        )
        got = {
            r["vertex"]: r["label"]
            for r in graph.label_propagation(tri, iterations=4).collect()
        }
        assert set(got.values()) == {vid(0)}


class TestKgEdges:
    def test_collapses_parallel_and_self_edges(self, spark):
        triples = spark.createDataFrame(
            [
                ("e1", "works_for", "e2"),
                ("e1", "founded", "e2"),  # parallel: same pair
                ("e3", "knows", "e3"),  # self-loop: dropped
                ("e2", "located_in", "e3"),
            ],
            "subj string, pred string, obj string",
        )
        got = {
            (r["src"], r["dst"]) for r in graph.kg_edges(triples).collect()
        }
        assert got == {("e1", "e2"), ("e2", "e3")}

    def test_evidence_weights_sum_over_parallel_edges(self, spark):
        triples = spark.createDataFrame(
            [
                ("e1", "works_for", "e2", 3),
                ("e1", "founded", "e2", 2),  # parallel: weights sum
                ("e2", "located_in", "e3", 1),
                ("e3", "knows", "e3", 9),  # self-loop: dropped
            ],
            "subj string, pred string, obj string, n_evidence int",
        )
        got = {
            (r["src"], r["dst"]): r["weight"]
            for r in graph.kg_edges(
                triples, evidence_col="n_evidence"
            ).collect()
        }
        assert got == {("e1", "e2"): 5.0, ("e2", "e3"): 1.0}


def dijkstra(weights: dict, sources: set[int]) -> dict[int, float]:
    """Exact oracle: heap-free Dijkstra over the weighted fixture."""
    dist = {s: 0.0 for s in sources}
    done: set[int] = set()
    while True:
        cand = {v: d for v, d in dist.items() if v not in done}
        if not cand:
            return dist
        u = min(cand, key=lambda v: (cand[v], v))
        done.add(u)
        for (a, b), w in weights.items():
            if a == u and dist[u] + w < dist.get(b, float("inf")):
                dist[b] = dist[u] + w


class TestShortestPaths:
    WEIGHTS = {(a, b): 1.0 + ((a * 7 + b * 3) % 5) for a, b in EDGES}

    @pytest.fixture(scope="class")
    def weighted_df(self, spark):
        return spark.createDataFrame(
            [(vid(a), vid(b), w) for (a, b), w in self.WEIGHTS.items()],
            "src string, dst string, weight double",
        )

    def test_weighted_matches_dijkstra(self, spark, weighted_df):
        seeds = spark.createDataFrame([(vid(0),)], "v string")
        got = {
            r["vertex"]: r["dist"]
            for r in graph.shortest_paths(
                weighted_df, seeds, weight_col="weight"
            ).collect()
        }
        want = {
            vid(v): d for v, d in dijkstra(self.WEIGHTS, {0}).items()
        }
        assert got == pytest.approx(want)

    def test_unit_weights_equal_hop_counts(self, spark, edges_df):
        seeds = spark.createDataFrame([(vid(20),)], "v string")
        got = {
            r["vertex"]: r["dist"]
            for r in graph.shortest_paths(edges_df, seeds).collect()
        }
        hops = {
            r["vertex"]: float(r["hop"])
            for r in graph.n_hop(edges_df, seeds, 30).collect()
        }
        assert got == hops

    def test_multi_source_and_direction(self, spark, weighted_df):
        seeds = spark.createDataFrame(
            [(vid(13),), (vid(19),)], "v string"
        )
        got = {
            r["vertex"]: r["dist"]
            for r in graph.shortest_paths(
                weighted_df, seeds, weight_col="weight", direction="in"
            ).collect()
        }
        inv = {(b, a): w for (a, b), w in self.WEIGHTS.items()}
        want = {
            vid(v): d for v, d in dijkstra(inv, {13, 19}).items()
        }
        assert got == pytest.approx(want)

    def test_round_cap_raises_honestly(self, spark, weighted_df):
        seeds = spark.createDataFrame([(vid(0),)], "v string")
        with pytest.raises(RuntimeError, match="shortest_paths"):
            graph.shortest_paths(
                weighted_df, seeds, weight_col="weight", max_rounds=2
            )
