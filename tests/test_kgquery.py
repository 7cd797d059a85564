"""BGP query compiler (antnre_spark/kgquery.py) vs a brute-force
binding enumerator over the same in-memory triple set."""

import pytest
from pyspark.sql import functions as F

from antnre_spark.kgquery import bgp_query

# (subj, pred, obj) — a small KG with a hub (n1), a chain
# (c* -in_nation-> n* -in_region-> r*), a cycle, and parallel preds.
TRIPLES = [
    ("c1", "in_nation", "n1"),
    ("c2", "in_nation", "n1"),
    ("c3", "in_nation", "n2"),
    ("c4", "in_nation", "n3"),
    ("s1", "in_nation", "n1"),
    ("s2", "in_nation", "n2"),
    ("n1", "in_region", "r1"),
    ("n2", "in_region", "r1"),
    ("n3", "in_region", "r2"),
    ("c1", "knows", "c2"),
    ("c2", "knows", "c3"),
    ("c3", "knows", "c1"),
    ("c1", "knows", "c4"),
    ("c4", "likes", "c4"),
    ("r1", "part_of", "w"),
    ("r2", "part_of", "w"),
]


def brute(triples, patterns, filters=(), optional=(), select=None,
          distinct=False):
    """Reference evaluator: nested-loop pattern matching."""

    def match_one(pattern, binding):
        out = []
        for row in triples:
            b = dict(binding)
            ok = True
            for term, val in zip(pattern, row):
                if term.startswith("?"):
                    name = term[1:]
                    if name in b and b[name] is not None and b[name] != val:
                        ok = False
                        break
                    b[name] = val
                elif term != val:
                    ok = False
                    break
            if ok:
                out.append(b)
        return out

    def match_group(pats, binding):
        acc = [binding]
        for pat in pats:
            acc = [b2 for b in acc for b2 in match_one(pat, b)]
        return acc

    bindings = match_group(patterns, {})
    bindings = [b for b in bindings if all(f(b) for f in filters)]
    for group in optional:
        nxt = []
        gvars = {t[1:] for pat in group for t in pat if t.startswith("?")}
        for b in bindings:
            ext = match_group(group, b)
            if ext:
                nxt.extend(ext)
            else:
                miss = dict(b)
                for v in gvars:
                    miss.setdefault(v, None)
                nxt.append(miss)
        bindings = nxt
    allvars = sorted({k for b in bindings for k in b})
    cols = select if select is not None else allvars
    rows = [tuple(b.get(c) for c in cols) for b in bindings]
    return sorted(set(rows)) if distinct else sorted(rows)


@pytest.fixture(scope="module")
def triples_df(spark):
    df = spark.createDataFrame(TRIPLES, ["subj", "pred", "obj"]).withColumn(
        "n_evidence", F.length("subj").cast("long")
    )
    return df.cache()


def got(df):
    return sorted(tuple(r) for r in df.collect())


class TestBgp:
    def test_single_pattern_bound_pred(self, triples_df):
        pats = [("?x", "in_nation", "?n")]
        assert got(bgp_query(triples_df, pats)) == brute(TRIPLES, pats)

    def test_chain_join(self, triples_df):
        pats = [("?c", "in_nation", "?n"), ("?n", "in_region", "?r")]
        assert got(bgp_query(triples_df, pats)) == brute(TRIPLES, pats)

    def test_chain_with_literal_end(self, triples_df):
        pats = [("?c", "in_nation", "?n"), ("?n", "in_region", "r1")]
        assert got(bgp_query(triples_df, pats)) == brute(TRIPLES, pats)

    def test_triangle_cycle(self, triples_df):
        pats = [
            ("?a", "knows", "?b"),
            ("?b", "knows", "?c"),
            ("?c", "knows", "?a"),
        ]
        assert got(bgp_query(triples_df, pats)) == brute(TRIPLES, pats)

    def test_repeated_var_within_pattern(self, triples_df):
        pats = [("?x", "likes", "?x")]
        assert got(bgp_query(triples_df, pats)) == brute(TRIPLES, pats)

    def test_filter_expr(self, triples_df):
        pats = [("?c", "in_nation", "?n")]
        assert got(bgp_query(triples_df, pats, filters=["c LIKE 'c%'"])) == (
            brute(TRIPLES, pats, filters=[lambda b: b["c"].startswith("c")])
        )

    def test_select_and_distinct(self, triples_df):
        pats = [("?c", "in_nation", "?n"), ("?n", "in_region", "?r")]
        assert got(
            bgp_query(triples_df, pats, select=["r"], distinct=True)
        ) == brute(TRIPLES, pats, select=["r"], distinct=True)

    def test_optional_matched_and_unmatched(self, triples_df):
        # every nation has a region, but only some c's know someone
        pats = [("?c", "in_nation", "?n")]
        opt = [[("?c", "knows", "?f")]]
        assert got(bgp_query(triples_df, pats, optional_patterns=opt)) == (
            brute(TRIPLES, pats, optional=opt)
        )

    def test_post_filter_negation_by_failure(self, triples_df):
        # SPARQL FILTER(!bound(?f)): entities that know NOBODY —
        # post_filters see optional vars as NULL when unbound.
        pats = [("?c", "in_nation", "?n")]
        opt = [[("?c", "knows", "?f")]]
        expect = [
            row
            for row in brute(TRIPLES, pats, optional=opt)
            if row[1] is None  # columns sorted: (c, f, n)
        ]
        assert got(
            bgp_query(
                triples_df, pats, optional_patterns=opt,
                post_filters=["f IS NULL"],
            )
        ) == expect
        # bound side: same as filtering the returned DataFrame
        base = bgp_query(triples_df, pats, optional_patterns=opt)
        assert got(
            bgp_query(
                triples_df, pats, optional_patterns=opt,
                post_filters=["f IS NOT NULL"],
            )
        ) == got(base.filter("f IS NOT NULL"))

    def test_filter_on_optional_var_is_analysis_error(self, triples_df):
        # pre-OPTIONAL `filters` cannot name optional-only variables —
        # pinned contract (see bgp_query docstring).
        from pyspark.errors import AnalysisException

        pats = [("?c", "in_nation", "?n")]
        opt = [[("?c", "knows", "?f")]]
        with pytest.raises(AnalysisException):
            bgp_query(
                triples_df, pats, optional_patterns=opt,
                filters=["f IS NULL"],
            ).collect()

    def test_exists_semi_keeps_without_multiplying(self, triples_df):
        # FILTER EXISTS: c1 knows TWO people but must appear once per
        # base binding (semi join, not inner join).
        pats = [("?c", "in_nation", "?n")]
        base = brute(TRIPLES, pats)  # (c, n)
        knowers = {s for (s, p, o) in TRIPLES if p == "knows"}
        expect = sorted(row for row in base if row[0] in knowers)
        assert got(
            bgp_query(
                triples_df, pats,
                exists_patterns=[[("?c", "knows", "?f")]],
            )
        ) == expect

    def test_not_exists_anti_complement(self, triples_df):
        pats = [("?c", "in_nation", "?n")]
        base = brute(TRIPLES, pats)
        knowers = {s for (s, p, o) in TRIPLES if p == "knows"}
        expect = sorted(row for row in base if row[0] not in knowers)
        assert got(
            bgp_query(
                triples_df, pats,
                not_exists_patterns=[[("?c", "knows", "?f")]],
            )
        ) == expect
        # correlation through the OBJECT var: nations NOT in region r1
        expect2 = sorted(
            row for row in base
            if (row[1], "in_region", "r1") not in TRIPLES
        )
        assert got(
            bgp_query(
                triples_df, pats,
                not_exists_patterns=[[("?n", "in_region", "r1")]],
            )
        ) == expect2

    def test_existence_group_vars_stay_quantified(self, triples_df):
        # the group's non-shared vars (?f) are never projected
        q = bgp_query(
            triples_df, [("?c", "in_nation", "?n")],
            exists_patterns=[[("?c", "knows", "?f")]],
        )
        assert q.columns == ["c", "n"]

    def test_disjoint_existence_group_raises(self, triples_df):
        with pytest.raises(ValueError, match="shares no variable"):
            bgp_query(
                triples_df, [("?c", "in_nation", "?n")],
                not_exists_patterns=[[("?x", "part_of", "?y")]],
            )

    def test_existence_plans_semi_anti_joins(self, triples_df):
        q = bgp_query(
            triples_df, [("?c", "in_nation", "?n")],
            exists_patterns=[[("?c", "knows", "?f")]],
            not_exists_patterns=[[("?n", "in_region", "r1")]],
        )
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "LeftSemi" in plan and "LeftAnti" in plan

    def test_bind_derived_column(self, triples_df):
        # SPARQL BIND: derived expression column, visible to select
        pats = [("?c", "in_nation", "?n")]
        rows = brute(TRIPLES, pats)  # (c, n)
        assert got(
            bgp_query(
                triples_df, pats,
                bind={"pair": "concat(c, '/', n)"}, select=["pair"],
            )
        ) == sorted((f"{c}/{n}",) for c, n in rows)
        # sees post-filtered OPTIONAL bindings (NULL-aware expr)
        opt = [[("?c", "knows", "?f")]]
        q = bgp_query(
            triples_df, pats, optional_patterns=opt,
            bind={"social": "f IS NOT NULL"}, select=["c", "social"],
        )
        expect = sorted(
            (row[0], row[1] is not None)
            for row in brute(TRIPLES, pats, optional=opt)  # (c, f, n)
        )
        assert got(q) == expect

    def test_bind_shadow_raises(self, triples_df):
        with pytest.raises(ValueError, match="shadows"):
            bgp_query(
                triples_df, [("?c", "in_nation", "?n")],
                bind={"n": "upper(c)"},
            )

    def test_existence_gate_true_false(self, triples_df):
        pats = [("?c", "in_nation", "?n")]
        with_true = bgp_query(triples_df, pats + [("r1", "part_of", "w")])
        with_false = bgp_query(triples_df, pats + [("r1", "part_of", "mars")])
        assert got(with_true) == brute(TRIPLES, pats)
        assert with_false.count() == 0

    def test_disconnected_raises(self, triples_df):
        pats = [("?a", "knows", "?b"), ("?x", "part_of", "?y")]
        with pytest.raises(ValueError, match="disconnected"):
            bgp_query(triples_df, pats)
        prod = bgp_query(triples_df, pats, allow_cartesian=True)
        assert got(prod) == brute(TRIPLES, pats)

    def test_unknown_select_raises(self, triples_df):
        with pytest.raises(ValueError, match="unknown"):
            bgp_query(triples_df, [("?a", "knows", "?b")], select=["z"])

    def test_join_order_seeds_most_bound(self, triples_df):
        # (c1, knows, ?b) is doubly bound -> seeds the chain; result
        # equality is what matters, the heuristic is deterministic.
        pats = [
            ("?b", "in_nation", "?n"),
            ("c1", "knows", "?b"),
            ("?n", "in_region", "?r"),
        ]
        assert got(bgp_query(triples_df, pats)) == brute(TRIPLES, pats)

    def test_bound_filters_reach_parquet_scan(self, spark, triples_df,
                                              tmp_path):
        path = str(tmp_path / "triples_pq")
        triples_df.write.mode("overwrite").parquet(path)
        pq = spark.read.parquet(path)
        q = bgp_query(
            pq, [("c1", "in_nation", "?n"), ("?n", "in_region", "?r")]
        )
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan
        assert "in_nation" in plan  # bound pred reached the scan


class TestAggregate:
    def test_group_count_vs_brute(self, triples_df):
        from collections import Counter

        from antnre_spark.kgquery import bgp_aggregate

        pats = [("?c", "in_nation", "?n"), ("?n", "in_region", "?r")]
        counts = Counter(row[1] for row in brute(TRIPLES, pats))  # (c,n,r)
        assert got(
            bgp_aggregate(
                triples_df, pats, group_by=["n"],
                aggs={"members": "count(*)"},
            )
        ) == sorted(counts.items())

    def test_global_group_distinct_and_having(self, triples_df):
        from antnre_spark.kgquery import bgp_aggregate

        pats = [("?c", "in_nation", "?n")]
        # one global group: [] group_by
        rows = brute(TRIPLES, pats)  # (c, n)
        assert got(
            bgp_aggregate(
                triples_df, pats, group_by=[],
                aggs={"nations": "count(DISTINCT n)", "total": "count(*)"},
            )
        ) == [(len({r[1] for r in rows}), len(rows))]
        # having keeps only the hub nation (n1: 3 members)
        assert got(
            bgp_aggregate(
                triples_df, pats, group_by=["n"],
                aggs={"members": "count(*)"}, having=["members >= 3"],
            )
        ) == [("n1", 3)]

    def test_agg_sees_post_filtered_optional(self, triples_df):
        from antnre_spark.kgquery import bgp_aggregate

        pats = [("?c", "in_nation", "?n")]
        opt = [[("?c", "knows", "?f")]]
        friendless = {
            row[0]
            for row in brute(TRIPLES, pats, optional=opt)
            if row[1] is None  # (c, f, n)
        }
        assert got(
            bgp_aggregate(
                triples_df, pats, group_by=[],
                aggs={"friendless": "count(DISTINCT c)"},
                optional_patterns=opt, post_filters=["f IS NULL"],
            )
        ) == [(len(friendless),)]

    def test_validation_raises(self, triples_df):
        from antnre_spark.kgquery import bgp_aggregate

        pats = [("?c", "in_nation", "?n")]
        with pytest.raises(ValueError, match="unknown"):
            bgp_aggregate(
                triples_df, pats, group_by=["z"], aggs={"m": "count(*)"}
            )
        with pytest.raises(ValueError, match="at least one"):
            bgp_aggregate(triples_df, pats, group_by=["n"], aggs={})
        with pytest.raises(ValueError, match="collide"):
            bgp_aggregate(
                triples_df, pats, group_by=["n"], aggs={"n": "count(*)"}
            )

    def test_partial_aggregate_in_plan(self, triples_df):
        # the scale contract: a partial (map-side) hash aggregate must
        # sit below the exchange so per-group state, not bindings,
        # crosses the shuffle.
        from antnre_spark.kgquery import bgp_aggregate

        q = bgp_aggregate(
            triples_df, [("?c", "in_nation", "?n")], group_by=["n"],
            aggs={"members": "count(*)"},
        )
        plan = q._jdf.queryExecution().executedPlan().toString()
        import re

        assert len(re.findall(r"HashAggregate", plan)) >= 2  # partial+final


def brute_pairs(triples, pred, lo, hi):
    """Reference bounded-path endpoint pairs (set semantics)."""

    def edges_for(p):
        if isinstance(p, str) and p.startswith("^"):
            return [(o, s) for (s, pp, o) in triples if pp == p[1:]]
        if isinstance(p, str):
            return [(s, o) for (s, pp, o) in triples if pp == p]
        out = []
        for q in p:
            out += edges_for(q)
        return out

    e = set(edges_for(pred))
    result = set()
    cur = set(e)
    if lo <= 1:
        result |= cur
    for k in range(2, hi + 1):
        cur = {(a, c) for (a, b) in cur for (b2, c) in e if b2 == b}
        if k >= lo:
            result |= cur
    return sorted(result)


class TestPaths:
    def test_path_pairs_one_to_two_hops(self, triples_df):
        from antnre_spark.kgquery import path_pairs

        got_pairs = sorted(
            tuple(r) for r in path_pairs(triples_df, "knows", 1, 2).collect()
        )
        assert got_pairs == brute_pairs(TRIPLES, "knows", 1, 2)

    def test_path_pattern_exact_two(self, triples_df):
        from antnre_spark.kgquery import Path

        q = bgp_query(triples_df, [("?a", Path("knows", 2, 2), "?c")])
        assert got(q) == brute_pairs(TRIPLES, "knows", 2, 2)

    def test_path_cycle_endpoints(self, triples_df):
        from antnre_spark.kgquery import Path

        # 3-hop knows cycle: exactly the triangle members return to self
        q = bgp_query(triples_df, [("?x", Path("knows", 3, 3), "?x")])
        expect = sorted(
            (a,) for (a, b) in brute_pairs(TRIPLES, "knows", 3, 3) if a == b
        )
        assert got(q) == expect

    def test_path_composes_with_plain_pattern(self, triples_df):
        from antnre_spark.kgquery import Path

        q = bgp_query(
            triples_df,
            [("?a", Path("knows", 1, 2), "?c"), ("?c", "in_nation", "?n")],
        )
        pairs = brute_pairs(TRIPLES, "knows", 1, 2)
        expect = sorted(
            (a, c, n)
            for (a, c) in pairs
            for (c2, p, n) in TRIPLES
            if c2 == c and p == "in_nation"
        )
        assert got(q) == expect

    def test_inverse_predicate(self, triples_df):
        q = bgp_query(triples_df, [("?n", "^in_nation", "?c")])
        # default select is sorted var names -> (c, n)
        expect = sorted(
            (s, o) for (s, p, o) in TRIPLES if p == "in_nation"
        )
        assert got(q) == expect

    def test_alternation_bag_semantics(self, triples_df):
        q = bgp_query(triples_df, [("?a", ["knows", "likes"], "?b")])
        expect = sorted(
            (s, o) for (s, p, o) in TRIPLES if p in ("knows", "likes")
        )
        assert got(q) == expect

    def test_fully_bound_path_gate(self, triples_df):
        from antnre_spark.kgquery import Path

        base = [("?r", "part_of", "w")]
        yes = bgp_query(triples_df, base + [("c1", Path("knows", 1, 3), "c3")])
        no = bgp_query(triples_df, base + [("c1", Path("knows", 1, 1), "c3")])
        assert yes.count() == 2 and no.count() == 0

    def test_path_inside_optional_and_exists_groups(self, triples_df):
        from antnre_spark.kgquery import Path

        # Path predicates compile through _scan, so they work inside
        # ANY group — pin OPTIONAL and EXISTS explicitly.
        pats = [("?c", "in_nation", "?n")]
        # 2-hop in_nation;in_region reachability as OPTIONAL — wrong
        # pred name, so every binding gets NULL
        q = bgp_query(
            triples_df, pats,
            optional_patterns=[[("?c", Path("nope", 1, 2), "?r")]],
        )
        assert all(r["r"] is None for r in q.collect())
        # EXISTS a 2-hop knows path: c1,c2,c3 (cycle) and c1->c4->c4?
        # (c4 likes only itself) — exactly the cycle members + anyone
        # reaching 2 hops
        two_hop = {
            a for a, _ in (
                (a, c)
                for (a, b) in [
                    (s, o) for (s, p, o) in TRIPLES if p == "knows"
                ]
                for (b2, c) in [
                    (s, o) for (s, p, o) in TRIPLES if p == "knows"
                ]
                if b == b2
            )
        }
        got_e = got(
            bgp_query(
                triples_df, pats,
                exists_patterns=[[("?c", Path("knows", 2, 2), "?f")]],
            )
        )
        expect = sorted(
            row for row in brute(TRIPLES, pats) if row[0] in two_hop
        )
        assert got_e == expect

    def test_hop_bounds_validated(self, triples_df):
        from antnre_spark.kgquery import Path, path_pairs

        with pytest.raises(ValueError, match="hops"):
            path_pairs(triples_df, "knows", 0, 2)
        with pytest.raises(ValueError, match="hops"):
            bgp_query(triples_df, [("?a", Path("knows", 1, 99), "?b")])


class TestConstruct:
    def test_collapse_chain_to_direct_edge(self, triples_df):
        from antnre_spark.kgquery import construct

        out = construct(
            triples_df,
            patterns=[("?c", "in_nation", "?n"), ("?n", "in_region", "?r")],
            template=[("?c", "in_region2", "?r")],
        )
        expect = sorted(
            {
                (c, "in_region2", r)
                for (c, _, n) in [t for t in TRIPLES if t[1] == "in_nation"]
                for (n2, _, r) in [t for t in TRIPLES if t[1] == "in_region"]
                if n2 == n
            }
        )
        assert got(out) == expect
        assert out.columns == ["subj", "pred", "obj"]

    def test_multi_template_and_literal_terms(self, triples_df):
        from antnre_spark.kgquery import construct

        out = construct(
            triples_df,
            patterns=[("?c", "in_nation", "n1")],
            template=[("?c", "kind", "resident"), ("n1", "has", "?c")],
        )
        members = sorted(
            {s for (s, p, o) in TRIPLES if p == "in_nation" and o == "n1"}
        )
        expect = sorted(
            [(m, "kind", "resident") for m in members]
            + [("n1", "has", m) for m in members]
        )
        assert got(out) == expect

    def test_unbound_optional_rows_dropped(self, triples_df):
        from antnre_spark.kgquery import construct

        # ?f unbound for customers who know no one -> those template
        # rows are dropped (SPARQL CONSTRUCT semantics), but c4 (knows
        # via c1) etc. survive
        out = construct(
            triples_df,
            patterns=[("?c", "in_nation", "?n")],
            optional_patterns=[[("?c", "knows", "?f")]],
            template=[("?c", "friend", "?f")],
        )
        expect = sorted(
            {
                (s, "friend", o)
                for (s, p, o) in TRIPLES
                if p == "knows"
                and any(
                    t[0] == s and t[1] == "in_nation" for t in TRIPLES
                )
            }
        )
        assert got(out) == expect

    def test_composes_with_bgp_query(self, triples_df):
        from antnre_spark.kgquery import bgp_query, construct

        derived = construct(
            triples_df,
            patterns=[("?c", "in_nation", "?n"), ("?n", "in_region", "?r")],
            template=[("?c", "in_region2", "?r")],
        )
        back = bgp_query(derived, [("?c", "in_region2", "r1")])
        expect = sorted(
            (c,)
            for (c, _, n) in [t for t in TRIPLES if t[1] == "in_nation"]
            if (n, "in_region", "r1") in TRIPLES
        )
        assert got(back) == expect

    def test_empty_template_raises(self, triples_df):
        from antnre_spark.kgquery import construct

        with pytest.raises(ValueError, match="template"):
            construct(triples_df, [("?a", "knows", "?b")], [])


def brute_closure(triples, pred, min_hops):
    """Transitive-closure oracle: Warshall over the pred's edge set;
    min_hops=0 adds (v, v) for every incident vertex."""
    edges = {(s, o) for (s, p, o) in triples if p == pred}
    verts = sorted({v for e in edges for v in e})
    reach = {v: {o for (s, o) in edges if s == v} for v in verts}
    changed = True
    while changed:
        changed = False
        for v in verts:
            ext = set().union(*(reach.get(m, set()) for m in reach[v])) \
                if reach[v] else set()
            if not ext <= reach[v]:
                reach[v] |= ext
                changed = True
    pairs = {(v, o) for v in verts for o in reach[v]}
    if min_hops == 0:
        pairs |= {(v, v) for v in verts}
    return sorted(pairs)


class TestClosure:
    """Unbounded property-path closure (Path(p, m, None) →
    closure_pairs): doubling fixpoint (both endpoints variable) and
    seeded BFS fixpoint (a bound endpoint), vs a Warshall oracle —
    including TERMINATION on the knows-cycle c1→c2→c3→c1."""

    def test_plus_full_closure_on_cycle_terminates(self, triples_df):
        from antnre_spark.kgquery import Path

        out = bgp_query(triples_df, [("?a", Path("knows", 1, None), "?b")])
        assert got(out) == brute_closure(TRIPLES, "knows", 1)
        # the cycle members reach themselves via the loop (p+ semantics)
        assert ("c1", "c1") in set(got(out))

    def test_star_full_closure_reflexive(self, triples_df):
        from antnre_spark.kgquery import Path

        out = bgp_query(triples_df, [("?a", Path("knows", 0, None), "?b")])
        assert got(out) == brute_closure(TRIPLES, "knows", 0)
        # c4 has only an INCOMING knows edge: reflexive row still there
        assert ("c4", "c4") in set(got(out))

    def test_plus_seeded_from_bound_subject(self, triples_df):
        from antnre_spark.kgquery import Path

        out = bgp_query(triples_df, [("c2", Path("knows", 1, None), "?b")])
        expect = sorted(
            (b,) for (a, b) in brute_closure(TRIPLES, "knows", 1)
            if a == "c2"
        )
        assert got(out) == expect

    def test_star_seeded_from_bound_object(self, triples_df):
        from antnre_spark.kgquery import Path

        out = bgp_query(triples_df, [("?a", Path("knows", 0, None), "c4")])
        expect = sorted(
            (a,) for (a, b) in brute_closure(TRIPLES, "knows", 0)
            if b == "c4"
        )
        assert got(out) == expect

    def test_closure_composes_with_chain(self, triples_df):
        from antnre_spark.kgquery import Path

        # everything under r1 via in_nation/in_region closure:
        # alternation + unbounded plus, then join a plain pattern
        out = bgp_query(
            triples_df,
            [
                ("?x", Path(["in_nation", "in_region"], 1, None), "?r"),
                ("?r", "part_of", "w"),
            ],
        )
        alt = [
            (s, "up", o)
            for (s, p, o) in TRIPLES
            if p in ("in_nation", "in_region")
        ]
        # default projection is sorted variable names: (r, x)
        expect = sorted(
            (b, a)
            for (a, b) in brute_closure(alt, "up", 1)
            if (b, "part_of", "w") in TRIPLES
        )
        assert got(out) == expect

    def test_unbounded_min_validated(self, triples_df):
        from antnre_spark.kgquery import Path, closure_pairs

        with pytest.raises(ValueError, match="min_hops"):
            Path("knows", 2, None)
        with pytest.raises(ValueError, match="min_hops"):
            closure_pairs(triples_df, "knows", 2)


class TestUnion:
    """SPARQL UNION of binding groups: bag union, NULL-padded disjoint
    variables, joined with required patterns per the algebra identity
    A . {B UNION C} == (A.B) UNION (A.C)."""

    def test_union_of_two_groups_vs_brute(self, triples_df):
        out = bgp_query(
            triples_df,
            [],
            union_patterns=[
                [("?m", "in_nation", "?n")],
                [("?m", "knows", "?f")],
            ],
        )
        # shared var m, disjoint n/f — NULL where the branch lacks it
        expect = sorted(
            [(f, m, None) for (m, p, f) in TRIPLES if p == "knows"]
            + [(None, m, n) for (m, p, n) in TRIPLES if p == "in_nation"],
            key=lambda t: tuple((x is None, x) for x in t))
        rows = sorted(
            [(r["f"], r["m"], r["n"]) for r in out.collect()],
            key=lambda t: tuple((x is None, x) for x in t))
        assert rows == expect

    def test_union_joined_with_required(self, triples_df):
        # A . {B UNION C}: nation members via in_nation, each with
        # either a region (branch 1) or a friend (branch 2)
        out = bgp_query(
            triples_df,
            [("?m", "in_nation", "?n")],
            union_patterns=[
                [("?n", "in_region", "?r")],
                [("?m", "knows", "?r")],
            ],
        )
        b1 = brute(
            TRIPLES, [("?m", "in_nation", "?n"), ("?n", "in_region", "?r")]
        )
        b2 = brute(
            TRIPLES, [("?m", "in_nation", "?n"), ("?m", "knows", "?r")]
        )
        assert got(out) == sorted(b1 + b2)

    def test_union_distinct_dedupes_across_groups(self, triples_df):
        # identical groups: bag union doubles, distinct collapses
        g = [("?m", "in_nation", "?n")]
        bag = bgp_query(triples_df, [], union_patterns=[g, g])
        assert bag.count() == 2 * len(
            [t for t in TRIPLES if t[1] == "in_nation"]
        )
        st = bgp_query(triples_df, [], union_patterns=[g, g], distinct=True)
        assert got(st) == brute(TRIPLES, g, distinct=True)

    def test_union_then_optional_and_filter(self, triples_df):
        # filters apply AFTER the union; optional after that
        out = bgp_query(
            triples_df,
            [],
            union_patterns=[
                [("?m", "in_nation", "n1")],
                [("?m", "likes", "?m")],
            ],
            filters=["m LIKE 'c%'"],
            optional_patterns=[[("?m", "knows", "?f")]],
        )
        members = [s for (s, p, o) in TRIPLES
                   if (p == "in_nation" and o == "n1") or
                      (p == "likes" and s == o)]
        members = [m for m in members if m.startswith("c")]
        expect = []
        for m in members:
            friends = [o for (s, p, o) in TRIPLES
                       if p == "knows" and s == m]
            if friends:
                expect.extend((f, m) for f in friends)
            else:
                expect.append((None, m))
        key = lambda t: tuple((x is None, x) for x in t)  # noqa: E731
        rows = [tuple(r) for r in out.collect()]
        assert sorted(rows, key=key) == sorted(expect, key=key)

    def test_empty_patterns_without_union_raises(self, triples_df):
        with pytest.raises(ValueError, match="empty pattern"):
            bgp_query(triples_df, [])

    def test_disjoint_union_group_raises(self, triples_df):
        with pytest.raises(ValueError, match="union group"):
            bgp_query(
                triples_df,
                [("?m", "in_nation", "?n")],
                union_patterns=[[("?x", "part_of", "?y")]],
            )


class TestStatsOrder:
    """Stats-hinted join order: per-predicate counts rank two
    one-bound patterns by actual cardinality (the syntactic heuristic
    ranks them equal)."""

    def test_predicate_stats_counts(self, triples_df):
        from antnre_spark.kgquery import predicate_stats

        st = predicate_stats(triples_df)
        assert st["in_nation"] == 6 and st["likes"] == 1

    def test_small_predicate_seeds_chain(self, triples_df):
        from antnre_spark.kgquery import _order, predicate_stats

        st = predicate_stats(triples_df)
        # both one-bound (pred only): syntactic order keeps list order,
        # stats order seeds with the 1-row likes scan
        pats = [("?a", "in_nation", "?n"), ("?a", "likes", "?b")]
        assert _order(pats, False) == [0, 1]
        assert _order(pats, False, st) == [1, 0]

    def test_bound_term_divides_estimate(self, triples_df):
        from antnre_spark.kgquery import _est_cost, predicate_stats

        st = predicate_stats(triples_df)
        loose = _est_cost(("?a", "in_nation", "?n"), st)
        tight = _est_cost(("?a", "in_nation", "n1"), st)
        assert tight < loose
        # absent predicate = empty scan = maximally selective
        assert _est_cost(("?a", "nope", "?b"), st) == 0.0

    def test_stats_results_identical(self, triples_df):
        from antnre_spark.kgquery import predicate_stats

        st = predicate_stats(triples_df)
        pats = [("?c", "in_nation", "?n"), ("?n", "in_region", "?r")]
        assert got(bgp_query(triples_df, pats, stats=st)) == \
            brute(TRIPLES, pats)


class TestSeqNegPaths:
    """Sequence paths (p1/p2) and negated property sets !(p1|...)."""

    def test_seq_matches_two_plain_patterns(self, triples_df):
        from antnre_spark.kgquery import Seq

        out = bgp_query(
            triples_df, [("?c", Seq("in_nation", "in_region"), "?r")]
        )
        twin = brute(
            TRIPLES,
            [("?c", "in_nation", "?m"), ("?m", "in_region", "?r")],
            select=["c", "r"],
        )
        assert got(out) == sorted(set(twin)) or got(out) == twin

    def test_seq_with_inverse_step_and_alternation(self, triples_df):
        from antnre_spark.kgquery import Seq

        # colleagues: same nation via in_nation then its inverse
        out = bgp_query(
            triples_df, [("?a", Seq("in_nation", "^in_nation"), "?b")]
        )
        expect = sorted(
            (a, b)
            for (a, pa, na) in TRIPLES
            if pa == "in_nation"
            for (b, pb, nb) in TRIPLES
            if pb == "in_nation" and nb == na
        )
        assert got(out) == expect

    def test_seq_inside_unbounded_closure_bound_object(self, triples_df):
        from antnre_spark.kgquery import Path, Seq

        # closure over the 2-step hierarchy seeded from the WORLD node:
        # Seq inversion (reversed inverted steps) drives the seeded BFS
        out = bgp_query(
            triples_df,
            [("?x", Path(Seq("in_region", "part_of"), 1, None), "w")],
        )
        seq_edges = [
            (a, "s2", w)
            for (a, p1, m) in TRIPLES
            if p1 == "in_region"
            for (m2, p2, w) in TRIPLES
            if p2 == "part_of" and m2 == m
        ]
        expect = sorted(
            (a,) for (a, b) in brute_closure(seq_edges, "s2", 1) if b == "w"
        )
        assert got(out) == expect

    def test_neg_property_set(self, triples_df):
        from antnre_spark.kgquery import Neg

        out = bgp_query(
            triples_df,
            [("?a", Neg("knows", "likes", "in_nation"), "?b")],
        )
        expect = sorted(
            (a, b)
            for (a, p, b) in TRIPLES
            if p not in ("knows", "likes", "in_nation")
        )
        assert got(out) == expect

    def test_validation(self, triples_df):
        from antnre_spark.kgquery import Neg, Seq

        with pytest.raises(ValueError, match="Seq"):
            Seq("only_one")
        with pytest.raises(ValueError, match="Neg"):
            Neg()


class TestValuesMinus:
    """SPARQL VALUES (inline binding rows) and MINUS."""

    def test_values_restricts_required(self, triples_df):
        out = bgp_query(
            triples_df,
            [("?m", "in_nation", "?n")],
            values=[{"m": "c1"}, {"m": "c3"}, {"m": "nobody"}],
        )
        expect = sorted(
            (m, n)
            for (m, p, n) in TRIPLES
            if p == "in_nation" and m in ("c1", "c3")
        )
        assert got(out) == expect

    def test_values_seeds_without_patterns(self, triples_df):
        out = bgp_query(
            triples_df,
            [],
            values=[{"m": "c1", "tag": "x"}, {"m": "c2", "tag": "y"}],
            optional_patterns=[[("?m", "knows", "?f")]],
            select=["m", "tag", "f"],
        )
        rows = sorted(tuple(r) for r in out.collect())
        expect = sorted(
            [("c1", "x", f) for (s, p, f) in TRIPLES
             if p == "knows" and s == "c1"]
            + [("c2", "y", f) for (s, p, f) in TRIPLES
               if p == "knows" and s == "c2"]
        )
        assert rows == expect

    def test_values_multi_var_rows_bind_jointly(self, triples_df):
        # two-column VALUES: only the exact (m, n) combinations pass
        out = bgp_query(
            triples_df,
            [("?m", "in_nation", "?n")],
            values=[{"m": "c1", "n": "n1"}, {"m": "c3", "n": "n1"}],
        )
        assert got(out) == [("c1", "n1")]  # (c3, n1) is not a fact

    def test_minus_removes_on_shared_vars(self, triples_df):
        out = bgp_query(
            triples_df,
            [("?m", "in_nation", "?n")],
            minus_patterns=[[("?m", "knows", "?x")]],
        )
        knowers = {s for (s, p, o) in TRIPLES if p == "knows"}
        expect = sorted(
            (m, n)
            for (m, p, n) in TRIPLES
            if p == "in_nation" and m not in knowers
        )
        assert got(out) == expect

    def test_minus_disjoint_domain_is_noop_unlike_not_exists(
        self, triples_df
    ):
        # the spec's reason both verbs exist: MINUS over a group sharing
        # NO variable removes nothing; NOT EXISTS would empty the result
        base = bgp_query(triples_df, [("?m", "in_nation", "?n")])
        minus = bgp_query(
            triples_df,
            [("?m", "in_nation", "?n")],
            minus_patterns=[[("?x", "part_of", "?y")]],
        )
        assert got(minus) == got(base)

    def test_values_validation(self, triples_df):
        with pytest.raises(ValueError, match="VALUES"):
            bgp_query(
                triples_df,
                [("?m", "in_nation", "?n")],
                values=[{"z": "v"}],
            )
        with pytest.raises(ValueError, match="empty VALUES"):
            bgp_query(triples_df, [], values=[{}])


class TestDescribe:
    def test_depth1_neighborhood(self, triples_df):
        from antnre_spark.kgquery import describe

        out = describe(triples_df, "n1")
        expect = sorted(
            (s, p, o, len(s))
            for (s, p, o) in TRIPLES
            if s == "n1" or o == "n1"
        )
        rows = sorted(
            (r["subj"], r["pred"], r["obj"], r["n_evidence"])
            for r in out.collect()
        )
        assert rows == expect

    def test_multiple_resources_and_validation(self, triples_df):
        from antnre_spark.kgquery import describe

        out = describe(triples_df, ["c4", "r2"])
        expect = {
            (s, p, o) for (s, p, o) in TRIPLES
            if s in ("c4", "r2") or o in ("c4", "r2")
        }
        assert {(r["subj"], r["pred"], r["obj"])
                for r in out.collect()} == expect
        with pytest.raises(ValueError, match="DESCRIBE"):
            describe(triples_df, [])


class TestRandomizedBgp:
    """Property test: RANDOM 1-3-pattern BGPs (variables in any
    position including the predicate, repeated variables, fully-bound
    gates mixed in) must match the brute-force binding enumerator with
    bag multiplicity. Derandomized (fixed example sequence) so a
    failure reproduces; each example is one tiny Spark job."""

    def test_random_bgps_match_brute(self, triples_df):
        from hypothesis import HealthCheck, assume, given, settings
        from hypothesis import strategies as st

        ents = sorted({t[0] for t in TRIPLES} | {t[2] for t in TRIPLES})
        preds = sorted({t[1] for t in TRIPLES})
        term = st.sampled_from(ents + ["?x", "?y", "?z"])
        pred_term = st.sampled_from(preds + ["?p", "?x"])
        pattern = st.tuples(term, pred_term, term)

        @settings(
            max_examples=25,
            deadline=None,
            derandomize=True,
            suppress_health_check=[
                HealthCheck.function_scoped_fixture,
                HealthCheck.too_slow,
            ],
        )
        @given(st.lists(pattern, min_size=1, max_size=3))
        def check(pats):
            pats = [tuple(p) for p in pats]
            # at least one variable somewhere: an all-gates query yields
            # a zero-column relation (shape not comparable to brute)
            assume(any(t.startswith("?") for p in pats for t in p))
            try:
                out = bgp_query(triples_df, pats)
            except ValueError:
                assume(False)  # disconnected BGP — rejected by design
            assert got(out) == brute(TRIPLES, pats)

        check()


class TestManifestStats:
    def test_manifest_counts_equal_scan_counts(self, spark, tmp_path):
        """r7: per-predicate stats from the IceLite manifest of a
        pred-partitioned table must equal the one-pass scan's counts —
        and cost zero Spark jobs (pure metadata read)."""
        from antnre_spark.icelite import IceLite
        from antnre_spark.kgquery import (
            predicate_stats,
            predicate_stats_from_manifest,
        )

        df = spark.createDataFrame(TRIPLES, ["subj", "pred", "obj"])
        tab = IceLite(str(tmp_path / "triples"))
        tab.overwrite_partitions(df, ["pred"])
        from_manifest = predicate_stats_from_manifest(tab)
        assert from_manifest == predicate_stats(tab.load(spark))

    def test_unpartitioned_table_returns_none(self, spark, tmp_path):
        from antnre_spark.icelite import IceLite
        from antnre_spark.kgquery import predicate_stats_from_manifest

        df = spark.createDataFrame(TRIPLES, ["subj", "pred", "obj"])
        tab = IceLite(str(tmp_path / "flat"))
        tab.overwrite(df)
        assert predicate_stats_from_manifest(tab) is None
        empty = IceLite(str(tmp_path / "nothing"))
        assert predicate_stats_from_manifest(empty) is None


class TestClosureCapBoundary:
    def test_fixpoint_at_exact_cap_does_not_raise(
        self, spark, monkeypatch
    ):
        """r7 review: the seeded BFS checks emptiness on the delta JUST
        computed, so a closure whose last new pair lands in the final
        allowed round completes instead of raising spuriously."""
        import antnre_spark.kgquery as kq

        chain = [(f"v{i}", "next", f"v{i+1}") for i in range(5)]
        t = spark.createDataFrame(chain, ["subj", "pred", "obj"])
        seed = spark.createDataFrame([("v0",)], "a string")
        # 5 pairs from v0; rounds: d2, d3, d4, d5, empty-confirm = 5
        monkeypatch.setattr(kq, "MAX_CLOSURE_BFS_ROUNDS", 5)
        out = kq.closure_pairs(t, "next", 1, sources=seed)
        assert out.count() == 5
        # one round fewer genuinely cannot confirm the fixpoint
        monkeypatch.setattr(kq, "MAX_CLOSURE_BFS_ROUNDS", 3)
        with pytest.raises(RuntimeError, match="no fixpoint"):
            kq.closure_pairs(t, "next", 1, sources=seed).count()
