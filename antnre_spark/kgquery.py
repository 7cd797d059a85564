"""Basic-graph-pattern (BGP) queries over the materialized KG.

The pipeline's output is a triples table (``materialize.build_triples``
schema: subj, pred, obj, conf, n_evidence, provenance). The natural
read-side capability of a KG store is conjunctive pattern matching —
"find all (?c, ?n, ?r) with (?c, in_nation, ?n) AND (?n, in_region,
?r)" — i.e. the SPARQL basic-graph-pattern fragment [pub: SPARQL 1.1,
W3C]. This module compiles a BGP into a DataFrame join tree and lets
Catalyst/AQE pick the physical plan.

Compilation model (one pattern = one filtered scan of the triples
relation, one shared variable = one equi-join key):

* Each triple pattern ``(s, p, o)`` — strings, ``?name`` marks a
  variable — becomes a scan of the triples DataFrame with every BOUND
  position pushed down as an equality filter and every variable
  position projected out under its variable name. Bound-position
  filters are sargable predicates on the scan, so with the triples
  table partitioned by ``pred`` (how ``jobs/link_materialize.py``
  writes it) a bound predicate prunes partitions before any shuffle.
* A variable repeated WITHIN a pattern (e.g. ``(?x, likes, ?x)``)
  becomes an intra-scan equality filter.
* Patterns are joined on their shared variables. Join ORDER is chosen
  by a deterministic selectivity heuristic: most-bound-positions
  first (a fully/doubly bound pattern yields the smallest scan), then
  connectivity — each next pattern must share a variable with the
  accumulated bindings when possible, so the plan stays a chain of
  equi-joins and a Cartesian product only appears when the BGP itself
  is disconnected (rejected by default, see ``allow_cartesian``).
* The result is one row per binding of the selected variables.

Scale posture (10^12-triple table): every join is a hash equi-join on
variable columns; AQE turns the small side into a broadcast when a
selective pattern (bound pred + bound subj/obj) shrinks it below the
threshold, and skew-join splitting handles hub entities (the same hubs
``materialize._salted_triple_agg`` already handles on the write side).
No driver-side materialization: the compiler builds the plan, the
caller decides the action.

``optional_patterns`` adds the SPARQL OPTIONAL semantics (left outer
join of each optional group against the required bindings), and
``filters`` accepts SQL boolean expressions over the variable columns
(pushed into the plan; Catalyst pushes them further down when legal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

Pattern = tuple[str, str, str]

_POSITIONS = ("subj", "pred", "obj")


def _is_var(term: str) -> bool:
    return term.startswith("?")


def _scan(triples: DataFrame, pattern: Pattern) -> tuple[DataFrame, set]:
    """One filtered+projected scan for one triple pattern.

    Returns (DataFrame with one column per distinct variable, set of
    variable names). Bound positions become pushed-down equality
    filters; a repeated variable becomes an intra-scan equality.
    """
    if len(pattern) != 3:
        raise ValueError(f"pattern must be (s, p, o): {pattern!r}")
    df = triples
    var_to_cols: dict[str, list] = {}
    for pos, term in zip(_POSITIONS, pattern):
        if _is_var(term):
            name = term[1:]
            if not name:
                raise ValueError(f"empty variable name in {pattern!r}")
            var_to_cols.setdefault(name, []).append(pos)
        else:
            df = df.filter(F.col(pos) == F.lit(term))
    for name, cols in var_to_cols.items():
        for extra in cols[1:]:
            df = df.filter(F.col(cols[0]) == F.col(extra))
    proj = [F.col(cols[0]).alias(name) for name, cols in var_to_cols.items()]
    if not proj:
        # fully bound: an existence gate — project a constant marker.
        return df.select(F.lit(1).alias("__exists")).limit(1), set()
    return df.select(*proj), set(var_to_cols)


def _order(patterns: list[Pattern], allow_cartesian: bool) -> list[int]:
    """Deterministic join order: seed with the most-bound pattern, then
    greedily extend along shared variables, most-bound first. Raises on
    a disconnected BGP unless ``allow_cartesian``."""

    def bound_count(p: Pattern) -> int:
        return sum(0 if _is_var(t) else 1 for t in p)

    def pvars(p: Pattern) -> set:
        return {t[1:] for t in p if _is_var(t)}

    remaining = list(range(len(patterns)))
    remaining.sort(key=lambda i: (-bound_count(patterns[i]), i))
    order: list[int] = []
    seen_vars: set = set()
    while remaining:
        pick = None
        for i in remaining:
            if not order or (pvars(patterns[i]) & seen_vars):
                pick = i
                break
        if pick is None:
            if not allow_cartesian:
                raise ValueError(
                    "disconnected BGP (no shared variable with the "
                    "accumulated patterns); pass allow_cartesian=True "
                    "to accept the product"
                )
            pick = remaining[0]
        order.append(pick)
        seen_vars |= pvars(patterns[pick])
        remaining.remove(pick)
    return order


def _join_group(
    triples: DataFrame, patterns: list[Pattern], allow_cartesian: bool
) -> tuple[DataFrame, set]:
    """Join one pattern group into a bindings DataFrame.

    Fully bound patterns (no variables) are existence GATES: they can't
    participate in the connectivity order (they bind nothing), so they
    are applied last as a crossJoin with a 0-or-1-row scan — the result
    keeps or empties the bindings without changing their shape.
    """
    gates = [p for p in patterns if not any(_is_var(t) for t in p)]
    varpats = [p for p in patterns if any(_is_var(t) for t in p)]
    acc = None
    acc_vars: set = set()
    if varpats:
        order = _order(varpats, allow_cartesian)
        for i in order:
            scan, svars = _scan(triples, varpats[i])
            if acc is None:
                acc, acc_vars = scan, svars
                continue
            shared = sorted(acc_vars & svars)
            if shared:
                acc = acc.join(scan, on=shared, how="inner")
            else:  # sanctioned Cartesian product (allow_cartesian)
                acc = acc.crossJoin(scan)
            acc_vars |= svars
    for g in gates:
        gate, _ = _scan(triples, g)
        acc = gate if acc is None else acc.crossJoin(gate).drop("__exists")
    if acc is None:
        raise ValueError("empty pattern list")
    if "__exists" in acc.columns:
        acc = acc.drop("__exists")
    return acc, acc_vars


def bgp_query(
    triples: DataFrame,
    patterns: list[Pattern],
    optional_patterns: list[list[Pattern]] | None = None,
    filters: list[str] | None = None,
    select: list[str] | None = None,
    distinct: bool = False,
    allow_cartesian: bool = False,
) -> DataFrame:
    """Compile a basic graph pattern into a DataFrame of variable
    bindings.

    ``patterns``: required conjunctive patterns; ``optional_patterns``:
    groups left-joined on their shared variables (unmatched → NULL,
    SPARQL OPTIONAL); ``filters``: SQL boolean expressions over the
    variable columns, applied after the required joins (Catalyst
    pushes them down when legal); ``select``: variable names to
    project (default: all, sorted); ``distinct``: set semantics.
    """
    acc, acc_vars = _join_group(triples, patterns, allow_cartesian)
    for expr in filters or []:
        acc = acc.filter(F.expr(expr))
    for group in optional_patterns or []:
        opt, ovars = _join_group(triples, group, allow_cartesian)
        shared = sorted(acc_vars & ovars)
        if not shared:
            raise ValueError(
                f"optional group {group!r} shares no variable with the "
                "required patterns"
            )
        acc = acc.join(opt, on=shared, how="left")
        acc_vars |= ovars
    out_cols = select if select is not None else sorted(acc_vars)
    missing = [c for c in out_cols if c not in acc.columns]
    if missing:
        raise ValueError(f"select names unknown variables: {missing}")
    acc = acc.select(*out_cols)
    return acc.distinct() if distinct else acc
