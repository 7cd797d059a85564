"""H2 triple aggregation with explicit hub salting (BASELINE.json:6
"explicit salting ... hub entities"; SURVEY.md §2.H/§4.3): the salted
two-level path must be value-IDENTICAL to the plain aggregate (the salt
only spreads rows) while actually fanning a planted hub's evidence across
multiple partial-agg groups."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from antnre_spark import materialize
from antnre_spark.salt import salt_col

REL_SCHEMA = (
    "conv_id string, turn_idx int, sent_idx int, "
    "subj_ent_type string, subj_surface string, "
    "obj_ent_type string, obj_surface string, pred string, conf double"
)
SM_SCHEMA = "ent_type string, norm string, entity_id string"


@pytest.fixture(scope="module")
def planted(spark):
    rows = []
    # one hub triple with 500 evidence rows + two cold triples
    for i in range(500):
        rows.append(
            (
                f"c{i:04d}", i % 7, 0,
                "Peop", "Alice Hub", "Org", "MegaCorp", "Work_For",
                0.5 + (i % 10) / 100.0,
            )
        )
    rows.append(("cx", 0, 0, "Peop", "Bob", "Org", "TinyCo", "Work_For", 0.8))
    rows.append(("cy", 1, 0, "Peop", "Carol", "Loc", "Paris", "Live_In", 0.7))
    rels = spark.createDataFrame(rows, REL_SCHEMA)
    sm = spark.createDataFrame(
        [
            ("Peop", "alice hub", "Peop:alice hub"),
            ("Org", "megacorp", "Org:megacorp"),
            ("Peop", "bob", "Peop:bob"),
            ("Org", "tinyco", "Org:tinyco"),
            ("Peop", "carol", "Peop:carol"),
            ("Loc", "paris", "Loc:paris"),
        ],
        SM_SCHEMA,
    )
    return rels, sm


def _as_rows(df):
    return sorted(
        (
            r["subj"], r["pred"], r["obj"], r["conf"], r["n_evidence"],
            tuple(map(tuple, r["provenance"])),
        )
        for r in df.collect()
    )


class TestHubSaltedTriples:
    def test_salted_equals_plain(self, planted):
        rels, sm = planted
        plain = materialize.build_triples(rels, sm)
        salted = materialize.build_triples(
            rels, sm, hub_subjects=["Peop:alice hub"]
        )
        assert _as_rows(salted) == _as_rows(plain)

    def test_hub_caps_and_counts(self, planted):
        rels, sm = planted
        got = {
            (r["subj"], r["pred"], r["obj"]): r
            for r in materialize.build_triples(
                rels, sm, hub_subjects=["Peop:alice hub"]
            ).collect()
        }
        hub = got[("Peop:alice hub", "Work_For", "Org:megacorp")]
        assert hub["n_evidence"] == 500
        assert len(hub["provenance"]) == materialize.PROVENANCE_CAP
        # provenance is the ascending head: first conv ids win
        assert hub["provenance"][0]["conv_id"] == "c0000"
        assert hub["conf"] == pytest.approx(0.59)

    def test_salt_spreads_hub_evidence(self, planted):
        """The skew property itself: the hub's 500 evidence rows land in
        >1 (key, salt) partial-agg group, so no single reducer sees them
        all (content-hash salt — deterministic under retry)."""
        rels, _sm = planted
        hot = rels.filter(F.col("subj_surface") == "Alice Hub")
        n_salts = (
            hot.withColumn(
                "_s",
                salt_col(16, content_cols=["conv_id", "turn_idx", "sent_idx"]),
            )
            .select("_s")
            .distinct()
            .count()
        )
        assert n_salts > 1
