"""A2 annotated-corpus reader: CoNLL04-format round-trip against the
fixture gold annotations (SURVEY.md §2.A)."""

from __future__ import annotations

from antnre_spark import sources


class TestConll04RoundTrip:
    def test_write_then_read_is_identity(self, spark, fixture_paths, tmp_path):
        gold = spark.read.parquet(fixture_paths["gold"]).limit(200)
        path = str(tmp_path / "corpus.conll04")
        n = sources.write_conll04(gold, path)
        assert n == 200
        back = sources.read_conll04(spark, path)
        key = ["conv_id", "turn_idx", "sent_idx"]
        a = {tuple(r[k] for k in key): r for r in gold.collect()}
        b = {tuple(r[k] for k in key): r for r in back.collect()}
        assert a.keys() == b.keys()
        for k in a:
            assert list(a[k]["tokens"]) == list(b[k]["tokens"])
            assert sorted(map(tuple, a[k]["ent_spans"])) == sorted(
                map(tuple, b[k]["ent_spans"])
            )
            assert sorted(map(tuple, a[k]["relations"])) == sorted(
                map(tuple, b[k]["relations"])
            )

    def test_parse_handles_empty_relations_and_spans(self, spark, tmp_path):
        text = (
            "#doc c1 0 0\n"
            "0\thello\tO\n"
            "1\tworld\tO\n"
            "\n"
            "#doc c1 0 1\n"
            "0\tJohn\tB-Peop\n"
            "1\tSmith\tI-Peop\n"
            "2\tworks\tO\n"
            "#rel 0 0 Work_For\n"
        )
        p = tmp_path / "t.conll04"
        p.write_text(text)
        rows = {r["sent_idx"]: r for r in sources.read_conll04(spark, str(p)).collect()}
        assert rows[0]["ent_spans"] == []
        assert [tuple(s) for s in rows[1]["ent_spans"]] == [(0, 2, "Peop")]
        assert [tuple(r) for r in rows[1]["relations"]] == [(0, 0, "Work_For")]
