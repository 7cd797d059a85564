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


class TestGloveIngestion:
    """A3 GloVe-text embedding ingestion (r5 verdict task 6): round-trip
    through the text format, OOV/UNK mean policy, width validation."""

    def test_round_trip_preserves_lexical_vectors(self, fixture_paths, tmp_path):
        import json

        import numpy as np

        from antnre_spark.sources import load_glove_embeddings, write_glove_text

        with np.load(fixture_paths["weights"]) as z:
            word_emb = z["word_emb"]
        with open(fixture_paths["vocab"]) as f:
            vocab = json.load(f)
        path = str(tmp_path / "tiny_glove.txt")
        n = write_glove_text(word_emb, vocab, path)
        assert n == len(vocab) - 2  # minus [PAD]/[UNK]

        loaded = load_glove_embeddings(path, vocab)
        assert loaded.shape == word_emb.shape and loaded.dtype == np.float32
        lexical = [vid for tok, vid in vocab.items() if tok not in ("[PAD]", "[UNK]")]
        np.testing.assert_allclose(
            loaded[lexical], word_emb[lexical], rtol=1e-4, atol=1e-5
        )
        # [PAD] zero; [UNK] = mean of matched vectors (OOV policy)
        assert not loaded[vocab["[PAD]"]].any()
        np.testing.assert_allclose(
            loaded[vocab["[UNK]"]],
            np.mean(word_emb[lexical].astype(np.float32), axis=0),
            rtol=1e-3, atol=1e-4,
        )

    def test_missing_tokens_get_mean_and_width_is_checked(self, tmp_path):
        import numpy as np
        import pytest

        from antnre_spark.sources import load_glove_embeddings

        vocab = {"[PAD]": 0, "[UNK]": 1, "alpha": 2, "beta": 3}
        p = str(tmp_path / "g.txt")
        with open(p, "w") as f:
            f.write("alpha 1.0 2.0\n")
            f.write("notinvocab 9.0 9.0\n")
        emb = load_glove_embeddings(p, vocab)
        np.testing.assert_allclose(emb[2], [1.0, 2.0])
        np.testing.assert_allclose(emb[3], [1.0, 2.0])  # mean of 1 match
        assert not emb[0].any()
        with open(p, "a") as f:
            f.write("beta 1.0 2.0 3.0\n")  # wrong width
        with pytest.raises(ValueError, match="vector width"):
            load_glove_embeddings(p, vocab)

    def test_inference_f1_unchanged_with_text_loaded_embeddings(
        self, fixture_paths, tmp_path
    ):
        """Swap word_emb for the text-round-tripped matrix: the held-out
        mention F1 of the inference path must match the fixture weights
        (only [UNK]'s vector differs — the mean policy)."""
        import json

        import numpy as np
        import pandas as pd

        from antnre_spark import train
        from antnre_spark.sources import load_glove_embeddings, write_glove_text

        with np.load(fixture_paths["weights"]) as z:
            w = {k: z[k] for k in z.files}
        with open(fixture_paths["vocab"]) as f:
            vocab = json.load(f)
        path = str(tmp_path / "rt_glove.txt")
        write_glove_text(w["word_emb"], vocab, path)
        w2 = dict(w, word_emb=load_glove_embeddings(path, vocab))

        gold = pd.read_parquet(fixture_paths["gold"]).head(300)
        sents = train.sentences_from_gold_rows(gold.to_dict("records"))
        f_base = train.mention_prf(w, vocab, sents)["f1"]
        f_glove = train.mention_prf(w2, vocab, sents)["f1"]
        assert f_glove >= f_base - 0.01, (f_glove, f_base)
