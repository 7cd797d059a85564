"""Distributed relation-decoder training (antnre_spark/train.py):
gradient correctness by finite differences, learning from random init on
the fixture gold, and warm-start preservation."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from antnre_spark import train
from antnre_spark.extract import broadcast_model


class TestGradients:
    def test_finite_difference(self):
        """Analytic gradient of the relu-MLP cross-entropy matches the
        central finite difference to 1e-6 relative — on random data, at
        random parameter coordinates."""
        rng = np.random.default_rng(3)
        dim_in, hidden, n_rels, n = 10, 7, 4, 20
        dims = (dim_in, hidden, n_rels)
        X = rng.standard_normal((n, dim_in))
        y = rng.integers(0, n_rels, n)
        w = rng.standard_normal(dim_in * hidden + hidden + hidden * n_rels + n_rels) * 0.3
        g, _ = train.grad_and_loss(w, X, y, dims)
        eps = 1e-6
        for idx in rng.choice(len(w), 25, replace=False):
            wp, wm = w.copy(), w.copy()
            wp[idx] += eps
            wm[idx] -= eps
            _, lp = train.grad_and_loss(wp, X, y, dims)
            _, lm = train.grad_and_loss(wm, X, y, dims)
            num = (lp - lm) / (2 * eps)
            assert num == pytest.approx(g[idx], rel=1e-4, abs=1e-5)


@pytest.fixture(scope="module")
def gold_pairs(spark, fixture_paths):
    w_bc, v_bc, key = broadcast_model(
        spark, fixture_paths["weights"], fixture_paths["vocab"]
    )
    gold = spark.read.parquet(fixture_paths["gold"]).limit(300)
    pairs = train.pair_training_frame(gold, w_bc, v_bc, key).persist()
    pairs.count()
    yield pairs
    pairs.unpersist()


class TestDistributedTraining:
    def test_learns_from_random_init(self, gold_pairs):
        """Full-batch distributed GD from seeded random init must drive
        the loss down monotonically-ish and reach high training accuracy
        on the fixture gold — proof the training path can RECOVER a
        working decoder, not just carry a pre-trained one."""
        dim_in = len(gold_pairs.first()["feat"])
        trained, history = train.fit_relation_decoder(
            gold_pairs, dim_in=dim_in, epochs=150, lr=0.1
        )
        assert history[-1] < 0.2 * history[0]
        acc = train.training_accuracy(gold_pairs, trained)
        assert acc >= 0.98, (acc, history)
        # trained weights are the inference dtype/shape
        assert trained["rel_W1"].dtype == np.float32
        assert trained["rel_W1"].shape == (dim_in, 64)

    def test_labels_are_nontrivial(self, gold_pairs):
        """The pair set must contain both None and real-relation labels
        (otherwise the accuracy above is vacuous)."""
        dist = {
            r["label"]: r["n"]
            for r in gold_pairs.groupBy("label")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert dist.get(0, 0) > 0
        assert sum(v for k, v in dist.items() if k != 0) > 50

    def test_warm_start_keeps_fixture_quality(self, gold_pairs, fixture_paths):
        """Fine-tuning FROM the shipped fixture decoder must not destroy
        it: accuracy after a few low-lr epochs stays >= the fixture
        decoder's own training accuracy minus noise."""
        with np.load(fixture_paths["weights"]) as z:
            init = {
                k: z[k] for k in ("rel_W1", "rel_b1", "rel_W2", "rel_b2")
            }
        base_acc = train.training_accuracy(gold_pairs, init)
        dim_in = len(gold_pairs.first()["feat"])
        tuned, history = train.fit_relation_decoder(
            gold_pairs, dim_in=dim_in, epochs=5, lr=0.05, momentum=0.0,
            init=init,
        )
        tuned_acc = train.training_accuracy(gold_pairs, tuned)
        assert tuned_acc >= base_acc - 0.02
        assert history[-1] <= history[0]
