"""BM25 ranked retrieval (operators/retrieval.py) and SemDeDup
(operators/semdedup.py) unit tests: closed-form score checks, keep-rule
semantics, and plan-shape guards (TakeOrdered top-k, no unpartitioned
window; candidate pairs only via the cluster equi-join)."""

import math

from pyspark.sql import functions as F

from tribeca_insights_spark.operators.retrieval import bm25_topk
from tribeca_insights_spark.operators.semdedup import semdedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestBM25:
    def test_closed_form_single_term(self, spark):
        # 3 docs, term 'x' hits doc 0 twice (dl=4) and doc 2 once (dl=2)
        df = _docs(spark, [
            (0, "x a x b"),
            (1, "a b c d"),
            (2, "x y"),
        ])
        out = {
            r["doc_id"]: r.asDict()
            for r in bm25_topk(df, ["x"], topk=10).collect()
        }
        assert set(out) == {0, 2}

        def expect(tf, dl, n=3, dfreq=2, k1=1.2, b=0.75, avgdl=10 / 3):
            idf = math.log((n - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
            tfw = tf * (k1 + 1.0) / (
                tf + k1 * ((1.0 - b) + b * (dl / avgdl))
            )
            return math.floor(1e6 * (idf * tfw))

        assert out[0]["score_micros"] == expect(tf=2, dl=4)
        assert out[2]["score_micros"] == expect(tf=1, dl=2)
        assert out[0]["n_terms_hit"] == 1 and out[0]["dl"] == 4

    def test_rare_term_outranks_common(self, spark):
        rows = [(i, "common filler words here") for i in range(20)]
        rows[0] = (0, "rare common filler words")
        df = _docs(spark, rows)
        top = bm25_topk(df, ["rare", "common"], topk=3).collect()
        assert top[0]["doc_id"] == 0  # the only 'rare' hit wins
        assert top[0]["score_micros"] > top[1]["score_micros"]

    def test_no_hits_absent_and_tie_break(self, spark):
        df = _docs(spark, [(0, "a b"), (1, "a b"), (2, "z z")])
        got = bm25_topk(df, ["a"], topk=1).collect()
        # docs 0/1 tie exactly; doc_id ascending breaks it; doc 2 absent
        assert [r["doc_id"] for r in got] == [0]

    def test_empty_query_terms_raise(self, spark):
        import pytest

        with pytest.raises(ValueError):
            bm25_topk(_docs(spark, [(0, "a")]), [])

    def test_plan_takeordered_no_window(self, spark):
        df = _docs(spark, [(0, "a b"), (1, "b c")])
        plan = bm25_topk(df, ["b"], topk=5)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        assert "Window" not in plan


class TestSemDeDup:
    def _emb(self, spark, rows):
        return spark.createDataFrame(rows, ["vec_id", "embedding"]) \
            .select("vec_id", F.col("embedding").cast("array<double>")
                    .alias("embedding"))

    def test_duplicate_dropped_keep_min_id(self, spark):
        # two tight groups far apart; ids 0/1 near-identical, 10/11 too
        rows = [
            (0, [1.0, 0.0, 0.0]),
            (1, [1.0005, 0.0, 0.0]),
            (10, [0.0, 1.0, 0.0]),
            (11, [0.0, 1.0002, 0.0]),
            (20, [0.5, 0.5, 0.7]),
        ]
        out = {r["vec_id"]: r.asDict() for r in
               semdedup(self._emb(spark, rows), k=2, iters=2,
                        tau=0.999).collect()}
        assert out[0]["keep"] is True
        assert out[1]["keep"] is False and out[1]["n_dup_smaller"] >= 1
        assert out[1]["max_cos_micros"] >= 999_000
        # 10/11 verdicts depend on shared-cluster membership with k=2;
        # whatever cluster they land in, the smaller id always survives
        assert out[10]["keep"] is True
        assert out[20]["n_dup_smaller"] == 0

    def test_kept_rows_have_null_cos(self, spark):
        rows = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
        out = semdedup(self._emb(spark, rows), k=1, iters=1,
                       tau=0.999).collect()
        assert all(r["keep"] for r in out)
        assert all(r["max_cos_micros"] is None for r in out)

    def test_pairs_confined_to_cluster(self, spark):
        # identical vectors in DIFFERENT clusters are never compared:
        # force k = n so every vector is its own seed/cluster
        rows = [(0, [1.0, 0.0]), (1, [1.0, 0.0])]
        out = semdedup(self._emb(spark, rows), k=2, iters=0,
                       tau=0.5).collect()
        by_id = {r["vec_id"]: r for r in out}
        if by_id[0]["cid"] != by_id[1]["cid"]:
            assert by_id[1]["keep"] is True
