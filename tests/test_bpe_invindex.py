"""BPE pair counting (operators/bpe.py) and blocked inverted index
(operators/retrieval.py:inverted_index) unit tests: closed-form count
checks, blocking/gap-encoding semantics, and plan-shape guards."""

import pytest

from tribeca_insights_spark.operators.bpe import bpe_pair_counts
from tribeca_insights_spark.operators.retrieval import inverted_index


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestBpePairCounts:
    def test_closed_form(self, spark):
        # vocab: 'abab' ×2 (pairs ab,ba,ab), 'ab' ×1 (pair ab)
        df = _docs(spark, [(0, "abab ab"), (1, "abab")])
        out = {r["pair"]: r.asDict()
               for r in bpe_pair_counts(df, topk=10).collect()}
        # 'ab': 2 positions in 'abab' (freq 2) + 1 in 'ab' (freq 1) = 5
        assert out["ab"]["pair_count"] == 5
        assert out["ab"]["n_words"] == 2
        assert out["ba"]["pair_count"] == 2
        assert out["ba"]["n_words"] == 1

    def test_single_char_words_ignored(self, spark):
        df = _docs(spark, [(0, "a b c ab")])
        out = bpe_pair_counts(df, topk=10).collect()
        assert [r["pair"] for r in out] == ["ab"]

    def test_topk_tie_break_lex(self, spark):
        df = _docs(spark, [(0, "xy yz")])
        out = bpe_pair_counts(df, topk=1).collect()
        assert out[0]["pair"] == "xy"  # equal counts → lexicographic

    def test_plan_takeordered(self, spark):
        plan = bpe_pair_counts(_docs(spark, [(0, "ab")]))._jdf \
            .queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        assert "Window" not in plan


class TestInvertedIndex:
    def test_postings_sorted_and_blocked(self, spark):
        df = _docs(spark, [
            (5, "w"), (3, "w"), (103, "w"), (250, "w z"), (3, "w"),
        ])
        out = {(r["term"], r["block"]): r.asDict()
               for r in inverted_index(df, block_size=100).collect()}
        assert out[("w", 0)]["postings"] == [3, 5]   # dup doc 3 deduped
        assert out[("w", 0)]["df_block"] == 2
        assert out[("w", 1)]["postings"] == [103]
        assert out[("w", 2)]["postings"] == [250]
        assert out[("z", 2)]["postings"] == [250]

    def test_gap_encoding(self, spark):
        df = _docs(spark, [(10, "t"), (17, "t"), (42, "t")])
        out = inverted_index(df, block_size=1000).collect()
        assert out[0]["postings"] == [10, 17, 42]
        assert out[0]["gaps"] == [10, 7, 25]
        # gaps reconstruct the postings by prefix sum
        acc, rec = 0, []
        for g in out[0]["gaps"]:
            acc += g
            rec.append(acc)
        assert rec == out[0]["postings"]

    def test_bad_block_size(self, spark):
        with pytest.raises(ValueError):
            inverted_index(_docs(spark, [(0, "a")]), block_size=0)

    def test_plan_no_window_no_singlepartition(self, spark):
        plan = inverted_index(_docs(spark, [(0, "a b")]))._jdf \
            .queryExecution().executedPlan().toString()
        assert "Window" not in plan
        assert "SinglePartition" not in plan
