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


# --- iterative BPE merge training -------------------------------------------


def _py_bpe(texts, n_merges):
    from collections import Counter

    words = Counter(w for t in texts for w in t.split() if w)
    vocab = {w: list(w) for w in words}
    out = []
    for step in range(1, n_merges + 1):
        pc = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += words[w]
        if not pc:
            break
        (l, r), c = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        out.append((step, l, r, c))
        for w, s in vocab.items():
            m, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    m.append(l + r)
                    i += 2
                else:
                    m.append(s[i])
                    i += 1
            vocab[w] = m
    return out


def test_bpe_train_matches_python_bpe(spark):
    from tribeca_insights_spark.operators.bpe import bpe_train_merges

    texts = [
        "low low low lower lower newest newest newest newest widest",
        "widest widest low newest",
    ]
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = [
        (r["step"], r["left"], r["right"], r["pair_count"])
        for r in bpe_train_merges(df, n_merges=5).orderBy("step").collect()
    ]
    assert got == _py_bpe(texts, 5)


def test_bpe_train_merge_applies_before_next_round(spark):
    from tribeca_insights_spark.operators.bpe import bpe_train_merges

    # "aaaa" x3: round 1 merges (a,a) with count 3*3=9 (overlap-counted
    # adjacency); round 2 must count pairs over [aa, aa] -- NOT raw chars
    df = spark.createDataFrame([(0, "aaaa aaaa aaaa")],
                               "doc_id long, text string")
    got = [
        (r["step"], r["left"], r["right"], r["pair_count"])
        for r in bpe_train_merges(df, n_merges=2).orderBy("step").collect()
    ]
    assert got == [(1, "a", "a", 9), (2, "aa", "aa", 3)]


def test_bpe_train_multichar_symbol_boundaries(spark):
    from tribeca_insights_spark.operators.bpe import bpe_train_merges

    # after merging (a,b)->ab, the string "xab" is [x, ab]; a naive
    # unanchored replace could corrupt "ab" inside other contexts --
    # the sentinel wrapping must keep symbols atomic
    texts = ["ab ab ab xab xab ba"]
    df = spark.createDataFrame([(0, texts[0])], "doc_id long, text string")
    got = [
        (r["step"], r["left"], r["right"], r["pair_count"])
        for r in bpe_train_merges(df, n_merges=3).orderBy("step").collect()
    ]
    assert got == _py_bpe(texts, 3)


def test_bpe_train_rejects_bad_nmerges(spark):
    import pytest

    from tribeca_insights_spark.operators.bpe import bpe_train_merges

    df = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bpe_train_merges(df, n_merges=0)
