"""Document chunking + sequence packing (operators/chunking.py) unit
tests: boundary coverage rules, overlap math, empty-doc handling, and
plan-shape guards (chunker has zero Exchange; packer's window is
partitioned by the group key, never global)."""

import pytest
from pyspark.sql import functions as F

from tribeca_insights_spark.operators.chunking import (
    chunk_documents,
    pack_sequences,
)


def _docs(spark, rows, cols=("doc_id", "text")):
    return spark.createDataFrame(rows, list(cols))


class TestChunkDocuments:
    def test_short_doc_single_chunk(self, spark):
        out = chunk_documents(
            _docs(spark, [(0, "a b c")]), chunk=32, stride=24
        ).collect()
        assert len(out) == 1
        r = out[0].asDict()
        assert (r["chunk_id"], r["start_token"], r["n_tokens"]) == (0, 1, 3)
        assert r["chunk_text"] == "a b c"

    def test_overlap_and_tail(self, spark):
        # 10 tokens, chunk=4, stride=3 → starts 1,4,7,10 (ceil(6/3)=2 →
        # 1+2=3 chunks? no: 1+ceil((10-4)/3)=1+2=3 → starts 1,4,7).
        # Coverage: last chunk [7..10] includes token 10.
        text = " ".join(f"t{i}" for i in range(1, 11))
        out = sorted(
            chunk_documents(
                _docs(spark, [(0, text)]), chunk=4, stride=3
            ).collect(),
            key=lambda r: r["chunk_id"],
        )
        assert [(r["start_token"], r["n_tokens"]) for r in out] == [
            (1, 4), (4, 4), (7, 4),
        ]
        assert out[1]["chunk_text"] == "t4 t5 t6 t7"
        # 1 token of overlap between consecutive chunks (chunk - stride)
        assert out[0]["chunk_text"].split()[-1] == \
            out[1]["chunk_text"].split()[0]

    def test_every_token_covered(self, spark):
        text = " ".join(f"w{i}" for i in range(57))
        out = chunk_documents(
            _docs(spark, [(0, text)]), chunk=8, stride=5
        ).collect()
        covered = set()
        for r in out:
            covered.update(
                range(r["start_token"], r["start_token"] + r["n_tokens"])
            )
        assert covered == set(range(1, 58))

    def test_empty_doc_no_chunks(self, spark):
        out = chunk_documents(
            _docs(spark, [(0, ""), (1, "   "), (2, "x")])
        ).collect()
        assert [r["doc_id"] for r in out] == [2]

    def test_bad_params_raise(self, spark):
        df = _docs(spark, [(0, "a")])
        with pytest.raises(ValueError):
            chunk_documents(df, chunk=0)
        with pytest.raises(ValueError):
            chunk_documents(df, stride=-1)

    def test_plan_no_exchange(self, spark):
        plan = chunk_documents(_docs(spark, [(0, "a b")]))._jdf \
            .queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestPackSequences:
    COLS = ("doc_id", "source", "text")

    def test_offsets_and_spans(self, spark):
        # source s: docs 0 (3 tok), 1 (4 tok), 2 (2 tok); ctx=5
        rows = [
            (0, "s", "a b c"),
            (1, "s", "d e f g"),
            (2, "s", "h i"),
        ]
        out = {
            r["doc_id"]: r.asDict()
            for r in pack_sequences(
                _docs(spark, rows, self.COLS), ctx=5
            ).collect()
        }
        assert out[0]["stream_offset"] == 0
        assert (out[0]["start_seq"], out[0]["end_seq"]) == (0, 0)
        # doc 1 spans tokens 3..6 → sequences 0 and 1
        assert out[1]["stream_offset"] == 3
        assert (out[1]["start_seq"], out[1]["end_seq"]) == (0, 1)
        assert out[1]["n_seqs_spanned"] == 2
        assert out[1]["offset_in_seq"] == 3
        assert out[2]["stream_offset"] == 7
        assert (out[2]["start_seq"], out[2]["end_seq"]) == (1, 1)

    def test_groups_independent(self, spark):
        rows = [(0, "a", "x y"), (1, "b", "x y z")]
        out = {
            r["doc_id"]: r.asDict()
            for r in pack_sequences(
                _docs(spark, rows, self.COLS), ctx=4
            ).collect()
        }
        # both docs start their own group's stream at offset 0
        assert out[0]["stream_offset"] == 0
        assert out[1]["stream_offset"] == 0

    def test_empty_docs_skipped(self, spark):
        rows = [(0, "a", ""), (1, "a", "x")]
        out = pack_sequences(_docs(spark, rows, self.COLS)).collect()
        assert [r["doc_id"] for r in out] == [1]

    def test_plan_window_partitioned(self, spark):
        plan = pack_sequences(
            _docs(spark, [(0, "a", "x")], self.COLS)
        )._jdf.queryExecution().executedPlan().toString()
        # hashpartitioning on the group key — never SinglePartition
        assert "hashpartitioning(group" in plan
        assert "SinglePartition" not in plan
