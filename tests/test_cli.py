"""CLI parity (reference cli.py:29-96 command surface over Spark).

Runs in a subprocess because the CLI owns its SparkSession lifecycle
(it stops the session on exit, which must not kill the shared test
fixture's)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=300):
    out = subprocess.run(
        [sys.executable, "-m", "tribeca_insights_spark", *args],
        capture_output=True, text=True, cwd=REPO, timeout=timeout,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_cli_crawl_resume_export(spark, tmp_path):
    from tribeca_insights_spark.fixtures import corpus_df

    docs_path = str(tmp_path / "docs.parquet")
    proj = str(tmp_path / "proj")
    corpus_df(spark, 12).write.mode("overwrite").parquet(docs_path)

    # run 1: limited work queue (crawler.py:215 semantics)
    r1 = _run(["crawl", "--input", docs_path, "--project-dir", proj,
               "--slug", "demo", "--max-pages", "8", "--reports",
               "--master", "local[2]"])
    assert r1["n_processed"] == 8 and r1["n_pages"] == 8

    # run 2: resume picks up exactly the remainder
    r2 = _run(["crawl", "--input", docs_path, "--project-dir", proj,
               "--slug", "demo", "--reports", "--master", "local[2]"])
    assert r2["n_processed"] == 4 and r2["n_pages"] == 12

    # project tree complete
    for artifact in (
        "index.md", "index.json", "external_urls.md", "external_urls.json",
        "keyword_frequency_demo.csv", "visited_urls_demo.csv",
        "project_demo.json",
    ):
        assert os.path.exists(os.path.join(proj, artifact)), artifact
    pages = json.load(open(os.path.join(proj, "project_demo.json")))
    assert pages["pages_count"] == 12

    # export re-derivations (exporters/__init__.py:6-22 dispatch)
    rj = _run(["export", "--project-dir", proj, "--slug", "demo",
               "--format", "json"])
    combined = json.load(open(rj["exported"]))
    assert len(combined) == 12
    rc = _run(["export", "--project-dir", proj, "--slug", "demo",
               "--format", "csv"])
    first = open(rc["exported"]).read().splitlines()
    assert first[0] == "word,freq"


def test_cli_report(spark, tmp_path):
    import csv

    from tribeca_insights_spark.fixtures import corpus_df

    docs_path = str(tmp_path / "docs.parquet")
    proj = str(tmp_path / "proj")
    corpus_df(spark, 10).write.mode("overwrite").parquet(docs_path)
    _run(["crawl", "--input", docs_path, "--project-dir", proj,
          "--slug", "demo", "--master", "local[2]"])
    r = _run(["report", "--project-dir", proj, "--master", "local[2]"])
    assert set(r["rows"]) == {
        "corpus_tf", "doc_frequency", "domain_top_keywords", "link_counts",
        "index",
    }
    assert r["rows"]["link_counts"] == 10
    with open(os.path.join(r["reports_dir"], "corpus_tf.csv")) as f:
        head = next(csv.reader(f))
    assert head == ["word", "freq"]
    # O(n_docs) reports are distributed CSV directories (no driver collect)
    import glob

    lc_dir = os.path.join(r["reports_dir"], "link_counts")
    assert os.path.isdir(lc_dir)
    parts = glob.glob(os.path.join(lc_dir, "part-*.csv"))
    assert parts
    rows = []
    for p in parts:
        with open(p) as f:
            rdr = csv.reader(f)
            hdr = next(rdr, None)
            if hdr is not None:
                assert hdr[0] == "url"
                rows.extend(rdr)
    assert len(rows) == 10


def test_cli_curate(spark, tmp_path):
    import json as _json
    import subprocess
    import sys

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [
            (1, "plenty of good clean words here to keep", "en"),
            (2, "plenty of good clean words here to keep", "en"),  # dup
            (3, "tiny", "en"),
            (4, "damaged � replacement marker with words", "en"),
        ],
        "doc_id long, text string, lang string",
    ).write.parquet(src)
    out_dir = str(tmp_path / "curated")
    p = subprocess.run(
        [sys.executable, "-m", "tribeca_insights_spark", "curate",
         "--input", src, "--out-dir", out_dir, "--dedup",
         "--master", "local[2]", "--shuffle-partitions", "4"],
        capture_output=True, text=True, timeout=300,
    )
    assert p.returncode == 0, p.stderr[-2000:]
    res = _json.loads(p.stdout.strip().splitlines()[-1])
    assert res["by_reason"]["kept"] == 1
    assert res["by_reason"]["duplicate"] == 1
    assert res["by_reason"]["too_short"] == 1
    assert res["by_reason"]["encoding"] == 1
    kept = spark.read.parquet(f"{out_dir}/kept")
    assert kept.count() == 1 and kept.first().doc_id == 1
    dropped = spark.read.parquet(f"{out_dir}/dropped")
    assert dropped.count() == 3
    assert "reasons_csv" in dropped.columns
