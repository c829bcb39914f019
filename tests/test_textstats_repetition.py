"""Gopher-style n-gram repetition signals (Rae et al. 2021 §A1.1):
top-n-gram char coverage and duplicate-n-gram instance fraction, as a
shuffle-free fold (textstats.py) pinned against handcrafted cases and the
DuckDB oracle twin."""

import duckdb
import pytest
from pyspark.sql import functions as F

from archivesspace_virgo_spark.operators import textstats as TS

from tests.conftest import SF_SMOKE


def _stats(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    rows = df.select(
        "doc_id",
        F.round(TS.top_ngram_char_frac("text", 2), 6).alias("top2"),
        F.round(TS.dup_ngram_frac("text", 2), 6).alias("dup2"),
        F.round(TS.top_ngram_char_frac("text", 3), 6).alias("top3"),
        F.round(TS.dup_ngram_frac("text", 3), 6).alias("dup3"),
    ).orderBy("doc_id").collect()
    return [(r["top2"], r["dup2"], r["top3"], r["dup3"]) for r in rows]


def test_handcrafted_cases(spark):
    got = _stats(spark, [
        "",            # no tokens -> all zero
        "Hello",       # single token -> no n-grams
        "a a a a",     # total repeat: dup=1.0; overlap makes top>1 (documented)
        "x y x y z",   # 'x y' twice: dup2=2/4, cov=2*2 chars of 5
    ])
    assert got[0] == (0.0, 0.0, 0.0, 0.0)
    assert got[1] == (0.0, 0.0, 0.0, 0.0)
    assert got[2] == (1.5, 1.0, 1.5, 1.0)
    assert got[3] == (0.8, 0.5, 0.6, 0.0)


@pytest.mark.parametrize("n", [2, 3])
def test_matches_duckdb_twin_on_corpus(spark, n):
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    got = (
        d.select(
            "doc_id",
            F.round(TS.top_ngram_char_frac("text", n), 6).alias("top"),
            F.round(TS.dup_ngram_frac("text", n), 6).alias("dup"),
        ).orderBy("doc_id").toPandas()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet')"
    )
    exp = con.execute(
        f"SELECT doc_id, round({TS.top_ngram_char_frac_sql('text', n)}, 6) "
        f"AS top, round({TS.dup_ngram_frac_sql('text', n)}, 6) AS dup "
        "FROM documents ORDER BY doc_id"
    ).df()
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["top"].tolist() == pytest.approx(exp["top"].tolist(), abs=1e-9)
    assert got["dup"].tolist() == pytest.approx(exp["dup"].tolist(), abs=1e-9)
