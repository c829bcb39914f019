"""Solr auxiliary components — pivot facets (facet.pivot), stats
(stats.field), terms enumeration (terms component) — each pinned against
an exact DuckDB oracle over the same parquet corpus.
"""

import duckdb
import pytest

from archivesspace_virgo_spark.config import IndexConfig
from archivesspace_virgo_spark.corpus import load_documents_as_corpus
from archivesspace_virgo_spark.functions.bm25 import bm25_oracle_sql
from archivesspace_virgo_spark.index.build import build_index
from archivesspace_virgo_spark.index.query import QueryEngine
from archivesspace_virgo_spark.tokenizer import TOKEN_SPLIT_PATTERN

from tests.conftest import SF_SMOKE

CFG = IndexConfig(docs_per_shard=64, block_size=16)
TERMS = ["spark", "window", "merge"]
BIG = 10 ** 9

TOK_CTE = f"""
tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text),
                '{TOKEN_SPLIT_PATTERN}'), t -> t <> '')) AS term
  FROM documents
)"""


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("comp_idx"))
    corpus = load_documents_as_corpus(spark, SF_SMOKE)
    build_index(spark, corpus, d, CFG)
    return QueryEngine(spark, d, CFG)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet')"
    )
    return c


def test_facet_pivot_matches_duckdb(engine, con):
    # doc_map's repo column is the adapter's source; pivot (lang, repo)
    got = [(r["lang"], r["repo"], r["facet_count"]) for r in
           engine.facet_pivot(TERMS, ["lang", "repo"]).collect()]
    exp = [
        (lang, repo, int(n))
        for lang, repo, n in con.execute(f"""
WITH scored AS ({bm25_oracle_sql(TERMS, k=BIG)})
SELECT lang, source AS repo, CAST(count(*) AS BIGINT) AS n
FROM documents WHERE doc_id IN (SELECT doc_id FROM scored)
GROUP BY 1, 2 ORDER BY n DESC, lang, repo
""").fetchall()
    ]
    assert got == exp and len(got) > 2
    with pytest.raises(ValueError):
        engine.facet_pivot(TERMS, [])


def test_stats_component_matches_duckdb(engine, con):
    r = engine.stats_component(TERMS).collect()[0]
    cnt, mn, mx, sm, mean = con.execute(f"""
WITH {TOK_CTE},
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
scored AS ({bm25_oracle_sql(TERMS, k=BIG)})
SELECT CAST(count(*) AS BIGINT), CAST(min(dl) AS BIGINT),
       CAST(max(dl) AS BIGINT), CAST(sum(dl) AS BIGINT), avg(dl)
FROM dl WHERE doc_id IN (SELECT doc_id FROM scored)
""").fetchone()
    assert (r["stats_count"], r["stats_min"], r["stats_max"],
            r["stats_sum"]) == (cnt, mn, mx, sm)
    assert abs(r["stats_mean"] - mean) < 1e-9
    assert cnt > 10


def test_terms_component_matches_duckdb(engine, con):
    got = [(r["term"], r["df"]) for r in
           engine.terms_component("s", n=5).collect()]
    exp = [
        (t, int(d))
        for t, d in con.execute(f"""
WITH {TOK_CTE},
dft AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok
        WHERE term LIKE 's%' GROUP BY 1)
SELECT term, df FROM dft ORDER BY df DESC, term LIMIT 5
""").fetchall()
    ]
    assert got == exp and len(got) == 5
    # index order + min_df
    got2 = [r["term"] for r in
            engine.terms_component("s", n=5, by_count=False).collect()]
    assert got2 == sorted(got2)
    hi = engine.terms_component("", n=3, min_df=100).collect()
    assert all(r["df"] >= 100 for r in hi)
