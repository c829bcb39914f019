"""CLI smoke tests (the reference's main-method operational surface)."""

import subprocess
import sys


def _run(*args):
    import os

    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-m", "archivesspace_virgo_spark", *args],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
        env=env,
    )


def test_cli_build_query_phrase_facet(tmp_path):
    import duckdb

    # adapt a tiny corpus to input_hint shape on disk
    src = str(tmp_path / "corpus")
    duckdb.sql(f"""
        COPY (
          SELECT doc_id, source AS repo, 'doc/' || doc_id AS path,
                 sha256(CAST(doc_id AS VARCHAR)) AS commit,
                 lang, text AS content
          FROM '/root/testdata/sf0.001/documents.parquet' LIMIT 120
        ) TO '{src}' (FORMAT PARQUET)
    """)
    idx = str(tmp_path / "idx")

    r = _run("build", "--corpus", src, "--index", idx,
             "--docs-per-shard", "64")
    assert r.returncode == 0, r.stderr[-2000:]

    r = _run("query", "--index", idx, "--terms", "table,join",
             "--docs-per-shard", "64", "-k", "3")
    assert r.returncode == 0, r.stderr[-2000:]
    lines = r.stdout.strip().splitlines()
    assert lines[-4].split("\t") == ["doc_id", "score"] or len(lines) >= 1
    assert any("\t" in ln for ln in lines[-3:])

    r = _run("phrase", "--index", idx, "--phrase", "value table",
             "--docs-per-shard", "64", "-k", "3")
    assert r.returncode == 0, r.stderr[-2000:]

    r = _run("facet", "--index", idx, "--terms", "table",
             "--field", "lang", "--docs-per-shard", "64")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "facet_count" in r.stdout

    r = _run("query", "--index", idx, "--terms", "table,join",
             "--exclude", "merge", "--docs-per-shard", "64", "-k", "3")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "doc_id" in r.stdout

    r = _run("query", "--index", idx, "--terms", "table,join",
             "--fq", "table", "--mm", "2", "--docs-per-shard", "64", "-k", "3")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "doc_id" in r.stdout

    r = _run("search", "--index", idx, "--q", 'table -merge join^2',
             "--docs-per-shard", "64", "-k", "3")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "doc_id" in r.stdout

    r = _run("suggest", "--index", idx, "--term", "tble",
             "--docs-per-shard", "64", "-n", "3")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "table" in r.stdout and "distance" in r.stdout

    r = _run("group", "--index", idx, "--terms", "table", "--field", "lang",
             "--k-per-group", "2", "--docs-per-shard", "64")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "rank_in_group" in r.stdout

    r = _run("sort", "--index", idx, "--terms", "table", "--field", "path",
             "--docs-per-shard", "64", "-k", "3")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "path" in r.stdout

    r = _run("dismax", "--index", idx, "--terms", "table,join",
             "--tie", "0.3", "--docs-per-shard", "64", "-k", "3")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "score" in r.stdout

    r = _run("stats", "--index", idx, "--terms", "table",
             "--docs-per-shard", "64")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "stats_mean" in r.stdout

    r = _run("terms", "--index", idx, "--prefix", "t", "-n", "3",
             "--docs-per-shard", "64")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "df" in r.stdout

    r = _run("phrase", "--index", idx, "--phrase", "value table",
             "--slop", "2", "--docs-per-shard", "64", "-k", "3")
    assert r.returncode == 0, r.stderr[-2000:]

    r = _run("rerank", "--index", idx, "--terms", "table,value",
             "--phrase", "value table", "--rerank-docs", "10",
             "--docs-per-shard", "64", "-k", "3")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "score" in r.stdout

    r = _run("explain", "--index", idx, "--terms", "table,join",
             "--ids", "0,1,2", "--docs-per-shard", "64")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "contrib" in r.stdout
