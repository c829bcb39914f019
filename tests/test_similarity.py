"""Embedding similarity operators: exact vs LSH consistency."""

import numpy as np
import pytest

from archivesspace_virgo_spark.operators import similarity as S

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").cache()


def test_cosine_topk_matches_numpy(spark, emb):
    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    q = np.asarray(S.deterministic_hyperplanes(64, 1, seed=7)[0])
    cos = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = np.lexsort((ids, -cos))[:10]
    expected = [(int(ids[i]), round(float(cos[i]), 6)) for i in order]
    got = [(r["vec_id"], r["cos"]) for r in S.cosine_topk(emb, q, k=10).collect()]
    assert [g[0] for g in got] == [e[0] for e in expected]
    for (_, gc), (_, ec) in zip(got, expected):
        assert abs(gc - ec) < 1e-6


def test_neardup_lsh_subset_of_exact(spark, emb):
    """Every LSH-blocked pair is in the exact set with the same cosine
    (precision = 1); recall is whatever the bucketing yields."""
    exact = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in S.embedding_neardup_pairs(emb, threshold=0.3).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in S.embedding_neardup_pairs_lsh(emb, threshold=0.3, n_planes=4).collect()
    }
    assert exact, "threshold too high: no exact pairs — test is vacuous"
    assert lsh, "no LSH pairs survived bucketing"
    for pair, cos in lsh.items():
        assert pair in exact
        assert abs(cos - exact[pair]) < 1e-9


def test_neardup_exact_symmetric_ordering(spark, emb):
    res = S.embedding_neardup_pairs(emb, threshold=0.3).collect()
    for r in res:
        assert r["id_a"] < r["id_b"]


def test_bucketed_ann_prunes_partitions(spark, emb, tmp_path):
    """The ANN scale wiring: bucket is a PARTITION column; a probe reads
    only the probed buckets' files (scan scope pinned via inputFiles) and
    returns exactly what the in-memory LSH variant returns."""
    from archivesspace_virgo_spark.operators.similarity import (
        lsh_cosine_topk,
        lsh_cosine_topk_bucketed,
        write_bucketed_embeddings,
    )

    query = [float((i * 7) % 13 - 6) for i in range(64)]
    path = str(tmp_path / "bucketed")
    write_bucketed_embeddings(emb, path, n_planes=4)

    got = lsh_cosine_topk_bucketed(
        spark, path, query, k=5, n_planes=4, probe_hamming=1
    )
    want = lsh_cosine_topk(emb, query, k=5, n_planes=4, probe_hamming=1)
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]

    # scan scope: the bucket predicate must reach the scan as a PARTITION
    # filter (file-level pruning), not a post-scan row filter
    plan = got._jdf.queryExecution().executedPlan().toString()
    import re
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "bucket" in m.group(1), plan[:2000]


def test_ivf_full_probe_equals_exact(spark, emb, tmp_path):
    """IVF with nprobe = n_lists is exhaustive search; with a data vector as
    the query, the top hit must be that vector itself at any nprobe>=1
    (its list is always the first probed)."""
    import re

    from archivesspace_virgo_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        ivf_train,
        write_ivf_embeddings,
    )

    cent = ivf_train(emb, n_lists=8, n_iter=3)
    path = str(tmp_path / "ivf")
    write_ivf_embeddings(emb, cent, path)

    row = emb.select("vec_id", "embedding").head(1)[0]
    query = [float(x) for x in row["embedding"]]

    full = ivf_topk(spark, path, cent, query, k=5, nprobe=8)
    exact = cosine_topk(emb, query, k=5)
    assert [tuple(r) for r in full.collect()] == [tuple(r) for r in exact.collect()]

    probe1 = ivf_topk(spark, path, cent, query, k=1, nprobe=1).collect()
    assert probe1[0]["vec_id"] == row["vec_id"]
    assert probe1[0]["cos"] == 1.0

    plan = ivf_topk(spark, path, cent, query, k=5, nprobe=2)._jdf \
        .queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "list_id" in m.group(1), plan[:2000]


def test_ivf_sampled_training_path(spark, emb, tmp_path):
    """Corpus-scale training: centroids trained on a seeded sample are
    deterministic and still produce a working partitioned index (the full
    corpus is assigned to the sampled-trained centroids; a full probe over
    them equals exact search, independent of training-set size)."""
    from archivesspace_virgo_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        ivf_train,
        write_ivf_embeddings,
    )

    c1 = ivf_train(emb, n_lists=8, n_iter=2, sample_fraction=0.5)
    c2 = ivf_train(emb, n_lists=8, n_iter=2, sample_fraction=0.5)
    assert (c1 == c2).all()  # seeded sample → deterministic training
    path = str(tmp_path / "ivf_sampled")
    write_ivf_embeddings(emb, c1, path)
    query = [0.1] * len(emb.select("embedding").head(1)[0][0])
    full = ivf_topk(spark, path, c1, query, k=5, nprobe=8)
    exact = cosine_topk(emb, query, k=5)
    assert [(r["vec_id"], round(r["cos"], 9)) for r in full.collect()] == \
        [(r["vec_id"], round(r["cos"], 9)) for r in exact.collect()]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        ivf_train(emb, n_lists=8, sample_fraction=0.0)
