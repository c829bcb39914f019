"""duplicate_clusters convergence contract: min-label propagation must
either converge within max_rounds or fail loudly — a silently partial
clustering returns WRONG keepers (ADVICE round 2)."""

import pytest
from pyspark.sql import functions as F

from archivesspace_virgo_spark.operators.dedup import duplicate_clusters


def _chain_pairs(spark, n):
    # path graph 0-1-2-...-n: label 0 needs ~n rounds to reach node n
    return spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )


def test_converges_on_shallow_chain(spark):
    out = duplicate_clusters(_chain_pairs(spark, 5), max_rounds=20)
    rows = {r["doc_id"]: r["keeper"] for r in out.collect()}
    assert rows == {i: 0 for i in range(6)}


def test_raises_on_non_convergence(spark):
    # chain deeper than the round budget: must raise, never return a
    # partially-propagated labelling
    with pytest.raises(RuntimeError, match="did not converge"):
        duplicate_clusters(_chain_pairs(spark, 12), max_rounds=2).collect()


def test_exact_round_budget_converges(spark):
    # enough rounds (+1 no-change round to detect the fixpoint) succeeds
    out = duplicate_clusters(_chain_pairs(spark, 6), max_rounds=8)
    assert {r["keeper"] for r in out.collect()} == {0}
