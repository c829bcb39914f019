"""ETL parity operators from the reference pipeline (SURVEY.md §2.2-§2.7).

Each operator is a Spark Column/DataFrame function plus a co-maintained
DuckDB SQL fragment used by the driver's correctness oracle.  Reference
citations point at /root/reference (the behavior source; implementations are
Spark-first, not ports).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# O1 — natural-order sort key (StringNaturalCompare.java:84-145)
# "Box 2" < "Box 10": digit runs compare numerically, text case-folds.
# Instead of a comparator (not expressible in SQL engines), derive a sort KEY:
# split into digit / non-digit runs; zero-pad digit runs to 20; lowercase text.
# Divergence noted: the reference's leading-zero "fractional" branch
# (compareLeft, :57-82) is not reproduced — zero-padding gives plain numeric
# order for those inputs.
# ---------------------------------------------------------------------------

NATURAL_RUNS_PATTERN = "([0-9]+|[^0-9]+)"


def natural_sort_key(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    runs = F.regexp_extract_all(c, F.lit(NATURAL_RUNS_PATTERN), 1)
    keyed = F.transform(
        runs,
        lambda p: F.when(p.rlike("^[0-9]+$"), F.lpad(p, 20, "0")).otherwise(
            F.lower(p)
        ),
    )
    return F.array_join(keyed, "")


def natural_sort_key_sql(expr: str) -> str:
    return (
        "list_aggregate(list_transform("
        f"regexp_extract_all({expr}, '{NATURAL_RUNS_PATTERN}', 1), "
        "p -> CASE WHEN regexp_matches(p, '^[0-9]+$') THEN lpad(p, 20, '0') "
        "ELSE lower(p) END), 'string_agg', '')"
    )


# ---------------------------------------------------------------------------
# F5 — date bucketing (ASpaceObject.java:322-337): stacked "years ago"
# facet labels.  Reference thresholds: >50 / <=50 / <=10 / <=3 / <=1.
# A FIXED reference year keeps both engines deterministic (the reference uses
# wall-clock yearsAgo; pinning it is the hermetic-test adaptation).
# ---------------------------------------------------------------------------

REFERENCE_YEAR = 2026
_BUCKETS = [(1, "last1"), (3, "last3"), (10, "last10"), (50, "last50")]


def date_bucket_labels(year_col: Column | str, ref_year: int = REFERENCE_YEAR) -> Column:
    y = F.col(year_col) if isinstance(year_col, str) else year_col
    age = F.lit(ref_year) - y
    labels = [F.when(age <= n, F.lit(lab)).otherwise(F.lit(None)) for n, lab in _BUCKETS]
    labels.append(F.when(age > 50, F.lit("over50")).otherwise(F.lit(None)))
    arr = F.array_compact(F.array(*labels))
    return F.array_join(arr, ",")


def date_bucket_labels_sql(year_expr: str, ref_year: int = REFERENCE_YEAR) -> str:
    age = f"({ref_year} - {year_expr})"
    parts = [
        f"CASE WHEN {age} <= {n} THEN 'last{n}' END" for n, _ in _BUCKETS
    ]
    parts.append(f"CASE WHEN {age} > 50 THEN 'over50' END")
    return (
        "array_to_string(list_filter([" + ", ".join(parts) + "], x -> x IS NOT NULL), ',')"
    )


# ---------------------------------------------------------------------------
# F1/F2 — id normalization + null-skipping concat (ASpaceObject.java:205-224)
# ---------------------------------------------------------------------------

def normalize_id(col: Column | str) -> Column:
    """replace('-','_'), strip '/' and spaces, uppercase (F1)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.upper(F.regexp_replace(F.regexp_replace(c, "-", "_"), "[/ ]", ""))


def normalize_id_sql(expr: str) -> str:
    return f"upper(regexp_replace(replace({expr}, '-', '_'), '[/ ]', '', 'g'))"


# F10/F11 — coalesce-with-derived-fallback (ASpaceTopContainer.java:80-101)

def coalesce_or_derived(primary: Column, fallback: Column) -> Column:
    return F.coalesce(primary, fallback)


# ---------------------------------------------------------------------------
# O5 — MARC non-filing-indicator sort prep (ASpaceObject.java:660-665):
# leading-article offset ('A ' -> 2, 'The ' -> 4, else 0)
# ---------------------------------------------------------------------------

def nonfiling_offset(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(c.startswith("The "), F.lit(4))
        .when(c.startswith("A "), F.lit(2))
        .otherwise(F.lit(0))
    )


def nonfiling_offset_sql(expr: str) -> str:
    return (
        f"CASE WHEN starts_with({expr}, 'The ') THEN 4 "
        f"WHEN starts_with({expr}, 'A ') THEN 2 ELSE 0 END"
    )


# ---------------------------------------------------------------------------
# F9 — capture-group regex rewrite (thumbnail resize,
# ASpaceObject.java:531-540): insert a size spec between /full/ and the rest
# ---------------------------------------------------------------------------

THUMB_PATTERN = "(https://.*/full/)[^/]*(/.*)"


def thumbnail_resize(col: Column | str, size: str = "!115,125") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, THUMB_PATTERN, f"$1{size}$2")


def thumbnail_resize_sql(expr: str, size: str = "!115,125") -> str:
    return rf"regexp_replace({expr}, '{THUMB_PATTERN}', '\1{size}\2')"


# ---------------------------------------------------------------------------
# F15 — year -> ISO timestamp (aspace-solr-v3-to-v4.xsl:67-71):
# published_date = concat(year, '-01-01T00:00:00Z')
# ---------------------------------------------------------------------------

def year_to_timestamp(year_col: Column | str) -> Column:
    y = F.col(year_col) if isinstance(year_col, str) else year_col
    return F.to_timestamp(F.concat(y.cast("string"), F.lit("-01-01T00:00:00Z")))


def year_to_timestamp_sql(year_expr: str) -> str:
    return (
        f"strptime(CAST({year_expr} AS VARCHAR) || '-01-01T00:00:00Z', "
        "'%Y-%m-%dT%H:%M:%SZ')"
    )


# ---------------------------------------------------------------------------
# P4 — shadow gate on projection (ASpaceObject.java:256-258): shadowed rows
# emit only skeletal fields; visible rows get the full enrichment block
# ---------------------------------------------------------------------------

def shadow_gate(shadowed: Column, skeletal: Column, enriched: Column) -> Column:
    return F.when(shadowed, skeletal).otherwise(enriched)


# ---------------------------------------------------------------------------
# Table-level parity ops
# ---------------------------------------------------------------------------

def collect_json_array(df: DataFrame, key: str, cols: list[str]) -> DataFrame:
    """A2 — collect rows into ONE JSON-array-of-objects string per key
    (containers -> special_collections_holding_display,
    ASpaceObject.java:377-404).  Order-stable via array_sort on the struct
    (field-order comparison) so the output is deterministic."""
    return df.groupBy(key).agg(
        F.to_json(F.array_sort(F.collect_list(F.struct(*cols)))).alias("json_arr")
    )


def string_agg(df: DataFrame, key: str, value: str, sep: str = "\n") -> DataFrame:
    """A1 — order-stable string aggregation (subnote concat,
    ASpaceObject.java:449-458)."""
    return df.groupBy(key).agg(
        F.array_join(F.sort_array(F.collect_list(value)), sep).alias("agg_value")
    )


def dedup_min_by_key(df: DataFrame, dup_key: str, keep_col: str) -> DataFrame:
    """A3 — dedup on a key keeping the min surviving id
    (containers deduped on call_number, ASpaceObject.java:497-509)."""
    return df.groupBy(dup_key).agg(F.min(keep_col).alias("kept"))


def shadowed_anti_join(fact: DataFrame, dim: DataFrame, key: str) -> DataFrame:
    """J4/P2 — rows with NO published counterpart (left anti,
    ASpaceAccession.java:40-52)."""
    return fact.join(dim, key, "left_anti")


def existing_semi_join(fact: DataFrame, dim: DataFrame, key: str) -> DataFrame:
    """J3-style dirty-key semi join (IndexRecords.java:141-167)."""
    return fact.join(dim, key, "left_semi")
