"""J6 — HTTP manifest enrichment join (ASpaceObject.java:511-549).

The reference fetches one IIIF manifest JSON per digital object (bounded to
5 per record, ASpaceObject.java:409) and projects label / thumbnail /
license / id out of it.  The Spark-native shape is a ``mapInPandas``
enrichment stage: URLs ride Arrow batches into a Python worker, the fetch
function is called once per distinct URL within the batch, and the
projected fields come back as plain columns — the same plumbing pattern as
the multimodal decode stage (operators/multimodal.py).

The fetch function is INJECTED.  Network I/O cannot run in this sandbox
(and a test must never depend on a live endpoint — the reference itself
mocks its client in tests, ASpaceAccessionTest.java:34), so:

- tests/production-with-cache pass ``fetch=`` explicitly;
- ``fake_manifest_fetch`` is the deterministic stand-in used in tests;
- ``urllib_fetch`` is the real-network default for cluster deployments,
  import-gated and never exercised here.

At scale: the enrichment stage is embarrassingly parallel (one HTTP pool
per executor), and callers bound fan-out per record upstream exactly like
the reference's ≤5 guard (topn_per_group / limit).
"""

from __future__ import annotations

import json
from typing import Callable, Iterator, Optional, Sequence

import pandas as pd
from pyspark.sql import DataFrame

#: manifest fields the reference projects (ASpaceObject.java:519-543)
MANIFEST_FIELDS = ("label", "thumbnail", "license", "manifest_id")


def fake_manifest_fetch(url: str) -> str:
    """Deterministic manifest JSON for tests: every field derivable from the
    URL alone, so Spark output has an exact oracle."""
    tail = url.rstrip("/").rsplit("/", 1)[-1]
    return json.dumps({
        "label": f"Manifest {tail}",
        "thumbnail": {"@id": f"{url}/thumb.jpg"},
        "license": "http://creativecommons.org/publicdomain/zero/1.0/",
        "@id": url,
    })


def urllib_fetch(url: str, timeout: float = 10.0) -> str:
    """Real-network fetch for cluster deployments (never used in tests)."""
    from urllib.request import urlopen  # local import: keep workers lean

    with urlopen(url, timeout=timeout) as r:  # noqa: S310 (caller-audited URL)
        return r.read().decode("utf-8")


def _project(doc: dict) -> dict:
    thumb = doc.get("thumbnail")
    if isinstance(thumb, dict):
        thumb = thumb.get("@id")
    return {
        "label": doc.get("label"),
        "thumbnail": thumb,
        "license": doc.get("license"),
        "manifest_id": doc.get("@id"),
    }


def http_manifest_join(
    df: DataFrame,
    url_col: str,
    fetch: Optional[Callable[[str], str]] = None,
    fields: Sequence[str] = MANIFEST_FIELDS,
) -> DataFrame:
    """Enrich each row with fields projected from the manifest at
    ``url_col``.  NULL urls pass through with NULL manifest fields (the
    reference skips objects without file versions).  Fetch failures yield
    NULL fields rather than failing the stage (the reference's per-record
    fail-soft, IndexRecords.java:97-101)."""
    fetch = fetch or urllib_fetch
    out_schema = df.schema.simpleString()[7:-1] + "".join(
        f",{f}:string" for f in fields
    )

    def enrich(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cache: dict = {}  # per-batch memo — the reference memoizes per object
            cols = {f: [] for f in fields}
            for url in pdf[url_col]:
                if url is None or (isinstance(url, float) and pd.isna(url)):
                    proj = dict.fromkeys(fields)
                else:
                    if url not in cache:
                        try:
                            cache[url] = _project(json.loads(fetch(url)))
                        except Exception:  # fail-soft per record
                            cache[url] = dict.fromkeys(fields)
                    proj = cache[url]
                for f in fields:
                    cols[f].append(proj.get(f))
            for f in fields:
                pdf[f] = pd.Series(cols[f], index=pdf.index, dtype=object)
            yield pdf

    return df.mapInPandas(enrich, schema=out_schema)
