"""S9 — MARC21 (ISO 2709) circulation-record sink.

The reference emits one MARC record per object for the circulation system
(ASpaceObject.java:649-692, via marc4j): control field 001 = record id,
data field 245 (ind2 = non-filing offset '0'/'2'/'4' per leading article)
with subfield a = title, 590 with subfield a = "From ArchivesSpace: <uri>",
and one 949 per top container (a = call number, h = location constant,
i = barcode).

Spark-native rendering: the record assembly is a plain projection (arrays
of (tag, data) structs built with codegen expressions); only the final
ISO 2709 byte packing runs in Python — an Arrow-batched ``mapInPandas``
kernel, because a binary wire format with internal byte offsets is exactly
the per-record formatting work a sink kernel is for.  The payload never
shuffles; write the result with ``df.write`` to any store.

Leader layout (fixed choices, deterministic): 'nam a22' + base + ' a 4500',
UTF-8 throughout.
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FT = b"\x1e"   # field terminator
RT = b"\x1d"   # record terminator
SF = b"\x1f"   # subfield delimiter
LOCATION = "SC-STACKS-MANUSCRIPT"

MARC_OUT_SCHEMA = "id string, marc binary"


def encode_marc(fields: List[Tuple[str, bytes]]) -> bytes:
    """Pack (tag, field-data) pairs into one ISO 2709 record.  ``field-data``
    excludes the field terminator (added here)."""
    directory = b""
    data = b""
    for tag, fdata in fields:
        fdata = fdata + FT
        # ISO 2709 directory slots are fixed-width (4-digit length, 5-digit
        # offset); overflow would silently shift every later entry and make
        # the record unreadable — fail loudly instead
        if len(fdata) > 9999:
            raise ValueError(
                f"MARC field {tag} is {len(fdata)} bytes; ISO 2709 caps a "
                "field at 9999 (truncate the source value first)"
            )
        if len(data) > 99999 - len(fdata):
            raise ValueError(
                "MARC record data section exceeds the ISO 2709 99999-byte "
                "offset limit"
            )
        directory += f"{tag}{len(fdata):04d}{len(data):05d}".encode()
        data += fdata
    directory += FT
    base = 24 + len(directory)
    record_len = base + len(data) + 1
    if record_len > 99999:
        raise ValueError(
            f"MARC record is {record_len} bytes; ISO 2709 caps a record at "
            "99999"
        )
    leader = f"{record_len:05d}nam a22{base:05d} a 4500".encode()
    assert len(leader) == 24
    return leader + directory + data + RT


def decode_marc(record: bytes) -> List[Tuple[str, bytes]]:
    """Inverse of ``encode_marc`` (round-trip tests / downstream readers)."""
    base = int(record[12:17])
    directory = record[24:base - 1]
    out = []
    for i in range(0, len(directory), 12):
        tag = directory[i:i + 3].decode()
        length = int(directory[i + 3:i + 7])
        start = int(directory[i + 7:i + 12])
        out.append((tag, record[base + start:base + start + length - 1]))
    return out


def _datafield(ind1: str, ind2: str, subfields: List[Tuple[str, str]]) -> bytes:
    body = b"".join(
        SF + code.encode() + (value or "").encode("utf-8")
        for code, value in subfields
    )
    return ind1.encode() + ind2.encode() + body


def marc_circulation_records(
    df: DataFrame,
    id_col: str = "id",
    title_col: str = "title",
    uri_col: str = "uri",
    containers_col: str = "containers",
) -> DataFrame:
    """(id, marc binary) — one ISO 2709 circulation record per input row.

    ``containers_col``: array<struct<call_number string, barcode string>>
    (one 949 field each, in array order).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rid, title, uri, containers in zip(
                pdf["_id"], pdf["_title"], pdf["_uri"], pdf["_containers"]
            ):
                title = title or ""
                nonfiling = "0"
                if title.startswith("A "):
                    nonfiling = "2"
                elif title.startswith("The "):
                    nonfiling = "4"
                fields: List[Tuple[str, bytes]] = [
                    ("001", str(rid).encode()),
                    ("245", _datafield("0", nonfiling, [("a", title)])),
                    ("590", _datafield("1", " ",
                                       [("a", f"From ArchivesSpace: {uri}")])),
                ]
                for c in (containers if containers is not None else []):
                    fields.append((
                        "949",
                        _datafield(" ", " ", [
                            ("a", c["call_number"]),
                            ("h", LOCATION),
                            ("i", c["barcode"]),
                        ]),
                    ))
                out.append((str(rid), encode_marc(fields)))
            yield pd.DataFrame(out, columns=["id", "marc"])

    cols = df.select(
        F.col(id_col).cast("string").alias("_id"),
        F.col(title_col).alias("_title"),
        F.col(uri_col).alias("_uri"),
        F.col(containers_col).alias("_containers"),
    )
    return cols.mapInPandas(run, schema=MARC_OUT_SCHEMA)
