"""S9 MARC circulation sink: ISO 2709 structural round-trip + field parity
with the reference's record shape (ASpaceObject.java:649-692)."""

from pyspark.sql import functions as F

from archivesspace_virgo_spark.operators.marc import (
    LOCATION,
    decode_marc,
    encode_marc,
    marc_circulation_records,
)


def test_encode_decode_roundtrip():
    fields = [
        ("001", b"as:123"),
        ("245", b"04\x1faThe Papers"),
        ("949", b"  \x1faMSS 1\x1fhX\x1fiB-1"),
    ]
    rec = encode_marc(fields)
    # leader arithmetic: record length and base address are self-describing
    assert int(rec[0:5]) == len(rec)
    assert rec.endswith(b"\x1d")
    assert decode_marc(rec) == fields


def test_encode_rejects_oversize_field_and_record():
    # ISO 2709 directory slots are fixed-width; overflow must raise, not
    # silently corrupt every subsequent directory entry (ADVICE round 2)
    import pytest

    with pytest.raises(ValueError, match="9999"):
        encode_marc([("245", b"x" * 10000)])
    # many max-size fields overflowing the 5-digit offset/record budget
    big = [("500", b"x" * 9000) for _ in range(12)]
    with pytest.raises(ValueError, match="99999"):
        encode_marc(big)
    # a max-size single field still round-trips
    ok = encode_marc([("245", b"x" * 9998)])
    assert decode_marc(ok) == [("245", b"x" * 9998)]


def test_circulation_records(spark):
    rows = [
        (1, "The Jefferson Papers", "/repositories/3/resources/1",
         [("MSS 38-113", "X001"), ("MSS 38-114", "X002")]),
        (2, "A Small Archive", "/repositories/3/resources/2", []),
        (3, "Letters", "/repositories/3/resources/3", None),
    ]
    df = spark.createDataFrame(
        rows,
        "id long, title string, uri string, "
        "containers array<struct<call_number string, barcode string>>",
    )
    out = {r["id"]: bytes(r["marc"])
           for r in marc_circulation_records(df).collect()}

    f1 = decode_marc(out["1"])
    tags = [t for t, _ in f1]
    assert tags == ["001", "245", "590", "949", "949"]
    # 245: ind1='0', ind2=nonfiling ('4' for 'The ')
    t245 = dict(f1)["245"]
    assert t245[:2] == b"04"
    assert b"\x1faThe Jefferson Papers" in t245
    assert dict(f1)["590"].startswith(b"1 ")
    assert b"From ArchivesSpace: /repositories/3/resources/1" in dict(f1)["590"]
    first949 = [d for t, d in f1 if t == "949"][0]
    assert (b"\x1faMSS 38-113" in first949
            and f"\x1fh{LOCATION}".encode() in first949
            and b"\x1fiX001" in first949)

    f2 = decode_marc(out["2"])
    assert [t for t, _ in f2] == ["001", "245", "590"]
    assert dict(f2)["245"][:2] == b"02"  # 'A ' -> nonfiling 2

    f3 = decode_marc(out["3"])  # null containers -> no 949s
    assert [t for t, _ in f3] == ["001", "245", "590"]
    assert dict(f3)["245"][:2] == b"00"


def test_sink_write(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "T", "/r/1", [("C1", "B1")])],
        "id long, title string, uri string, "
        "containers array<struct<call_number string, barcode string>>",
    )
    out = str(tmp_path / "marc")
    marc_circulation_records(df).write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out).collect()
    assert len(back) == 1
    assert decode_marc(bytes(back[0]["marc"]))[0] == ("001", b"1")
