"""Value pinning for the rows-only multimodal decode stub: the driver
only checks rows for ops without oracle SQL, so exact expected values
are computed here in pure Python from the same fixture."""

from __future__ import annotations

import pyarrow.parquet as pq

from etl_intraday_bidask_spark.registry import load_all_operators
from tests.conftest import SF_SMALL

REGISTRY = load_all_operators()


def expected_decode_aggregates() -> dict[str, tuple[int, int, int]]:
    table = pq.read_table(f"{SF_SMALL}/documents.parquet").to_pydict()
    agg: dict[str, list[int]] = {}
    for doc_id, text in zip(table["doc_id"], table["text"]):
        media_type = ["image", "audio", "video"][doc_id % 3]
        payload = text.encode("utf-8")
        row = agg.setdefault(media_type, [0, 0, 0])
        row[0] += 1
        row[1] += len(payload)
        row[2] += sum(payload[:16])
    return {k: tuple(v) for k, v in agg.items()}


def test_decode_stub_matches_python_reference(spark):
    result = REGISTRY["multimodal_decode_stub"].spark_fn(spark, SF_SMALL)
    got = {
        r["media_type"]: (r["n_media"], r["total_bytes"], r["sum_head16"])
        for r in result.collect()
    }
    assert got == expected_decode_aggregates()
