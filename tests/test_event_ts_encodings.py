"""The events fixture has shipped ``ts`` as INT64 TIMESTAMP(NANOS) in
one generation and native TIMESTAMP(MICROS) in another; the event
source must read both identically (sources/tables.py::event_ts_column).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from ecom_churn_lakehouse_spark.sources.tables import load_events

SF = "/root/testdata/sf0.001"


def _rewrite(tmp_path, unit: str) -> str:
    tbl = pq.read_table(f"{SF}/events.parquet")
    ts = tbl["ts"].cast(pa.timestamp(unit))
    tbl = tbl.set_column(tbl.schema.get_field_index("ts"), "ts", ts)
    out = tmp_path / unit
    out.mkdir()
    pq.write_table(tbl, str(out / "events.parquet"))
    return str(out)


def test_nanos_and_micros_encodings_read_identically(spark, tmp_path):
    us_dir = _rewrite(tmp_path, "us")
    ns_dir = _rewrite(tmp_path, "ns")

    us = load_events(spark, us_dir)
    ns = load_events(spark, ns_dir)
    assert us.schema == ns.schema
    assert us.schema["ts"].dataType.typeName() == "timestamp"

    us_rows = sorted(
        (r["event_id"], r["ts"]) for r in us.select("event_id", "ts").collect()
    )
    ns_rows = sorted(
        (r["event_id"], r["ts"]) for r in ns.select("event_id", "ts").collect()
    )
    assert us_rows == ns_rows
    assert len(us_rows) > 0
