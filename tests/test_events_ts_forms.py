"""Both physical forms of events.ts load identically.

The driver's generator has shipped ``ts`` as nanosecond INT64 (rounds
<= 3) and as microsecond TIMESTAMP (round 4+); io.events_read_plan
sniffs the parquet footer and io.normalize_events_ts converts either
to session-tz TIMESTAMP.  The micro form is exercised by every events
query against the live testdata — this module keeps the NANO branch
alive with a synthetic fixture, because a driver-side regeneration
back to nanos would otherwise hit untested code in every events
query's scan path."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hypertension_dashboard_pipeline_spark import io as eio

ROWS = [
    (1, dt.datetime(2024, 1, 1, 10, 0, 7, 179575), 11, "view", 1.5, "{}"),
    (2, dt.datetime(2024, 1, 2, 23, 59, 59, 999999), 12, "click", 2.5, "{}"),
]


def _write_events(tmpdir: str, ts_type: pa.DataType) -> str:
    ts = [r[1] for r in ROWS]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in ROWS], pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")).cast(ts_type),
            "user_id": pa.array([r[2] for r in ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in ROWS]),
            "value": pa.array([r[4] for r in ROWS], pa.float64()),
            "props": pa.array([r[5] for r in ROWS]),
        }
    )
    pq.write_table(tbl, f"{tmpdir}/events.parquet")
    return tmpdir


@pytest.mark.parametrize("form", ["us", "ns"])
def test_both_ts_forms_load_to_identical_timestamps(spark, tmp_path, form):
    sf_dir = _write_events(str(tmp_path), pa.timestamp(form))
    schema, raw_nanos = eio.events_read_plan(sf_dir)
    assert raw_nanos == (form == "ns")
    got = {
        r.event_id: r.ts
        for r in eio.load_table(spark, sf_dir, "events").collect()
    }
    assert got == {r[0]: r[1] for r in ROWS}


def test_nano_form_reads_ts_as_long_pre_normalization(spark, tmp_path):
    """The nano path must declare ts as INT64 in the reader schema —
    letting Spark parse it as TIMESTAMP would either fail or silently
    mis-scale, which is the original round-boundary hazard."""
    sf_dir = _write_events(str(tmp_path), pa.timestamp("ns"))
    schema, raw_nanos = eio.events_read_plan(sf_dir)
    assert raw_nanos
    ts_field = next(f for f in schema.fields if f.name == "ts")
    assert ts_field.dataType.typeName() == "long"
