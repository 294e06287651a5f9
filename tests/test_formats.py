"""read_table round-trips the same rows from parquet, CSV, JSONL and Arrow
IPC copies of the events table."""
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ccl_ray.sources.formats import read_table

SF = "/root/testdata/sf0.001/events.parquet"
COLS = ["event_id", "ts", "user_id", "event_type", "value"]


def _want() -> pd.DataFrame:
    return (
        pq.read_table(SF, columns=COLS)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )


def _got(ds) -> pd.DataFrame:
    return ds.to_pandas().sort_values("event_id").reset_index(drop=True)[COLS]


def test_parquet_passthrough():
    pd.testing.assert_frame_equal(
        _got(read_table(SF, columns=COLS)), _want()
    )


def test_csv_roundtrip(tmp_path):
    df = _want()
    p = str(tmp_path / "events.csv")
    df.to_csv(p, index=False, date_format="%Y-%m-%d %H:%M:%S.%f")
    schema = pa.schema(
        [("event_id", pa.int64()), ("ts", pa.timestamp("us")),
         ("user_id", pa.int64()), ("event_type", pa.string()),
         ("value", pa.float64())]
    )
    got = _got(read_table(p, columns=COLS, schema=schema))
    pd.testing.assert_frame_equal(got, df)


def test_jsonl_roundtrip(tmp_path):
    df = _want()
    p = str(tmp_path / "events.jsonl")
    out = df.copy()
    out["ts"] = out["ts"].dt.strftime("%Y-%m-%d %H:%M:%S.%f")
    out.to_json(p, orient="records", lines=True)
    schema = pa.schema(
        [("event_id", pa.int64()), ("ts", pa.timestamp("us")),
         ("user_id", pa.int64()), ("event_type", pa.string()),
         ("value", pa.float64())]
    )
    got = _got(read_table(p, columns=COLS, schema=schema))
    pd.testing.assert_frame_equal(got, df)


def test_arrow_ipc_roundtrip(tmp_path):
    tbl = pq.read_table(SF, columns=COLS)
    p = str(tmp_path / "events.arrow")
    with pa.OSFile(p, "wb") as sink:
        with pa.ipc.new_file(sink, tbl.schema) as w:
            w.write_table(tbl)
    got = _got(read_table(p))
    pd.testing.assert_frame_equal(got, _want())


def test_infer_format_rejects_unknown(tmp_path):
    import pytest

    with pytest.raises(ValueError):
        read_table(str(tmp_path / "events.xyz"))
