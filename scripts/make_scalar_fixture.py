"""Generate the committed scalar clips fixture (_fixtures/clips_scalar.parquet):
the TINY clips table WITHOUT the bytes payload (pure-Python generation, one
small file) so DuckDB oracle SQL can read it without running Spark first."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

from protovalidate_spark.fixtures import TINY, py_row


def main():
    rows = [py_row(i, TINY) for i in range(TINY.n_rows)]
    import datetime as dt
    epoch = dt.date(2026, 1, 1)
    table = pa.table({
        "row_idx": pa.array([r["row_idx"] for r in rows], pa.int64()),
        "clip_id": pa.array([r["clip_id"] for r in rows], pa.string()),
        "sr_hz": pa.array([r["sr_hz"] for r in rows], pa.int32()),
        "dur_ms": pa.array([r["dur_ms"] for r in rows], pa.int32()),
        "codec": pa.array([r["codec"] for r in rows], pa.string()),
        "transcript": pa.array([r["transcript"] for r in rows], pa.string()),
        "part_date": pa.array(
            [epoch + dt.timedelta(days=r["part"]) for r in rows], pa.date32()),
    })
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "_fixtures", "clips_scalar.parquet")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pq.write_table(table, out)
    print(out, os.path.getsize(out), "bytes,", table.num_rows, "rows")


if __name__ == "__main__":
    main()
