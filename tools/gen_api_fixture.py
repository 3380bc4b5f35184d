"""Generate the committed EP1 API-doc fixture (FIXTURES.md F2).

``fixtures/api_docs.parquet`` is a deterministic, network-free recording of
a CM ``impalaQueries`` response batch — one row per query doc in the
``API_DOC_SCHEMA`` shape (reference ``impala_query_sizing.py:189-208``),
with the F2 edge cases baked in:

- ~1/37 of docs OMIT ``memory_aggregate_peak`` → the D1 skip route;
- 1/20 DDL + 1/20 DML docs (the server filter would drop them; the
  flatten oracle routes them explicitly);
- a few docs with a NULL ``attributes`` map (every extraction → NULL);
- byte counts up to ~8 TB so the GB conversion exercises large values
  that are still exact doubles (< 2^53).

All values derive from pure integer arithmetic on the row index — no RNG,
no clock — so re-running this script reproduces the identical file and
``sizing_api_flatten``'s oracle hash is stable across machines. Written
with pyarrow (not Spark) so the fixture is ONE file and its MAP column is
read identically by Spark and DuckDB.

Usage: python tools/gen_api_fixture.py [n_docs]
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

N_DOCS = 3000

POOLS = ["etl", "bi", "adhoc", "click", "batch"]


def make_doc(i: int) -> dict:
    if i % 501 == 500:
        attrs = None  # NULL map: every element_at → NULL, skip-routed
    else:
        attrs = {
            "pool": POOLS[i % 5],
            "hdfs_bytes_read": str((i * 2654435761) % (8 << 40)),
            "memory_spilled": str(0 if i % 10 < 7 else (i * 97) % (1 << 40)),
            "thread_cpu_time": str((i * 7919 + 31) % 86_400_000),
            "admission_wait": str((i * 13) % 250),
            "num_backends": str(1 + i % 40),
        }
        if i % 37 != 0:
            attrs["memory_aggregate_peak"] = str((i * 40503) % (2 << 40))
    return {
        "queryId": f"api-{i:08d}",
        "startTime": (
            f"2024-03-{1 + i % 28:02d}T{i % 24:02d}:"
            f"{(i * 7) % 60:02d}:{(i * 13) % 60:02d}.{i % 1000:03d}Z"
        ),
        "endTime": (
            f"2024-03-{1 + i % 28:02d}T{(i + 1) % 24:02d}:"
            f"{(i * 11) % 60:02d}:{(i * 17) % 60:02d}.{(i * 3) % 1000:03d}Z"
        ),
        "durationMillis": 500 + (i * 7919) % 7_200_000,
        "queryState": "EXCEPTION" if i % 50 == 0 else "FINISHED",
        "user": f"user_{i % 17}",
        "queryType": "DDL" if i % 20 == 0 else ("DML" if i % 20 == 1 else "QUERY"),
        "attributes": attrs,
    }


def main(n_docs: int = N_DOCS) -> Path:
    docs = [make_doc(i) for i in range(n_docs)]
    schema = pa.schema(
        [
            ("queryId", pa.string()),
            ("startTime", pa.string()),
            ("endTime", pa.string()),
            ("durationMillis", pa.int64()),
            ("queryState", pa.string()),
            ("user", pa.string()),
            ("queryType", pa.string()),
            ("attributes", pa.map_(pa.string(), pa.string())),
        ]
    )
    table = pa.Table.from_pylist(docs, schema=schema)
    out = Path(__file__).resolve().parent.parent / "fixtures" / "api_docs.parquet"
    out.parent.mkdir(exist_ok=True)
    pq.write_table(table, out)
    print(f"wrote {out} ({n_docs} docs, {out.stat().st_size} bytes)")
    return out


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else N_DOCS)
