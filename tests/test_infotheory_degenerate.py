"""Degenerate-corpus fixture for ``rel_entropy_jsd`` (r9 ADVICE).

If the corpus is entirely one segment (all-weekday events) the mixture
ratio would divide by zero; before the guard, Spark returned an empty
frame while the DuckDB oracle's scalar subqueries produced a NULL/inf
row — a parity divergence on degenerate input. Both dialects now filter
the identical ``np > 0 AND nq > 0`` predicate, so the degenerate case is
a DEFINED result: 0 rows from both engines, pinned here.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from impala_base_to_cdw_sizing_spark.operators.infotheory import (
    _DAY_NS,
    SQL_ENTROPY_JSD,
    q_entropy_jsd,
)
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def weekday_only_dir(tmp_path_factory) -> str:
    """sf0.001 events restricted to weekday rows (seg 0) only."""
    out = tmp_path_factory.mktemp("weekday_events")
    src = pq.read_table(f"{SF_SMALL}/events.parquet")
    pdf = src.to_pandas()
    ns = pdf["ts"].astype("datetime64[ns]").astype("int64")
    weekend = ((ns // _DAY_NS + 3) % 7) >= 5
    kept = pdf[~weekend.to_numpy()]
    assert 0 < len(kept) < len(pdf)  # fixture really drops a segment
    pq.write_table(
        pa.Table.from_pandas(kept, schema=src.schema, preserve_index=False),
        f"{out}/events.parquet",
    )
    return str(out)


def test_degenerate_segment_defined_and_parity_checked(spark, weekday_only_dir):
    sdf = q_entropy_jsd(spark, weekday_only_dir)
    assert sdf.count() == 0

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{weekday_only_dir}/events.parquet')"
    )
    duck = con.execute(SQL_ENTROPY_JSD).fetch_df()
    con.close()
    assert len(duck) == 0
