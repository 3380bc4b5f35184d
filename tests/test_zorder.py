"""Z-order clustering must deliver MEASURED two-dimensional data
skipping: per-file parquet footer min/max stats (the exact metadata a
scan's row-group skipping reads) get tighter in BOTH dimensions, where
a linear sort is compact in one and full-range in the other."""

from __future__ import annotations

from pathlib import Path

import pyarrow.parquet as pq

from impala_base_to_cdw_sizing_spark.sinks.layout import write_zordered

N = 40_000
DOMAIN = 512  # x and y are independent uniforms over [0, DOMAIN)
# 16 files = the top 4 Morton bits (y,x,y,x) → a symmetric 4×4 grid, so
# BOTH dimensions split twice; an odd bit budget favors one dimension
N_FILES = 16


def _file_ranges(path: str, cols: list[str]) -> list[dict[str, tuple]]:
    out = []
    for f in sorted(Path(path).glob("part-*.parquet")):
        md = pq.ParquetFile(str(f)).metadata
        schema_names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            for c in cols:
                st = md.row_group(rg).column(schema_names[c]).statistics
                lo[c] = st.min if lo[c] is None else min(lo[c], st.min)
                hi[c] = st.max if hi[c] is None else max(hi[c], st.max)
        out.append({c: (lo[c], hi[c]) for c in cols})
    return out


def _mean_span(ranges, col):
    return sum(hi - lo for lo, hi in (r[col] for r in ranges)) / len(ranges)


def _files_hit(ranges, col, lo, hi):
    return sum(1 for r in ranges if not (r[col][1] < lo or r[col][0] > hi))


def test_zorder_tightens_both_dimensions_and_skips_files(spark, tmp_path):
    df = spark.range(N).selectExpr(
        "CAST(id % {d} AS BIGINT) AS x".format(d=DOMAIN),
        "CAST((id * 7919) % {d} AS BIGINT) AS y".format(d=DOMAIN),
    )
    linear = str(tmp_path / "linear")
    (
        df.repartitionByRange(N_FILES, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(linear)
    )
    zpath = str(tmp_path / "zorder")
    write_zordered(df, zpath, "x", "y", n_files=N_FILES)

    lin = _file_ranges(linear, ["x", "y"])
    zo = _file_ranges(zpath, ["x", "y"])
    assert len(lin) == len(zo) == N_FILES

    # linear: compact in x, ~full-domain in y per file
    assert _mean_span(lin, "x") < DOMAIN / 4
    assert _mean_span(lin, "y") > DOMAIN * 0.9
    # z-order: BOTH dimensions bounded well under the domain
    assert _mean_span(zo, "x") < DOMAIN * 0.6
    assert _mean_span(zo, "y") < DOMAIN * 0.6

    # the operational consequence: a narrow y-band predicate intersects
    # (= must scan) every linear file but only a strip of the z grid —
    # and the x-band case, which the linear layout also handles, still
    # skips at least half the z files (the 2-D compromise is bounded)
    y_lo, y_hi = 100, 120
    assert _files_hit(lin, "y", y_lo, y_hi) == N_FILES
    assert _files_hit(zo, "y", y_lo, y_hi) <= N_FILES // 2
    assert _files_hit(zo, "x", 100, 120) <= N_FILES // 2

    # layout changed, content did not
    a = spark.read.parquet(linear)
    b = spark.read.parquet(zpath)
    assert a.count() == b.count() == N
    assert a.selectExpr("sum(x * 13 + y)").first()[0] == (
        b.selectExpr("sum(x * 13 + y)").first()[0]
    )
