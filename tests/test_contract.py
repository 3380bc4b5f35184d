"""Driver-contract invariants: every oracle has a query, SQL strings are
well-formed enough to parse, and the CLI's API-mode guard fires."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import pytest
import duckdb

import __spark_entry__ as ent


def test_every_oracle_key_has_a_query():
    qs, oracles = ent.queries(), ent.oracle_sql()
    assert set(oracles) <= set(qs), set(oracles) - set(qs)
    assert all(callable(fn) for fn in qs.values())
    # every declared query is oracle-bearing since round 3 (mm_decode's
    # stub kernel is pure byte arithmetic DuckDB replays via blob funcs)
    assert sorted(set(qs) - set(oracles)) == []


def test_oracle_sql_parses_in_duckdb():
    """Catch SQL syntax drift without running the data: EXPLAIN every
    oracle against empty views with matching schemas."""
    con = duckdb.connect()
    ddl = {
        "region": "r_regionkey int, r_name varchar",
        "nation": "n_nationkey int, n_name varchar, n_regionkey int",
        "customer": "c_custkey bigint, c_name varchar, c_nationkey int,"
        " c_acctbal double, c_mktsegment varchar",
        "supplier": "s_suppkey bigint, s_name varchar, s_nationkey int,"
        " s_acctbal double",
        "part": "p_partkey bigint, p_name varchar, p_brand varchar,"
        " p_type varchar, p_size int, p_retailprice double",
        "orders": "o_orderkey bigint, o_custkey bigint, o_orderstatus varchar,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority varchar",
        "lineitem": "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag varchar,"
        " l_linestatus varchar, l_shipdate timestamp",
        "events": "event_id bigint, ts timestamp_ns, user_id bigint,"
        " event_type varchar, value double, props varchar",
        "documents": "doc_id bigint, text varchar, lang varchar,"
        " source varchar, n_chars bigint",
        "embeddings": "vec_id bigint, embedding float[], label int",
    }
    for name, cols in ddl.items():
        con.execute(f"CREATE TABLE {name} ({cols})")
    for name, sql in ent.oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001
            raise AssertionError(f"oracle {name} failed to plan: {e}") from e


@pytest.mark.slow  # re-tiered r15: driver gate = fast tier; this test's coverage stays in the release gate (pytest -m "")
def test_cli_api_mode_unreachable_host_fails_with_named_error(tmp_path: Path):
    """API mode is a real program path since r9 (`run_api_sizing`); an
    unreachable CM host must fail fast with a one-line named error, not
    a raw traceback (the reference dies in urllib2 mid-page-loop). The
    happy path over a live loopback server is tests/test_ep1_e2e.py."""
    conf = tmp_path / "api.conf"
    conf.write_text("cm_url=https://cm-host.invalid:7183\n")
    r = subprocess.run(
        [sys.executable, "-m", "impala_base_to_cdw_sizing_spark", str(conf)],
        capture_output=True, text=True, timeout=300,
        cwd=str(Path(__file__).resolve().parent.parent),
    )
    assert r.returncode == 1
    assert "ERROR: API fetch from https://cm-host.invalid:7183 failed" in r.stdout
