"""Deterministic sf1 dataset derived from the driver's read-only sf0.1.

The driver ships sf{0.001,0.01,0.1} only (TESTDATA.md) and /root/testdata
is read-only, so the sf1 scaling runs (VERDICT r4 items #1/#8) use a
derived dataset built here: 10 FK-consistent copies of every scaled
table, written to .testdata/sf1/ inside the repo (gitignored — ~200 MB,
regenerate with `python tools/gen_sf1.py`).

Design rules (no RNG anywhere — the output is a pure function of sf0.1):

- region/nation are fixed dimensions (TPC-H convention) — copied as-is.
- Every scaled table gets copy c's surrogate keys shifted by
  c * (max_key + 1); foreign keys shift by the SAME stride as the key
  they reference, so join selectivity and fan-out per key are identical
  to sf0.1 (orders/customer ~10/1, lineitem/orders ~4/1, events/user
  ~67/1 — more keys, same per-key group sizes: the realistic scale-up).
- events keep their timestamps: 10x densification of the same window
  (more users, same horizon) — this is what stresses the sweep/funnel/
  spike operators, and it leaves calendar-convention semantics intact.
- documents: copy 0 is verbatim; copy c>0 suffixes every word at
  position p with p % 3 == c % 3 by ``_c{c}``. Within a copy the
  transformation is uniform, so the sf0.1 duplicate/near-duplicate
  structure is preserved exactly per copy (duplicate RATE constant at
  10x); across copies every word 3-shingle (SPARK_SHINGLES in
  operators/text.py) contains a modified word, so MinHash/Jaccard/
  SimHash do NOT link copies — the corpus grows, the candidate graph
  grows linearly, not quadratically in copies. n_chars is recomputed.
- embeddings: copy c>0 cyclically rotates vector components by
  (7 * c) % 64 (distinct shift per copy, dim=64). Rotation preserves
  norms and all WITHIN-copy pairwise cosines mathematically (float
  sums reorder, so agreement is to summation-order ulps), while
  cross-copy cosines decorrelate — exact/near-duplicate vector groups
  stay the sf0.1 size instead of gaining 9 clones each (which would
  make pair outputs quadratic in the copy count).

Skew mode (``--skew``, r8 verdict #2): the uniform key-stride copies keep
per-key group sizes constant, but real 100 TB corpora are Zipfian. With
the flag, four deterministic hot keys are injected AFTER the copy
transform (conditions on the SHIFTED global ids, so every copy carries
the same hot fraction and the dataset remains a pure function of sf0.1):

- events: ~50% of rows get ``event_type = 'click'`` (event_id % 2 == 0)
  — one pool carries half of query_history (pool == event_type in
  sources/synthetic.py), stressing pool-grouped aggs and the sweep;
- events: ~30% of rows get ``user_id = 0`` (event_id % 10 < 3) — one
  user dominates sessionization/funnels/per-user windows;
- documents: ~20% of docs (doc_id % 5 == 0) get a shared leading
  3-word phrase — one hot shingle with df = 0.2·corpus, the quadratic
  hazard for inverted-index candidate generation;
- embeddings: ~25% of vectors (vec_id % 4 == 0) collapse onto one
  dominant direction (basis e0 + small per-row deterministic offset) —
  one hot IVF/LSH cell for the ANN/semantic-dedup family.

Usage: python tools/gen_sf1.py [--copies N] [--skew] [--src DIR] [--out DIR]
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC_DEFAULT = "/root/testdata/sf0.1"
OUT_DEFAULT = str(Path(__file__).resolve().parent.parent / ".testdata" / "sf1")

# key column -> referenced stride name; strides computed from the data.
STRIDES = {
    "c_custkey": "customer",
    "s_suppkey": "supplier",
    "p_partkey": "part",
    "o_orderkey": "orders",
    "event_id": "events",
    "user_id": "users",
    "doc_id": "documents",
    "vec_id": "embeddings",
}
FK_COLS = {
    "o_custkey": "customer",
    "l_orderkey": "orders",
    "l_partkey": "part",
    "l_suppkey": "supplier",
}


def _strides(src: str) -> dict[str, int]:
    out: dict[str, int] = {}
    for table, key in [
        ("customer", "c_custkey"),
        ("supplier", "s_suppkey"),
        ("part", "p_partkey"),
        ("orders", "o_orderkey"),
        ("events", "event_id"),
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
    ]:
        col = pq.read_table(f"{src}/{table}.parquet", columns=[key])[key]
        out[table] = int(pa.compute.max(col).as_py()) + 1
    uid = pq.read_table(f"{src}/events.parquet", columns=["user_id"])["user_id"]
    out["users"] = int(pa.compute.max(uid).as_py()) + 1
    return out


def _perturb_text(text: str, copy: int) -> str:
    if copy == 0:
        return text
    res = copy % 3
    suf = f"_c{copy}"
    words = text.split(" ")
    return " ".join(
        w + suf if p % 3 == res and w else w for p, w in enumerate(words)
    )


_HOT_PHRASE = "hotshingle alpha beta "


def _apply_skew(out: pd.DataFrame, table: str) -> pd.DataFrame:
    """Deterministic Zipf-ish hot keys, conditioned on the global ids."""
    if table == "events":
        eid = out["event_id"].to_numpy()
        et = out["event_type"].to_numpy(dtype=object, copy=True)
        et[eid % 2 == 0] = "click"  # one pool ~50% of query_history
        out["event_type"] = et
        uid = out["user_id"].to_numpy(copy=True)
        uid[eid % 10 < 3] = 0  # one user ~30% of events
        out["user_id"] = uid
    elif table == "documents":
        did = out["doc_id"].to_numpy()
        hot = did % 5 == 0  # one shingle in ~20% of documents
        out["text"] = [
            _HOT_PHRASE + t if h else t for t, h in zip(out["text"], hot)
        ]
        out["n_chars"] = [len(t) for t in out["text"]]
    elif table == "embeddings":
        vid = out["vec_id"].to_numpy()
        mat = np.stack(out["embedding"].to_numpy()).copy()
        hot = vid % 4 == 0  # one dominant cluster ~25% of vectors
        dim = mat.shape[1]
        hot_ids = vid[hot]
        nh = int(hot.sum())
        cluster = np.zeros((nh, dim), dtype=mat.dtype)
        cluster[:, 0] = 1.0
        # Injective per-id offset (r9 ADVICE: the old (id*13)%dim index +
        # id%7 magnitude collided for ids congruent mod 7·dim, making hot
        # vectors bit-equal and breaking the "exact dedup must not
        # collapse the cluster" invariant). Two adjacent components with
        # coprime-modulus magnitudes: collision now needs id ≡ mod
        # lcm(dim,997,1009) ≈ 6.4e7 — beyond any generated id range.
        # Both increments (1e-5, 1e-6) are ≫ float32 ulp even on top of
        # the 1.0 base component, and cosines stay ~1 (offsets ≤ 0.022).
        c1 = ((hot_ids * 13) % dim).astype(np.int64)
        rows = np.arange(nh)
        cluster[rows, c1] += (
            0.01 * (1.0 + (hot_ids % 997) / 997.0)
        ).astype(mat.dtype)
        cluster[rows, (c1 + 1) % dim] += (
            0.001 * (1.0 + (hot_ids % 1009) / 1009.0)
        ).astype(mat.dtype)
        mat[hot] = cluster
        out["embedding"] = list(mat)
    return out


def _copy_frame(
    pdf: pd.DataFrame, table: str, copy: int, st: dict[str, int], skew: bool = False
) -> pd.DataFrame:
    out = pdf.copy(deep=False)
    for col in out.columns:
        ref = STRIDES.get(col) or FK_COLS.get(col)
        if ref is not None:
            out[col] = pdf[col] + copy * st[ref]
    if table == "documents":
        out["text"] = [_perturb_text(t, copy) for t in pdf["text"]]
        out["n_chars"] = [len(t) for t in out["text"]]
    if table == "embeddings" and copy > 0:
        mat = np.stack(pdf["embedding"].to_numpy())
        out["embedding"] = list(np.roll(mat, (7 * copy) % mat.shape[1], axis=1))
    if skew:
        out = _apply_skew(out, table)
    return out


def generate(src: str, out_dir: str, copies: int, skew: bool = False) -> None:
    os.makedirs(out_dir, exist_ok=True)
    st = _strides(src)
    for table in ["region", "nation"]:
        pq.write_table(pq.read_table(f"{src}/{table}.parquet"), f"{out_dir}/{table}.parquet")
        print(f"{table}: copied fixed dim")
    for table in [
        "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        base = pq.read_table(f"{src}/{table}.parquet")
        schema = base.schema
        pdf = base.to_pandas()
        writer = pq.ParquetWriter(f"{out_dir}/{table}.parquet", schema)
        try:
            for c in range(copies):
                chunk = pa.Table.from_pandas(
                    _copy_frame(pdf, table, c, st, skew=skew),
                    schema=schema, preserve_index=False,
                )
                writer.write_table(chunk)
        finally:
            writer.close()
        print(f"{table}: {len(pdf)} x {copies} rows written" + (" (skewed)" if skew else ""))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--skew", action="store_true")
    ap.add_argument("--src", default=SRC_DEFAULT)
    ap.add_argument("--out", default=OUT_DEFAULT)
    a = ap.parse_args()
    generate(a.src, a.out, a.copies, skew=a.skew)


if __name__ == "__main__":
    main()
