"""One-off probe: decompose the sf10->sf30 super-linear growth of the
three heavies into its drivers (edge/candidate/pair counts, CC rounds)
so the fix targets the real term, not a guess.

Usage: python tools/probe_sf30.py <sf_dir> [components|prefix|hardneg ...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from impala_base_to_cdw_sizing_spark.session import build_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    which = set(sys.argv[2:]) or {"components", "prefix", "hardneg"}
    spark = build_spark("probe-sf30", data_dir=sf_dir)
    out: dict[str, object] = {"sf_dir": sf_dir}

    if "components" in which:
        from impala_base_to_cdw_sizing_spark.operators.text import (
            cc_labels_converged,
            q_dedup_minhash,
        )

        t0 = time.perf_counter()
        pairs = (
            q_dedup_minhash(spark, sf_dir)
            .filter(F.col("est_jaccard") >= 0.5)
            .select("doc_a", "doc_b")
        )
        edges = pairs.union(
            pairs.select(
                F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
            )
        ).cache()
        out["cc_edges"] = edges.count()
        out["cc_edges_sec"] = round(time.perf_counter() - t0, 1)
        endpoints = edges.select(F.col("doc_a").alias("doc_id")).distinct()
        out["cc_endpoints"] = endpoints.count()
        rounds: list[int] = []
        t0 = time.perf_counter()
        labels = cc_labels_converged(edges, endpoints, rounds_out=rounds)
        out["cc_labels"] = labels.count()
        out["cc_rounds"] = rounds[0]
        out["cc_iter_sec"] = round(time.perf_counter() - t0, 1)
        edges.unpersist()

    if "prefix" in which:
        from impala_base_to_cdw_sizing_spark.operators.ppjoin import (
            _candidates,
            _prefix,
            _sh,
            q_prefixfilter,
        )

        t0 = time.perf_counter()
        sh = _sh(spark, sf_dir)
        out["pf_docs"] = sh.count()
        cand = _candidates(_prefix(sh))
        out["pf_candidates"] = cand.count()
        out["pf_cand_sec"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        out["pf_output"] = q_prefixfilter(spark, sf_dir).count()
        out["pf_out_sec"] = round(time.perf_counter() - t0, 1)

    if "hardneg" in which:
        from impala_base_to_cdw_sizing_spark.operators.similarity import (
            _banded_spark,
            _capped_spark,
            _emb,
        )

        t0 = time.perf_counter()
        emb = _emb(spark, sf_dir)
        out["hn_vecs"] = emb.count()
        banded = _banded_spark(
            emb.withColumn("norm2", F.lit(1.0))
        )
        anchors = banded.selectExpr("vec_id AS a_id", "band_id", "band_key")
        cand = _capped_spark(banded).selectExpr(
            "vec_id AS c_id", "band_id", "band_key"
        )
        pairs = (
            anchors.join(cand, ["band_id", "band_key"])
            .filter(F.col("a_id") != F.col("c_id"))
            .select("a_id", "c_id")
            .distinct()
        )
        out["hn_pairs"] = pairs.count()
        out["hn_pairs_sec"] = round(time.perf_counter() - t0, 1)

    if "semtime" in which:
        # wall-clock only (quiet-box reruns after a loaded counts pass:
        # the counts are load-independent, the timings are not)
        from impala_base_to_cdw_sizing_spark.operators.curation import (
            q_dedup_hybrid,
            q_dedup_semantic,
        )

        t0 = time.perf_counter()
        q_dedup_semantic(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        out["dedup_semantic_sec"] = round(time.perf_counter() - t0, 1)
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        q_dedup_hybrid(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        out["dedup_hybrid_sec"] = round(time.perf_counter() - t0, 1)
        spark.catalog.clearCache()

    if "semantic" in which:
        # r12 verdict task 4: the semantic-dedup saturation notch —
        # candidate count vs the balanced-cell model and the CAP*n hard
        # bound, plus end-to-end wall-clock for dedup_semantic and
        # dedup_hybrid (noop sink, full materialization)
        import math

        from impala_base_to_cdw_sizing_spark.operators.curation import (
            _SEM_CELL_CAP,
            _SEM_K_CAP,
            _sem_assigned,
            _sem_candidate_pairs,
            q_dedup_hybrid,
            q_dedup_semantic,
        )

        t0 = time.perf_counter()
        assigned = _sem_assigned(spark, sf_dir).cache()
        n = assigned.count()
        out["sem_vectors"] = n
        out["sem_candidates"] = _sem_candidate_pairs(assigned).count()
        out["sem_counts_sec"] = round(time.perf_counter() - t0, 1)
        assigned.unpersist()
        k = min(math.ceil(math.sqrt(n)), _SEM_K_CAP)
        c = n / k
        cap = _SEM_CELL_CAP
        per = c * (c - 1) / 2 if c <= cap else cap * c - cap * (cap + 1) / 2
        out["sem_model"] = int(k * per)
        out["sem_cap_load"] = round(out["sem_candidates"] / (cap * n), 3)
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        q_dedup_semantic(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        out["dedup_semantic_sec"] = round(time.perf_counter() - t0, 1)
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        q_dedup_hybrid(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        out["dedup_hybrid_sec"] = round(time.perf_counter() - t0, 1)
        spark.catalog.clearCache()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
