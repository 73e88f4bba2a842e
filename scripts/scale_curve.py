#!/usr/bin/env python
"""Measured scaling curves: run headline operators on 1x/2x/4x/8x copies
of the sf0.1 tables (ids offset, text perturbed so near-dup structure
stays realistic rather than 8 exact copies of every doc) and print
seconds per scale. Evidence for the linearity claims in SCALING.md —
an operator whose time grows super-linearly here has a hidden quadratic
stage. Scratch data lives under /tmp; driver inputs are never touched."""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from comlake_core_spark.session import get_spark, tables
from comlake_core_spark.workloads import REGISTRY

SRC = "/root/testdata/sf0.1"
# v2: copies offset o_custkey/c_custkey too — without that, every order
# matched `factor` duplicate customers and the join OUTPUT grew as
# factor² (a builder artifact that read as a super-linear plan cliff)
BASE = "/tmp/comlake-scale-v2"
FACTORS = [1, 2, 4, 8]
OPS = [
    "dedup_minhash_lsh",
    "corpus_ngram_novelty",
    "text_feature_hashing",
    "jaccard_topk_similar_docs",
    "join_revenue_by_nation",
    "dedup_exact",
    "embedding_quantize_int8",
    # similarity/PQ family (VERDICT r2 #6): watching for broadcast cliffs
    # like the revenue join's — codebooks/LUTs are plan literals, so these
    # must stay scan-shaped as the corpus grows
    "embedding_pq_codes",
    "ann_pq_adc_topk",
    "ann_ivfpq_topk",
]


def build(spark, factor: int) -> str:
    out = f"{BASE}/x{factor}"
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    t = tables(spark, SRC)
    for name, df in t.items():
        parts = []
        for i in range(factor):
            d = df
            if name == "documents":
                d = d.select(
                    (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
                    F.concat(F.col("text"), F.lit(f" copyvar{i}")).alias("text"),
                    "lang", "source", "n_chars",
                )
            elif name == "embeddings":
                d = d.select((F.col("vec_id") + i * 10_000_000).alias("vec_id"), "embedding", "label")
            elif name == "lineitem":
                d = d.select(
                    (F.col("l_orderkey") + i * 100_000_000).alias("l_orderkey"),
                    *[c for c in d.columns if c != "l_orderkey"],
                )
            elif name == "orders":
                d = d.select(
                    (F.col("o_orderkey") + i * 100_000_000).alias("o_orderkey"),
                    (F.col("o_custkey") + i * 10_000_000).alias("o_custkey"),
                    *[c for c in d.columns if c not in ("o_orderkey", "o_custkey")],
                )
            elif name == "customer":
                d = d.select(
                    (F.col("c_custkey") + i * 10_000_000).alias("c_custkey"),
                    *[c for c in d.columns if c != "c_custkey"],
                )
            elif name == "events":
                d = d.select(
                    (F.col("event_id") + i * 100_000_000).alias("event_id"),
                    *[c for c in d.columns if c != "event_id"],
                )
            parts.append(d)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
    open(os.path.join(out, "_DONE"), "w").write("ok")
    return out


def main() -> None:
    spark = get_spark("scale-curve")
    results: dict[str, dict[int, float]] = {op: {} for op in OPS}
    for factor in FACTORS:
        sf_dir = build(spark, factor)
        for op in OPS:
            # warm plan shape at tiny scale, then time
            REGISTRY[op].fn(spark, "/root/testdata/sf0.001").write.mode("overwrite").format("noop").save()
            t0 = time.time()
            REGISTRY[op].fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            results[op][factor] = round(time.time() - t0, 2)
            print(f"x{factor} {op}: {results[op][factor]}s", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
