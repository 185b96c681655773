"""End-to-end corpus curation: the full LLM-training-data pipeline in one run.

Chains the engine's data-pipeline operators over the `documents` table the
way a pre-training data job would, printing a funnel report:

1. dedup        — MinHash-LSH candidate pairs → exact-Jaccard verification →
                  connected components → one representative per cluster
2. decontaminate— drop training docs sharing word-8-grams with the held-out
                  eval slice (doc_id % 10 == 0)
3. quality      — token-count / punctuation / stopword screens
4. split        — content-addressed train/val/test assignment
5. pack         — concat-and-chunk token packing of the surviving train set

Every stage is a DataFrame → DataFrame transform (no driver-side loops); the
funnel counts are the only collected values.

Run: ``python scripts/curate_demo.py [sf_dir]`` (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from killrweather_spark.functions.curation import (  # noqa: E402
    connected_components,
    dedup_keep_list,
    deterministic_split,
    pack_sequences,
)
from killrweather_spark.functions.dedup import (  # noqa: E402
    char_shingles,
    decontaminate,
    lsh_candidate_pairs,
    minhash_signatures,
)
from killrweather_spark.functions.text import quality_metrics  # noqa: E402
from killrweather_spark.session import get_session  # noqa: E402
from killrweather_spark.sources.readers import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session(app_name="curate_demo")
    t0 = time.perf_counter()

    docs = load_table(spark, sf_dir, "documents")
    funnel: list[tuple[str, int]] = [("input", docs.count())]

    # 1. dedup: LSH candidates -> exact-Jaccard verify -> components ->
    #    one representative per duplicate cluster
    sh = char_shingles(docs, "text", "doc_id", gram=6)
    sig = minhash_signatures(sh, "doc_id", n_hashes=16)
    cand = lsh_candidate_pairs(sig, "doc_id", bands=4)
    shd = sh.distinct().persist()
    sizes = shd.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (
        cand.join(shd.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a")
        .join(shd.select(F.col("doc_id").alias("doc_b"), "shingle"),
              ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    verified = (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"),
                                F.col("n_sh").alias("n_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"),
                           F.col("n_sh").alias("n_b")), "doc_b")
        .filter(F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")) >= 0.6)
        .select("doc_a", "doc_b")
    )
    comp = connected_components(verified)
    keep = dedup_keep_list(docs, comp, "doc_id").filter(
        F.col("doc_id") == F.col("representative")
    )
    funnel.append(("after exact+near dedup", keep.count()))

    # 2. decontaminate vs the held-out eval slice
    ev = keep.filter(F.col("doc_id") % 10 == 0)
    tr = keep.filter(F.col("doc_id") % 10 != 0)
    contaminated = decontaminate(tr, ev, "text", "doc_id", n=8).select("doc_id")
    clean = tr.join(contaminated, "doc_id", "left_anti")
    funnel.append(("train after decontamination", clean.count()))

    # 3. quality screens (cheap SQL expressions, one pass)
    q = quality_metrics(clean, "text")
    passed = q.filter(
        (F.col("n_tokens") >= 20)
        & (F.col("stopword_ratio") >= 0.01)
        & (F.col("punct_ratio") <= 0.2)
    ).select(*clean.columns)
    funnel.append(("after quality screens", passed.count()))

    # 4. content-addressed split (stable under corpus growth)
    split = deterministic_split(passed, "doc_id",
                                (("train", 0.9), ("val", 0.95)), "test")
    by_split = {r["split"]: r["n"] for r in
                split.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    funnel.append(("train split", by_split.get("train", 0)))

    # 5. pack the train split into fixed-size sequences
    train = split.filter(F.col("split") == "train")
    packed = pack_sequences(train, "doc_id", "text",
                            budget_tokens=512, n_shards=8)
    n_seqs = packed.select("shard", "seq_id").distinct().count()
    funnel.append(("packed sequences", n_seqs))

    dt = time.perf_counter() - t0
    width = max(len(k) for k, _ in funnel)
    print(f"\ncorpus curation funnel @ {sf_dir}")
    for k, v in funnel:
        print(f"  {k:<{width}} : {v:>8,}")
    print(f"  wall time : {dt:.1f} s")
    spark.stop()


if __name__ == "__main__":
    main()
