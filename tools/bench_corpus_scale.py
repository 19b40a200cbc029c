"""Corpus-prep operators at 500k docs — scale datapoints beyond the
5k-doc sf0.1 fixtures (companion to bench_clusters_scale.py; same
deterministic generated corpus, so runs are comparable).

Covers the round-4 hash-key/shuffle work:
  dedup_spans        128-bit md5 window keys through the count exchange
  boilerplate_lines  128-bit line keys + broadcast anti-join removal
  lm_score           bigram-LM train + score (two counts + one join)
  decontaminate      hash64-prefilter vs plain broadcast (every 50th
                     doc plays the benchmark)

Each op returns a row per doc; throughput = docs/sec end-to-end.
Usage: BENCH_CORPUS_DOCS=500000 python tools/bench_corpus_scale.py
Prints one JSON line; record in BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lambdo_spark.session import get_spark
from lambdo_spark.sources.documents import generate_documents

N_DOCS = int(os.environ.get("BENCH_CORPUS_DOCS", "500000"))


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="bench_corpus_scale",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(512 * 1024),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, int(cpus) * 4, numPartitions=int(cpus) * 4).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    path = f"/tmp/lambdo_bench_docs_{N_DOCS}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        generate_documents(
            spark, N_DOCS, seed=42, partitions=int(cpus) * 4
        ).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)
    bench_docs = docs.where(F.pmod(F.col("doc_id"), F.lit(50)) == 0)

    from lambdo_spark.functions.exact_substr import remove_duplicate_spans
    from lambdo_spark.functions.text import remove_boilerplate_lines
    from lambdo_spark.functions.lm import lm_score
    from lambdo_spark.functions.contamination import decontaminate

    ops = {
        "dedup_spans_hash128": lambda: remove_duplicate_spans(
            docs, span_tokens=8, min_count=2
        ),
        "dedup_spans_text": lambda: remove_duplicate_spans(
            docs, span_tokens=8, min_count=2, key="text"
        ),
        "boilerplate_lines": lambda: remove_boilerplate_lines(
            docs, group_cols=("source",), min_docs=5
        ),
        "lm_score": lambda: lm_score(docs),
        "decontaminate_plain": lambda: decontaminate(docs, bench_docs, n=8),
        "decontaminate_hash64": lambda: decontaminate(
            docs, bench_docs, n=8, prefilter="hash64"
        ),
    }
    walls, rows = {}, {}
    for name, fn in ops.items():
        t0 = time.time()
        df = fn()
        # noop sink: count() alone is join-eliminated on these
        # doc-shaped outputs (Catalyst proves the aggregated join side
        # unique and counts the bare id column — measured, see
        # bench.py run_forced) — the noop write forces every column
        df.write.format("noop").mode("overwrite").save()
        rows[name] = df.count()
        walls[name] = round(time.time() - t0, 3)
        print(f"{name}: {walls[name]}s rows={rows[name]}", file=sys.stderr)
        assert rows[name] == N_DOCS, (name, rows[name])
    print(json.dumps({
        "metric": "corpus_ops_scale",
        "docs": N_DOCS,
        "cpus": cpus,
        "walls_sec": walls,
        "docs_per_sec": {k: int(N_DOCS / v) for k, v in walls.items()},
    }))


if __name__ == "__main__":
    main()
