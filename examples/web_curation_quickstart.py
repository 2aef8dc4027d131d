"""Web-crawl curation quickstart: the round-3 operator families composed
into the funnel a CommonCrawl-style ingestion runs, stage by stage:

    crawl records (url + text)
      → URL canonicalization + exact URL dedup   (curation.canonicalize_urls)
      → Gopher rule battery                      (drop-filter conjunction)
      → ExactSubstr span removal                 (dedup.remove_duplicated_spans)
      → CCNet perplexity buckets                 (keep head+middle terciles)
      → document-atomic NFD packing              (curation.pack_atomic)
      → JSONL export                             (sources.jsonl_corpus)

Run:  python examples/web_curation_quickstart.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hiss_cube_spark import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/web_curation_out"

    from hiss_cube_spark.operators.curation import canonicalize_urls, pack_atomic
    from hiss_cube_spark.operators.dedup import remove_duplicated_spans
    from hiss_cube_spark.operators.text_analysis import bigram_lm_score
    from hiss_cube_spark.sources.jsonl_corpus import write_jsonl_corpus

    spark = get_spark("web-curation")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # crawl records: synthesize messy URLs (the documents table stands in
    # for WARC text records)
    crawl = docs.withColumn(
        "url",
        F.concat(
            F.lit("https://www."),
            F.col("source"),
            F.lit(".example.com/p/"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit("?utm_source=crawl&id="),
            (F.col("doc_id") % 3).cast("string"),
        ),
    )

    # 1) URL dedup: canonicalize, keep min doc per canonical URL
    c = canonicalize_urls(crawl)
    w = F.row_number().over(Window.partitionBy("canonical_url").orderBy("doc_id"))
    url_unique = c.withColumn("_rn", w).where(F.col("_rn") == 1).drop("_rn")
    print("after URL dedup:", url_unique.count())

    # 2) Gopher rules (inline conjunction — see text_gopher_rules for the
    # named per-rule verdicts)
    toks = F.filter(F.split("text", " "), lambda t: F.length(t) > 0)
    n = F.size(toks)
    gated = url_unique.where((n >= 25) & (n <= 100000))
    print("after quality gate:", gated.count())

    # 3) ExactSubstr span removal (keep first occurrence of duplicated
    # 5-grams, cut the rest)
    cleaned = remove_duplicated_spans(
        gated.select("doc_id", "text"), n=5, min_count=2
    )
    kept = cleaned.where(F.length("clean_text") > 0)
    print(
        "after span removal:",
        kept.count(),
        "| tokens removed:",
        cleaned.agg(F.sum("n_removed")).first()[0],
    )

    # 4) CCNet perplexity terciles per language: drop the tail bucket
    lm = bigram_lm_score(
        kept.selectExpr("doc_id", "clean_text AS text"), max_train_docs=2000
    )
    j = lm.join(docs.select("doc_id", "lang", "source"), "doc_id")
    tw = Window.partitionBy("lang").orderBy(F.col("lm_score").desc(), "doc_id")
    headmid = (
        j.withColumn("bucket", F.ntile(3).over(tw)).where(F.col("bucket") <= 2)
    )
    print("after perplexity filter:", headmid.count())

    # 5) atomic packing per source shard
    packed = pack_atomic(
        headmid.join(kept.selectExpr("doc_id", "clean_text AS text"), "doc_id"),
        capacity=512,
    )
    fill = packed.groupBy("shard").agg(
        F.max("bin_id").alias("n_bins"), F.sum("n_tokens").alias("n_tokens")
    )
    print("packing (first shards):")
    for r in fill.orderBy("shard").limit(5).collect():
        print("  ", r["shard"], "bins:", r["n_bins"] + 1, "tokens:", r["n_tokens"])

    # 6) JSONL export of the survivor corpus
    final = headmid.join(
        kept.selectExpr("doc_id", "clean_text AS text"), "doc_id"
    ).select(
        "doc_id", "text", "lang", "source", F.length("text").alias("n_chars")
    )
    write_jsonl_corpus(final, os.path.join(out_dir, "corpus"), compression="gzip", shards=4)
    print("exported", final.count(), "documents to", os.path.join(out_dir, "corpus"))
    spark.stop()


if __name__ == "__main__":
    main()
