"""spark-submit entrypoint for the corpus (LLM-training-data) pipeline.

The text-side counterpart of ``run_pipeline.py``: quality admission →
exact + near-dup dedup (canonical keep set) → per-doc text metrics →
concat-then-chunk sequence packing, with a composition ROLLUP report
printed at the end. Every stage writes its own parquet under ``--out``
and a finished stage (``_SUCCESS`` present) is SKIPPED on re-run —
stage-level idempotent resume, the coarse-grained sibling of
``plans/checkpoint.py``'s per-chunk lineage.

    spark-submit --py-files ffcl_spark.zip scripts/run_corpus_pipeline.py \
        --docs s3://bucket/docs/ --out s3://bucket/corpus/ \
        --min-tokens 20 --max-dup-span-frac 0.8 \
        --neardup-threshold 0.8 --chunk-tokens 2048

Local smoke (same code path):

    python scripts/run_corpus_pipeline.py \
        --docs /root/testdata/sf0.001 --out /tmp/corpus_out
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from ffcl_spark import get_spark  # noqa: E402


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--docs", required=True, help="input dir: documents.parquet")
    ap.add_argument("--out", required=True, help="output root (one subdir per stage)")
    ap.add_argument("--min-tokens", type=int, default=10)
    ap.add_argument("--max-dup-span-frac", type=float, default=0.95)
    ap.add_argument("--neardup-threshold", type=float, default=0.8)
    ap.add_argument("--chunk-tokens", type=int, default=2048)
    ap.add_argument(
        "--max-ppl", type=float, default=None,
        help="model-based gate: drop docs whose unigram-LM perplexity exceeds this",
    )
    ap.add_argument(
        "--benchmark", default=None,
        help="decontamination: parquet of benchmark/eval docs (doc_id, text); "
        "docs whose n-gram containment vs it reaches --max-contamination are dropped",
    )
    ap.add_argument("--max-contamination", type=float, default=0.5)
    args = ap.parse_args(argv)

    from ffcl_spark.operators.dedup import (
        dedup_groups,
        exact_dedup,
        ngram_contamination,
    )
    from ffcl_spark.operators.sampling import pack_chunks
    from ffcl_spark.operators.textops import (
        corpus_stats,
        lm_perplexity,
        quality_filter,
        text_metrics,
    )

    spark = get_spark(app_name="ffcl_corpus_pipeline")
    out = args.out.rstrip("/")

    def stage(name: str, build) -> DataFrame:
        """Stage-level idempotent resume: a finished stage's parquet is
        read back instead of recomputed."""
        path = f"{out}/{name}"
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            print(f"stage {name}: resume (already complete)", flush=True)
        else:
            build().write.mode("overwrite").parquet(path)
            print(f"stage {name}: done", flush=True)
        return spark.read.parquet(path)

    docs = spark.read.parquet(f"{args.docs}/documents.parquet")
    n_in = docs.count()

    # 1. quality admission (same rules as the streaming ingest gate)
    rules = {
        "min_tokens": args.min_tokens,
        "max_dup_span_frac": args.max_dup_span_frac,
    }
    clean = stage("quality", lambda: quality_filter(docs, rules))

    # optional model-based gate: perplexity under a unigram LM fitted
    # on the heuristic-clean survivors
    if args.max_ppl is not None:
        clean = stage(
            "ppl",
            lambda: clean.join(
                lm_perplexity(clean)
                .where(F.col("ppl") <= args.max_ppl)
                .select("doc_id"),
                "doc_id",
                "left_semi",
            ),
        )

    # optional decontamination: drop docs containing too much of the
    # benchmark/eval set (directional n-gram containment — docs too
    # short to carry n-gram evidence are kept, the operator contract)
    if args.benchmark is not None:
        bench = spark.read.parquet(args.benchmark)
        clean = stage(
            "decontaminate",
            lambda: clean.join(
                ngram_contamination(clean, bench)
                .where(F.col("ratio") >= args.max_contamination)
                .select(F.col("id").alias("doc_id")),
                "doc_id",
                "left_anti",
            ),
        )

    # 2. dedup: exact groups first (cheap md5 partial agg), then
    # MinHash-LSH near-dup closure over the exact survivors; the kept
    # corpus is the canonical id of each near-dup group
    def build_corpus() -> DataFrame:
        ex = exact_dedup(clean)
        ex_keep = clean.join(
            ex.where(F.col("id") == F.col("canonical_id")).select(
                F.col("id").alias("doc_id")
            ),
            "doc_id",
            "left_semi",
        )
        g = dedup_groups(ex_keep, args.neardup_threshold)
        return ex_keep.join(
            g.where(F.col("id") == F.col("canonical_id")).select(
                F.col("id").alias("doc_id")
            ),
            "doc_id",
            "left_semi",
        )

    corpus = stage("corpus", build_corpus)

    # 3. per-doc metrics (token counts / quality / lang / fingerprint —
    # one corpus scan) and 4. the packed training layout
    stage("stats", lambda: text_metrics(corpus))
    stage(
        "pack",
        lambda: pack_chunks(corpus, args.chunk_tokens),
    )

    # composition report (ROLLUP levels: 2 = (lang, source) leaf,
    # 0 = grand total)
    rep = corpus_stats(corpus).orderBy("level", "lang", "source").collect()
    # Spark's rollup yields zero rows on an empty input (no
    # grand-total row) — report the empty corpus instead of crashing
    tot = next((r for r in rep if r["level"] == 0), None)
    if tot is None:
        print(f"done: {n_in} docs in -> 0 kept; stages under {out}/")
        spark.stop()
        return
    print(
        f"done: {n_in} docs in -> {tot['n_docs']} kept "
        f"({tot['n_tokens']} tokens); stages under {out}/ "
        f"(quality, corpus, stats, pack)"
    )
    for r in rep:
        if r["level"] == 2:
            print(
                f"  {r['lang']}/{r['source']}: {r['n_docs']} docs, "
                f"{r['n_tokens']} tokens, mean {r['mean_chars']:.1f} chars"
            )
    spark.stop()


if __name__ == "__main__":
    main()
