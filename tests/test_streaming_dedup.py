"""Streaming ingest dedup: exact + near-dup vs the at-rest index.

Semantics under test (streaming/dedup.py):
- exact identity = span-sequence digest (whole interleaved doc);
- near-dup = textual MinHash-LSH + exact-Jaccard verification;
- within a batch: the batch operators' canonical rules (min-id per
  digest, then min-id per verified-near-dup component);
- across batches: filter semantics vs ADMITTED docs only;
- replay of an epoch is idempotent (the handler's store reads exclude
  the current epoch's partial writes).
"""

import gc
import time

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ffcl_spark.sources.docs import DOCS_SCHEMA, span_sequence_digest
from ffcl_spark.streaming.dedup import (
    bootstrap_store,
    content_keys,
    dedup_batch,
    dedup_stream,
)
from ffcl_spark.streaming.enrich import read_docs_stream


def _doc(doc_id: str, text: str, media_tag: str):
    """Interleaved doc with the fixture span layout; media_tag controls
    exact identity (same text + same tag = identical span sequence)."""
    return (
        doc_id,
        [
            ("media", "", f"media://{media_tag}/0?x=1.000&y=2.000", 0),
            ("text", text, "", 1),
            ("media", "", f"media://{media_tag}/2?x=3.000&y=4.000", 2),
        ],
    )


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, DOCS_SCHEMA)


def _words(lo: int, hi: int) -> str:
    return " ".join(f"t{i:03d}" for i in range(lo, hi))


def test_content_keys(spark):
    docs = _docs_df(
        spark,
        [
            _doc("d0", "a b c", "m0"),
            _doc("d1", "a b c", "m0"),  # identical spans to d0
            _doc("d2", "a b c", "m2"),  # same text, different media
        ],
    )
    got = {r.doc_id: r for r in content_keys(docs).collect()}
    assert got["d0"].content_hash == got["d1"].content_hash
    assert got["d0"].content_hash != got["d2"].content_hash
    assert got["d0"].text == "a b c"


def test_dedup_stream_single_drop_hand_oracle(spark, tmp_path):
    """One file-drop through the real stream; hand-known keep set."""
    t_a = _words(0, 40)
    t_b = _words(100, 140)
    t_c = _words(200, 240)
    t_h = _words(300, 340)
    history = _docs_df(spark, [_doc("h1", t_h, "mh1")])
    batch = _docs_df(
        spark,
        [
            _doc("d00", t_a, "m00"),  # keep (canonical of everything A)
            _doc("d01", t_a, "m00"),  # exact clone of d00 -> drop
            _doc("d02", t_a, "m02"),  # same text, new media -> near-dup drop
            _doc("d03", t_b, "m03"),  # keep
            _doc("d04", t_b, "m04"),  # near-dup of d03 -> drop
            _doc("d05", t_c, "m05"),  # keep
            _doc("d06", t_h, "m06"),  # near-dup of HISTORY h1 -> drop
            _doc("d07", t_h, "mh1"),  # exact clone of h1 -> drop
        ],
    )
    store = str(tmp_path / "store")
    drop = str(tmp_path / "drop")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    bootstrap_store(spark, store, history)
    batch.coalesce(1).write.parquet(drop)

    dedup_stream(read_docs_stream(spark, drop), store, out, ckpt, threshold=0.8)
    admitted = spark.read.parquet(f"{out}/epoch=*")
    kept = sorted(r.doc_id for r in admitted.select("doc_id").collect())
    assert kept == ["d00", "d03", "d05"]

    # span sequences of admitted docs are byte-identical to the input
    dig_in = {r.doc_id: r.span_seq for r in span_sequence_digest(batch).collect()}
    for r in span_sequence_digest(admitted).collect():
        assert dig_in[r.doc_id] == r.span_seq

    # the at-rest index grew by exactly the admitted set
    for sub, per_doc in (("hashes", 1), ("bands", 8), ("texts", 1)):
        rows = spark.read.parquet(f"{store}/{sub}/epoch=0")
        assert rows.count() == 3 * per_doc
        assert sorted(set(r.id for r in rows.collect())) == ["d00", "d03", "d05"]

    # restart on the same checkpoint: nothing new to consume, outputs
    # and stores unchanged
    n0 = admitted.count()
    dedup_stream(read_docs_stream(spark, drop), store, out, ckpt, threshold=0.8)
    assert spark.read.parquet(f"{out}/epoch=*").count() == n0


def test_dedup_stream_one_shot_equals_batch_closure(spark, tmp_path):
    """A whole corpus arriving as one batch reproduces the batch
    operators' composition (exact min-id, then dedup_groups canonical)
    — stream==batch parity through the real machinery (file source,
    store round-trip, banded store join)."""
    from ffcl_spark.operators.dedup import dedup_groups

    # 6 template texts x perturbation: shared 40-token cores with
    # 0/2/4-token prefix shifts -> a mix of >= and < threshold pairs
    rows = []
    for fam in range(6):
        base = 1000 * fam
        for j, shift in enumerate((0, 2, 4, 30)):
            did = f"d{fam}{j}"
            rows.append(_doc(did, _words(base + shift, base + shift + 40), f"m{did}"))
    # plus two exact clones
    rows.append(_doc("dx0", _words(0, 40), "md00"))  # clone of d00's content
    rows.append(_doc("dx1", _words(3000, 3040), "md30"))  # clone of d30's content
    docs = _docs_df(spark, rows)

    store = str(tmp_path / "store")
    drop = str(tmp_path / "drop")
    out = str(tmp_path / "out")
    bootstrap_store(spark, store)  # empty history
    docs.coalesce(1).write.parquet(drop)
    dedup_stream(
        read_docs_stream(spark, drop), store, out, str(tmp_path / "ckpt"), threshold=0.7
    )
    got = sorted(
        r.doc_id for r in spark.read.parquet(f"{out}/epoch=*").select("doc_id").collect()
    )

    # batch twin: same composition on the static table
    ck = content_keys(docs)
    keep1 = ck.groupBy("content_hash").agg(F.min("doc_id").alias("doc_id"))
    surv = ck.join(keep1, ["content_hash", "doc_id"], "left_semi")
    groups = dedup_groups(surv, 0.7, "doc_id", "text")
    exp = sorted(
        r.id for r in groups.where(F.col("id") == F.col("canonical_id")).collect()
    )
    assert got == exp
    # non-vacuous: the fixture must actually exercise both layers
    assert len(got) < docs.count()


def test_cross_epoch_filter_vs_batch_closure(spark, tmp_path):
    """The documented cross-batch rule: drop iff near-dup of an
    ADMITTED doc. A T1-T2-T3 chain (adjacent Jaccard ~0.815 >= 0.7,
    T1-T3 ~0.661 < 0.7) arriving over three epochs admits {T1, T3}
    (T2's index rows never land, so T3 is only checked against T1),
    while the same docs in ONE batch collapse the whole component to
    {T1} via the closure."""
    t1, t2, t3 = _words(0, 100), _words(10, 110), _words(20, 120)
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    bootstrap_store(spark, store)
    for epoch, (did, text) in enumerate((("d1", t1), ("d2", t2), ("d3", t3))):
        dedup_batch(
            _docs_df(spark, [_doc(did, text, f"m{did}")]), epoch, store, out, threshold=0.7
        )
    got = sorted(
        r.doc_id for r in spark.read.parquet(f"{out}/epoch=*").select("doc_id").collect()
    )
    assert got == ["d1", "d3"]

    # single-batch closure on the identical docs keeps only T1
    store2 = str(tmp_path / "store2")
    out2 = str(tmp_path / "out2")
    bootstrap_store(spark, store2)
    all3 = _docs_df(
        spark, [_doc("d1", t1, "md1"), _doc("d2", t2, "md2"), _doc("d3", t3, "md3")]
    )
    dedup_batch(all3, 0, store2, out2, threshold=0.7)
    got2 = sorted(
        r.doc_id
        for r in spark.read.parquet(f"{out2}/epoch=*").select("doc_id").collect()
    )
    assert got2 == ["d1"]


def test_replay_idempotent(spark, tmp_path):
    """Re-running an epoch (foreachBatch replay after a crash) must
    reproduce it exactly: the handler's store reads exclude the
    epoch's own previous partial writes, so no doc collides with
    itself."""
    t_a, t_b = _words(0, 40), _words(100, 140)
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    bootstrap_store(spark, store)
    batch0 = _docs_df(spark, [_doc("d0", t_a, "m0"), _doc("d1", t_a, "m1")])
    dedup_batch(batch0, 0, store, out)
    first = sorted(r.doc_id for r in spark.read.parquet(f"{out}/epoch=0").collect())
    assert first == ["d0"]
    # replay epoch 0: same survivors (d0 must NOT be dropped against
    # its own epoch-0 store rows), stores rewritten identically
    dedup_batch(batch0, 0, store, out)
    assert sorted(
        r.doc_id for r in spark.read.parquet(f"{out}/epoch=0").collect()
    ) == ["d0"]
    assert spark.read.parquet(f"{store}/hashes/epoch=0").count() == 1
    # and the next epoch still sees epoch 0 exactly once
    batch1 = _docs_df(spark, [_doc("d2", t_a, "m2"), _doc("d3", t_b, "m3")])
    dedup_batch(batch1, 1, store, out)
    assert sorted(
        r.doc_id for r in spark.read.parquet(f"{out}/epoch=*").collect()
    ) == ["d0", "d3"]


def test_dedup_stream_no_cache_growth(spark, tmp_path):
    """Per-epoch handler hygiene: the batch operators persist shingle/
    candidate intermediates and carry them on their results; the
    handler must release every one, so >= 8 epochs leave the session's
    persistent-RDD set no larger than before (the streaming.enrich
    round-4 lesson, applied to the dedup family's internal persists)."""
    rows = [
        _doc(f"d{i:02d}", _words(50 * (i % 5), 50 * (i % 5) + 40), f"m{i:02d}")
        for i in range(16)
    ]
    docs = _docs_df(spark, rows)
    store = str(tmp_path / "store")
    drop = str(tmp_path / "drop")
    bootstrap_store(spark, store)
    docs.repartition(8).write.parquet(drop)

    def persistent_ids():
        return {
            int(k)
            for k in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
        }

    gc.collect()
    # count only RDDs the stream itself persists (ids are monotone) —
    # immune to the ContextCleaner concurrently collecting OTHER
    # tests' stale caches during the poll (see the matching note in
    # test_streaming.py's no-growth test)
    id_floor = max(persistent_ids(), default=-1)

    def n_stream_persistent():
        return sum(1 for i in persistent_ids() if i > id_floor)

    dedup_stream(
        read_docs_stream(spark, drop, max_files_per_trigger=1),
        store,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    epochs = {
        p.split("epoch=")[1].split("/")[0]
        for p in spark.read.parquet(f"{store}/hashes/epoch=*").inputFiles()
    }
    assert len(epochs) >= 8
    # drop terminated-query retention, then allow a generous settle
    spark.streams.resetTerminated()
    deadline = time.time() + 180
    while time.time() < deadline:
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        if n_stream_persistent() == 0:
            break
        time.sleep(1)
    assert n_stream_persistent() == 0


def test_quality_gated_admission(spark, tmp_path):
    """quality_rules rejects degenerate docs BEFORE dedup, and a
    rejected doc is not indexed — it never blocks a future
    near-duplicate (stateless filter semantics)."""
    t_spam = " ".join(["spam"] * 40)
    t_good = _words(0, 40)
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    bootstrap_store(spark, store)
    rules = {"min_tokens": 10, "max_dup_token_frac": 0.5}

    batch0 = _docs_df(
        spark,
        [
            _doc("d0", t_spam, "m0"),      # degenerate → quality reject
            _doc("d1", t_good, "m1"),      # keep
            _doc("d2", _words(0, 5), "m2"),  # too short → quality reject
        ],
    )
    dedup_batch(batch0, 0, store, out, quality_rules=rules)
    assert sorted(
        r.doc_id for r in spark.read.parquet(f"{out}/epoch=0").collect()
    ) == ["d1"]
    # rejected docs were not indexed (one admitted row per store)
    assert spark.read.parquet(f"{store}/hashes/epoch=0").count() == 1
    assert spark.read.parquet(f"{store}/texts/epoch=0").count() == 1

    # epoch 1: an exact clone of the REJECTED spam doc still fails on
    # quality (not on dedup); a near-dup of the admitted doc dedups as
    # usual; replay of epoch 0 stays idempotent under the gate
    batch1 = _docs_df(
        spark,
        [_doc("d3", t_spam, "m3"), _doc("d4", t_good, "m4")],
    )
    dedup_batch(batch1, 1, store, out, quality_rules=rules)
    assert spark.read.parquet(f"{out}/epoch=1").count() == 0
    dedup_batch(batch0, 0, store, out, quality_rules=rules)
    assert sorted(
        r.doc_id for r in spark.read.parquet(f"{out}/epoch=*").collect()
    ) == ["d1"]
