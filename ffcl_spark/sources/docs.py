"""Interleaved text+media document table: schema, deterministic
synthesis, span-sequence invariant.

Authoritative schema (BASELINE.json input_hint):

    doc_id: string
    spans:  array<struct<kind:string, text:string, media_ref:string, offset:int>>

Media spans carry 2-D coordinates embedded in ``media_ref`` as
``media://{doc_id}/{offset}?x={x:.3f}&y={y:.3f}``. Coordinates are
derived from integer ids with pure int64 arithmetic (below) so that a
SQL oracle (DuckDB) can reproduce them bit-for-bit:

    ax = (pid * 2654435761 + 1013904223) % 2^32 ; x = (ax % 60000 - 30000)/1000
    ay = (pid * 2246822519 + 3266489917) % 2^32 ; y = (ay % 60000 - 30000)/1000

(The single ``(k - 30000)/1000`` division yields the nearest double to
the exact 3-decimal value, so the %.3f format → regexp parse
round-trip is bit-exact; a ``k/1000 - 30`` form would be 1 ulp off.)

where ``pid = 2*id + m`` for media span m ∈ {0, 1} of source row
``id``. Milli-unit coordinates make the %.3f format/parse round-trip
exact in IEEE double.

Every document has the fixed span layout
``[media(offset 0), text(offset 1), media(offset 2)]`` — interleaved
text and media, ≥1 media span per doc (FIXTURES.md §1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SPAN_TYPE = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]
)

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("spans", T.ArrayType(SPAN_TYPE)),
    ]
)

# int64-safe mixing constants (Knuth/xxhash-style multiplicative hash).
AX_MUL, AX_ADD = 2654435761, 1013904223
AY_MUL, AY_ADD = 2246822519, 3266489917
MOD32 = 4294967296
COORD_MOD = 60000  # milli-units across the [-30, 30) domain


def derived_coord(pid: Column, mul: int, add: int) -> Column:
    """Deterministic coordinate in [-30, 30) from an integer point id.

    Pure int64 arithmetic + one double division — reproducible in any
    SQL engine (see ``oracle_sql`` in ``__spark_entry__.py``).
    """
    a = F.pmod(pid.cast("long") * F.lit(mul) + F.lit(add), F.lit(MOD32))
    return (F.pmod(a, F.lit(COORD_MOD)) - F.lit(30000)).cast("double") / F.lit(1000.0)


def _media_span(id_col: Column, m: int, offset: int) -> Column:
    pid = id_col * 2 + F.lit(m)
    x = derived_coord(pid, AX_MUL, AX_ADD)
    y = derived_coord(pid, AY_MUL, AY_ADD)
    ref = F.format_string(
        "media://doc-%d/%d?x=%.3f&y=%.3f", id_col, F.lit(offset), x, y
    )
    return F.struct(
        F.lit("media").alias("kind"),
        F.lit("").alias("text"),
        ref.alias("media_ref"),
        F.lit(offset).cast("int").alias("offset"),
    )


def synth_docs(source: DataFrame, id_col: str, text_col: str | None) -> DataFrame:
    """Deterministically build the interleaved-docs table from any
    table with an integer id column (and optional text column).

    Layout per doc: [media(0), text(1), media(2)] → 2 points per doc
    with point ids ``2*id`` and ``2*id + 1``.
    """
    id_c = F.col(id_col).cast("long")
    text = F.coalesce(F.col(text_col), F.lit("")) if text_col else F.lit("")
    text_span = F.struct(
        F.lit("text").alias("kind"),
        text.alias("text"),
        F.lit("").alias("media_ref"),
        F.lit(1).cast("int").alias("offset"),
    )
    return source.select(
        F.format_string("doc-%d", id_c).alias("doc_id"),
        F.array(
            _media_span(id_c, 0, 0), text_span, _media_span(id_c, 1, 2)
        ).alias("spans"),
    )


def span_sequence_digest(docs: DataFrame) -> DataFrame:
    """(doc_id, span_seq) where span_seq is the md5 of the ordered
    concatenation of (kind, text, media_ref, offset) — the per-row
    invariant (input_hint: span-sequence equality). Jobs must leave
    this digest unchanged for every doc_id.
    """
    joined = F.array_join(
        F.transform(
            F.col("spans"),
            lambda s: F.concat_ws(
                "\x1f", s["kind"], s["text"], s["media_ref"], s["offset"].cast("string")
            ),
        ),
        "\x1e",
    )
    return docs.select(F.col("doc_id"), F.md5(joined).alias("span_seq"))


def check_span_invariant(before: DataFrame, after: DataFrame) -> int:
    """Number of doc_ids whose span sequence changed (must be 0)."""
    b = span_sequence_digest(before).alias("b")
    a = span_sequence_digest(after).alias("a")
    return (
        b.join(a, "doc_id", "full_outer")
        .where(
            (F.col("b.span_seq") != F.col("a.span_seq"))
            | F.col("b.span_seq").isNull()
            | F.col("a.span_seq").isNull()
        )
        .count()
    )
