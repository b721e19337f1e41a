"""JSONL transcript source: schema-on-read ingestion of the north-rule
transcript schema from newline-delimited JSON — the interchange format
transcript dumps usually arrive in before they are parquet-ified.

Scale posture:
- The schema is EXPLICIT (datagen.TRANSCRIPT_SCHEMA): no sampling pass
  over a 100 TB drop to infer types, and a field that drifts type
  lands in the corrupt-record column instead of silently retyping the
  whole read.
- mode=PERMISSIVE + columnNameOfCorruptRecord: malformed lines are
  quarantined per row, not fatal per job; `read_transcripts_jsonl`
  returns the clean rows and (optionally) the quarantine for a
  dead-letter sink.
- Plain-text JSONL splits by line, so one big file still parallelizes
  across tasks. Gzip does NOT split (one task per .gz file) — prefer
  uncompressed or zstd for ingest drops.
- ts is parsed with an explicit timestampFormat (ISO-8601 with
  microseconds), session timezone UTC — no locale-dependent parsing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from .datagen import TRANSCRIPT_SCHEMA

_CORRUPT = "_corrupt_record"


def read_transcripts_jsonl(
    spark: SparkSession, path: str, keep_corrupt: bool = False
) -> DataFrame:
    """Read north-rule transcripts from JSONL.

    keep_corrupt=False (default) returns only well-formed rows in
    TRANSCRIPT_SCHEMA column order. keep_corrupt=True additionally
    keeps the `_corrupt_record` column (NULL for good rows) so the
    caller can route bad lines to a dead-letter sink — materialize
    FULL rows when doing so (Spark rejects plans whose scan references
    ONLY the corrupt column, e.g. a bare filter+count on it).

    The clean-path filter is `ts IS NOT NULL` rather than
    `_corrupt_record IS NULL`: the two are equivalent (ts is mandatory
    in the north-rule schema, and a malformed line parses every data
    column as NULL), but filtering on a data column keeps simple
    row-count/validation queries off the corrupt-column-only
    restriction above.
    """
    schema = T.StructType(
        TRANSCRIPT_SCHEMA.fields + [T.StructField(_CORRUPT, T.StringType(), True)]
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .json(path)
    )
    if keep_corrupt:
        return df
    return df.where(F.col("ts").isNotNull()).select(
        *[f.name for f in TRANSCRIPT_SCHEMA.fields]
    )


def write_transcripts_jsonl(df: DataFrame, path: str) -> None:
    """Write transcripts as JSONL with the matching timestamp format
    (round-trips through read_transcripts_jsonl bit-for-bit)."""
    df.select(*[f.name for f in TRANSCRIPT_SCHEMA.fields]).write.mode(
        "overwrite"
    ).option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").json(path)
