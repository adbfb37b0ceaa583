"""Diff-upsert station registry sink (SURVEY.md K3/T5).

The reference reads the current S3 station object and skips the PUT
when the serialized JSON is byte-identical (providers.js:94-132).
Spark-first on plain parquet (no Delta in this environment):

1. content-hash both sides (md5 of the canonical JSON serialization —
   nulls stripped like station.js:176-184);
2. **anti-join new vs existing on (key, content_hash)** → only
   changed/new stations survive (the write-elision, J5);
3. merge: changed rows replace same-key existing rows (first-wins
   window on priority), everything else carries over;
4. atomic swap of the store directory.

At 100 TB station dims stay tiny relative to measures, but the same
merge works at any size: it's one hash-partitioned join on the key.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def content_hash(df: DataFrame, key: str) -> DataFrame:
    """md5 over the canonical row JSON (sorted struct fields, nulls
    dropped at serialize — C12)."""
    cols = sorted(c for c in df.columns if c != key)
    return df.withColumn(
        "content_hash",
        F.md5(F.to_json(F.struct(*[F.col(c) for c in cols]), {"ignoreNullFields": "true"})),
    )


def diff_upsert(
    spark: SparkSession, new: DataFrame, store_path: str, key: str
) -> dict[str, int]:
    """Merge ``new`` into the parquet store at ``store_path``; returns
    counts {written, skipped_unchanged, total}."""
    hashed_new = content_hash(new, key)
    if os.path.exists(store_path):
        existing = spark.read.parquet(store_path)
    else:
        existing = spark.createDataFrame([], hashed_new.schema)

    # write elision: drop new rows whose (key, hash) already exists
    changed = hashed_new.join(
        existing.select(key, "content_hash"), on=[key, "content_hash"], how="left_anti"
    )
    n_new, n_changed = new.count(), changed.count()

    merged = changed.withColumn("_prio", F.lit(0)).unionByName(
        existing.withColumn("_prio", F.lit(1))
    )
    # content_hash tiebreaks same-key same-prio rows (a batch carrying
    # two different updates for one key) — fully deterministic merge,
    # same bar the dedup operators hold themselves to
    w = Window.partitionBy(key).orderBy(
        F.col("_prio").asc(), F.col("content_hash").asc()
    )
    result = (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_prio")
    )

    # stage NEXT TO the store so the renames below are same-filesystem
    # (a cross-fs shutil.move degrades to a non-atomic copy), and swap
    # by renaming the old store aside first — a crash mid-swap leaves
    # either the old or the new store in place, never neither
    parent = os.path.dirname(os.path.abspath(store_path)) or "."
    os.makedirs(parent, exist_ok=True)
    tag = uuid.uuid4().hex[:10]
    tmp = os.path.join(parent, f".{os.path.basename(store_path)}.new.{tag}")
    result.write.mode("overwrite").parquet(tmp)
    old = os.path.join(parent, f".{os.path.basename(store_path)}.old.{tag}")
    if os.path.exists(store_path):
        os.rename(store_path, old)
    os.rename(tmp, store_path)
    if os.path.exists(old):
        shutil.rmtree(old)
    return {
        "written": n_changed,
        "skipped_unchanged": n_new - n_changed,
        "total": spark.read.parquet(store_path).count(),
    }
