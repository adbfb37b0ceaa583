"""Small-files compaction — the unglamorous op every long-running
pipeline needs (SURVEY §2.9 partitioning hygiene).

Streaming sinks and fine-grained partitionBy layouts accrete many small
files; at scale each file is a task, a name-node/listing entry, and a
scheduling unit, so a table of 10⁶ kilobyte files can cost more to PLAN
than to read. Compaction rewrites a prefix into ~target-sized files.

Shape: one read → coalesce(ceil(bytes/target)) → write to a temp
prefix → atomic directory swap. ``coalesce`` (not ``repartition``)
keeps it shuffle-free: existing partitions concatenate map-side. The
swap here is the local-FS rename; an object-store deployment swaps a
manifest/pointer instead (same two-phase publish the measures sink
uses) — the compaction PLAN is identical.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import SparkSession


def parquet_bytes(path: str) -> int:
    """Total bytes of parquet data under ``path`` (local FS walk)."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    return total


def parquet_file_count(path: str) -> int:
    return sum(
        f.endswith(".parquet")
        for _root, _dirs, files in os.walk(path)
        for f in files
    )


def compact_parquet(
    spark: SparkSession, path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> int:
    """Rewrite the parquet prefix at ``path`` into ceil(bytes/target)
    files. Returns the new file count. Shuffle-free (coalesce) and
    atomic on the reader side: readers see the old layout until the
    final swap."""
    n_files = max(1, math.ceil(parquet_bytes(path) / target_file_bytes))
    tmp = f"{path}.compact-{uuid.uuid4().hex[:8]}"
    spark.read.parquet(path).coalesce(n_files).write.mode("overwrite").parquet(tmp)
    bak = f"{path}.bak-{uuid.uuid4().hex[:8]}"
    os.replace(path, bak) if os.path.isfile(path) else shutil.move(path, bak)
    shutil.move(tmp, path)
    shutil.rmtree(bak)
    return parquet_file_count(path)
