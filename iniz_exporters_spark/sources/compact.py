"""Small-file compaction for parquet directories.

Streaming sinks, per-partition writers, and frequent small appends leave
a long tail of tiny files; at cluster scale the resulting task-per-file
scheduling and NameNode/listing pressure dominate scan cost long before
IO does. Compaction rewrites a directory to a target file count sized by
the data's actual bytes, atomically (write to a sibling temp dir, then
swap), so readers never observe a half-rewritten directory.
"""

from __future__ import annotations

import os
import shutil
import uuid


def compact_parquet_dir(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite ``path`` with ceil(total_bytes / target) files (min 1).
    Returns the new file count. Uses the on-disk byte size — the honest
    proxy for post-compression output size — not row counts.
    """
    total = 0
    for root, _, files in os.walk(path):
        total += sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if f.endswith(".parquet")
        )
    n_files = max(1, -(-total // target_file_bytes))
    df = spark.read.parquet(path)
    tmp = f"{path.rstrip('/')}.__compact_{uuid.uuid4().hex[:8]}"
    df.repartition(n_files).write.parquet(tmp)
    old = f"{path.rstrip('/')}.__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n_files
