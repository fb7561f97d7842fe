"""Single-file ordered CSV sink (SURVEY §2.1 S4).

The Initializer-CSV contract is: one file, header row, caller-specified
column order, NULL rendered as the empty string (reference
concept_csv_export.py:183-190, location_csv_export.py:98-102).

A distributed engine writes one file per partition, so this helper keeps the
plan distributed through the final sort and only merges at the very end:
``coalesce(1)`` for metadata-scale exports (the reference's regime). For
data-scale outputs, pass ``single_file=False`` to emit a part-file directory
instead — same header/order/NULL policy per file.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import DataFrame


def write_single_csv(
    df: DataFrame,
    path: str,
    columns: list[str] | None = None,
    single_file: bool = True,
) -> None:
    if columns:
        df = df.select(*[f"`{c}`" for c in columns])
    # NULL→"" policy: emptyValue/nullValue write empty strings, matching the
    # reference's NULL collapse (concept_csv_export.py:577) without its
    # literal-"NULL" corruption bug.
    writer = (
        df.write.option("header", True)
        .option("nullValue", "")
        .option("emptyValue", "")
        .mode("overwrite")
    )
    if not single_file:
        writer.csv(path)
        return
    tmp = tempfile.mkdtemp(prefix="iniz_csv_")
    try:
        df.coalesce(1).write.option("header", True).option("nullValue", "").option(
            "emptyValue", ""
        ).mode("overwrite").csv(tmp)
        (part,) = glob.glob(os.path.join(tmp, "part-*.csv"))
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        shutil.move(part, path)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
