"""Fixture staging shared by the lakehouse queries: every Delta /
Iceberg / Hudi fixture needs single-file parquet parts with CHOSEN
names (Spark's writer emits its own part-file names into a directory),
and before round 13 each query carried its own copy of the
stage-and-rename closure — nine in evolution.py alone. One helper, one
place to fix the pattern."""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame


def stage_single_parquet(
    df: DataFrame, stage_root: str, dest_dir: str, name: str
) -> str:
    """Write ``df`` as EXACTLY ONE parquet file at
    ``dest_dir/name`` (name may contain subdirectories, e.g.
    Hive-style ``prio=0/part-0.parquet``) and return the destination
    path. Stages through a throwaway directory because Spark's writer
    controls its own file names."""
    tmp = os.path.join(stage_root, f"stage_{uuid.uuid4().hex}")
    df.coalesce(1).write.parquet(tmp)
    src = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    dest = os.path.join(dest_dir, name)
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    os.replace(os.path.join(tmp, src), dest)
    shutil.rmtree(tmp, ignore_errors=True)
    return dest


def stage_many_parquet(
    jobs, stage_root: str, dest_dir: str
) -> list[str]:
    """Stage several independent single-file parquet parts
    concurrently (guide §2.6: independent fixture writes are separate
    Spark jobs that otherwise serialize their stage tails). ``jobs``
    is a sequence of (df, name); returns destination paths in order."""
    from spark_hive_spark.scratch import run_parallel

    return run_parallel(*(
        lambda df=df, name=name: stage_single_parquet(
            df, stage_root, dest_dir, name
        )
        for df, name in jobs
    ))
