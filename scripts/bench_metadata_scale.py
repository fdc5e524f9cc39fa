"""File-count scale datapoints for the Hudi metadata-table readers
(round 19, r18 verdict #5): the metadata table exists because real
tables have 1e5-1e7 data files — this script synthesizes `files`
partitions and `record_index` images at growing file/record counts
and measures what a reader TOUCHES per operation:

- files partition: one HoodieMetadataRecord per table partition
  (its map carries that partition's files, ~10 per partition here);
  the measured op is "list one partition" = one keyed point GET.
- record_index: one cell per record key; the op is one key lookup.

The claim under test: per-op touched blocks stay O(index levels)
(1 data block + at most 1 leaf-index block, root resident from
load-on-open) while the file TOTAL block count grows linearly with
entries — i.e. lookups scale with log(file count), not file count.

Usage: python scripts/bench_metadata_scale.py
Prints one markdown table per family for SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spark_hive_spark.sources.hfile import HFileReader, hfile_encode
from spark_hive_spark.sources.hudi_mor import enc_metadata_record


def files_partition_image(n_partitions: int, files_per: int = 10) -> bytes:
    cells = {}
    for p in range(n_partitions):
        key = f"date={p:07d}"
        cells[key.encode()] = enc_metadata_record(
            key, 2,
            {f"fg-{i}_0-1-0_001.parquet": (4096 * (i + 1), False)
             for i in range(files_per)},
        )
    return hfile_encode(cells, block_size=4096, max_root_entries=128)


def record_index_image(n_records: int) -> bytes:
    # value shape matches the RLI fixture's ~40-byte Avro payload
    val = b"\x00" * 38
    cells = {f"{k:09d}".encode(): val for k in range(n_records)}
    return hfile_encode(cells, block_size=4096, max_root_entries=128)


def probe(img: bytes, keys: list[bytes]) -> dict:
    rd = HFileReader(img)
    n_data_blocks = sum(
        len(rd._data_entries_from(i)) for i in range(len(rd.index))
    )
    rd2 = HFileReader(img)  # fresh counters, cold caches
    touched = []
    for k in keys:
        b0 = rd2.blocks_read + rd2.index_blocks_read
        rd2._leaf_cache.clear()  # force cold per probe
        assert rd2.get(k) is not None, k
        touched.append(rd2.blocks_read + rd2.index_blocks_read - b0)
    return {
        "entries": rd.entry_count,
        "levels": rd.levels,
        "data_blocks": n_data_blocks,
        "root_entries": len(rd.index),
        "size_mb": len(img) / 1e6,
        "max_touched": max(touched),
        "avg_touched": sum(touched) / len(touched),
    }


def main() -> None:
    print("## files partition (list one partition = keyed GET)")
    print("| partitions (~files) | image | data blocks | levels |"
          " blocks touched/get |")
    print("|---|---|---|---|---|")
    for n in (30, 300, 3000, 30000):
        t0 = time.time()
        img = files_partition_image(n)
        keys = [f"date={p:07d}".encode()
                for p in range(0, n, max(1, n // 50))]
        r = probe(img, keys)
        print(f"| {n} (~{n*10} files) | {r['size_mb']:.2f} MB "
              f"| {r['data_blocks']} | {r['levels']} "
              f"| max {r['max_touched']} (avg {r['avg_touched']:.2f}) |"
              f"  <!-- build {time.time()-t0:.1f}s -->")
    print()
    print("## record_index (one key lookup)")
    print("| records | image | data blocks | levels |"
          " blocks touched/get |")
    print("|---|---|---|---|---|")
    for n in (10_000, 100_000, 1_000_000):
        t0 = time.time()
        img = record_index_image(n)
        keys = [f"{k:09d}".encode()
                for k in range(0, n, max(1, n // 50))]
        r = probe(img, keys)
        print(f"| {n} | {r['size_mb']:.2f} MB | {r['data_blocks']} "
              f"| {r['levels']} "
              f"| max {r['max_touched']} (avg {r['avg_touched']:.2f}) |"
              f"  <!-- build {time.time()-t0:.1f}s -->")


if __name__ == "__main__":
    main()
