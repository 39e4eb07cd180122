#!/usr/bin/env python3
"""Re-materialize a corpus dir with a MULTI-FILE parquet layout.

The driver-shipped sf dirs store each table as ONE parquet file with
1-3 row groups, which pins any scan-bound query to <=3 tasks however
many cores the session has (BASELINE.md q86/q214 analyses) — a layout
artifact no production table has. This rewrites each table as a
directory of K order-preserving part files (one row group each), the
layout a real ingest produces, so scan parallelism reflects the engine
rather than the fixture. Row ORDER is preserved globally (part-file
name order = original row order); no query depends on file order
anyway (positions in the corpus queries derive from data columns).

Usage: python3 tools/rechunk.py <srcSfDir> <outDir>
       python3 tools/rechunk.py /root/testdata/sf0.1 target/sf0.1-mrg

Sizing: tables >= 256 KB split into max(8, ceil(bytes/1MB)) parts
(capped 24); smaller dimension tables stay one file.
"""
import math
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def rechunk(src_dir: str, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        src = os.path.join(src_dir, f"{t}.parquet")
        size = (os.path.getsize(src) if os.path.isfile(src) else
                sum(os.path.getsize(os.path.join(src, f))
                    for f in os.listdir(src) if f.endswith(".parquet")))
        tbl = pq.read_table(src)
        k = 1 if size < 256 * 1024 else min(24, max(8, math.ceil(size / (1024 * 1024))))
        dst = os.path.join(out_dir, f"{t}.parquet")
        os.makedirs(dst, exist_ok=True)
        n = tbl.num_rows
        per = math.ceil(n / k) if k > 1 else n
        for i in range(k):
            lo = i * per
            part = tbl.slice(lo, min(per, n - lo)) if lo < n else tbl.slice(0, 0)
            pq.write_table(part, os.path.join(dst, f"part-{i:05d}.parquet"),
                           row_group_size=max(1, part.num_rows))
        print(f"{t}: {size} bytes, {n} rows -> {k} part(s)")


if __name__ == "__main__":
    rechunk(sys.argv[1], sys.argv[2])
