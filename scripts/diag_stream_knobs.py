"""A/B the StreamingPipeline micro-batch knobs on the bench stream corpus.

Three configurations of the same 4-micro-batch curation stream (min-of-2
each, one session): session defaults; + output_files/shuffle_partitions
(micro-batch-sized file counts and shuffles — AQE never coalesces
streaming plans); + parallel_sinks (overlap the two sink appends from the
materialized cache). Writes the measured walls to stdout; the committed
``diag_stream_knobs.out`` holds a representative run backing the runner
docstrings and the bench's knob choices.

Usage: python scripts/diag_stream_knobs.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# capture the optional sf_dir BEFORE resetting argv for bench's import-time parser
_SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
sys.argv = [sys.argv[0]]

import bench  # noqa: E402  (repo root on path)
from mega_data_factory_spark.session import get_spark  # noqa: E402
from mega_data_factory_spark.streaming import StreamingPipeline  # noqa: E402

CONFIGS = [
    ("defaults", {}),
    ("sized (output_files=4, shuffle_partitions=8)", dict(output_files=4, shuffle_partitions=8)),
    (
        "sized + parallel_sinks",
        dict(output_files=4, shuffle_partitions=8, parallel_sinks=True),
    ),
]


def main() -> None:
    sf_dir = _SF_DIR
    spark = get_spark("diag-stream-knobs", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.range(1).count()
    tmp = tempfile.mkdtemp(prefix="mdf_diag_knobs_")
    try:
        src, n_in = bench._stream_src(spark, sf_dir, tmp)
        print(f"corpus: {n_in} rows, 8 files, maxFilesPerTrigger=2 -> 4 micro-batches")
        results = {}
        for rep in range(2):
            for ci, (label, kw) in enumerate(CONFIGS):
                # checkpoint dirs must be unique per (config, rep): a reused
                # checkpoint considers the files processed and no-ops
                name = f"cfg{ci}_rep{rep}"
                cfg = bench._stream_cfg(src, tmp, name)
                schema = spark.read.parquet(src).schema
                stream = (
                    spark.readStream.schema(schema).option("maxFilesPerTrigger", "2").parquet(src)
                )
                t0 = time.perf_counter()
                q = StreamingPipeline(
                    cfg, checkpoint_dir=os.path.join(tmp, name, "ckpt"), **kw
                ).start(stream)
                q.awaitTermination()
                w = time.perf_counter() - t0
                results[label] = min(results.get(label, float("inf")), w)
        base = results[CONFIGS[0][0]]
        for label, _ in CONFIGS:
            w = results[label]
            print(f"{label}: {w:.3f}s  ({n_in/w:,.0f} rec/s, {100*(base-w)/base:+.0f}% vs defaults)")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
