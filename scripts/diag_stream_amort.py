"""A/B the 1M-row / 2-trigger streaming amortization knobs.

The round-8 bench added streaming_pipeline_1m (~500k rows/trigger) and
measured 1.68x over the one-shot batch at shuffle_partitions=8 —
above the <=1.5 amortization bar. This diag sweeps the two per-batch
knobs (shuffle_partitions, output_files) at that trigger size to find
whether the residual is knob mis-sizing or genuine per-trigger floor.

Usage: python scripts/diag_stream_amort.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mega_data_factory_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("diag-stream-amort", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.range(1).count()

    import bench

    tmp = tempfile.mkdtemp(prefix="mdf_diag_amort_")
    try:
        src, n = bench._stream_src(spark, sf_dir, tmp, rows_target=1_000_000, name="src1m")
        print(f"corpus: {n} rows", flush=True)
        batch = min(bench._batch_pipeline_same(spark, src, tmp, f"b{i}") for i in range(2))
        print(f"batch: {batch:.3f}s", flush=True)
        for sp in (8, 16, 32):
            for of in (2, 4):
                tag = f"sp{sp}_of{of}"
                wall, trig = bench._streaming_pipeline(
                    spark, src, tmp, tag, files_per_trigger=4, shuffle_partitions=sp,
                    output_files=of,
                )
                print(
                    f"{tag}: wall {wall:.3f}s triggers {[round(t,2) for t in trig]} "
                    f"ratio {wall/batch:.2f}x",
                    flush=True,
                )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
