"""Streaming amortization lever test (VERDICT r8 #6): does ~4M rows / 2
triggers put the streaming total-wall ratio <= 1.5 without definitional
help? Measures, at sf0.1: the curation workload streamed as 2 x ~2M-row
triggers (bench.py's streaming_pipeline_2m shape, doubled), its one-shot
batch wall, and the two-job floor (2x the one-shot wall of a half corpus)
— same min-of-2 and ratio definitions as the bench.

Usage: python scripts/diag_stream_4m.py [sf_dir] [rows]
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
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    n_files = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    fpt = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    spark = get_spark("diag-stream-4m", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()

    from bench import _batch_pipeline_same, _stream_src, _streaming_pipeline

    tmp = tempfile.mkdtemp(prefix="mdf_stream4m_")
    try:
        src, n = _stream_src(spark, sf_dir, tmp, rows_target=rows, name="s4m", n_files=n_files)
        print(f"corpus: {n} rows in {n_files} files, {fpt} files/trigger", flush=True)
        dt = float("inf")
        trig: list[float] = []
        for i in range(2):
            wall, t = _streaming_pipeline(
                spark, src, tmp, f"s{i}", files_per_trigger=fpt,
                shuffle_partitions=32, output_files=4,
            )
            print(f"  stream pass {i}: wall {wall:.2f}s triggers {[round(x,2) for x in t]}", flush=True)
            if wall < dt:
                dt, trig = wall, t
        batch = float("inf")
        for i in range(2):
            b = _batch_pipeline_same(spark, src, tmp, f"b{i}")
            print(f"  batch pass {i}: {b:.2f}s", flush=True)
            batch = min(batch, b)
        src_half, n_half = _stream_src(
            spark, sf_dir, tmp, rows_target=rows // 2, name="s4m_half", n_files=max(n_files // 2, 1)
        )
        bh = float("inf")
        for i in range(2):
            b = _batch_pipeline_same(spark, src_half, tmp, f"h{i}")
            print(f"  half-batch pass {i}: {b:.2f}s ({n_half} rows)", flush=True)
            bh = min(bh, b)
        print(
            f"RESULT rows={n} files={n_files} fpt={fpt} stream_wall={dt:.2f} "
            f"triggers={[round(x,2) for x in trig]} "
            f"batch={batch:.2f} total_wall_ratio={dt/batch:.2f} "
            f"two_job_batch={2*bh:.2f} vs_two_job={dt/(2*bh):.2f}",
            flush=True,
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
