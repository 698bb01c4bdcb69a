"""Batch checkpoint/resume: an idempotent processed-file manifest.

The reference resumes interrupted runs with per-shard ``records_processed``
skip counts (framework/base.py:20-33, framework/loader_worker.py:133-140,
236-252). Under Spark the natural resume unit is the input FILE, not a
record offset: tasks are retried idempotently within a run, so the only
state worth persisting across runs is "which input files already reached
the sink". A JSON-lines manifest records each processed file with the run
id; the next run subtracts manifest entries from the source listing and
reads only the remainder. This is exactly Structured Streaming's file-
source checkpoint contract, kept dependency-free for batch mode.

Scale note: the manifest lists file paths (one short line per input file
— ~100 bytes x #files, driver-side). At 100 TB with 128 MB files that is
~800k lines / ~80 MB — fine as a single JSON-lines object; beyond that,
partition the manifest by date prefix or move to a table.
"""

from __future__ import annotations

import glob
import json
import os
import time

_EXT = {"parquet": ".parquet", "json": ".json", "csv": ".csv", "orc": ".orc", "text": ".txt"}


def list_input_files(path: str, fmt: str = "parquet") -> list[str]:
    """Deterministic (sorted) listing of the source's data files — the
    reference sorts its file list for shard stability
    (huggingface_loader.py:71)."""
    if os.path.isfile(path):
        return [path]
    ext = _EXT.get(fmt, "")
    # isfile filter on BOTH branches: a DIRECTORY matching the extension
    # glob (e.g. a dataset dir literally named data.parquet) would be
    # listed alongside its part files and read twice
    files = [p for p in glob.glob(os.path.join(path, f"**/*{ext}"), recursive=True) if os.path.isfile(p)]
    if not files:  # directory of files without the expected extension
        files = [p for p in glob.glob(os.path.join(path, "**/*"), recursive=True) if os.path.isfile(p)]
    return sorted(p for p in files if not os.path.basename(p).startswith(("_", ".")))


def processed_files(manifest_path: str) -> set[str]:
    if not os.path.exists(manifest_path):
        return set()
    out: set[str] = set()
    with open(manifest_path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.add(json.loads(line)["file"])
    return out


def unprocessed_files(path: str, manifest_path: str, fmt: str = "parquet") -> list[str]:
    done = processed_files(manifest_path)
    return [p for p in list_input_files(path, fmt) if p not in done]


def mark_processed(manifest_path: str, files: list[str], run_id: str) -> None:
    """Append-only, written AFTER the sink write succeeds — a crash between
    sink and manifest re-processes those files (at-least-once, same as the
    reference's checkpoint_interval granularity); with an append-mode sink
    that means duplicate rows, so pair resume with a dedup stage or an
    overwrite-by-partition sink for exactly-once output."""
    os.makedirs(os.path.dirname(manifest_path) or ".", exist_ok=True)
    ts = time.time()
    with open(manifest_path, "a") as f:
        for p in files:
            f.write(json.dumps({"file": p, "run_id": run_id, "ts": ts}) + "\n")
