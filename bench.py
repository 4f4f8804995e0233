#!/usr/bin/env python
"""Per-round benchmark: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is FULLY executed via a noop-format write — every output column is
materialized, nothing is collected to the driver — and timed after a warm-up of
the SparkSession; the JVM/session startup cost is excluded — at 100TB scale,
session startup is amortized to zero, so including it would only measure the
sandbox.  (An earlier version timed `df.count()`, which lets Catalyst prune
computed projection columns: a pure-projection query like text_simhash measured
0.23s under count() vs 4.34s real — every timing here is the real number.)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import __spark_entry__ as entry_mod  # noqa: E402
from dataqualitycontroltool_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("dqc-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    queries = entry_mod.queries()
    # warm-up: touch every table so OS page cache / parquet footers are hot
    from dataqualitycontroltool_spark.sources.tables import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    timings: dict[str, float] = {}
    for name, fn in queries.items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        # noop write = full execution of EVERY column (count() would let
        # Catalyst prune computed projections — perf gotcha #2)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    payload = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "graft": _graft_throughput(spark, cpus),
        "graft_hamming": _graft_hamming(spark),
        "graft_real_jpeg": _graft_real_jpeg(spark),
        "graft_real_webp": _graft_real_webp(spark),
        "dicom_10k": _dicom_scale(spark),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": cpus,
    }
    line = json.dumps(payload)
    print(line)
    _persist_full_artifact(line)


def _persist_full_artifact(line: str) -> None:
    """Write the complete bench JSON to BENCH/r{N}_full.json so the round's
    perf record never depends on the driver's 4096-char stdout tail capture
    (BENCH_r03.json arrived with "parsed": null — VERDICT r3 #3).  The round
    number comes from $SPARK_GRAFT_ROUND if set, else the highest existing
    BENCH_r*.json in the repo root + 1 (the driver writes that file AFTER
    this script runs, so current round = max + 1)."""
    import re

    root = Path(__file__).resolve().parent
    rnd = os.environ.get("SPARK_GRAFT_ROUND")
    if not rnd:
        seen = [
            int(m.group(1))
            for p in root.glob("BENCH_r*.json")
            if (m := re.match(r"BENCH_r(\d+)\.json$", p.name))
        ]
        rnd = str(max(seen, default=0) + 1)
    try:
        out = root / "BENCH" / f"r{int(rnd):02d}_full.json"
        out.parent.mkdir(exist_ok=True)
        out.write_text(line + "\n")
        print(f"full bench artifact: {out}", file=sys.stderr)
    except (OSError, ValueError) as exc:
        # never fail the bench over the side artifact (a non-numeric
        # $SPARK_GRAFT_ROUND lands here too)
        print(f"could not write full bench artifact: {exc}", file=sys.stderr)


def _dicom_scale(spark, n_files: int = 10_000) -> dict:
    """The full DICOM report plan (decode → consensus → 5 report tables)
    at a 10k-file synthetic tree — verifies the melt/consensus plan and the
    files-per-task partition sizing hold beyond the 146-file fixture.

    Warm-up pass (25% of files, untimed) first — the r4 verdict's 671-1,259
    files/s cross-round variance was isolated (r5, PLANS.md) to the COLD
    first run: the tree is generated executor-side in memory (no disk I/O,
    so page cache is irrelevant); the spread was the ~8s pandas-UDF
    worker-fleet spawn + codegen cost, whose share of an 11s cold run moves
    with box load.  Warm runs sit at 3.7-4.0s.  Same discipline as
    _timed_graft."""
    from dataqualitycontroltool_spark.sources import dicom as dcm

    warm = dcm.synth_dicom_frame(spark, n_files // 4, invalid_every=997)
    for v in dcm.dicom_report_tables(dcm.decode_headers(warm).localCheckpoint()).values():
        v.count()
    files = dcm.synth_dicom_frame(spark, n_files, invalid_every=997)
    t0 = time.perf_counter()
    headers = dcm.decode_headers(files).localCheckpoint()
    reps = dcm.dicom_report_tables(headers)
    counts = {k: v.count() for k, v in reps.items()}
    wall = time.perf_counter() - t0
    return {"files": n_files, "wall_s": round(wall, 2),
            "files_per_sec": round(n_files / wall, 1),
            "valid_seqs": counts["validsequences"],
            "invalid_seqs": counts["invalidsequences"]}


def _timed_graft(spark, rows: int, out_tag: str, cfg=None, **write_kwargs) -> dict:
    """Shared graft-throughput harness: build the corpus once per boot
    (cached on disk), spawn the Python UDF worker fleet with a 25%
    warm-up pass, then time ONE full pipeline write.  All graft metrics
    (stub, hamming, real-JPEG, real-WebP) share this shape so a change to
    the warm-up or timing discipline lands everywhere at once."""
    from pyspark.sql import functions as F

    from dataqualitycontroltool_spark.graft.pipeline import run_pipeline
    from dataqualitycontroltool_spark.graft.synth import write_images

    tag = "".join(f"_{k}" for k in sorted(write_kwargs)) or ""
    path = f"/tmp/dqc_bench_images{tag}_{rows}"
    if not os.path.exists(f"{path}/_SUCCESS"):
        write_images(spark, path, rows, n_partitions=32, **write_kwargs)
    df = spark.read.parquet(path)
    n = df.count()
    warm = df.where(F.pmod(F.xxhash64("image_id"), F.lit(4)) == 0)
    run_pipeline(warm, cfg).write.mode("overwrite").parquet(
        f"/tmp/dqc_bench_warm_{out_tag}"
    )
    t0 = time.perf_counter()
    run_pipeline(df, cfg).write.mode("overwrite").parquet(
        f"/tmp/dqc_bench_out_{out_tag}"
    )
    wall = time.perf_counter() - t0
    return {"rows": n, "wall_s": round(wall, 2),
            "images_per_sec": round(n / wall, 1)}


def _graft_hamming(spark, rows: int = 8000) -> dict:
    """Full pipeline with the phash NEAR-duplicate index (banded hamming +
    connected components, max_hamming=3) instead of exact-match dedup — the
    north-star's perturbed-image case (re-encodes / slight crops whose
    phash differs by a few bits).  Reuses the main graft corpus so the two
    numbers isolate the hamming index's cost."""
    from dataqualitycontroltool_spark.graft.pipeline import KeepDropConfig

    return _timed_graft(spark, rows, "ham", cfg=KeepDropConfig(dedupe_hamming=3))


def _graft_real_jpeg(spark, rows: int = 4000) -> dict:
    """Same pipeline over a corpus where every jpeg row (~35% of rows) is a
    GENUINE baseline T.81/JFIF bitstream decoded by the built-in numpy
    codec — the honest cost of real-bitstream decode through the Spark
    plumbing, reported separately so the main graft number stays comparable
    across rounds (stub codec, unchanged input)."""
    return _timed_graft(spark, rows, "rj", real_jpeg_frac=1.0)


def _graft_real_webp(spark, rows: int = 4000) -> dict:
    """Same pipeline over a corpus where every webp row (~15% of rows) is a
    GENUINE lossless RIFF/VP8L bitstream decoded by the built-in numpy
    codec (graft/vp8l.py) — the real-WebP twin of _graft_real_jpeg, new in
    r4 with the VP8L codec."""
    return _timed_graft(spark, rows, "rw", real_webp_frac=1.0)


def _graft_throughput(spark, cpus: int, rows: int = 8000) -> dict:
    """Images/sec of the full quality-filter pipeline at this session's
    parallelism (ties BENCH_r{N}.json to BASELINE.md's throughput target;
    the N-vs-4N scaling evidence lives in bench_scaling.py / BENCH/)."""
    return _timed_graft(spark, rows, "main")


if __name__ == "__main__":
    main()
