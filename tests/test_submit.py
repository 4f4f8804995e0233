"""North-rule launch evidence: the quality-filter pipeline genuinely runs via
``spark-submit --py-files <zip> examples/submit_driver.py filter <in> <out>``
— the exact cluster launch mode the north rule names — as a real subprocess.

The package is available to the child ONLY through ``--py-files`` (PYTHONPATH
is stripped and the working directory is outside the repo), so this test fails
if the zip layout, the zip-import guard in ``session._ship_package``, or the
external-master detection in ``get_spark`` breaks.  The second run proves
checkpoint-resume works through the same launch path (manifest-complete ⇒
zero partitions reprocessed).
"""

import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)

N_ROWS, N_PARTS = 400, 2


def _submit(cmd_args, cwd):
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    cmd = [
        SPARK_SUBMIT,
        "--master", "local[4]",
        "--driver-memory", "4g",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=8",
    ] + cmd_args
    return subprocess.run(
        cmd, cwd=str(cwd), env=env, capture_output=True, text=True, timeout=420
    )


def test_spark_submit_pyfiles_filter_and_resume(spark, tmp_path):
    from dataqualitycontroltool_spark.cli import build_pyfiles_zip
    from dataqualitycontroltool_spark.graft import synth

    in_path = tmp_path / "corpus"
    out_path = tmp_path / "out"
    synth.write_images(spark, str(in_path), N_ROWS, N_PARTS, seed=7)
    zpath = build_pyfiles_zip()

    args = [
        "--py-files", zpath,
        str(REPO / "examples" / "submit_driver.py"),
        "filter", str(in_path), str(out_path),
    ]
    run1 = _submit(args, tmp_path)
    assert run1.returncode == 0, run1.stderr[-4000:]
    stats = json.loads(run1.stdout.strip().splitlines()[-1])
    assert stats["partitions_processed"] == N_PARTS
    assert stats["rows_in"] == N_ROWS
    assert 0 < stats["kept"] < N_ROWS  # keep/drop is non-trivial by synth design

    # output layout: one parquet dir per input partition + one lineage
    # marker per partition (object-store-safe commit protocol)
    markers = sorted((out_path / "_manifest").glob("part-*.json"))
    assert len(markers) == N_PARTS
    result = spark.read.parquet(*[str(out_path / f"part={p}") for p in range(N_PARTS)])
    assert result.count() == N_ROWS
    assert {"image_id", "keep", "caption_scrubbed"} <= set(result.columns)

    # resume through the same spark-submit path: everything already done
    run2 = _submit(args, tmp_path)
    assert run2.returncode == 0, run2.stderr[-4000:]
    stats2 = json.loads(run2.stdout.strip().splitlines()[-1])
    assert stats2["partitions_processed"] == 0
