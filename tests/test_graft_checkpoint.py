"""Checkpoint/resume semantics (north_rule: resumable per partition with
per-partition lineage + metrics): a run interrupted after K partitions and
then resumed must produce byte-identical keep/drop output to a single-shot
run, and must not re-process completed partitions."""

import pandas as pd
import pytest

from dataqualitycontroltool_spark.graft import checkpoint, synth
from dataqualitycontroltool_spark.graft.pipeline import run_pipeline
from dataqualitycontroltool_spark.graft.rules import KeepDropConfig

N_ROWS, N_PARTS = 400, 4


@pytest.fixture(scope="module")
def paths(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("ckpt")
    in_path = str(root / "input")
    synth.write_images(spark, in_path, N_ROWS, N_PARTS, seed=42)
    return in_path, str(root / "out"), str(root / "out_oneshot")


def test_resume_matches_single_shot(spark, paths):
    in_path, out_path, _ = paths
    cfg = KeepDropConfig()

    # simulate a crash after 2 of 4 partitions
    first = checkpoint.run_resumable(spark, in_path, out_path, cfg, max_partitions=2)
    assert [r["part"] for r in first] == [0, 1]
    assert len(checkpoint.read_manifest(out_path)) == 2

    # resume: only the remaining partitions run
    second = checkpoint.run_resumable(spark, in_path, out_path, cfg)
    assert [r["part"] for r in second] == [2, 3]
    manifest = checkpoint.read_manifest(out_path)
    assert len(manifest) == 4
    assert sum(r["rows_in"] for r in manifest.values()) == N_ROWS

    # third call: nothing left
    assert checkpoint.run_resumable(spark, in_path, out_path, cfg) == []

    resumed = (
        checkpoint.read_output(spark, out_path)
        .select("image_id", "keep", "drop_reason", "caption_scrubbed")
        .toPandas().sort_values("image_id").reset_index(drop=True)
    )
    oneshot = (
        run_pipeline(spark.read.parquet(in_path), cfg)
        .select("image_id", "keep", "drop_reason", "caption_scrubbed")
        .toPandas().sort_values("image_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(resumed, oneshot)


def test_lineage_manifest_contents(spark, paths):
    in_path, out_path, _ = paths
    manifest = checkpoint.read_manifest(out_path)
    for row in manifest.values():
        assert row["rows_in"] == row["kept"] + row["dropped"]
        assert row["wall_s"] > 0
        assert row["rows_scrubbed"] >= 0


def test_catalog_table_ref_input(spark, paths, tmp_path):
    """in_path may be a catalog table ref instead of a parquet path (the
    Iceberg surface on a real cluster): same manifest, same output.  A temp
    view exercises the spark.table dispatch + the distinct-scan fallback of
    corpus_partitions (the Iceberg .partitions metadata path needs the
    Iceberg runtime, absent in this sandbox)."""
    from dataqualitycontroltool_spark.graft.io import (
        corpus_partitions, is_table_ref, read_corpus)

    in_path, out_path, _ = paths
    assert not is_table_ref(in_path) and not is_table_ref("file:/x/y")
    assert is_table_ref("cat.db.images") and is_table_ref("images")

    spark.read.parquet(in_path).createOrReplaceTempView("corpus_v")
    assert read_corpus(spark, "corpus_v").count() == N_ROWS
    assert corpus_partitions(spark, "corpus_v") == list(range(N_PARTS))

    out_tbl = str(tmp_path / "out_tbl")
    rows = checkpoint.run_resumable(spark, "corpus_v", out_tbl, KeepDropConfig())
    assert [r["part"] for r in rows] == list(range(N_PARTS))
    got = (checkpoint.read_output(spark, out_tbl)
           .select("image_id", "keep").toPandas()
           .sort_values("image_id").reset_index(drop=True))
    exp = (checkpoint.read_output(spark, out_path)
           .select("image_id", "keep").toPandas()
           .sort_values("image_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)


def test_uri_out_path_and_manifest_on_hadoop_fs(spark, paths, tmp_path):
    """On a cluster ``out_path`` is an HDFS/object-store URI, not a local
    path.  A ``file:`` URI exercises the same Hadoop FileSystem dispatch:
    the manifest markers must land under the URI (not the driver cwd),
    resume must see them, and the output must match the plain-path run."""
    in_path, out_path, _ = paths
    uri_out = "file:" + str(tmp_path / "out_uri")

    first = checkpoint.run_resumable(
        spark, in_path, uri_out, KeepDropConfig(), max_partitions=1)
    assert [r["part"] for r in first] == [0]
    # marker is physically under the URI's local mapping
    assert (tmp_path / "out_uri" / "_manifest" / "part-0.json").exists()

    rest = checkpoint.run_resumable(spark, in_path, uri_out, KeepDropConfig())
    assert [r["part"] for r in rest] == [1, 2, 3]

    got = (checkpoint.read_output(spark, uri_out)
           .select("image_id", "keep").toPandas()
           .sort_values("image_id").reset_index(drop=True))
    exp = (checkpoint.read_output(spark, out_path)
           .select("image_id", "keep").toPandas()
           .sort_values("image_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)


def test_legacy_jsonl_manifest_still_read(spark, tmp_path):
    """Outputs written by older versions carry a single ``_manifest.jsonl``;
    resume must honor it (and per-part markers take precedence)."""
    out = tmp_path / "legacy_out"
    out.mkdir()
    (out / "_manifest.jsonl").write_text(
        '{"part": 0, "rows_in": 10, "kept": 7, "dropped": 3}\n'
        '{"part": 1, "rows_in": 10, "kept": 10, "dropped": 0}\n'
    )
    (out / "_manifest").mkdir()
    (out / "_manifest" / "part-1.json").write_text(
        '{"part": 1, "rows_in": 10, "kept": 9, "dropped": 1}\n'
    )
    manifest = checkpoint.read_manifest(str(out), spark)
    assert sorted(manifest) == [0, 1]
    assert manifest[0]["kept"] == 7
    assert manifest[1]["kept"] == 9  # marker wins over the legacy line


def test_corrupt_marker_treated_as_not_done(spark, tmp_path):
    """A crash between marker create() and write leaves an empty/truncated
    file; resume must treat that partition as NOT done (and re-run it), not
    wedge every future run on a JSONDecodeError."""
    in_path = str(tmp_path / "input")
    synth.write_images(spark, in_path, 200, 2, seed=3)
    out = str(tmp_path / "out")

    checkpoint.run_resumable(spark, in_path, out, KeepDropConfig())
    assert sorted(checkpoint.read_manifest(out, spark)) == [0, 1]

    # simulate the crash window: truncate one marker
    import pathlib
    (pathlib.Path(out) / "_manifest" / "part-1.json").write_text("")
    assert sorted(checkpoint.read_manifest(out, spark)) == [0]

    redo = checkpoint.run_resumable(spark, in_path, out, KeepDropConfig())
    assert [r["part"] for r in redo] == [1]  # re-ran exactly the broken one
    assert sorted(checkpoint.read_manifest(out, spark)) == [0, 1]


def test_bare_relative_path_is_not_a_table_ref(tmp_path, monkeypatch):
    from dataqualitycontroltool_spark.graft.io import is_table_ref

    (tmp_path / "corpus").mkdir()
    monkeypatch.chdir(tmp_path)
    assert not is_table_ref("corpus")       # existing bare dir = path
    assert is_table_ref("corpus_missing")   # nonexistent bare name = table
