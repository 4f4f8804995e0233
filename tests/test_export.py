"""Deterministic shuffle-and-shard export (operators/export.py): total
pseudo-random order, balanced shards, engine-replayable assignment, and a
write path that preserves order with one file per shard."""

import pytest
from pyspark.sql import functions as F

from dataqualitycontroltool_spark.operators import export

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_shard_assignment_deterministic_and_total(spark, docs):
    a = export.shard_table(docs, "doc_id", 8).select("doc_id", "shard", "pos")
    b = export.shard_table(docs, "doc_id", 8).select("doc_id", "shard", "pos")
    ra, rb = (sorted(x.collect()) for x in (a, b))
    assert ra == rb  # rerun == rerun (no RNG state)
    n = docs.count()
    assert len(ra) == n
    # pos is a 1..k permutation within every shard
    per_shard = {}
    for r in ra:
        per_shard.setdefault(r.shard, []).append(r.pos)
    assert set(per_shard) == set(range(8))
    for shard, ps in per_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    # hash balance: no shard more than 2x the ideal share (binomial, n/8)
    assert max(len(p) for p in per_shard.values()) < 2 * (n / 8)


def test_shard_order_decorrelated_from_id_order(docs):
    # the whole point: storage order must not follow id (ingest) order
    rows = (
        export.shard_table(docs, "doc_id", 1)
        .orderBy("pos")
        .select("doc_id")
        .collect()
    )
    ids = [r.doc_id for r in rows]
    assert ids != sorted(ids)
    # Spearman-ish check: adjacent ids in shuffle order are rarely adjacent
    adjacent = sum(1 for x, y in zip(ids, ids[1:]) if abs(x - y) == 1)
    assert adjacent < len(ids) * 0.05


def test_write_shards_roundtrip_and_manifest(spark, docs, tmp_path):
    out = str(tmp_path / "shards")
    manifest = export.write_shards(
        docs, out, "doc_id", n_shards=4, token_col="n_chars"
    )
    m = {r.shard: (r.rows, r.tokens) for r in manifest.collect()}
    assert set(m) == set(range(4))
    assert sum(r for r, _ in m.values()) == docs.count()

    back = spark.read.parquet(out)  # _shards_manifest must be invisible
    assert back.count() == docs.count()
    want_tokens = docs.agg(F.sum(F.col("n_chars").cast("bigint"))).first()[0]
    assert sum(t for _, t in m.values()) == want_tokens

    # one data file per shard, rows stored in pos order within it
    for shard in range(4):
        part = spark.read.parquet(f"{out}/shard={shard}")
        files = [r[0] for r in part.select(F.input_file_name()).distinct().collect()]
        assert len(files) == 1
        stored = [r.pos for r in part.select("pos").collect()]
        assert stored == sorted(stored)


def test_bad_n_shards_raises(docs):
    with pytest.raises(ValueError, match="n_shards"):
        export.shard_table(docs, "doc_id", 0)


def test_oracle_parity_duckdb(spark, docs):
    """The md5-prefix shard/pos assignment replays exactly in DuckDB (the
    oracle contract for export_shards_documents)."""
    duckdb = pytest.importorskip("duckdb")
    got = sorted(
        export.shard_table(docs, "doc_id", 8)
        .select("doc_id", "shard", "pos")
        .collect()
    )
    want = sorted(
        duckdb.sql(
            f"""
            WITH h AS (
              SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || '|42') AS hh
              FROM read_parquet('{SF}/documents.parquet')
            )
            SELECT doc_id,
                   CAST(CAST(('0x' || substr(hh,1,8)) AS BIGINT) % 8 AS INT),
                   CAST(row_number() OVER (
                        PARTITION BY CAST(('0x' || substr(hh,1,8)) AS BIGINT) % 8
                        ORDER BY hh, doc_id) AS BIGINT)
            FROM h
            """
        ).fetchall()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_pack_sequences_invariants(spark, docs):
    seq = 512
    out = export.pack_sequences(
        docs, "doc_id", "n_chars", seq_tokens=seq, n_shards=4
    ).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    assert set(by_shard) == set(range(4))
    for rows in by_shard.values():
        rows.sort(key=lambda r: r.pos)
        cum = 0
        for r in rows:
            # token_offset is the exact running sum of the shard stream
            assert r.token_offset == cum
            assert r.seq_id == cum // seq
            assert r.seq_offset == cum % seq
            tok = r.n_chars or 0
            want_span = 0 if tok <= 0 else (cum + tok - 1) // seq - cum // seq + 1
            assert r.seq_span == want_span
            cum += tok
    # the fixture corpus must actually exercise boundary chopping
    assert any(r.seq_span >= 2 for r in out)


def test_pack_sequences_single_window_plan(docs):
    import io, contextlib

    df = export.pack_sequences(docs, "doc_id", "n_chars", 2048, 4)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # the expensive parts must not duplicate: both window functions share
    # one shard shuffle and one per-shard sort (they stream over the same
    # sorted run as separate Window passes — no extra exchange, no re-sort)
    assert sum(l.strip().startswith("(") and ") Exchange" in l for l in plan.splitlines()) == 1
    assert sum(l.strip().startswith("(") and ") Sort" in l for l in plan.splitlines()) == 1


def test_pack_sequences_bad_args(docs):
    with pytest.raises(ValueError, match="seq_tokens"):
        export.pack_sequences(docs, "doc_id", "n_chars", 0, 4)
    with pytest.raises(ValueError, match="n_shards"):
        export.pack_sequences(docs, "doc_id", "n_chars", 2048, 0)


def test_pack_sequences_adversarial_tokens(spark):
    """NULL / zero / window-sized / many-window documents: offsets stay an
    exact running sum, spans chop correctly, NULL counts as 0 tokens."""
    seq = 100
    rows = [
        (1, None),      # NULL tokens -> 0
        (2, 0),         # empty doc
        (3, 1),
        (4, 100),       # exactly one window
        (5, 99),
        (6, 1000),      # spans many windows
        (7, 101),       # one token over
        (8, 50),
    ]
    df = spark.createDataFrame(rows, "doc_id long, tok long")
    out = sorted(
        export.pack_sequences(df, "doc_id", "tok", seq, n_shards=1).collect(),
        key=lambda r: r.pos,
    )
    cum = 0
    for r in out:
        tok = r.tok or 0
        assert r.token_offset == cum
        assert r.seq_id == cum // seq and r.seq_offset == cum % seq
        want_span = 0 if tok <= 0 else (cum + tok - 1) // seq - cum // seq + 1
        assert r.seq_span == want_span
        cum += tok
    assert cum == 1351
    spans = {r.doc_id: r.seq_span for r in out}
    assert spans[1] == 0 and spans[2] == 0  # null/empty touch no window
    assert spans[6] >= 10  # the 1000-token doc crosses many windows
