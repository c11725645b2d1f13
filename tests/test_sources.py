"""Source-client tests (SURVEY.md §2.1): CSV file client round-trip,
scaled-int iterator, deterministic generators, dictionary reader.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from timeseriesdb_spark.sources import clients


def test_csv_file_client_roundtrip(spark, tmp_path):
    p = tmp_path / "sig.csv"
    p.write_text("id,value\n1,1.5\n2,-2.25\n3,0.125\n")
    schema = StructType(
        [StructField("id", LongType()), StructField("value", DoubleType())]
    )
    df = clients.csv_file_client(spark, str(p), schema, skip_header=True)
    rows = sorted((r.id, r.value) for r in df.collect())
    assert rows == [(1, 1.5), (2, -2.25), (3, 0.125)]


def test_csv_custom_delimiter(spark, tmp_path):
    p = tmp_path / "sig.tsv"
    p.write_text("1\t1.5\n2\t2.5\n")
    schema = StructType(
        [StructField("id", LongType()), StructField("value", DoubleType())]
    )
    df = clients.csv_file_client(spark, str(p), schema, delimiter="\t")
    assert df.count() == 2


def test_scaled_int_client(spark, tmp_path):
    p = tmp_path / "vals.csv"
    p.write_text("1.2345\n-0.5\n2.0\n")
    df = clients.scaled_int_client(spark, str(p), p=3)
    got = sorted(r.scaled for r in df.collect())
    # floor semantics: 1.2345→1234, -0.5→-500, 2.0→2000
    assert got == [-500, 1234, 2000]


def test_generator_deterministic_across_partitioning(spark):
    a = clients.generator_client(spark, "normal", n_rows=1000, seed=7)
    b = clients.generator_client(spark, "normal", n_rows=1000, seed=7)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_generator_uniform_bounds(spark):
    df = clients.generator_client(spark, "uniform", n_rows=1000, lo=10.0, hi=20.0)
    from pyspark.sql import functions as F

    row = df.agg(F.min("value").alias("lo"), F.max("value").alias("hi")).first()
    assert 10.0 <= row.lo and row.hi < 20.0


def test_read_dict(spark, tmp_path):
    p = tmp_path / "dict.tsv"
    p.write_text("1.0\t2.0\t3.0\n4.0\t5.0\t6.0\n")
    df = clients.read_dict(spark, str(p))
    feats = [r.features for r in df.orderBy("row_id").collect()]
    assert feats == [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]]


def test_register_views_sql_session(spark):
    """The SQL front door: after register_views, any ANSI query over
    the star schema runs through spark.sql — including joins and
    window functions over the normalized events timestamps."""
    from timeseriesdb_spark.tables import TABLES, register_views
    from tests.conftest import SF_DIR

    register_views(spark, SF_DIR)
    for t in TABLES:
        assert spark.sql(f"SELECT count(*) AS n FROM {t}").first()["n"] > 0
    row = spark.sql(
        """
        SELECT n.n_name, count(*) AS n_cust
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name ORDER BY n_cust DESC, n_name LIMIT 1
        """
    ).first()
    assert row["n_cust"] > 0
    lagged = spark.sql(
        """
        SELECT user_id, ts,
               lag(value) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS pv
        FROM events LIMIT 5
        """
    ).collect()
    assert len(lagged) == 5


def test_jsonl_events_client(spark, tmp_path):
    """Declared-schema JSONL ingest: good lines parse to the events
    schema, malformed lines are quarantined, never fatal."""
    from timeseriesdb_spark.sources.clients import jsonl_events_client

    p = tmp_path / "events.jsonl"
    p.write_text(
        '{"event_id": 1, "ts": "2024-01-01T00:00:01.000000", '
        '"user_id": 7, "event_type": "click", "value": 1.5, '
        '"props": "{\\"k\\": 1}"}\n'
        '{"event_id": 2, "ts": "2024-01-01T00:00:02.000000", '
        '"user_id": 8, "event_type": "view", "value": 2.5, '
        '"props": null}\n'
        "THIS IS NOT JSON\n"
    )
    df = jsonl_events_client(spark, str(p))
    rows = df.orderBy("event_id").collect()
    assert len(rows) == 3
    good = [r for r in rows if r._corrupt_record is None]
    assert [r.event_id for r in good] == [1, 2]
    assert good[0].event_type == "click"
    assert good[0].value == 1.5
    assert good[0].ts.isoformat().startswith("2024-01-01T00:00:01")

    clean = jsonl_events_client(spark, str(p), drop_corrupt=True)
    assert clean.count() == 2
    assert "_corrupt_record" not in clean.columns
