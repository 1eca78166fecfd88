"""Python UDTF and custom Python DataSource surfaces."""

from __future__ import annotations

from clinical_data_platform_spark.functions.tablefuncs import (
    SplitSentences,
    register as register_udtf,
)
from clinical_data_platform_spark.sources.pydatasource import (
    _mix,
    register as register_source,
)


def test_udtf_direct_invocation(spark):
    from pyspark.sql.functions import lit

    # standalone invocation takes literal args; column refs need LATERAL
    out = SplitSentences(lit("One two. Three! ")).collect()
    assert [(r.sent_id, r.sentence, r.n_words) for r in out] == [
        (0, "One two", 2),
        (1, "Three", 1),
    ]


def test_udtf_lateral_sql(spark):
    register_udtf(spark)
    spark.sql(
        "SELECT * FROM VALUES (1, 'Hi there. Bye.'), (2, '') AS t(id, txt)"
    ).createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        """
        SELECT d.id, s.sent_id, s.sentence
        FROM udtf_docs d, LATERAL split_sentences(d.txt) s
        ORDER BY d.id, s.sent_id
        """
    ).collect()
    assert [(r.id, r.sent_id, r.sentence) for r in rows] == [
        (1, 0, "Hi there"),
        (1, 1, "Bye"),
    ]


def test_python_datasource_partitioned_read(spark):
    register_source(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("rows", "1000")
        .option("partitions", "8")
        .load()
    )
    assert df.rdd.getNumPartitions() == 8
    assert df.count() == 1000
    assert dict(df.dtypes) == {
        "event_id": "bigint",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
    }
    # deterministic + recomputable: row content derives from event_id only
    row = df.filter(df.event_id == 123).first()
    h = _mix(123)
    assert row.user_id == h % 10_000
    assert row.value == ((h >> 24) % 100_000) / 1000.0
    # two reads agree (task-retry safety)
    again = (
        spark.read.format("synthetic_events")
        .option("rows", "1000")
        .option("partitions", "3")
        .load()
    )
    assert sorted(r.event_id for r in again.collect()) == list(range(1000))
