"""Wave-12 plans: golden-record survivorship, class-balance weights —
invariants beyond the DuckDB value oracle."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_golden_records_survivorship_rules(spark):
    from clinical_data_platform_spark.plans.advanced import (
        golden_customer_records,
    )

    rows = golden_customer_records(spark, SF).collect()
    by_entity: dict[int, dict[str, tuple[str, int]]] = {}
    for r in rows:
        by_entity.setdefault(r.entity_id, {})[r.attr] = (
            r.golden_value,
            r.src_ts,
        )
    n_cust = spark.read.parquet(f"{SF}/customer.parquet").count()
    assert len(by_entity) == n_cust
    for ent, attrs in by_entity.items():
        # acctbal: record 1 always carries a value -> always survives
        assert attrs["acctbal"][1] == 1
        # name: from record 1 ('_v1' suffix) unless nulled there, in
        # which case the base record survives
        val, ts = attrs["name"]
        assert (ts == 1 and val.endswith("_v1")) or ts == 0
        # segment: record 2's SEG_V2 when present, else the base value
        val, ts = attrs["segment"]
        assert (ts == 2 and val == "SEG_V2") or ts == 0
        # one golden value per attribute, never a null
        assert len(attrs) == 3
        assert all(v is not None for v, _ in attrs.values())


def test_class_balance_weights_equalize(spark):
    from clinical_data_platform_spark.plans.trainprep import (
        class_balance_weights,
    )

    rows = class_balance_weights(spark, SF).collect()
    total = sum(r.n for r in rows)
    k = len(rows)
    eff = [r.effective_rows for r in rows]
    # every class's effective mass equals N/k (trunc6 tolerance)
    for e in eff:
        assert abs(e - total / k) < 1e-3
    for r in rows:
        assert r.class_weight > 0
        # rarer class -> larger weight
    ordered = sorted(rows, key=lambda r: r.n)
    weights = [r.class_weight for r in ordered]
    assert weights == sorted(weights, reverse=True)
