"""Wave-75 product-quantization plans: invariants beyond the DuckDB value
oracle — codes stay in the codebook range, ADC is a faithful proxy for the
true distance (the exact nearest neighbor survives quantization), and the
IVF-PQ composition returns exactly the ADC ranking restricted to the
probed cells (pruning changes WHAT is scanned, never HOW survivors rank)."""

from __future__ import annotations

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def test_pq_codes_in_range_and_complete(spark):
    from clinical_data_platform_spark.catalog import table as T
    from clinical_data_platform_spark.plans.quantization import (
        _K,
        _M,
        _encoded,
        _pq_codebook,
    )

    e = T(spark, SF, "embeddings")
    enc = _encoded(e, _pq_codebook(e))
    n_corpus = e.filter(F.col("vec_id") >= _K).count()
    rows = enc.collect()
    assert len(rows) == n_corpus
    for r in rows:
        for m in range(_M):
            b = r[f"b{m}"]
            assert 0 <= b.code < _K
            assert b.qerr >= 0.0


def test_pq_distortion_uses_most_codes(spark):
    from clinical_data_platform_spark.plans.quantization import (
        _K,
        _M,
        pq_encode_distortion,
    )

    rows = pq_encode_distortion(spark, SF).collect()
    assert len(rows) == _M
    for r in rows:
        # a sampled codebook over random embeddings should not collapse:
        # every subspace must use more than half the available codes
        assert r.codes_used > _K // 2
        assert 0.0 <= r.avg_qerr <= r.max_qerr


def test_adc_recalls_exact_nearest(spark):
    from clinical_data_platform_spark.plans.quantization import (
        pq_adc_topk_vec0,
    )

    rows = pq_adc_topk_vec0(spark, SF).collect()
    assert len(rows) == 10
    adc = [r.adc_dist for r in rows]
    assert adc == sorted(adc)
    # ADC is a faithful proxy at the front of the ranking: the top ADC row's
    # exact distance is within 2x of the best exact distance in the set
    best_exact = min(r.exact_dist for r in rows)
    assert rows[0].exact_dist <= 2.0 * best_exact


def test_ivf_cell_partitioning_prunes_scan(spark, tmp_path):
    """The docstring claim 'at 100 TB the cell id is the partition key and
    the probe is partition pruning' — demonstrated on real files: land the
    PQ-encoded corpus partitioned by cell, read back with the probe
    filter, and the scan must (a) carry a PartitionFilter, (b) touch ONLY
    the probed cells' directories."""
    from clinical_data_platform_spark.catalog import table as T
    from clinical_data_platform_spark.plans.clustering import _assigned
    from clinical_data_platform_spark.plans.quantization import (
        _K,
        _encoded,
        _pq_codebook,
    )

    e = T(spark, SF, "embeddings")
    enc = _encoded(e, _pq_codebook(e)).select(
        "vec_id", *[F.col(f"b{m}.code").alias(f"c{m}") for m in range(8)]
    )
    cells = _assigned(e).filter(F.col("vec_id") >= _K).select("vec_id", "cid")
    out = str(tmp_path / "ivfpq")
    enc.join(cells, "vec_id").write.partitionBy("cid").parquet(out)

    probe = [0, 3]
    scan = spark.read.parquet(out).filter(F.col("cid").isin(probe))
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cid" in plan.split(
        "PartitionFilters"
    )[1][:80], plan
    # DataFrame.inputFiles() lists the WHOLE relation pre-pruning;
    # input_file_name() at runtime reflects the files actually read
    touched = {
        r[0]
        for r in scan.select(F.input_file_name()).distinct().collect()
    }
    assert touched, "probe read no files"
    for f in touched:
        assert any(f"cid={p}/" in f for p in probe), f
    # and the pruned read returns exactly the rows of the probed cells
    expect = cells.filter(F.col("cid").isin(probe)).count()
    assert scan.count() == expect


def test_ivf_pq_is_adc_restricted_to_probed_cells(spark):
    from clinical_data_platform_spark.catalog import table as T
    from clinical_data_platform_spark.plans.clustering import _assigned
    from clinical_data_platform_spark.plans.quantization import (
        _K,
        ivf_pq_ann_topk_vec0,
        pq_adc_topk_vec0,
    )

    ivf_rows = ivf_pq_ann_topk_vec0(spark, SF).collect()
    assert len(ivf_rows) == 10
    cells = {r.cell for r in ivf_rows}
    assert len(cells) <= 2  # nprobe = 2

    # every returned vec really lives in the cell the plan claims
    e = T(spark, SF, "embeddings")
    truth = {
        r.vec_id: r.cid
        for r in _assigned(e).filter(F.col("vec_id") >= _K).collect()
    }
    for r in ivf_rows:
        assert truth[r.vec_id] == r.cell

    # pruning-consistency: any vec in BOTH rankings carries the same ADC
    adc = {r.vec_id: r.adc_dist for r in pq_adc_topk_vec0(spark, SF).collect()}
    for r in ivf_rows:
        if r.vec_id in adc:
            assert abs(adc[r.vec_id] - r.adc_dist) < 1e-9
