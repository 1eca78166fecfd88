"""S5 object-store contract tests (r4 verdict item 5).

No S3/MinIO endpoint exists in this container, so the contract under test
is the part the engine actually owns: translating the reference's
connection config (ingestion/s3_client.py:17-28, config.py:17-24) into
the ``fs.s3a.*`` Hadoop configuration the S3A connector consumes, and
installing it on a LIVE SparkSession. The byte transport itself is
hadoop-aws's contract, not ours — exactly as the reference delegates it
to boto3."""

from __future__ import annotations

import pytest

from clinical_data_platform_spark.sources.objectstore import (
    ObjectStoreConfig,
    apply_object_store,
    bucket_url,
    builder_confs,
    minio_local,
    s3a_confs,
)


def test_minio_profile_matches_reference_dev_default():
    cfg = minio_local()
    confs = s3a_confs(cfg)
    # reference config.py:17 default endpoint
    assert confs["fs.s3a.endpoint"] == "http://localhost:9000"
    # MinIO needs path-style; plain-http endpoint disables SSL
    assert confs["fs.s3a.path.style.access"] == "true"
    assert confs["fs.s3a.connection.ssl.enabled"] == "false"
    # static keys -> simple credentials provider, never the default chain
    assert confs["fs.s3a.access.key"] == "minioadmin"
    assert confs["fs.s3a.secret.key"] == "minioadmin"
    assert confs["fs.s3a.aws.credentials.provider"].endswith(
        "SimpleAWSCredentialsProvider"
    )


def test_aws_profile_uses_default_credential_chain():
    # no endpoint + no keys = real S3 with instance-profile/env credentials
    confs = s3a_confs(ObjectStoreConfig(region="us-east-1"))
    assert "fs.s3a.endpoint" not in confs
    assert "fs.s3a.access.key" not in confs
    assert "fs.s3a.aws.credentials.provider" not in confs
    assert confs["fs.s3a.endpoint.region"] == "us-east-1"
    assert confs["fs.s3a.connection.ssl.enabled"] == "true"
    # scale posture: streaming multipart upload + rename-free commit
    assert confs["fs.s3a.fast.upload"] == "true"
    assert confs["fs.s3a.committer.name"] == "magic"


def test_apply_object_store_mutates_live_session(spark):
    """fs.* settings are Hadoop conf (runtime-mutable), so installing on a
    driver-provided session must take effect immediately — verified
    through the JVM-side configuration the S3A connector actually reads."""
    apply_object_store(spark, minio_local(endpoint="http://minio.test:9000"))
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("fs.s3a.endpoint") == "http://minio.test:9000"
    assert hconf.get("fs.s3a.path.style.access") == "true"
    # reconfiguring (e.g. switching stores mid-session) overwrites cleanly
    apply_object_store(spark, ObjectStoreConfig(region="eu-west-1"))
    assert hconf.get("fs.s3a.endpoint.region") == "eu-west-1"


def test_builder_confs_are_spark_prefixed():
    b = builder_confs(minio_local())
    assert b["spark.hadoop.fs.s3a.endpoint"] == "http://localhost:9000"
    assert all(k.startswith("spark.hadoop.fs.s3a.") for k in b)


def test_bucket_url_shapes():
    assert bucket_url("bronze") == "s3a://bronze"
    assert bucket_url("bronze", "sdtm/dm.parquet") == "s3a://bronze/sdtm/dm.parquet"
    assert bucket_url("bronze", "/lead/slash") == "s3a://bronze/lead/slash"
    with pytest.raises(ValueError):
        bucket_url("not/a/bucket")


def test_s3a_read_path_fails_fast_without_connector(spark):
    """In this jar-less container an s3a open must raise the CLASSPATH
    error (missing S3AFileSystem), not hang or silently return empty —
    proving the URI actually routes to the S3A connector."""
    apply_object_store(spark, minio_local())
    with pytest.raises(Exception) as ei:
        spark.read.parquet("s3a://no-such-bucket/x.parquet").collect()
    msg = str(ei.value)
    assert "s3a" in msg.lower() or "S3AFileSystem" in msg
