"""Object-store (S3/MinIO) wiring for the engine — the Spark-first twin of
the reference's bespoke boto3 client.

Reference behavior (parity targets):
- ``src/clinical_platform/ingestion/s3_client.py:17-28`` builds a boto3
  client from config: endpoint URL, access/secret key, use_ssl.
- ``src/clinical_platform/ingestion/ingest_csv.py:141-146`` writes parquet
  bytes to a bronze bucket key; reads come back through the same client.
- ``src/clinical_platform/config.py:17-24,102-106`` defaults the endpoint
  to a local MinIO (``http://localhost:9000``) and switches to the real
  AWS endpoint when the backend is S3.

The Spark-native translation: there is no bespoke byte-pull client at all.
Executors read and write ``s3a://bucket/key`` URIs directly through the
Hadoop S3A connector — streaming, split-aware, and parallel per partition,
which is the whole point at 100 TB (the reference's single-process
``get_bytes`` would funnel every byte through one host). This module owns
exactly one job: translating the reference's connection config into the
``fs.s3a.*`` Hadoop configuration the connector consumes, so every
``spark.read.parquet("s3a://...")`` / ``df.write.parquet("s3a://...")``
in the engine (ingest paths are parameters throughout) works against
AWS S3 or MinIO unchanged.

Bucket CREATION (reference ``s3_client.py:30-40`` ensure_buckets) is
deliberately out of engine scope: provisioning belongs to infra, not a
query engine; S3A fails fast with a clear error on a missing bucket.

No boto3, no bespoke client — and nothing here needs the hadoop-aws jar
at import time, so the module is fully unit-testable in a jar-less
container (the S3A classpath is only consulted when a path is opened).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass(frozen=True)
class ObjectStoreConfig:
    """Connection settings, mirroring reference config.py's StorageConfig.

    ``endpoint`` empty/None means real AWS S3 (the connector derives the
    regional endpoint); set it for MinIO or any S3-compatible store.
    ``path_style_access`` is required by MinIO (virtual-host addressing
    needs wildcard DNS); harmless against AWS.
    """

    endpoint: str | None = None
    access_key: str | None = None
    secret_key: str | None = None
    region: str | None = None
    use_ssl: bool = True
    path_style_access: bool = False


def s3a_confs(cfg: ObjectStoreConfig) -> dict[str, str]:
    """The ``fs.s3a.*`` map for a given connection config.

    Only connection settings the reference exposes are emitted, plus the
    two safety settings any production S3A deployment wants: fast upload
    (streaming multipart PUTs instead of buffering whole partitions on
    local disk) and magic committer (atomic, rename-free output commit —
    rename on S3 is a copy, and the default FileOutputCommitter v1 doubles
    write traffic and leaves partial output windows).
    """
    confs: dict[str, str] = {
        "fs.s3a.fast.upload": "true",
        "fs.s3a.committer.name": "magic",
        "fs.s3a.connection.ssl.enabled": "true" if cfg.use_ssl else "false",
        "fs.s3a.path.style.access": "true" if cfg.path_style_access else "false",
    }
    if cfg.endpoint:
        confs["fs.s3a.endpoint"] = cfg.endpoint
    if cfg.region:
        confs["fs.s3a.endpoint.region"] = cfg.region
    if cfg.access_key and cfg.secret_key:
        confs["fs.s3a.access.key"] = cfg.access_key
        confs["fs.s3a.secret.key"] = cfg.secret_key
        confs["fs.s3a.aws.credentials.provider"] = (
            "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider"
        )
    # no keys -> leave the provider chain at its default (instance
    # profile / env vars / EKS IRSA), the right posture on a real cluster
    return confs


def minio_local(
    endpoint: str = "http://localhost:9000",
    access_key: str = "minioadmin",
    secret_key: str = "minioadmin",
) -> ObjectStoreConfig:
    """The reference's development default (config.py:17-24): local MinIO,
    path-style, plain HTTP."""
    return ObjectStoreConfig(
        endpoint=endpoint,
        access_key=access_key,
        secret_key=secret_key,
        use_ssl=endpoint.startswith("https"),
        path_style_access=True,
    )


def apply_object_store(spark: SparkSession, cfg: ObjectStoreConfig) -> SparkSession:
    """Install the config on a LIVE session.

    ``fs.*`` settings live in the Hadoop configuration, which — unlike
    ``spark.sql.*`` static confs — is runtime-mutable on the SparkContext,
    so this works both at bootstrap and on a driver-provided session."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in s3a_confs(cfg).items():
        hconf.set(k, v)
    return spark


def builder_confs(cfg: ObjectStoreConfig) -> dict[str, str]:
    """The same settings as ``spark.hadoop.*`` builder keys, for callers
    assembling a session from scratch (cluster submit scripts)."""
    return {f"spark.hadoop.{k}": v for k, v in s3a_confs(cfg).items()}


class EdgeObjectClient:
    """Control-plane byte transport — the reference's actual client
    surface (``src/clinical_platform/ingestion/s3_client.py:12-51``:
    put_bytes / get_bytes / list_keys / ensure_bucket over boto3),
    re-scoped for a Spark engine: bulk data NEVER moves through this
    class (executors stream s3a:// directly — funneling 100 TB through
    one driver-side client is exactly the reference antipattern this
    module's header calls out). What legitimately rides a single-host
    client: registry/config artifacts, small landing files a CSV edge
    produces before the engine picks them up, and test probes. boto3 is
    imported lazily so the module stays importable without it.

    Tested against a LIVE S3 API (moto server) in
    tests/test_objectstore.py — real bytes through HTTP, the transport
    itself, not just config assembly."""

    def __init__(self, client) -> None:
        self.client = client

    @classmethod
    def from_config(cls, cfg: ObjectStoreConfig) -> "EdgeObjectClient":
        import boto3

        session = boto3.session.Session()
        return cls(
            session.client(
                "s3",
                endpoint_url=cfg.endpoint,
                aws_access_key_id=cfg.access_key,
                aws_secret_access_key=cfg.secret_key,
                use_ssl=cfg.use_ssl,
                region_name=cfg.region or "us-east-1",
            )
        )

    def ensure_bucket(self, bucket: str) -> None:
        """Reference parity (s3_client.py:30-40); kept OUT of engine query
        paths — provisioning is an edge concern."""
        try:
            self.client.head_bucket(Bucket=bucket)
        except Exception:  # noqa: BLE001 — head failure means "create"
            self.client.create_bucket(Bucket=bucket)

    def put_bytes(self, bucket: str, key: str, data: bytes) -> None:
        from io import BytesIO

        self.client.put_object(Bucket=bucket, Key=key, Body=BytesIO(data))

    def get_bytes(self, bucket: str, key: str) -> bytes:
        return self.client.get_object(Bucket=bucket, Key=key)["Body"].read()

    def list_keys(self, bucket: str, prefix: str = ""):
        resp = self.client.list_objects_v2(Bucket=bucket, Prefix=prefix)
        for obj in resp.get("Contents", []) or []:
            yield obj["Key"]


def bucket_url(bucket: str, key: str = "") -> str:
    """``s3a://bucket[/key]`` — the URI every engine path parameter
    accepts wherever a local path works today (reference parity:
    bronze/silver bucket keys in ingest_csv.py:141-146)."""
    if not bucket or "/" in bucket:
        raise ValueError(f"invalid bucket name: {bucket!r}")
    return f"s3a://{bucket}/{key.lstrip('/')}" if key else f"s3a://{bucket}"
