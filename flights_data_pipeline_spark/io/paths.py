"""Storage-path posture: one place that says which URI schemes the
engine runs on and how to point it at an object store.

The reference deployment lands every extract in MinIO (S3-compatible;
reference ``dags/flights_data_pipeline.py:126-131``,
``docker-compose.yml:73-93``). This engine is path-scheme-agnostic by
construction — every source/sink takes a path string and hands it to
Spark's Hadoop filesystem layer — but that fact was implicit until
now. This module makes it explicit:

* ``validate_path`` is the routing gate every path can pass through:
  it accepts local paths and the Hadoop-connector schemes Spark
  resolves natively (``file``, ``s3a``, ``hdfs``, ``abfss``, ``gs``,
  ``wasbs``) and REJECTS the two classic foot-guns — the legacy
  ``s3://``/``s3n://`` connectors (superseded by s3a; on EMR ``s3://``
  means EMRFS, which this engine does not assume) and unknown schemes
  (fail at plan time, not task time).
* ``s3a_conf`` is the documented conf block for an S3/MinIO endpoint —
  the exact settings a 1000-executor cluster needs, as data:
  credentials come from the provider chain (env/IAM), never inline.

Operators with LOCAL-ONLY semantics (``operators/merge._swap_in``
rename-swaps, ``io/pysource``'s manifest sink uses ``os.replace``)
keep their own stricter guards: atomic rename does not exist on object
stores, so those paths must stay local (or move to a conditional-PUT
commit, which the pysource docstring sketches). Everything else —
parquet scans, CSV codec, layout writes, checkpoint dirs — is
scheme-transparent.

No MinIO exists in this sandbox, so the s3a path is exercised at the
routing/conf layer only (``tests/test_paths.py``); the parquet IO it
feeds is identical on any Hadoop filesystem.
"""

from __future__ import annotations

#: schemes Spark's bundled/standard Hadoop connectors resolve; "" is a
#: schemeless local path.
SUPPORTED_SCHEMES = frozenset(
    {"", "file", "s3a", "hdfs", "abfss", "gs", "wasbs"}
)

#: superseded or provider-private connectors we refuse early with a
#: pointed message instead of letting Spark fail mid-job.
_REJECTED_SCHEMES = {
    "s3": "use 's3a://' — 's3://' is the legacy (removed) Hadoop "
    "connector, or EMRFS on EMR, neither of which this engine assumes",
    "s3n": "use 's3a://' — 's3n://' was removed from Hadoop 3",
}


def scheme_of(path: str) -> str:
    """URI scheme of ``path``, lower-cased; '' for schemeless/local."""
    head, sep, _ = path.partition("://")
    if not sep or "/" in head:
        return ""
    return head.lower()


def is_remote(path: str) -> bool:
    """True when the path resolves to a non-local filesystem."""
    return scheme_of(path) not in ("", "file")


def validate_path(path: str, *, require_local: bool = False) -> str:
    """Routing gate: return ``path`` if this engine can run on it,
    raise ``ValueError`` otherwise (unknown scheme, a superseded S3
    connector, or a remote path where an operator needs atomic local
    rename)."""
    s = scheme_of(path)
    if s in _REJECTED_SCHEMES:
        raise ValueError(f"unsupported scheme {s!r} in {path!r}: "
                         f"{_REJECTED_SCHEMES[s]}")
    if s not in SUPPORTED_SCHEMES:
        raise ValueError(
            f"unknown path scheme {s!r} in {path!r}; supported: "
            + ", ".join(sorted(x or "<local>" for x in SUPPORTED_SCHEMES))
        )
    if require_local and is_remote(path):
        raise ValueError(
            f"this operator needs an atomic-rename filesystem, got "
            f"{path!r}; object stores need the conditional-PUT commit "
            "variant (see io/pysource.py)"
        )
    return path


def s3a_conf(
    endpoint: str | None = None,
    *,
    path_style_access: bool | None = None,
) -> dict[str, str]:
    """The Spark conf block that points s3a:// paths at an S3 or
    MinIO endpoint — returned as data so deployments apply it via
    ``SparkSession.builder.config(...)`` or spark-defaults.

    Credentials intentionally absent: the default
    ``DefaultAWSCredentialsProviderChain`` reads env vars/instance
    roles, which is the only sane posture on a shared cluster.
    ``path_style_access=True`` is what MinIO and most on-prem S3
    implementations need (virtual-host-style bucket DNS is AWS-only).
    """
    conf = {
        # committers: the classic FileOutputCommitter rename-commits,
        # which is O(data) + non-atomic on S3; the magic committer
        # writes task output to its final location under a deferred
        # multipart-upload handle — O(1) commit, no rename
        "spark.hadoop.fs.s3a.committer.name": "magic",
        "spark.hadoop.fs.s3a.committer.magic.enabled": "true",
        "spark.sql.sources.commitProtocolClass": (
            "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
        ),
        "spark.sql.parquet.output.committer.class": (
            "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter"
        ),
        # read path: random IO for parquet footers/column chunks
        "spark.hadoop.fs.s3a.experimental.input.fadvise": "random",
        # connection pool sized for wide executors
        "spark.hadoop.fs.s3a.connection.maximum": "96",
        "spark.hadoop.fs.s3a.threads.max": "64",
    }
    if endpoint is not None:
        conf["spark.hadoop.fs.s3a.endpoint"] = endpoint
    if path_style_access is not None:
        conf["spark.hadoop.fs.s3a.path.style.access"] = str(
            bool(path_style_access)
        ).lower()
    return conf
