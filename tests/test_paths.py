"""Path-scheme routing: the engine's object-store posture is explicit
(io/paths.py) — local and s3a/hdfs-family paths route through, the
superseded S3 connectors and unknown schemes fail at PLAN time with a
pointed message, and local-only operators can demand atomicity."""

import pytest

from flights_data_pipeline_spark.io.paths import (
    SUPPORTED_SCHEMES,
    is_remote,
    s3a_conf,
    scheme_of,
    validate_path,
)


def test_scheme_parsing():
    assert scheme_of("/root/testdata/sf0.1") == ""
    assert scheme_of("relative/dir/file.parquet") == ""
    assert scheme_of("file:///tmp/x") == "file"
    assert scheme_of("S3A://bucket/key") == "s3a"
    assert scheme_of("hdfs://nn:8020/warehouse") == "hdfs"
    # '://' later in the path is not a scheme
    assert scheme_of("dir/oddly://named") == ""


def test_local_vs_remote():
    assert not is_remote("/data/x.parquet")
    assert not is_remote("file:///data/x.parquet")
    assert is_remote("s3a://bucket/x.parquet")
    assert is_remote("hdfs://nn/x.parquet")


def test_validate_routes_supported_schemes():
    for p in [
        "/local/table.parquet",
        "file:///local/table.parquet",
        "s3a://bucket/prefix/table.parquet",
        "hdfs://nn:8020/db/table",
        "abfss://container@acct.dfs.core.windows.net/t",
        "gs://bucket/t",
    ]:
        assert validate_path(p) == p


def test_validate_rejects_legacy_s3_connectors():
    with pytest.raises(ValueError, match="s3a"):
        validate_path("s3://bucket/key")
    with pytest.raises(ValueError, match="s3a"):
        validate_path("s3n://bucket/key")


def test_validate_rejects_unknown_scheme():
    with pytest.raises(ValueError, match="unknown path scheme"):
        validate_path("ftp://host/file")


def test_validate_require_local():
    assert validate_path("/tmp/t", require_local=True) == "/tmp/t"
    with pytest.raises(ValueError, match="atomic-rename"):
        validate_path("s3a://bucket/t", require_local=True)


def test_s3a_conf_block():
    conf = s3a_conf("http://minio:9000", path_style_access=True)
    assert conf["spark.hadoop.fs.s3a.endpoint"] == "http://minio:9000"
    assert conf["spark.hadoop.fs.s3a.path.style.access"] == "true"
    # the magic committer is the object-store commit story
    assert conf["spark.hadoop.fs.s3a.committer.name"] == "magic"
    # no inline credentials, ever
    assert not any("secret" in k or "access.key" in k for k in conf)
    # without an endpoint (plain AWS) the endpoint key is absent
    assert "spark.hadoop.fs.s3a.endpoint" not in s3a_conf()
    assert "" in SUPPORTED_SCHEMES and "s3a" in SUPPORTED_SCHEMES
