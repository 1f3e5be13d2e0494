"""Tests for utils (A17/A19 parity) and the JDBC connector config (A18)."""

from __future__ import annotations

import pytest

from pgvector_db_spark.sources.jdbc import JDBCConfig
from pgvector_db_spark.utils import distribute_model_dir, download_model, time_it


def test_time_it_records_duration():
    @time_it
    def f(x):
        return x * 2

    assert f(21) == 42
    assert f.last_seconds is not None and f.last_seconds >= 0


def test_download_model_injectable(tmp_path):
    calls = []

    def fake_downloader(name, dest):
        calls.append((name, dest))
        return dest

    out = download_model("org/model-x", str(tmp_path), downloader=fake_downloader)
    assert calls == [("org/model-x", out)]
    assert out.endswith("org__model-x")


def test_download_model_gated_without_hub():
    try:
        import huggingface_hub  # noqa: F401

        pytest.skip("hub installed; gate not reachable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        download_model("org/model-x", "/tmp/nowhere")


def test_distribute_model_dir(spark, tmp_path):
    d = tmp_path / "model"
    d.mkdir()
    (d / "weights.bin").write_bytes(b"\x00\x01")
    assert distribute_model_dir(spark, str(d)) == "model"


def test_jdbc_options_sslmode_and_sizes():
    cfg = JDBCConfig(host="db.example", database="vectors", user="u", password="pw")
    opts = cfg.options("documents")
    assert opts["url"] == "jdbc:postgresql://db.example:5432/vectors"
    assert opts["dbtable"] == "public.documents"
    assert opts["sslmode"] == "require"
    assert opts["batchsize"] == "1000"  # reference pg_insert.py:23 default


def test_jdbc_token_provider_replaces_password():
    cfg = JDBCConfig(
        host="h", database="d", user="u", token_provider=lambda: "iam-token-123"
    )
    assert cfg.options("t")["password"] == "iam-token-123"
    with pytest.raises(ValueError):
        JDBCConfig(host="h", database="d", user="u").resolve_password()


def test_jdbc_roundtrip_embedded_derby(spark, tables, tmp_path):
    """LIVE JDBC read/write (A18 executed, not just configured): the same
    read_jdbc/write_jdbc code paths run against the embedded Derby engine
    that ships in Spark's jars — write a real table over JDBC, read it
    back (plain and range-partitioned), compare exactly."""
    from pgvector_db_spark.sources.jdbc import (
        JDBCConfig,
        read_jdbc,
        write_jdbc,
    )

    cfg = JDBCConfig(
        host="",
        database="",
        user="app",
        password="app",
        schema_name="APP",
        sslmode=None,
        driver="org.apache.derby.jdbc.EmbeddedDriver",
        url_override=f"jdbc:derby:{tmp_path}/derbydb;create=true",
        batch_size=100,
    )
    src = (
        tables["orders"]
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .limit(200)
    )
    write_jdbc(src, cfg, "orders_rt", mode="overwrite")

    back = read_jdbc(spark, cfg, "orders_rt")
    want = sorted(map(tuple, src.collect()))
    assert sorted(map(tuple, back.collect())) == want

    parted = read_jdbc(
        spark, cfg, "orders_rt",
        partition_column="o_orderkey", num_partitions=4,
        lower_bound=0, upper_bound=10_000_000,
    )
    assert parted.rdd.getNumPartitions() == 4
    assert sorted(map(tuple, parted.collect())) == want
