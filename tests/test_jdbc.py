"""JDBC option plumbing — no driver ships in the container, so the tests
stop at the option/reader boundary (the exact knobs Spark hands the
driver: fetchsize, batchsize, partition spec)."""

import pytest

from aws_etl_bank_spark.sources import jdbc


def test_read_options_defaults():
    opts = jdbc.build_read_options("jdbc:postgresql://h/db", "accounts")
    assert opts["dbtable"] == "accounts"
    assert opts["fetchsize"] == "1000"  # parity: fetchmany(size=1000)
    assert "partitionColumn" not in opts


def test_read_options_full_partition_spec():
    opts = jdbc.build_read_options(
        "jdbc:postgresql://h/db", "accounts", user="u", password="p",
        fetchsize=5000, partition_column="account_id", lower_bound=0,
        upper_bound=1_000_000, num_partitions=64)
    assert opts["partitionColumn"] == "account_id"
    assert opts["lowerBound"] == "0"
    assert opts["upperBound"] == "1000000"
    assert opts["numPartitions"] == "64"
    assert opts["fetchsize"] == "5000"


def test_read_options_partial_partition_spec_rejected():
    with pytest.raises(ValueError, match="partial JDBC partition spec"):
        jdbc.build_read_options("jdbc:postgresql://h/db", "t",
                                partition_column="id", num_partitions=8)


def test_read_options_predicate_subquery():
    opts = jdbc.build_read_options(
        "jdbc:postgresql://h/db", "t",
        predicate="SELECT * FROM t WHERE updated_at > '2024-01-01'")
    assert opts["dbtable"].startswith("(SELECT * FROM t WHERE")
    assert opts["dbtable"].endswith(") AS src")


def test_write_options_batch_and_truncate():
    opts = jdbc.build_write_options(
        "jdbc:postgresql://h/db", "t", batchsize=2000, num_partitions=16,
        truncate=True)
    assert opts["batchsize"] == "2000"
    assert opts["numPartitions"] == "16"
    assert opts["truncate"] == "true"
    assert opts["isolationLevel"] == "READ_COMMITTED"


def test_context_jdbc_conf_roundtrip(spark):
    from aws_etl_bank_spark.context import EngineContext

    ctx = EngineContext(spark)
    ctx.register_jdbc_connection("pg", {"url": "jdbc:postgresql://h/db",
                                        "user": "u", "password": "p"})
    conf = ctx.extract_jdbc_conf("pg")
    opts = jdbc.build_read_options(conf["url"], "t", user=conf["user"],
                                   password=conf["password"])
    assert opts["url"] == "jdbc:postgresql://h/db"
    assert opts["user"] == "u"
