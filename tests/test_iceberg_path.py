"""Exercise the fmt="iceberg" write path (VERDICT r2 item 4).

No Iceberg runtime jar ships in this sandbox, but the fmt="iceberg" branch
in sources.write_output is pure DataFrameWriterV2 — writeTo(location)
.partitionedBy(col).createOrReplace() — and the V2 builder is
catalog-agnostic, so the chain can execute against the session catalog.
The session catalog supports CTAS but not RTAS (REPLACE TABLE AS SELECT),
so the test monkeypatches the final verb createOrReplace -> create on the
SAME builder object: writeTo, partitionedBy, and the physical partitioned
write all run for real — a signature typo (partitionBy vs partitionedBy)
or a wrong receiver raises here — and the patch records that the
production branch invoked createOrReplace exactly once per call.  Only the
RTAS commit + Iceberg format resolution remain environmental.
"""

import pytest
from pyspark.sql.readwriter import DataFrameWriterV2

from extractor_spark.spark.sources import iceberg_available, write_output

pytestmark = pytest.mark.spark


def test_iceberg_gate_reports_absent(spark):
    # sandbox ships no iceberg-spark-runtime jar; the gate must say so
    assert iceberg_available(spark) is False


@pytest.fixture()
def ctas_instead_of_rtas(monkeypatch):
    calls = []
    real_create = DataFrameWriterV2.create

    def fake_create_or_replace(self):
        calls.append(self)
        real_create(self)  # CTAS: the session catalog's supported verb

    monkeypatch.setattr(DataFrameWriterV2, "createOrReplace", fake_create_or_replace)
    return calls


def test_write_output_iceberg_branch_end_to_end(spark, ctas_instead_of_rtas):
    df = spark.createDataFrame(
        [(f"https://x.test/{i}", i % 3, f"doc {i}") for i in range(30)],
        "url string, bucket int, text string",
    )
    table = "spark_catalog.default.iceberg_branch_smoke"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        write_output(df, table, fmt="iceberg", partition_col="bucket")
        assert len(ctas_instead_of_rtas) == 1  # production verb was invoked
        back = spark.table(table)
        assert back.count() == 30
        assert set(back.columns) == {"url", "bucket", "text"}
        # identity-partitioned on bucket (catalog records the transform)
        desc = spark.sql(f"DESCRIBE TABLE {table}").collect()
        txt = "\n".join(f"{r[0]} {r[1]}" for r in desc)
        assert "bucket" in txt and "Partition" in txt
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_write_output_iceberg_unpartitioned(spark, ctas_instead_of_rtas):
    """partition_col=None must skip partitionedBy (df[None] would raise)."""
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    table = "spark_catalog.default.iceberg_branch_flat"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        write_output(df, table, fmt="iceberg", partition_col=None)
        assert len(ctas_instead_of_rtas) == 1
        assert spark.table(table).count() == 2
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
