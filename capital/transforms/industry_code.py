"""Bronze→silver industry-code pipeline (SURVEY.md §3.2) — the
reference's only real Spark job, re-expressed without Glue.

Reference flow (glue_job_scripts/industry_code_glue_job.py): catalog
scan → DynamicFrame → ``spark.sql`` projection+cast (lines 38-47) →
audit columns (49-51) → parquet overwrite (56-66) → Redshift JDBC with
DROP/CREATE preactions (89-101). The crawler + bookmark machinery
collapses to ``spark.read.json`` + a checkpointed incremental run (see
capital.streaming).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from capital.io import write_partitioned

#: KRX API field names → silver names (dags/brz_industry_code_daily/
#: extractors.py:47-56 does this projection imperatively).
KRX_FIELD_MAP = {
    "ISU_SRT_CD": "item_code",
    "ISU_ABBRV": "item_name",
    "IDX_IND_NM": "industry_code",
    "MKT_TP_NM": "market",
}


def read_bronze(spark: SparkSession, path: str) -> DataFrame:
    """Schema inference plays the Glue crawler (SURVEY.md §1.3)."""
    return spark.read.json(path)


def silver_industry_code(bronze: DataFrame) -> DataFrame:
    """P1 projection + TO_DATE cast + P2 audit columns.

    Twin of the reference SQL (industry_code_glue_job.py:38-47):
    ``SELECT item_code, item_name, industry_code, market,
    TO_DATE(issue_date, 'yyyy-MM-dd') AS issue_date``.
    """
    return bronze.select(
        "item_code",
        "item_name",
        "industry_code",
        "market",
        F.to_date("issue_date", "yyyy-MM-dd").alias("issue_date"),
    ).withColumns(
        {
            "created_at": F.current_timestamp(),
            "updated_at": F.current_timestamp(),
        }
    )


def project_krx_payload(raw: DataFrame) -> DataFrame:
    """P7 field mapping: raw KRX API names → silver names."""
    return raw.select(
        *[F.col(src).alias(dst) for src, dst in KRX_FIELD_MAP.items()],
        F.col("issue_date"),
    )


def run(spark: SparkSession, bronze_path: str, silver_path: str) -> DataFrame:
    """End-to-end: bronze JSON → silver parquet, ymd-partitioned
    dynamic overwrite (K3: 'gets overwritten with new data',
    industry_code_glue_job.py:56-66)."""
    silver = silver_industry_code(read_bronze(spark, bronze_path))
    out = silver.withColumn("ymd", F.col("issue_date"))
    write_partitioned(out, silver_path)
    return silver
