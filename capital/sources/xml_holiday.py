"""XML API source (SURVEY.md §2.8 F15 — the KRX holiday API).

The reference parses the public-data-portal XML with ElementTree on the
worker (dags/brz_kr_etf_daily/tasks_deprecated.py:31-33; the active
holiday DAG consumes the same payload, dags/brz_kr_market_holiday_daily/
tasks.py:8-37). Engine version: stdlib ElementTree → rows →
``createDataFrame``; volume is a handful of rows/year, so driver-side
parse is the right cost model.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession


def parse_holiday_xml(xml_text: str) -> list[dict]:
    """``<item><locdate>20240101</locdate><dateName>신정</dateName></item>``
    rows → dicts with ISO dates."""
    root = ET.fromstring(xml_text)
    out = []
    for item in root.iter("item"):
        locdate = item.findtext("locdate") or ""
        name = item.findtext("dateName") or ""
        if len(locdate) == 8:
            out.append(
                {
                    "calnd_dd_dy": f"{locdate[:4]}-{locdate[4:6]}-{locdate[6:]}",
                    "holdy_nm": name,
                    "year": int(locdate[:4]),
                }
            )
    return out


_HOLIDAY_SCHEMA = "calnd_dd_dy string, holdy_nm string, year int"


def holidays_to_dataframe(spark: SparkSession, xml_text: str) -> DataFrame:
    return spark.createDataFrame(
        parse_holiday_xml(xml_text), schema=_HOLIDAY_SCHEMA
    )


def parse_xml_payloads(df: DataFrame, xml_col: str = "xml") -> DataFrame:
    """Distributed twin of :func:`holidays_to_dataframe` for the
    many-payloads shape (one API response per (year, page) row — the
    regime where driver-side parse stops scaling): ``mapInPandas``
    parses each Arrow batch with ElementTree on the executors and
    explodes item rows. Payloads parse independently, so this
    partitions/scales like any narrow op; a malformed payload fails
    its task loudly rather than silently dropping rows."""

    def _parse(batches):
        import pandas as pd

        for pdf in batches:
            rows: list[dict] = []
            for x in pdf[xml_col]:
                rows.extend(parse_holiday_xml(x))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["calnd_dd_dy", "holdy_nm", "year"]
                )

    return df.mapInPandas(_parse, schema=_HOLIDAY_SCHEMA)
