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


def holidays_to_dataframe(spark: SparkSession, xml_text: str) -> DataFrame:
    return spark.createDataFrame(
        parse_holiday_xml(xml_text),
        schema="calnd_dd_dy string, holdy_nm string, year int",
    )
