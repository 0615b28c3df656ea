from __future__ import annotations

from pyspark.sql import functions as F

from capital.sources.xml_holiday import holidays_to_dataframe, parse_holiday_xml
from capital.transforms.indicators import (
    cast_bok_values,
    classify_gics,
    coin_klines_enrich,
    rename_fx_panel,
)

_XML = """<?xml version="1.0" encoding="UTF-8"?>
<response><body><items>
  <item><locdate>20240101</locdate><dateName>신정</dateName></item>
  <item><locdate>20240209</locdate><dateName>설날 연휴</dateName></item>
  <item><locdate>20240301</locdate><dateName>삼일절</dateName></item>
</items></body></response>
"""


def test_parse_holiday_xml(spark):
    rows = parse_holiday_xml(_XML)
    assert rows[0] == {
        "calnd_dd_dy": "2024-01-01",
        "holdy_nm": "신정",
        "year": 2024,
    }
    df = holidays_to_dataframe(spark, _XML)
    assert df.count() == 3
    assert df.filter(F.col("year") == 2024).count() == 3


def test_parse_xml_payloads_distributed(spark):
    """mapInPandas parse over many payloads == union of driver-side
    parses, across multiple partitions (payloads are independent)."""
    from capital.sources.xml_holiday import parse_xml_payloads

    def payload(year: int) -> str:
        return (
            "<response><body><items>"
            f"<item><locdate>{year}0101</locdate><dateName>NY</dateName></item>"
            f"<item><locdate>{year}0301</locdate><dateName>M1</dateName></item>"
            "</items></body></response>"
        )

    years = [2020, 2021, 2022, 2023]
    df = spark.createDataFrame(
        [(y, payload(y)) for y in years], "year_req int, xml string"
    ).repartition(3)
    got = parse_xml_payloads(df)
    rows = {tuple(r) for r in got.collect()}
    expect = {
        (f"{y}-01-01", "NY", y) for y in years
    } | {(f"{y}-03-01", "M1", y) for y in years}
    assert rows == expect
    assert dict(got.dtypes)["year"] == "int"


def test_cast_bok_values(spark):
    raw = spark.createDataFrame(
        [("902Y006", "1355.2"), ("902Y006", "junk")],
        "STAT_CODE string, DATA_VALUE string",
    )
    out = cast_bok_values(raw).collect()
    assert out[0].DATA_VALUE == 1355.2
    assert out[1].DATA_VALUE is None


def test_coin_klines_enrich(spark):
    raw = spark.createDataFrame(
        [(1704153600000, 1704239999999, "x")],
        "Open_time long, Close_time long, Ignore string",
    )
    out = coin_klines_enrich(raw)
    assert "Ignore" not in out.columns
    row = out.collect()[0]
    assert row.open_ts.isoformat().startswith("2024-01-02T00:00:00")


def test_classify_gics(spark):
    codes = spark.createDataFrame(
        [("45",), ("4510",), ("451020",), ("45102010",)], "code string"
    )
    got = {r.code: r.category for r in classify_gics(codes).collect()}
    assert got == {
        "45": "sector",
        "4510": "industry_group",
        "451020": "industry",
        "45102010": "sub_industry",
    }


def test_rename_fx_panel(spark):
    raw = spark.createDataFrame([("2024-01-02", 1300.5)], "Date string, `USDKRW=X` double")
    out = rename_fx_panel(raw)
    assert "RecordDate" in out.columns and "Date" not in out.columns
