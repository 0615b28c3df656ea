"""HTML-table scraper source (SURVEY.md §2.1 S4, S5).

The reference parses crawled ``<table>`` markup into dicts with
BeautifulSoup on the worker (dags/brz_bonds_meta_monthly/
extractors.py:25-55). The engine uses only the stdlib
:mod:`html.parser` (no extra deps) and returns rows ready for
``spark.createDataFrame``; header keys are snake_cased exactly like the
reference (``lower().replace(" ", "_")``, extractors.py:45) and
duplicate headers keep the first value (A4 first-wins,
extractors.py:48).
"""

from __future__ import annotations

from html.parser import HTMLParser

from pyspark.sql import DataFrame, SparkSession


class _TableParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__()
        self.rows: list[list[str]] = []
        self._row: list[str] | None = None
        self._cell: list[str] | None = None

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "tr":
            self._row = []
        elif tag in ("td", "th"):
            self._cell = []

    def handle_endtag(self, tag: str) -> None:
        if tag in ("td", "th") and self._cell is not None:
            assert self._row is not None
            self._row.append("".join(self._cell).strip())
            self._cell = None
        elif tag == "tr" and self._row is not None:
            if self._row:
                self.rows.append(self._row)
            self._row = None

    def handle_data(self, data: str) -> None:
        if self._cell is not None:
            self._cell.append(data)


def parse_two_column_table(html: str) -> dict[str, str]:
    """2-col ``<tr><td>header</td><td>value</td></tr>`` table → dict.

    First value wins on duplicate headers (reference A4 semantics:
    ``parsed[h] = parsed.get(h, content)``)."""
    p = _TableParser()
    p.feed(html)
    parsed: dict[str, str] = {}
    for row in p.rows:
        if len(row) < 2:
            continue
        header = row[0].strip().lower().replace(" ", "_")
        parsed.setdefault(header, row[1])
    return parsed


def tables_to_dataframe(
    spark: SparkSession, named_html: dict[str, str]
) -> DataFrame:
    """S4: {name → html} → DataFrame(name, attrs map<string,string>)."""
    rows = [
        {"name": name, "attrs": parse_two_column_table(html)}
        for name, html in named_html.items()
    ]
    return spark.createDataFrame(
        rows, schema="name string, attrs map<string,string>"
    )
