"""Korean/UTF-8 robustness (SURVEY.md §7 risk register): the reference
handles Korean market data with explicit ``ensure_ascii=False`` dances;
the engine must treat multi-byte text as a first-class citizen through
normalization, fingerprinting, tokenization, and sinks."""

from __future__ import annotations

from pyspark.sql import functions as F

from capital.llm.text import (
    normalized,
    with_bpe_token_count,
    with_fingerprint,
)

_KO = [
    (1, "코스피 지수가 사상 최고치를 경신했다"),
    (2, "코스피  지수가 사상 최고치를  경신했다"),  # extra spaces
    (3, "삼성전자 주가 3% 상승, 거래량 1,200만 주"),
]


def _df(spark):
    return spark.createDataFrame(_KO, "doc_id long, text string")


def test_normalization_collapses_korean_whitespace(spark):
    rows = _df(spark).select(
        "doc_id", normalized(F.col("text")).alias("norm")
    ).collect()
    by_id = {r.doc_id: r.norm for r in rows}
    assert by_id[1] == by_id[2]  # whitespace-insensitive equality


def test_fingerprint_dedups_korean_variants(spark):
    fp = {r.doc_id: r.fingerprint for r in with_fingerprint(_df(spark)).collect()}
    assert fp[1] == fp[2]
    assert fp[1] != fp[3]


def test_bpe_tokens_segment_hangul_and_digits(spark):
    rows = {r.doc_id: r for r in with_bpe_token_count(_df(spark)).collect()}
    # "삼성전자 주가 3% 상승, ..." mixes Hangul runs, digit runs, and
    # punctuation — each segments separately (no mega-token).
    assert rows[3].n_bpe_tokens >= 10
    assert all(r.n_bpe_tokens > 0 for r in rows.values())


def test_json_sink_preserves_utf8(spark, tmp_path):
    from capital.io import write_json

    path = str(tmp_path / "ko_json")
    write_json(_df(spark), path)
    back = spark.read.json(path)
    assert {r.text for r in back.collect()} == {t for _, t in _KO}
    # Raw bytes on disk are UTF-8 Korean, not \uXXXX escapes.
    import glob

    raw = b"".join(
        open(f, "rb").read() for f in glob.glob(f"{path}/part-*")
    )
    assert "코스피".encode() in raw
