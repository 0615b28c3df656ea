"""The modern curation funnel (``pipe_curation_v2``) as paired
driver queries: per-document survivors + the per-source profile.

The DuckDB oracle re-derives EVERY stage from the same constants and
SQL fragments as the per-operator oracles it composes — the C4 line
fixture (``_c4_fixture_sql``), the extraction fixture arithmetic
(``V2_LINKY_MOD``), the parameterized NB classifier
(``nb_pred_sql``), the parameterized Gopher rules
(``gopher_rules_sql``), the C4 line/page rules, the first-occurrence
line dedup, the MinHash→LSH→verify recursive closure
(``_clusters_oracle``), the span-decontamination unnest walk
(the ``_DECON_SPAN_ORACLE`` shape), and the shared PII scrub chain
(``pii_scrub_sql``) — so a hash match here proves the tiers'
fixture/tokenizer conventions compose end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from capital.io import load_table
from capital.queries.registry import query


def _v2_ctes() -> str:
    """The full funnel as one WITH chain (multi-referenced CTEs
    MATERIALIZED — the round-9 DuckDB CTE-inlining rule)."""
    from capital.llm.c4 import MIN_LINE_WORDS
    from capital.llm.pipeline_v2 import (
        V2_BENCH_MOD,
        V2_DECON_K,
        V2_GOPHER_OVERRIDES,
        V2_LINKY_MOD,
        V2_LINKY_OFF,
        V2_MIN_KEPT_LINES,
    )
    from capital.queries.curation_queries import (
        _c4_fixture_sql,
        gopher_rules_sql,
        nb_pred_sql,
    )
    from capital.queries.llm_queries import (
        _NTOKS,
        _clusters_oracle,
        pii_scrub_sql,
    )

    k = V2_DECON_K
    keep_line = (
        "l -> regexp_matches(l, '[.!?\"]$')"
        f" AND len(string_split_regex(trim(l), '\\s+'))"
        f" >= {MIN_LINE_WORDS}"
        " AND NOT contains(lower(l), 'javascript')"
    )
    # tokens of an already-normalized (lowercase, single-space/newline)
    # text column — the decon/minhash convention over derived text.
    ntoks_v2 = (
        r"string_split_regex(trim(regexp_replace(lower(text),"
        r" '\s+', ' ', 'g')), '\s+')"
    )
    return f"""
    {_c4_fixture_sql()},
    v2w AS (
      SELECT f.doc_id AS doc_id, d.lang AS lang, d.source AS source,
             f.lines AS lines
      FROM fx f JOIN documents d USING (doc_id)
      WHERE f.doc_id % {V2_BENCH_MOD} != 0 AND f.text IS NOT NULL),
    v2ex AS MATERIALIZED (
      SELECT doc_id, lang, source,
             array_to_string(
               [trim(lines[i]) FOR i IN range(1, len(lines) + 1)
                IF (i - 1) % {V2_LINKY_MOD} != {V2_LINKY_OFF}
                   AND trim(lines[i]) <> ''],
               chr(10)) AS text
      FROM v2w),
    v2nb AS MATERIALIZED ({nb_pred_sql("v2ex")}),
    v2c1 AS MATERIALIZED (
      SELECT e.* FROM v2ex e JOIN v2nb p USING (doc_id)
      WHERE p.nb_pred = e.lang),
    v2go AS (
      SELECT doc_id, gopher_keep
      FROM ({gopher_rules_sql("v2c1", V2_GOPHER_OVERRIDES)})),
    v2c2 AS MATERIALIZED (
      SELECT c.* FROM v2c1 c JOIN v2go g USING (doc_id)
      WHERE g.gopher_keep),
    v2c4s AS (
      SELECT doc_id, lang, source, text,
             list_filter(string_split(text, chr(10)), {keep_line})
               AS kept
      FROM v2c2),
    v2c3 AS MATERIALIZED (
      SELECT doc_id, lang, source,
             array_to_string(kept, chr(10)) AS text
      FROM v2c4s
      WHERE len(kept) >= {V2_MIN_KEPT_LINES}
        AND NOT contains(text, '{{')
        AND NOT contains(lower(text), 'lorem ipsum')),
    v2ln AS (
      SELECT doc_id, u.i AS idx, ls[u.i] AS line
      FROM (SELECT doc_id, string_split(text, chr(10)) AS ls
            FROM v2c3),
           unnest(range(1, len(ls) + 1)) AS u(i)),
    v2rnk AS (
      SELECT doc_id, idx, line,
             row_number() OVER (PARTITION BY line
                                ORDER BY doc_id, idx) AS rn
      FROM v2ln),
    v2ld AS MATERIALIZED (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_lines,
             CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_removed_lines,
             coalesce(string_agg(CASE WHEN rn = 1 THEN line END,
                                 chr(10) ORDER BY idx), '') AS text
      FROM v2rnk GROUP BY doc_id),
    v2c4d AS MATERIALIZED (
      SELECT c.doc_id AS doc_id, c.lang AS lang, c.source AS source,
             l.n_lines AS n_lines, l.n_removed_lines AS n_removed_lines,
             l.text AS text
      FROM v2c3 c JOIN v2ld l USING (doc_id)),
    v2comp AS MATERIALIZED ({_clusters_oracle("v2c4d")}),
    v2keep AS (SELECT MIN(doc_id) AS doc_id FROM v2comp
               GROUP BY component_id),
    v2c5 AS MATERIALIZED (
      SELECT c.* FROM v2c4d c JOIN v2keep USING (doc_id)),
    v2n AS MATERIALIZED (
      SELECT doc_id, {ntoks_v2} AS t FROM v2c5),
    v2bg AS MATERIALIZED (
      SELECT DISTINCT unnest(s) AS g FROM (
        SELECT list_distinct(
                 [array_to_string(t[i:i+{k - 1}], ' ')
                  FOR i IN range(1, greatest(len(t) - {k - 1}, 1) + 1)])
               AS s
        FROM (SELECT {_NTOKS} AS t FROM documents
              WHERE doc_id % {V2_BENCH_MOD} = 0))),
    v2tg AS (
      SELECT doc_id, i AS gpos,
             array_to_string(t[i:i+{k - 1}], ' ') AS g
      FROM v2n, unnest(range(1, len(t) - {k} + 2)) AS u(i)
      WHERE len(t) >= {k}),
    v2mk AS MATERIALIZED (
      SELECT DISTINCT doc_id, p AS pos
      FROM (SELECT v2tg.doc_id AS doc_id, v2tg.gpos AS gpos
            FROM v2tg JOIN v2bg USING (g)),
           unnest(range(gpos, gpos + {k})) AS v(p)),
    v2tp AS (
      SELECT doc_id, i AS pos, t[i] AS tok
      FROM v2n, unnest(range(1, len(t) + 1)) AS u(i)),
    v2kp AS (
      SELECT doc_id, pos, tok FROM v2tp
      ANTI JOIN v2mk USING (doc_id, pos)),
    v2cl AS MATERIALIZED (
      SELECT doc_id, COUNT(*) AS nk,
             array_to_string(list(tok ORDER BY pos), ' ') AS ctext
      FROM v2kp GROUP BY doc_id),
    v2fin AS MATERIALIZED (
      SELECT n.doc_id AS doc_id,
             CAST(len(n.t) AS BIGINT) AS n_tokens,
             CAST(len(n.t) - COALESCE(c.nk, 0) AS BIGINT)
               AS n_removed_tokens,
             COALESCE(c.ctext, '') AS ctext
      FROM v2n n LEFT JOIN v2cl c USING (doc_id)),
    v2out AS MATERIALIZED (
      SELECT c.doc_id AS doc_id, c.lang AS lang, c.source AS source,
             c.n_lines AS n_lines,
             c.n_removed_lines AS n_removed_lines,
             f.n_tokens AS n_tokens,
             f.n_removed_tokens AS n_removed_tokens,
             md5({pii_scrub_sql("f.ctext")}) AS scrubbed_md5
      FROM v2c5 c JOIN v2fin f USING (doc_id))
    """


def _v2_doc_oracle() -> str:
    return f"""
    WITH {_v2_ctes()}
    SELECT doc_id, lang, source, n_lines, n_removed_lines,
           n_tokens, n_removed_tokens, scrubbed_md5
    FROM v2out
    """


def _v2_profile_oracle() -> str:
    counts = {
        "n_extracted": "v2ex",
        "n_lang_kept": "v2c1",
        "n_gopher_kept": "v2c2",
        "n_c4_kept": "v2c3",
    }
    cnt_ctes = ",".join(
        f"""
    p_{name} AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS {name}
                 FROM {rel} GROUP BY source)"""
        for name, rel in counts.items()
    )
    joins = " ".join(
        f"LEFT JOIN p_{name} USING (source)" for name in counts
    )
    sel = ",\n           ".join(
        f"COALESCE({name}, 0) AS {name}" for name in counts
    )
    return f"""
    WITH {_v2_ctes()},
    p_in AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_input
             FROM documents GROUP BY source),{cnt_ctes},
    p_ld AS (SELECT v2c4d.source AS source,
                    CAST(SUM(n_removed_lines) AS BIGINT)
                      AS lines_removed
             FROM v2c4d GROUP BY v2c4d.source),
    p_fin AS (SELECT v2out.source AS source,
                     CAST(COUNT(*) AS BIGINT) AS n_survivors,
                     CAST(SUM(n_removed_tokens) AS BIGINT)
                       AS tokens_removed_decon,
                     CAST(SUM(n_tokens - n_removed_tokens) AS BIGINT)
                       AS tokens_final,
                     md5(string_agg(scrubbed_md5, ''
                                    ORDER BY doc_id)) AS corpus_md5
              FROM v2out GROUP BY v2out.source)
    SELECT p_in.source AS source, n_input,
           {sel},
           COALESCE(lines_removed, 0) AS lines_removed,
           COALESCE(n_survivors, 0) AS n_survivors,
           COALESCE(tokens_removed_decon, 0) AS tokens_removed_decon,
           COALESCE(tokens_final, 0) AS tokens_final,
           corpus_md5
    FROM p_in {joins}
    LEFT JOIN p_ld USING (source)
    LEFT JOIN p_fin USING (source)
    """


@query("pipe_curation_v2", memoize=False, oracle=_v2_doc_oracle())
def pipe_curation_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MODERN curation funnel end-to-end (capital/llm/
    pipeline_v2.py): benchmark holdout → HTML render → REAL
    main-content extraction kernel → trainable NB language gate →
    Gopher rules → C4 line rules → corpus-wide line dedup →
    MinHash→LSH→verify cluster dedup → surgical span decontamination
    vs the holdout → PII scrub. One row per surviving document with
    per-stage removal mass and the scrubbed-text digest; the oracle
    composes the same per-operator SQL fragments, proving the
    round-13–15 tiers' conventions compose. memoize=False: the NB
    training and benchmark-gram collects are eager per call."""
    from capital.llm.pipeline_v2 import curation_v2

    d = load_table(spark, sf_dir, "documents")
    return curation_v2(d).select(
        "doc_id", "lang", "source", "n_lines", "n_removed_lines",
        "n_tokens", "n_removed_tokens", "scrubbed_md5",
    )


@query(
    "pipe_curation_v2_profile", memoize=False,
    oracle=_v2_profile_oracle(),
)
def pipe_curation_v2_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source report card of the modern curation funnel: input →
    extracted → language-gate → Gopher → C4 survivors, removed
    line/token mass, the final token budget, and an order-canonical
    digest of the survivors' scrubbed texts (the corpus-run summary a
    100 TB curation job publishes per source)."""
    from capital.llm.pipeline_v2 import curation_v2_profile

    d = load_table(spark, sf_dir, "documents")
    return curation_v2_profile(d).select(
        "source", "n_input", "n_extracted", "n_lang_kept",
        "n_gopher_kept", "n_c4_kept", "lines_removed", "n_survivors",
        "tokens_removed_decon", "tokens_final", "corpus_md5",
    )


@query(
    "pipe_curation_v2_stored", memoize=False, oracle=_v2_doc_oracle()
)
def pipe_curation_v2_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The modern curation funnel against a STORED language model
    (llm/nbayes nb_save/nb_load — the cur_nb_stored_classify posture
    composed): train once on the extracted work corpus, persist the
    exact-integer state, rebuild the whole funnel from the loaded
    model. Integer state is lossless through parquet, so the result
    must hash-match the SAME oracle as the in-call pipe_curation_v2 —
    the store→compose twin the streaming twin runs on every day-N+1
    batch. memoize=False: writes the model eagerly per call."""
    import tempfile

    from capital.llm.nbayes import nb_load, nb_save, nb_train
    from capital.llm.pipeline_v2 import (
        curation_v2,
        extract_corpus,
        v2_work_split,
    )

    d = load_table(spark, sf_dir, "documents")
    # per-call private dir: a fixed shared path raced concurrent
    # sessions (overwrite vs lazy read — round-16 review); the model
    # is tiny and /tmp is session-scoped in this sandbox.
    path = tempfile.mkdtemp(prefix="capital_v2_nb_model_")
    work, _bench = v2_work_split(d)
    c0 = extract_corpus(work)
    nb_save(nb_train(c0.select("doc_id", "lang", "text")), path)
    return curation_v2(d, nb_model=nb_load(spark, path)).select(
        "doc_id", "lang", "source", "n_lines", "n_removed_lines",
        "n_tokens", "n_removed_tokens", "scrubbed_md5",
    )
