"""Published-recipe funnel equality on the NATURAL corpus (round-11 task).

The bench's ``*_published`` lines run the shipped Gopher and FineWeb
recipe YAMLs on ``fixtures.natural_documents_df`` — English-shaped prose
with a per-cut violator quota — and record the per-stage funnel. Until
now only the bench observed those funnels; this module folds them into
the pytest oracle bar: materialize the natural corpus to parquet, run
each published recipe through ``Pipeline.run`` EXACTLY as shipped (zero
threshold overrides), and mirror every stage in DuckDB over the same
parquet, asserting

  * the per-operator cut SETS (which doc_ids each operator rejected),
  * the surviving doc_id set,
  * the full per-operator (input -> output) funnel, stage by stage.

The mirrors reuse the same SQL builders the driver-facing oracles use
(plans/curation.py, plans/dedup_queries.py), so this is one more
consumer of the single SQL-mirror source of truth, not a re-derivation.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from mega_data_factory_spark.operators.refiners import (
    DEFAULT_STOPWORDS,
    LANG_MARKERS,
    PII_EMAIL,
    PII_IPV4,
    PII_PHONE,
)
from mega_data_factory_spark.plans.curation import (
    NORM_NOLOWER,
    _content_key_sql,
    _gopher_quality_oracle,
    _text_cleanup_oracle,
    _text_length,
    _token_count,
    _wc,
)
from mega_data_factory_spark.plans.dedup_queries import NORM_SQL, _minhash_ctes, _shingle_ctes

N_DOCS = 1500  # 30 full doc_id % 50 quota cycles — every violator class present
PLANTED_FLOOR = 10**10  # oracle-planted rows live above this; natural ids below


# --------------------------------------------------------------- fixtures


@pytest.fixture(scope="module")
def natural(spark, tmp_path_factory):
    """(parquet_path, duckdb connection with `documents` = natural corpus)."""
    path = str(tmp_path_factory.mktemp("natural_funnel") / "documents.parquet")
    from mega_data_factory_spark.fixtures import natural_documents_df

    natural_documents_df(spark, N_DOCS).write.parquet(path)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    return path, con


def _run_recipe(spark, tmp_path, yaml_name: str, src: str):
    """Run a shipped recipe YAML (source overridden to the natural corpus,
    thresholds untouched) and return (funnel, cut_by, passed_ids)."""
    from mega_data_factory_spark.config import PipelineConfig, SinkConfig
    from mega_data_factory_spark.plans.pipeline import Pipeline

    with open(f"configs/{yaml_name}") as f:
        cfg = PipelineConfig.from_yaml(f.read())
    cfg.source.path = src
    cfg.sink = SinkConfig(path=str(tmp_path / "out"), mode="overwrite")
    cfg.rejected_sink = SinkConfig(path=str(tmp_path / "rej"), mode="overwrite")
    cfg.metrics_path = str(tmp_path / "metrics")
    res = Pipeline(cfg).run(spark)
    funnel = [(m.operator, m.input_records, m.output_records) for m in res.operators]
    rej = spark.read.parquet(str(tmp_path / "rej"))
    cut_by: dict[int, str] = {
        r.doc_id: r.operator for r in rej.select("doc_id", "operator").collect()
    }
    passed = {
        r.doc_id
        for r in spark.read.parquet(str(tmp_path / "out")).select("doc_id").collect()
    }
    return funnel, cut_by, passed


# ----------------------------------------------------------- SQL mirrors


def _lang_ok_ids(con) -> set[int]:
    """lang_score >= 1 <=> any marker word (any language) occurs whole-word."""
    import re

    words = sorted({w for ws in LANG_MARKERS.values() for w in ws})
    pat = "\\b(" + "|".join(re.escape(w) for w in words) + ")\\b"
    rows = con.execute(
        f"SELECT doc_id FROM documents WHERE regexp_matches(lower(text), '{pat}')"
    ).fetchall()
    return {r[0] for r in rows}


def _annotation(con, sql: str, cols: list[str]) -> dict[int, tuple]:
    df = con.execute(sql).df()
    df = df[df["doc_id"] < PLANTED_FLOOR]
    return {int(r.doc_id): tuple(getattr(r, c) for c in cols) for r in df.itertuples()}


def _dedup_cuts(con, ids: set[int], corpus_sql: str) -> tuple[set[int], set[int]]:
    """(exact-dedup cut ids, minhash cut ids) over the given survivors.

    ``corpus_sql`` must select (doc_id, text) for ALL natural docs; the
    survivor set restricts it. Exact dedup (first-wins min id over the
    content key) feeds MinHash (16 hashes / 4 bands — the recipes' YAML
    params, which are also the plans/dedup_queries constants)."""
    con.register("surv_ids", pd.DataFrame({"doc_id": sorted(ids)}))
    sql = f"""
WITH all_docs AS ({corpus_sql}),
base AS (SELECT d.doc_id, d.text FROM all_docs d JOIN surv_ids USING (doc_id)),
keyed AS (
  SELECT doc_id, text,
         row_number() OVER (PARTITION BY {_content_key_sql()} ORDER BY doc_id) AS rn
  FROM base
),
corpus AS (SELECT doc_id, text FROM keyed WHERE rn = 1),
{_shingle_ctes(3).strip()},
{_minhash_ctes().strip()}
SELECT (SELECT coalesce(list(doc_id), []) FROM keyed WHERE rn > 1) AS exact_cut,
       (SELECT coalesce(list(doc_id), []) FROM dups) AS near_cut
"""
    exact_cut, near_cut = con.execute(sql).fetchone()
    return {int(i) for i in exact_cut}, {int(i) for i in near_cut}


def _assert_funnel(funnel, cuts: list[tuple[str, set[int]]], n0: int):
    """The per-operator (input -> output) chain implied by the cut sets
    must equal the pipeline's reported funnel exactly, in stage order."""
    expected = []
    remaining = n0
    by_op = dict(cuts)
    for op, _in, _out in funnel:
        cut_here = len(by_op.get(op, ()))
        expected.append((op, remaining, remaining - cut_here))
        remaining -= cut_here
    assert funnel == expected, f"funnel mismatch:\n got {funnel}\n exp {expected}"


# ----------------------------------------------------------------- tests


def test_gopher_published_funnel_matches_duckdb(spark, tmp_path, natural):
    src, con = natural
    funnel, cut_by, passed = _run_recipe(spark, tmp_path, "gopher_style_recipe.yaml", src)

    all_ids = {r[0] for r in con.execute("SELECT doc_id FROM documents").fetchall()}
    assert len(all_ids) == N_DOCS

    # stage 1: language (lang_score >= 1)
    lang_ok = _lang_ok_ids(con)
    # stage 2: the eight published Gopher quality rules
    gq = _annotation(con, _gopher_quality_oracle(), ["gopher_pass"])
    s2 = {i for i in lang_ok if gq[i][0]}
    # stage 3: repetition cuts (dup-word <= 0.3, then top-bigram <= 0.2)
    rep = _annotation(con, _text_cleanup_oracle(), ["dup_word_ratio", "top_bigram_ratio"])
    s2a = {i for i in s2 if rep[i][0] <= 0.3}
    s3 = {i for i in s2a if rep[i][1] <= 0.2}
    # stage 4+5: exact then MinHash dedup on the RAW text
    exact_cut, near_cut = _dedup_cuts(con, s3, "SELECT doc_id, text FROM documents")
    survivors = s3 - exact_cut - near_cut

    cuts = [
        ("LanguageCut", all_ids - lang_ok),
        ("GopherQualityFilter", lang_ok - s2),
        ("DupWordCut", s2 - s2a),
        ("TopBigramCut", s2a - s3),
        ("TextExactDeduplicator", exact_cut),
        ("MinHashLSHDeduplicator", near_cut),
    ]
    for op, ids in cuts:
        got = {d for d, o in cut_by.items() if o == op}
        assert got == ids, f"{op}: spark cut {len(got)} docs, duckdb {len(ids)}"
    assert passed == survivors
    # every stage must carry volume AND cut something (the fixture's quota
    # contract — a degenerate stage would silently weaken this whole test).
    # TopBigramCut is exempt: the fixture documents (fixtures.py r=10) that
    # a top-bigram violation implies a dup-word violation arithmetically,
    # so the preceding DupWordCut always claims those docs first.
    for op, ids in cuts:
        if op != "TopBigramCut":
            assert ids, f"{op} cut nothing — natural fixture quota broken?"
    _assert_funnel(funnel, cuts, len(all_ids))


def test_fineweb_published_funnel_matches_duckdb(spark, tmp_path, natural):
    src, con = natural
    funnel, cut_by, passed = _run_recipe(spark, tmp_path, "fineweb_style_recipe.yaml", src)

    all_ids = {r[0] for r in con.execute("SELECT doc_id FROM documents").fetchall()}

    # stage 1: language
    lang_ok = _lang_ok_ids(con)
    # stage 2: quality rules — length band, dup-word <= 0.6, quality >= 0.3
    len_ok = {
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM documents WHERE {_text_length('text', 'n_chars')} BETWEEN 80 AND 100000"
        ).fetchall()
    }
    rep = _annotation(con, _text_cleanup_oracle(), ["dup_word_ratio"])
    tokens = _token_count("text")
    hits = " + ".join(_wc("text", w) for w in DEFAULT_STOPWORDS)
    ratio = f"(CASE WHEN {tokens} > 0 THEN CAST(({hits}) AS DOUBLE) / {tokens} ELSE 0.0 END)"
    nn = NORM_NOLOWER.format(c="text")
    avg_len = f"(CASE WHEN {tokens} > 0 THEN CAST(length({nn}) - ({tokens} - 1) AS DOUBLE) / {tokens} ELSE 0.0 END)"
    score = (
        f"0.4 * least(CAST({tokens} AS DOUBLE) / 200.0, 1.0) "
        f"+ 0.3 * least({ratio} * 5.0, 1.0) "
        f"+ 0.3 * (CASE WHEN {avg_len} >= 3.0 AND {avg_len} <= 10.0 THEN 1.0 ELSE 0.0 END)"
    )
    q_ok = {
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM documents WHERE round({score}, 6) >= 0.3"
        ).fetchall()
    }
    s_len = lang_ok & len_ok
    s_rep = {i for i in s_len if rep[i][0] <= 0.6}
    s_q = s_rep & q_ok

    # cleanup chain (NFC+control strip -> intra-doc line dedup -> PII
    # redact), mirrored as one view: the dedups key on its output
    ctrl = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"
    con.execute(
        f"""
CREATE OR REPLACE TEMP VIEW fw_clean AS
WITH n AS (
  SELECT doc_id, regexp_replace(nfc_normalize(text), '{ctrl}', '', 'g') AS tn
  FROM documents
),
units AS (
  SELECT doc_id, unnest(string_split(tn, chr(10))) AS u,
         generate_subscripts(string_split(tn, chr(10)), 1) AS pos
  FROM n
),
marked AS (
  SELECT doc_id, u, pos,
         CASE WHEN length(trim(u)) >= 10
              THEN row_number() OVER (PARTITION BY doc_id, u ORDER BY pos)
              ELSE 1 END AS rn
  FROM units
),
rebuilt AS (
  SELECT doc_id,
         COALESCE(string_agg(CASE WHEN rn = 1 THEN u END, chr(10) ORDER BY pos), '') AS td
  FROM marked GROUP BY doc_id
)
SELECT n.doc_id,
       regexp_replace(regexp_replace(regexp_replace(
         r.td, '{PII_EMAIL}', '<EMAIL>', 'g'),
         '{PII_PHONE}', '<PHONE>', 'g'),
         '{PII_IPV4}', '<IP>', 'g') AS text
FROM n JOIN rebuilt r USING (doc_id)
"""
    )
    exact_cut, near_cut = _dedup_cuts(con, s_q, "SELECT doc_id, text FROM fw_clean")
    survivors = s_q - exact_cut - near_cut

    cuts = [
        ("NumericRangeFilter", all_ids - lang_ok),
        ("TextLengthFilter", lang_ok - s_len),
        ("GopherRepetitionCut", s_len - s_rep),
        ("QualityScoreCut", s_rep - s_q),
        ("TextExactDeduplicator", exact_cut),
        ("MinHashLSHDeduplicator", near_cut),
    ]
    for op, ids in cuts:
        got = {d for d, o in cut_by.items() if o == op}
        assert got == ids, f"{op}: spark cut {len(got)} docs, duckdb {len(ids)}"
    assert passed == survivors
    _assert_funnel(funnel, cuts, len(all_ids))


def test_c4_published_funnel_matches_duckdb(spark, tmp_path, natural):
    """Third shipped recipe: language -> C4 line rules + page flags ->
    page filter -> exact-span dedup on the CLEANED text (span_tokens=15,
    no DF cap in the shipped YAML)."""
    src, con = natural
    funnel, cut_by, passed = _run_recipe(spark, tmp_path, "c4_style_recipe.yaml", src)

    all_ids = {r[0] for r in con.execute("SELECT doc_id FROM documents").fetchall()}

    lang_ok = _lang_ok_ids(con)
    # C4 heuristics: the driver oracle runs with the same (bad_words,
    # min_sentences) the shipped YAML uses (plans/curation.py constants)
    from mega_data_factory_spark.plans.curation import (
        C4_BAD_WORDS,
        C4_MIN_SENTENCES,
        _c4_clean_oracle,
    )

    assert C4_BAD_WORDS == ("badword",) and C4_MIN_SENTENCES == 3  # YAML params
    c4 = _annotation(con, _c4_clean_oracle(), ["c4_page_pass", "c4_text"])
    s2 = {i for i in lang_ok if c4[i][0]}

    # span dedup over the survivors' CLEANED text — the shipped recipe
    # sets no max_doc_freq, so mirror the index without the DF cut
    # (plans/dedup_queries._span_ctes applies one for its own bench row)
    import pandas as pd

    con.register(
        "c4tbl",
        pd.DataFrame(
            {"doc_id": sorted(s2), "text": [c4[i][1] for i in sorted(s2)]}
        ),
    )
    n = 15
    span_cut_rows = con.execute(
        f"""
WITH corpus AS (SELECT doc_id, text FROM c4tbl),
norm AS (SELECT doc_id, {NORM_SQL} AS t FROM corpus),
w AS (SELECT doc_id, string_split(t, ' ') AS ws FROM norm),
sp AS (
  SELECT doc_id,
    list_distinct(list_transform(range(1, len(ws) - {n - 2}), i -> array_to_string(ws[i:i+{n - 1}], ' '))) AS s
  FROM w WHERE len(ws) >= {n}
),
inv AS (SELECT doc_id, unnest(s) AS span FROM sp),
pairs AS (
  SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS shared
  FROM inv a JOIN inv b ON a.span = b.span AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT DISTINCT idb FROM pairs WHERE shared >= 1
"""
    ).fetchall()
    span_cut = {int(r[0]) for r in span_cut_rows}
    survivors = s2 - span_cut

    cuts = [
        ("LanguageCut", all_ids - lang_ok),
        ("C4PageFilter", lang_ok - s2),
        ("SharedSpanDeduplicator", span_cut),
    ]
    for op, ids in cuts:
        got = {d for d, o in cut_by.items() if o == op}
        assert got == ids, f"{op}: spark cut {len(got)} docs, duckdb {len(ids)}"
    assert passed == survivors
    assert span_cut, "span dedup cut nothing — exact/near-dup quota should collide"
    _assert_funnel(funnel, cuts, len(all_ids))
