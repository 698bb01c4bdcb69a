"""BpeTokenizer: merge-learning sanity on a known corpus, lossless
detokenization, determinism, persistence, containment. Iterative merge
selection is not SQL-expressible (like k-means); these bars are the
correctness gate."""

import pytest
from pyspark.sql import functions as F

from mega_data_factory_spark.operators.bpe import END_OF_WORD, BpeTokenizer


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "low low low low low"),
        (2, "lower lower newer newer newer newer"),
        (3, "newest newest widest widest"),
        (4, "low lower lowest"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bpe_learns_frequent_merges(spark, corpus):
    """On the classic low/lower/newer corpus, high-frequency adjacent pairs
    ('lo', 'er</w>'-style units) become early merges, and frequent whole
    words collapse to few tokens while rare words stay more segmented."""
    tok = BpeTokenizer(vocab_size=40).fit(corpus)
    assert tok.merges, "no merges learned"
    pair_strs = ["".join(p) for p in tok.merges]
    assert "lo" in pair_strs[:6]  # 'l','o' co-occur in low/lower/lowest
    enc = tok.encode(corpus).collect()
    by_id = {r.doc_id: r for r in enc}
    # 'low' is the most frequent word: it must encode to ONE token
    assert by_id[1].bpe_tokens.count("low" + END_OF_WORD) == 5
    assert by_id[1].bpe_token_count == 5
    # counts column matches the array
    for r in enc:
        assert r.bpe_token_count == len(r.bpe_tokens)


def test_bpe_detokenization_lossless(spark, corpus):
    """concatenating tokens and mapping the end-of-word marker to a space
    reproduces the normalized text exactly — including unseen words/chars
    (single-char fallback, never an error)."""
    tok = BpeTokenizer(vocab_size=40).fit(corpus)
    probe = spark.createDataFrame(
        [(1, "low lower zebra 12345 ünïcödé"), (2, None), (3, "newest")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in tok.encode(probe).collect()}
    for i, expected in ((1, "low lower zebra 12345 ünïcödé"), (3, "newest")):
        detok = "".join(rows[i].bpe_tokens).replace(END_OF_WORD, " ").strip()
        assert detok == expected
    assert rows[2].bpe_tokens is None and rows[2].bpe_token_count is None


def test_bpe_deterministic_and_layout_independent(spark, corpus):
    a = BpeTokenizer(vocab_size=40).fit(corpus)
    b = BpeTokenizer(vocab_size=40).fit(corpus.repartition(7))
    assert a.merges == b.merges


def test_bpe_save_load_roundtrip(spark, corpus, tmp_path):
    a = BpeTokenizer(vocab_size=40).fit(corpus)
    p = str(tmp_path / "bpe" / "model.json")
    a.save(p)
    b = BpeTokenizer.load(p)
    assert b.merges == a.merges and b.lowercase == a.lowercase
    ea = [tuple(r.bpe_tokens) for r in a.encode(corpus).orderBy("doc_id").collect()]
    eb = [tuple(r.bpe_tokens) for r in b.encode(corpus).orderBy("doc_id").collect()]
    assert ea == eb


def test_bpe_unicode_whitespace_word_parity(spark):
    """fit's JVM split (Java \\s = ASCII whitespace) treats U+00A0 as
    word-interior; encode must agree — one trained word, one end-of-word
    marker, not two (regression: str.split() breaks on Unicode ws)."""
    nb = "a b"
    df = spark.createDataFrame([(i, nb) for i in range(5)], "doc_id long, text string")
    tok = BpeTokenizer(vocab_size=20).fit(df)
    toks = tok.encode(df).collect()[0].bpe_tokens
    assert sum(t.count(END_OF_WORD) for t in toks) == 1
    assert "".join(toks).replace(END_OF_WORD, " ").strip() == nb


def test_bpe_validation(spark):
    with pytest.raises(ValueError, match="vocab_size"):
        BpeTokenizer(0)
    empty = spark.createDataFrame([(1, "")], "doc_id long, text string")
    with pytest.raises(ValueError, match="no words"):
        BpeTokenizer(10).fit(empty)
    with pytest.raises(ValueError, match="fit"):
        BpeTokenizer(10).encode(empty)
    with pytest.raises(ValueError, match="nothing to save"):
        BpeTokenizer(10).save("/tmp/x.json")


def test_bpe_yaml_pipeline_apply(spark, corpus, tmp_path):
    """Registry + model_path path: a config-driven stage encodes per batch
    from the persisted model (apply == lazy-load + encode)."""
    from mega_data_factory_spark.registry import OPERATORS

    p = str(tmp_path / "bpe.json")
    BpeTokenizer(vocab_size=40).fit(corpus).save(p)
    op = OPERATORS.create("bpe_tokenizer", {"model_path": p})
    out = op.apply(corpus)
    assert {"bpe_tokens", "bpe_token_count"} <= set(out.columns)
    assert out.filter(F.col("bpe_token_count").isNull()).count() == 0


def test_bpe_encode_ids_matches_tokens(spark, corpus):
    """encode_ids is encode through the vocab map: inverse-vocab maps ids
    back to exactly the bpe_tokens arrays; counts agree; NULL stays NULL."""
    tok = BpeTokenizer(vocab_size=40).fit(corpus)
    inv = {i: t for t, i in tok.vocab().items()}
    assert 0 not in inv  # id 0 is reserved UNK
    probe = corpus.union(
        spark.createDataFrame([(9, None)], "doc_id long, text string")
    )
    both = tok.encode_ids(tok.encode(probe)).collect()
    for r in both:
        if r.text is None:
            assert r.bpe_token_ids is None and r.bpe_token_count is None
            continue
        assert [inv[i] for i in r.bpe_token_ids] == list(r.bpe_tokens)
        assert r.bpe_token_count == len(r.bpe_token_ids)


def test_bpe_unknown_chars_get_unk_id(spark, corpus):
    tok = BpeTokenizer(vocab_size=40).fit(corpus)
    probe = spark.createDataFrame([(1, "low ßß")], "doc_id long, text string")
    ids = probe.transform(tok.encode_ids).collect()[0].bpe_token_ids
    assert 0 in ids  # fit-unseen char maps to UNK, never an error
    assert ids[0] != 0  # known word still resolves


def test_bpe_vocab_persists_across_save_load(spark, corpus, tmp_path):
    a = BpeTokenizer(vocab_size=40).fit(corpus)
    p = str(tmp_path / "bpe_ids.json")
    a.save(p)
    b = BpeTokenizer.load(p)
    assert b.vocab() == a.vocab()
    ea = [tuple(r.bpe_token_ids) for r in a.encode_ids(corpus).orderBy("doc_id").collect()]
    eb = [tuple(r.bpe_token_ids) for r in b.encode_ids(corpus).orderBy("doc_id").collect()]
    assert ea == eb


def test_cli_fit_bpe_and_export_tokens(spark, corpus, tmp_path, capsys):
    """The full CLI story: fit-bpe trains + persists a model, export-tokens
    encodes, packs, and writes bucket-ordered shard parquet whose token
    total equals the corpus's encoded token count."""
    import json

    from mega_data_factory_spark.__main__ import main

    src = str(tmp_path / "docs.parquet")
    corpus.write.parquet(src)
    model = str(tmp_path / "bpe.json")
    out = str(tmp_path / "shards")
    assert main(["fit-bpe", "-i", src, "-o", model, "--vocab-size", "40"]) == 0
    fit_out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert fit_out["merges"] > 0 and fit_out["vocab"] > 0
    assert main([
        "export-tokens", "-i", src, "-m", model, "-o", out,
        "--seq-len", "16", "--buckets", "2",
    ]) == 0
    exp_out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    tok = BpeTokenizer.load(model)
    n_tokens = (
        tok.encode_ids(corpus)
        .agg(F.sum("bpe_token_count"))
        .first()[0]
    )
    assert exp_out["tokens"] == n_tokens
    shards = spark.read.parquet(out)
    assert shards.count() == exp_out["sequences"]
    full = shards.filter(F.col("n_tokens") == 16).count()
    assert full >= exp_out["sequences"] - 2  # <=1 partial per bucket


def test_bpe_tie_break_is_lexicographic_on_joined_key(spark):
    """Equal-count pairs merge in lexicographic order of the joined
    a\\0b key — the canonical deterministic tie-break the lazy-heap
    argmax implements (count desc, then smallest key)."""
    rows = [(i, w) for i, w in enumerate(["xy"] * 3 + ["xz"] * 3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    tok = BpeTokenizer(vocab_size=30).fit(df)
    # every initial pair has count 3; "x\0y" < "x\0z" < the EOW pairs
    assert tok.merges[0] == ("x", "y")
    assert tok.merges[1] == ("x", "z")


def test_cli_export_tokens_with_spans(spark, corpus, tmp_path, capsys):
    """--spans adds T5 denoising columns to the exported shards, and the
    sentinel splice reconstructs each packed sequence exactly."""
    import json

    from mega_data_factory_spark.__main__ import main

    src = str(tmp_path / "docs.parquet")
    corpus.write.parquet(src)
    model = str(tmp_path / "bpe.json")
    out = str(tmp_path / "span_shards")
    assert main(["fit-bpe", "-i", src, "-o", model, "--vocab-size", "40"]) == 0
    capsys.readouterr()
    assert main([
        "export-tokens", "-i", src, "-m", model, "-o", out,
        "--seq-len", "16", "--buckets", "2", "--spans", "500",
    ]) == 0
    shards = spark.read.parquet(out)
    assert {"tokens", "input_ids", "target_ids"} <= set(shards.columns)
    for r in shards.collect():
        spans, cur = {}, None
        for t in r.target_ids:
            if t > 400:
                cur, spans[cur] = t, []
            else:
                spans[cur].append(t)
        rebuilt = []
        for t in r.input_ids:
            rebuilt.extend(spans[t] if t > 400 else [t])
        assert rebuilt == list(r.tokens)


def test_cli_span_flags_require_spans_even_at_default_values(spark, corpus, tmp_path):
    """Presence, not value: explicitly passing --noise-density/--mean-span
    without --spans errors uniformly — including when the passed value
    restates the effective default (the value-comparison guard silently
    accepted `--noise-density 0.15`)."""
    import pytest

    from mega_data_factory_spark.__main__ import main

    src = str(tmp_path / "docs.parquet")
    corpus.write.parquet(src)
    model = str(tmp_path / "bpe.json")
    assert main(["fit-bpe", "-i", src, "-o", model, "--vocab-size", "40"]) == 0
    for flags in (["--noise-density", "0.15"], ["--mean-span", "3.0"]):
        with pytest.raises(SystemExit) as exc:
            main([
                "export-tokens", "-i", src, "-m", model,
                "-o", str(tmp_path / "never_written"), "--seq-len", "16", *flags,
            ])
        assert exc.value.code == 2
