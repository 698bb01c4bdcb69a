"""WARC source tests: synthesized WARC files through the binaryFile +
mapInPandas path (reference CommonCrawlLoader record shape)."""

import gzip


def make_warc(records):
    """records: list of (url, date, html_bytes)."""
    out = bytearray()
    for url, date, html in records:
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n" + html
        head = (
            f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: {url}\r\n"
            f"WARC-Date: {date}\r\nContent-Length: {len(http)}\r\n\r\n"
        ).encode()
        out += head + http + b"\r\n\r\n"
    # one non-response record that must be skipped
    meta = b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nabcd\r\n\r\n"
    return bytes(out) + meta


HTML = (
    b"<html><head><title>Test  Page</title><script>var x=1;</script></head>"
    b"<body><p>" + b"useful words " * 20 + b"</p></body></html>"
)
TINY = b"<html><body>short</body></html>"  # extract < 50 chars -> dropped


def test_parse_warc_bytes():
    from mega_data_factory_spark.sources.warc import parse_warc_bytes

    data = make_warc(
        [
            ("http://a.example/x", "2024-01-01T00:00:00Z", HTML),
            ("http://b.example/y", "2024-01-02T00:00:00Z", TINY),
        ]
    )
    rows = list(parse_warc_bytes(data, "w.warc", "CC-TEST"))
    assert len(rows) == 1  # tiny extract dropped, warcinfo skipped
    r = rows[0]
    assert r["url"] == "http://a.example/x"
    assert r["title"] == "Test Page"
    assert "useful words" in r["text"] and "var x=1" not in r["text"]
    assert r["text_length"] == len(r["text"])
    # gzipped variant parses identically
    assert list(parse_warc_bytes(gzip.compress(data), "w.warc.gz", "CC-TEST"))[0]["text"] == r["text"]


def test_read_warc_spark(spark, tmp_path):
    from mega_data_factory_spark.sources.warc import read_warc

    for i in range(3):
        (tmp_path / f"f{i}.warc").write_bytes(
            make_warc([(f"http://site{i}.example/", "2024-01-01T00:00:00Z", HTML)])
        )
    df = read_warc(spark, str(tmp_path), options={"crawl_id": "CC-TEST"})
    rows = df.collect()
    assert len(rows) == 3
    assert {r.url for r in rows} == {f"http://site{i}.example/" for i in range(3)}
    assert all(r.crawl_id == "CC-TEST" and r.text_length >= 50 for r in rows)
    # schema contract matches the reference record shape
    assert df.columns == ["crawl_id", "warc_path", "url", "warc_date", "title", "text", "text_length"]


def test_warc_through_yaml_pipeline(spark, tmp_path):
    """The reference's CommonCrawl entry shape end-to-end: YAML config with
    a warc source (resolved via the custom-source registry), a length
    filter stage, and a parquet sink."""
    from mega_data_factory_spark.config import PipelineConfig
    from mega_data_factory_spark.plans.pipeline import Pipeline

    (tmp_path / "crawl").mkdir()
    with open(tmp_path / "crawl" / "a.warc", "wb") as f:
        f.write(make_warc([
            ("http://ok.example.com/1", "2024-01-01T00:00:00Z", HTML),
            ("http://ok.example.com/2", "2024-01-01T00:00:01Z", TINY),  # dropped (<50 chars)
        ]))

    cfg = PipelineConfig.from_yaml(
        f"""
pipeline:
  name: warc_pipeline
  id_col: url
  source: {{format: warc, path: {tmp_path}/crawl, options: {{crawl_id: CC-TEST}}}}
  stages:
    - name: s
      operators:
        - name: TextLengthFilter
          params: {{min_length: 50, max_length: 100000, length_col: text_length}}
  sink: {{format: parquet, path: {tmp_path}/out, mode: overwrite}}
"""
    )
    result = Pipeline(cfg).run(spark)
    assert result.input_records == 1 and result.output_records == 1  # TINY dropped at parse
    out = spark.read.parquet(f"{tmp_path}/out").collect()
    assert out[0].crawl_id == "CC-TEST" and out[0].title == "Test Page"


def test_warc_python_datasource(spark, tmp_path):
    """PySpark 4 Python DataSource variant: file-per-partition reads with
    the same record contract as the mapInPandas path."""
    from mega_data_factory_spark.sources.warc_datasource import register

    (tmp_path / "ds").mkdir()
    for i in range(3):
        with open(tmp_path / "ds" / f"f{i}.warc", "wb") as f:
            f.write(make_warc([(f"http://site{i}.com/a", "2024-01-01T00:00:00Z", HTML)]))

    register(spark)
    df = (
        spark.read.format("warc")
        .option("path", str(tmp_path / "ds"))
        .option("crawl_id", "CC-DS")
        .load()
    )
    assert df.rdd.getNumPartitions() == 3  # one partition per WARC file
    rows = df.orderBy("url").collect()
    assert [r.url for r in rows] == [f"http://site{i}.com/a" for i in range(3)]
    assert all(r.crawl_id == "CC-DS" and r.title == "Test Page" and r.text_length >= 50 for r in rows)


def test_warc_extract_matches_oracle(spark):
    """The registered warc_extract driver query: deterministic fixture WARC
    bytes (gzipped + plain, with skipped warcinfo/non-HTML/short records)
    through the full parser + extractor, hash-compared against the string-
    arithmetic oracle."""
    from tests.conftest import assert_query_matches_oracle

    assert_query_matches_oracle(spark, "warc_extract")


def test_warc_datasource_empty_dir_and_gz_stream(spark, tmp_path):
    """Empty dir: PySpark substitutes [None] for an empty partition list —
    must yield an empty frame, not dereference None.path. .gz files stream
    through gzip.GzipFile (no whole-file slurp) with the same records."""
    import gzip as _gzip

    from mega_data_factory_spark.sources.warc_datasource import register

    register(spark)
    empty = tmp_path / "none"
    empty.mkdir()
    assert spark.read.format("warc").option("path", str(empty)).load().count() == 0

    data = make_warc(
        [("http://gz.example/a", "2024-01-01T00:00:00Z",
          b"<html><title>T</title><body>" + b"word " * 40 + b"</body></html>")]
    )
    gz_dir = tmp_path / "gz"
    gz_dir.mkdir()
    (gz_dir / "f.warc.gz").write_bytes(_gzip.compress(data))
    rows = spark.read.format("warc").option("path", str(gz_dir)).load().collect()
    assert len(rows) == 1 and rows[0].url == "http://gz.example/a"
