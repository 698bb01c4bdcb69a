"""Remote CommonCrawl source tests against a local http.server: index
listing, per-task download with cache, and the retry/backoff contract
(reference commoncrawl_loader.py:38-64,147-175)."""

import gzip
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from tests.test_warc import HTML, make_warc

CRAWL = "CC-TEST-2024"
WARC_PATHS = [
    f"crawl-data/{CRAWL}/segments/1/warc/file-{i:05d}.warc.gz" for i in range(3)
]


@pytest.fixture(scope="module")
def cc_server():
    """Serves warc.paths.gz plus three single-record gzipped WARC files.
    /flaky/... paths fail with 503 on every first hit (retry exercise)."""
    files = {}
    paths_body = "\n".join(WARC_PATHS).encode()
    files[f"/crawl-data/{CRAWL}/warc.paths.gz"] = gzip.compress(paths_body)
    for i, p in enumerate(WARC_PATHS):
        warc = make_warc([(f"http://site{i}.example/", "2024-01-01T00:00:00Z", HTML)])
        files["/" + p] = gzip.compress(warc)
    hits: dict[str, int] = {}

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            path = self.path
            flaky = path.startswith("/flaky")
            if flaky:
                path = path[len("/flaky") :]
            hits[self.path] = hits.get(self.path, 0) + 1
            if flaky and hits[self.path] == 1:
                self.send_error(503, "first attempt always fails")
                return
            body = files.get(path)
            if body is None:
                self.send_error(404)
                return
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", hits
    srv.shutdown()


def test_list_warc_paths_sizing(cc_server):
    from mega_data_factory_spark.sources.commoncrawl import list_warc_paths

    base, _ = cc_server
    assert list_warc_paths(CRAWL, base_url=base) == WARC_PATHS
    # reference sizing: ~5k records/file, never fewer files than workers
    assert list_warc_paths(CRAWL, base_url=base, max_samples=6000, num_workers=1) == WARC_PATHS[:2]
    assert len(list_warc_paths(CRAWL, base_url=base, max_samples=10, num_workers=3)) == 3
    assert list_warc_paths(CRAWL, base_url=base, num_files=1) == WARC_PATHS[:1]


def test_fetch_retry_backoff(cc_server):
    from mega_data_factory_spark.sources.commoncrawl import fetch_with_retry

    base, hits = cc_server
    naps = []
    url = f"{base}/flaky/crawl-data/{CRAWL}/warc.paths.gz"
    data = fetch_with_retry(url, retries=3, backoff=2.0, sleep=naps.append)
    assert gzip.decompress(data).decode().splitlines() == WARC_PATHS
    assert naps == [1.0]  # one 503 -> one backoff (2**0), then success


def test_fetch_retry_exhaustion():
    from mega_data_factory_spark.sources.commoncrawl import fetch_with_retry

    naps = []
    with pytest.raises(RuntimeError, match="after 3 attempts"):
        fetch_with_retry("http://127.0.0.1:1/nothing", retries=3, timeout=0.2, sleep=naps.append)
    assert naps == [1.0, 2.0]  # 2**0, 2**1 between the three attempts


def test_read_commoncrawl_end_to_end(spark, cc_server, tmp_path):
    from mega_data_factory_spark.sources.commoncrawl import read_commoncrawl

    base, _ = cc_server
    df = read_commoncrawl(spark, CRAWL, base_url=base, cache_dir=str(tmp_path / "cache"))
    rows = {r.url: r for r in df.collect()}
    assert set(rows) == {f"http://site{i}.example/" for i in range(3)}
    r = rows["http://site1.example/"]
    assert r.crawl_id == CRAWL and r.title == "Test Page" and r.text_length > 50
    assert r.warc_path == WARC_PATHS[1]
    # second read hits the executor-local cache, not the server
    assert read_commoncrawl(spark, CRAWL, base_url=base, cache_dir=str(tmp_path / "cache")).count() == 3


def test_read_source_commoncrawl_format(spark, cc_server, tmp_path):
    from mega_data_factory_spark.config import SourceConfig
    from mega_data_factory_spark.sources import read_source

    base, _ = cc_server
    cfg = SourceConfig(
        format="commoncrawl",
        path=CRAWL,
        options={"base_url": base, "num_files": "2", "cache_dir": str(tmp_path / "c2")},
    )
    df = read_source(spark, cfg, max_samples=1)
    assert df.count() == 1
