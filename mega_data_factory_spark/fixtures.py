"""Deterministic in-query image fixtures.

The test tables carry no binary image column, so image-family queries and
benches synthesize BMP records inside the plan (generated per-partition via
``mapInPandas`` — distributed, never driver-side). Everything is a pure
function of ``id``, so an ANSI-SQL oracle can mirror the metadata
(width/height/file size/format) with integer arithmetic, and repeated pixel
content (``id % content_period``) gives the phash dedup real duplicates.

BMP layout matches operators.images._decode_bmp: 24-bit, bottom-up,
4-byte-aligned rows, 54-byte header.
"""

from __future__ import annotations

import struct


def bmp_bytes(arr) -> bytes:
    """Minimal 24-bit bottom-up BMP for an (h, w, 3) uint8 array."""
    import numpy as np

    h, w, _ = arr.shape
    row = ((w * 3 + 3) // 4) * 4
    px = np.zeros((h, row), dtype=np.uint8)
    px[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)
    data = px.tobytes()
    return (
        b"BM"
        + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
        + data
    )


def image_size(i: int, *, vary_size: bool) -> tuple[int, int]:
    """(width, height) for image id i — pure integer arithmetic so the SQL
    oracle reproduces it: w = 32 + (i % 5) * 8, h = 32 + (i % 3) * 16."""
    if not vary_size:
        return 64, 64
    return 32 + (i % 5) * 8, 32 + (i % 3) * 16


def image_size_sql(id_expr: str = "id") -> tuple[str, str, str]:
    """SQL mirrors of (width, height, bmp file size) for ``vary_size=True``."""
    w = f"(32 + ({id_expr} % 5) * 8)"
    h = f"(32 + ({id_expr} % 3) * 16)"
    size = f"(54 + {h} * ((({w} * 3 + 3) // 4) * 4))"
    return w, h, size


def image_df(spark, n: int, *, content_period: int = 2048, vary_size: bool = False):
    """n synthetic BMP records ``(id long, image binary)``.

    Pixel content is seeded by ``id % content_period`` (ids that agree mod
    the period are pixel-identical -> phash duplicates). With
    ``vary_size=True`` dimensions follow ``image_size`` (metadata becomes a
    deterministic function of id, mirrored by ``image_size_sql``); note
    content can only repeat between ids whose sizes also agree
    (period a multiple of 15 keeps sizes aligned mod the period).
    """
    import pandas as pd

    def gen(batches):
        import numpy as np

        for pdf in batches:
            imgs = []
            for i in pdf["id"]:
                i = int(i)
                w, h = image_size(i, vary_size=vary_size)
                rng = np.random.default_rng(i % content_period)
                imgs.append(bmp_bytes(rng.integers(0, 256, (h, w, 3), dtype=np.uint8)))
            yield pd.DataFrame({"id": pdf["id"].astype("int64"), "image": imgs})

    par = int(spark.sparkContext.defaultParallelism)
    return spark.range(n).repartition(par, "id").mapInPandas(gen, "id long, image binary")


# ------------------------------------------------------------ WARC fixtures

WARC_DATE = "2024-01-01T00:00:00Z"
RECS_PER_FILE = 3  # html responses kept per fixture file


def warc_html(fid: int, rid: int) -> bytes:
    """Deterministic HTML for record rid of file fid. The tag-strip
    extractor yields exactly ``warc_text_sql``'s value (title text is part
    of the stripped body, then whitespace collapses)."""
    gid = fid * RECS_PER_FILE + rid
    return (
        f"<html><head><title>Doc {gid} title</title></head>"
        f"<body><p>Paragraph one for document {gid} carries deterministic "
        f"words alpha{gid} beta{gid} gamma{gid}.</p>"
        f"<script>var x = {gid};</script></body></html>"
    ).encode()


def warc_text_sql(fid_expr: str, rid_expr: str) -> tuple[str, str, str]:
    """SQL mirrors of (title, text, url) for record (fid, rid)."""
    gid = f"({fid_expr} * {RECS_PER_FILE} + {rid_expr})"
    title = f"('Doc ' || {gid} || ' title')"
    text = (
        f"('Doc ' || {gid} || ' title Paragraph one for document ' || {gid} || "
        f"' carries deterministic words alpha' || {gid} || ' beta' || {gid} || "
        f"' gamma' || {gid} || '.')"
    )
    url = f"('http://example.com/' || {fid_expr} || '/' || {rid_expr})"
    return title, text, url


def _warc_record(warc_type: bytes, uri: bytes, payload: bytes) -> bytes:
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: " + warc_type + b"\r\n"
        b"WARC-Target-URI: " + uri + b"\r\n"
        b"WARC-Date: " + WARC_DATE.encode() + b"\r\n"
        b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n"
    )
    return head + payload + b"\r\n\r\n"


def warc_file_bytes(fid: int) -> bytes:
    """One WARC file: a warcinfo record (skipped by the parser), three html
    responses (kept), one text/plain response (skipped), one html response
    whose extract is under MIN_TEXT_LEN (dropped). Odd fids are gzipped
    (mtime pinned -> bytes deterministic) to exercise the decompress path.
    """
    import gzip as _gzip
    import io as _io

    def http(body: bytes, ctype: bytes) -> bytes:
        return b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype + b"\r\n\r\n" + body

    out = [_warc_record(b"warcinfo", b"", b"software: fixture\r\n")]
    for rid in range(RECS_PER_FILE):
        uri = f"http://example.com/{fid}/{rid}".encode()
        out.append(_warc_record(b"response", uri, http(warc_html(fid, rid), b"text/html")))
    out.append(_warc_record(b"response", f"http://example.com/{fid}/plain".encode(), http(b"plain text payload, long enough to pass any length gate but wrong content type", b"text/plain")))
    out.append(_warc_record(b"response", f"http://example.com/{fid}/short".encode(), http(b"<html><body><p>tiny</p></body></html>", b"text/html")))
    raw = b"".join(out)
    if fid % 2 == 1:
        buf = _io.BytesIO()
        with _gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(raw)
        return buf.getvalue()
    return raw


def warc_files_df(spark, n_files: int):
    """n_files synthetic WARC files ``(path string, content binary)`` —
    the same shape a ``binaryFile`` scan produces, generated distributed
    as a pure function of id (the image_df pattern)."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "path": [f"mem://warc/{int(i)}.warc" + (".gz" if int(i) % 2 else "") for i in pdf["id"]],
                    "content": [warc_file_bytes(int(i)) for i in pdf["id"]],
                }
            )

    par = int(spark.sparkContext.defaultParallelism)
    return spark.range(n_files).repartition(par, "id").mapInPandas(gen, "path string, content binary")


# --------------------------------------------------- natural-text fixtures
#
# The driver-generated documents tables are stopword-free single-line word
# soup, so every PUBLISHED quality threshold (Rae et al. 2021 Gopher rules,
# FineWeb-style cuts) guts them at stage 1 and the as-shipped recipe bench
# lines timed an empty funnel (round-9 verdict Missing #1). This corpus is
# the fix: deterministic English-shaped prose — real stopwords at natural
# density, 3-8 char content words, sentence/line structure — built as a
# pure function of doc_id, with a per-cut VIOLATOR QUOTA (doc_id % 50) so
# every published rule cuts a known, realistic slice and every stage after
# it still carries volume:
#
#   r=0  short doc (25-40 words)            -> Gopher word-count cut
#   r=1  ultrashort (<80 chars)             -> TextLengthFilter + word count
#   r=2  stopword-free soup                 -> language cut (both recipes)
#   r=3  single distinct stopword           -> Gopher >=2-stopwords cut
#   r=4  '#'-tagged words (ratio > 0.1)     -> Gopher symbol-ratio cut
#   r=5  all-bullet lines (> 90%)           -> Gopher bullet-line cut
#   r=6  40% ellipsis-ended lines (> 30%)   -> Gopher ellipsis-line cut
#   r=7  glued long words (mean len > 10)   -> Gopher mean-word-len cut;
#                                              FineWeb QualityScoreCut
#   r=8  28% numeric tokens (alpha < 0.8)   -> Gopher alpha-word cut
#   r=9  one sentence repeated 10x          -> DupWordCut (gopher 0.3 /
#                                              fineweb 0.6)
#   r=10 one bigram repeated run            -> DupWordCut + top-bigram both
#        (dup<=0.3 with top-bigram>0.2 is arithmetically impossible:
#        dup ~ 2k/N, top ~ k/N — so no quota can reach TopBigramCut alone)
#   r=11 exact duplicate of doc i+1         -> TextExactDeduplicator cut
#   r=13 near duplicate of doc i+1          -> MinHashLSHDeduplicator cut
#        (last sentence rewritten; J ~ 0.85 -> ~95% caught at 16/4 bands)
#   r=15 clean + planted email/phone        -> PiiRedactRefiner rewrites
#   r=16 one line repeated 3x inside doc    -> IntraDocDedupRefiner strips
#   else clean prose (passes every published rule)

NATURAL_STOP_POOL = (
    "the", "be", "to", "of", "and", "that", "have", "with", "a", "in",
    "is", "on", "for", "it", "as", "was", "are", "at", "by", "this",
    "from", "or", "an", "but", "not", "all", "were", "when", "can", "had",
)

# content vocabulary: common English words, 3-9 chars, none colliding with
# the Gopher/DEFAULT stopword lists (so the single-stopword quota is exact)
_NATURAL_BASE = (
    "time", "year", "people", "way", "day", "man", "thing", "woman", "life",
    "child", "world", "school", "state", "family", "student", "group",
    "country", "problem", "hand", "part", "place", "case", "week", "company",
    "system", "program", "question", "work", "number", "night", "point",
    "home", "water", "room", "mother", "area", "money", "story", "fact",
    "month", "lot", "right", "study", "book", "eye", "job", "word",
    "business", "issue", "side", "kind", "head", "house", "service",
    "friend", "father", "power", "hour", "game", "line", "end", "member",
    "law", "car", "city", "community", "name", "president", "team",
    "minute", "idea", "kid", "body", "information", "back", "parent",
    "face", "others", "level", "office", "door", "health", "person", "art",
    "war", "history", "party", "result", "change", "morning", "reason",
    "research", "girl", "guy", "moment", "air", "teacher", "force",
    "education", "foot", "boy", "age", "policy", "process", "music",
    "market", "sense", "nation", "plan", "college", "interest", "death",
    "experience", "effect", "use", "class", "control", "care", "field",
    "development", "role", "effort", "rate", "heart", "drug", "show",
    "leader", "light", "voice", "wife", "police", "mind", "price",
    "report", "decision", "son", "view", "relationship", "town", "road",
    "arm", "difference", "value", "building", "action", "model", "season",
    "society", "tax", "director", "position", "player", "record", "paper",
    "space", "ground", "form", "event", "official", "matter", "center",
    "couple", "site", "project", "activity", "star", "table", "need",
    "court", "american", "oil", "situation", "cost", "industry", "figure",
    "street", "image", "phrase", "garden", "window", "signal", "engine",
    "bridge", "stream", "filter", "vector", "sample", "cluster", "batch",
)
_NATURAL_SUFFIXES = ("", "", "", "s", "ed", "ing", "ly", "ers")


def _natural_sentence(rng, n_words: int, *, stop_p: float = 0.24, force_stops=()):
    """One sentence: capitalized first word, period end; ``force_stops``
    tokens are planted at fixed early positions (language/stopword-rule
    insurance for short docs)."""
    words = []
    for _ in range(n_words):
        if rng.random() < stop_p:
            words.append(rng.choice(NATURAL_STOP_POOL))
        else:
            words.append(rng.choice(_NATURAL_BASE) + rng.choice(_NATURAL_SUFFIXES))
    for k, w in enumerate(force_stops):
        if k + 1 < len(words):
            words[k + 1] = w
    words[0] = words[0].capitalize()
    return " ".join(words) + "."


def _natural_prose(rng, target_words: int, *, stop_p: float = 0.24) -> str:
    """Sentences until >= target_words, grouped 2-3 per line. The FIRST
    sentence always carries 'the' and 'of' (>=1 en marker hit and >=2
    distinct Gopher stopwords even at the shortest quota)."""
    sents, n, first = [], 0, True
    while n < target_words:
        k = rng.randint(8, 18)
        s = _natural_sentence(rng, k, stop_p=stop_p, force_stops=("the", "of") if first else ())
        first = False
        sents.append(s)
        n += k
    lines, i = [], 0
    while i < len(sents):
        step = rng.randint(2, 3)
        lines.append(" ".join(sents[i : i + step]))
        i += step
    return "\n".join(lines)


def _natural_clean_text(i: int) -> str:
    rng = __import__("random").Random(i * 9176 + 11)
    return _natural_prose(rng, rng.randint(55, 160))


def natural_text(i: int) -> str:
    """Document text for doc_id ``i`` — pure function, quota by i % 50."""
    import random as _r

    r = i % 50
    rng = _r.Random(i * 7349 + 5)
    if r == 0:  # short: under the 50-word floor, over 80 chars
        return _natural_prose(rng, rng.randint(25, 38))
    if r == 1:  # ultrashort: under 80 chars
        return _natural_sentence(rng, 7, force_stops=("the", "of"))[:78]
    if r == 2:  # stopword-free soup: no markers of any language
        return " ".join(
            rng.choice(_NATURAL_BASE) + rng.choice(("s", "ed", "ing")) for _ in range(rng.randint(60, 120))
        )
    if r == 3:  # exactly one distinct stopword ('the'), many times
        body = [rng.choice(_NATURAL_BASE) for _ in range(rng.randint(70, 110))]
        for k in range(0, len(body), 9):
            body[k] = "the"
        return " ".join(body)
    if r == 4:  # '#'-tagged words: ratio ~0.15 > 0.1
        words = _natural_prose(rng, 95).replace("\n", " ").split(" ")
        for k in range(0, len(words), 7):
            words[k] = "#" + words[k].strip(".").lower()
        return " ".join(words)
    if r == 5:  # every line bulleted (> 90%)
        return "\n".join("- " + _natural_sentence(rng, rng.randint(8, 14), force_stops=("the", "of")) for _ in range(8))
    if r == 6:  # 40% of lines end in an ellipsis (> 30%)
        lines = [_natural_sentence(rng, rng.randint(8, 14), force_stops=("the", "of") if j == 0 else ()) for j in range(10)]
        return "\n".join(s[:-1] + "..." if j % 5 < 2 else s for j, s in enumerate(lines))
    if r == 7:  # glued long words: mean word length > 10
        glue = lambda: rng.choice(_NATURAL_BASE) + rng.choice(_NATURAL_BASE) + rng.choice(("ment", "ation", "ness"))
        words = [glue() for _ in range(rng.randint(28, 40))]
        words[1], words[3] = "the", "of"  # passes language + stopword rules
        return " ".join(words) + "."
    if r == 8:  # 28% pure-numeric tokens: alpha word frac < 0.8
        words = _natural_prose(rng, 90).replace("\n", " ").split(" ")
        for k in range(0, len(words) - 1, 4):
            words[k] = str(rng.randint(1000, 99999))
        return " ".join(words)
    if r == 9:  # one sentence repeated: dup_word_ratio ~0.9
        s = _natural_sentence(rng, 12, force_stops=("the", "of"))
        return " ".join([s] * 10)
    if r == 10:  # consecutive bigram run: top_bigram AND dup_word trip
        a, b = rng.choice(_NATURAL_BASE), rng.choice(_NATURAL_BASE)
        head = _natural_sentence(rng, 10, force_stops=("the", "of"))
        return head + " " + " ".join([a, b] * 30)
    if r == 11:  # exact duplicate of the next (clean) doc
        return _natural_clean_text(i + 1)
    if r == 13:  # near duplicate of the next (clean) doc: last sentence rewritten
        base = _natural_clean_text(i + 1)
        cut = base.rfind(". ")
        return base[: cut + 2] + _natural_sentence(rng, 10) if cut > 0 else base + " extra."
    if r == 15:  # clean + PII (redacted by PiiRedactRefiner, never cut)
        return (
            _natural_clean_text(i)
            + f"\nContact {rng.choice(('ann', 'joe', 'max'))}.lee{i % 97}@example.com or call 555-{i % 900 + 100:03d}-{i % 9000 + 1000:04d}."
        )
    if r == 16:  # one line repeated 3x (IntraDocDedupRefiner strips two)
        line = _natural_sentence(rng, 11, force_stops=("the", "of"))
        return "\n".join([line, _natural_prose(rng, 70), line, line])
    return _natural_clean_text(i)


def natural_documents_df(spark, n: int):
    """n natural-text rows matching the documents table schema
    ``(doc_id long, text string, lang string, source string, n_chars
    long)`` — generated distributed (mapInPandas over range, the image_df
    pattern); everything a pure function of doc_id."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            ids = [int(i) for i in pdf["id"]]
            texts = [natural_text(i) for i in ids]
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "text": texts,
                    "lang": ["und" if i % 50 == 2 else "en" for i in ids],
                    "source": [("web", "news", "wiki", "forum")[i % 4] for i in ids],
                    "n_chars": pd.Series([len(t) for t in texts], dtype="int64"),
                }
            )

    par = int(spark.sparkContext.defaultParallelism)
    return spark.range(n).repartition(par, "id").mapInPandas(
        gen, "doc_id long, text string, lang string, source string, n_chars long"
    )
