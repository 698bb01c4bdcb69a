"""URL canonicalization — the crawl-dedup key normalizer.

Web crawls carry the same page under many spellings: http vs https, with
and without ``www.``, trailing slash, ``#fragment``, tracking parameters
(``utm_*``, ``gclid``, ...), and shuffled query order. Exact-URL dedup
(C4/RefinedWeb both dedup by URL before content dedup) needs one canonical
spelling per page; ``canonical_url`` produces it as a pure codegen'd
Column pipeline — no UDF, no shuffle, fuses into the scan.

Deliberately regex-only (no ``parse_url``): the Java-regex expressions
here stay inside the Java/RE2 common subset (the PiiRedactRefiner
discipline), so the DuckDB oracle mirrors them token-for-token and the
differential test pins the exact semantics
(tests/test_curation.py::test_url_canonicalize_matches_oracle).

Canonical form (scheme-less, the dedup key shape):

    host/path?k=v&k2=v2

* scheme and ``#fragment`` dropped (http/https/protocol-relative/bare
  collapse — the point);
* host lowercased, ``:port`` and leading ``www.`` stripped, trailing dot
  removed; ``userinfo@`` stripped only when the URL had an explicit
  ``//``-authority (so ``mailto:``/bare-email values keep a distinct key
  instead of aliasing with the site root);
* path: trailing ``/`` stripped (``/`` alone collapses to empty);
* query: parameters split on ``&``, empties and tracking params dropped,
  the rest SORTED (order-insensitive compare) and rejoined; an
  all-tracking query disappears entirely.

NULL/blank input -> NULL (no stable identity; KeyDeduplicator's window
groups NULLs, and the NUL-sentinel rule applies if composed into
multi-key dedup).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The standard strip set: Google/Facebook/Microsoft/Mailchimp click and
# campaign trackers. Matched against the full "k=v" token by prefix-anchored
# regex (utm_* covers utm_source/medium/campaign/term/content/id/...).
TRACKING_PARAM_RE = (
    "^(utm_[^=]*|gclid|gclsrc|dclid|fbclid|msclkid|mc_cid|mc_eid|igshid|"
    "ref|ref_src|ref_url|_ga|_gl|spm|yclid|wbraid|gbraid)(=.*)?$"
)


def canonical_url(url: Column | str) -> Column:
    """Canonical scheme-less URL string (see module docstring), or NULL for
    NULL/blank/host-less input."""
    u = F.col(url) if isinstance(url, str) else url
    u = F.trim(u)
    # scheme and fragment off first; what remains is authority[/path][?query].
    # The optional-scheme form also strips protocol-relative "//host/x"
    # (a valid crawl spelling that previously canonicalized to NULL).
    bare = F.regexp_replace(u, "^([a-zA-Z][a-zA-Z0-9+.-]*:)?//", "")
    bare = F.regexp_replace(bare, "#.*$", "")

    authority = F.regexp_extract(bare, "^([^/?]+)", 1)
    # userinfo@ is only stripped when the URL had an explicit //-authority:
    # on scheme-less values an unconditional "^[^@]*@" cut turned
    # "mailto:info@example.com" (and bare email addresses in the url
    # field) into the site root "example.com", aliasing unrelated
    # documents with the homepage's dedup key.
    had_authority = u.rlike("^([a-zA-Z][a-zA-Z0-9+.-]*:)?//")
    host = F.lower(
        F.when(had_authority, F.regexp_replace(authority, "^[^@]*@", "")).otherwise(authority)
    )
    host = F.regexp_replace(host, ":[0-9]*$", "")  # drop port (incl. bare ':')
    host = F.regexp_replace(host, "^www\\.", "")
    host = F.regexp_replace(host, "\\.$", "")  # trailing-dot FQDN form

    path = F.regexp_extract(bare, "^[^/?]+([^?]*)", 1)
    path = F.regexp_replace(path, "/+$", "")  # trailing slash(es); "/" -> ""

    query = F.when(bare.contains("?"), F.regexp_extract(bare, "\\?(.*)$", 1)).otherwise(F.lit(""))
    params = F.filter(
        F.split(query, "&"),
        lambda p: (F.length(p) > 0) & ~p.rlike(TRACKING_PARAM_RE),
    )
    qpart = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(F.array_sort(params), "&"))
    ).otherwise(F.lit(""))

    out = F.concat(host, path, qpart)
    return F.when(u.isNull() | (F.length(u) == 0) | (F.length(host) == 0), F.lit(None)).otherwise(
        out
    )
