"""Text refiners (projection-extension operators, SELECT *, f(...) AS col).

The reference's refiners are image-model ops (SURVEY §2.3); the text-side
refiners here are the text-analysis operators a training-data pipeline needs
(language-ID heuristic, quality scoring, token counting, fingerprinting) —
first-class engine extensions per the build brief. All pure Column
expressions: codegen'd, no Python, oracle-expressible.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mega_data_factory_spark.functions.hashing import stable_text_hash
from mega_data_factory_spark.functions.text import (
    normalize_text,
    text_length,
    token_count,
    word_occurrences,
)
from mega_data_factory_spark.operators.base import Refiner


class TextStatsRefiner(Refiner):
    """Adds ``text_length`` (effective length), ``token_count``, and
    ``avg_token_len`` (rounded to 6) — the cheap structural text stats."""

    def __init__(self, *, text_col: str = "text", length_col: str | None = None, name: str | None = None):
        super().__init__(name)
        self.text_col = text_col
        self.length_col = length_col

    def columns(self, df: DataFrame) -> dict[str, Column]:
        tokens = token_count(self.text_col)
        norm = normalize_text(self.text_col, lowercase=False)
        # chars-in-tokens / tokens; normalized text has single spaces, so
        # chars-in-tokens = len(norm) - (tokens - 1)
        avg_len = F.when(
            tokens > 0,
            F.round((F.length(norm) - (tokens - F.lit(1))).cast("double") / tokens, 6),
        ).otherwise(F.lit(0.0))
        return {
            "text_length": text_length(self.text_col, self.length_col),
            "token_count": tokens,
            "avg_token_len": avg_len,
        }


# Per-language marker words for the n-gram/stopword language-ID heuristic.
# Deliberately tiny and ASCII so the oracle can mirror the exact counting.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "a"),
    "es": ("el", "la", "de", "que"),
    "de": ("der", "die", "und", "das"),
    "fr": ("le", "les", "et", "des"),
}


class LanguageIdRefiner(Refiner):
    """Heuristic language ID: count whole-word marker hits per language and
    take the argmax (ties broken by the fixed language order; 'und' —
    undetermined — when nothing matches). Adds ``lang_pred`` and
    ``lang_score`` (the winning hit count).

    This is the classic stopword/n-gram-profile heuristic (Cavnar-Trenkle
    style) reduced to an oracle-checkable closed form.
    """

    def __init__(self, *, text_col: str = "text", markers: dict[str, tuple[str, ...]] | None = None, name: str | None = None):
        super().__init__(name)
        self.text_col = text_col
        self.markers = markers or LANG_MARKERS

    def scores(self) -> dict[str, Column]:
        return {
            lang: reduce(lambda a, b: a + b, [word_occurrences(self.text_col, w) for w in words])
            for lang, words in self.markers.items()
        }

    def columns(self, df: DataFrame) -> dict[str, Column]:
        scores = self.scores()
        langs = list(scores)
        best = F.greatest(*scores.values()) if len(langs) > 1 else scores[langs[0]]
        pred = F.lit("und")
        # first language in declared order wins ties -> iterate reversed so
        # earlier langs overwrite later ones in the when-chain
        for lang in reversed(langs):
            pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
        pred = F.when(best > 0, pred).otherwise(F.lit("und"))
        return {"lang_pred": pred, "lang_score": best}


DEFAULT_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "on", "for", "with")


class QualityScoreRefiner(Refiner):
    """Heuristic document quality score in [0,1] from structural signals
    (length band, stopword ratio, mean token length band) — the deterministic
    skeleton of RefinedWeb/Gopher-style quality rules. Adds
    ``stopword_ratio`` and ``quality_score`` (both rounded to 6).

    score = 0.4 * clamp(tokens/200) + 0.3 * min(stopword_ratio*5, 1)
          + 0.3 * (3 <= avg_token_len <= 10)
    """

    def __init__(self, *, text_col: str = "text", stopwords: tuple[str, ...] = DEFAULT_STOPWORDS, name: str | None = None):
        super().__init__(name)
        self.text_col = text_col
        self.stopwords = stopwords

    def columns(self, df: DataFrame) -> dict[str, Column]:
        tokens = token_count(self.text_col)
        stop_hits = reduce(lambda a, b: a + b, [word_occurrences(self.text_col, w) for w in self.stopwords])
        ratio = F.when(tokens > 0, stop_hits.cast("double") / tokens).otherwise(F.lit(0.0))
        norm = normalize_text(self.text_col, lowercase=False)
        avg_len = F.when(tokens > 0, (F.length(norm) - (tokens - F.lit(1))).cast("double") / tokens).otherwise(F.lit(0.0))
        length_component = F.least(tokens.cast("double") / F.lit(200.0), F.lit(1.0))
        stop_component = F.least(ratio * F.lit(5.0), F.lit(1.0))
        len_band = F.when((avg_len >= 3.0) & (avg_len <= 10.0), F.lit(1.0)).otherwise(F.lit(0.0))
        score = F.lit(0.4) * length_component + F.lit(0.3) * stop_component + F.lit(0.3) * len_band
        return {
            "stopword_ratio": F.round(ratio, 6),
            "quality_score": F.round(score, 6),
        }


class FingerprintRefiner(Refiner):
    """Adds ``fingerprint`` — md5 of the normalized text (the portable
    content fingerprint; reference text_exact_dedup.py derives its dedup key
    the same way) and ``fingerprint_prefix`` (first 8 hex chars, a compact
    shard/bucket key that keeps wide text out of shuffles — the phash
    precompute pattern of image_phash_dedup.py:75-76 generalized)."""

    def __init__(self, *, text_col: str = "text", name: str | None = None):
        super().__init__(name)
        self.text_col = text_col

    def columns(self, df: DataFrame) -> dict[str, Column]:
        fp = stable_text_hash(normalize_text(self.text_col))
        return {"fingerprint": fp, "fingerprint_prefix": F.substring(fp, 1, 8)}
