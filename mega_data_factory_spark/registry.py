"""Operator / source / sink registries — the reference's dynamic
instantiation contract (framework/registry.py:13-133): config names resolve
to classes at pipeline-build time.

Accepts registered PascalCase names AND snake_case spellings, including the
reference's acronym quirks (``image_aigc_detector_refiner`` must resolve to
``ImageAIGCDetectorRefiner`` even though naive snake->Pascal gives
``ImageAigcDetectorRefiner`` — reference framework/config.py:21-28 vs
operators/refiners/__init__.py).
"""

from __future__ import annotations

import re
from typing import Any


class Registry:
    def __init__(self, kind: str):
        self.kind = kind
        self._by_name: dict[str, type] = {}

    @staticmethod
    def _snake(name: str) -> str:
        return re.sub(r"(?<=[a-z0-9])(?=[A-Z])", "_", name).lower()

    def register(self, cls: type, *aliases: str) -> type:
        names = {cls.__name__, self._snake(cls.__name__), *aliases}
        for n in names:
            self._by_name[n.lower()] = cls
        return cls

    def get(self, name: str) -> type:
        cls = self._by_name.get(name.lower())
        if cls is None:
            raise KeyError(f"unknown {self.kind} {name!r}; known: {sorted(set(self._by_name))}")
        return cls

    def create(self, name: str, params: dict[str, Any] | None = None):
        return self.get(name)(**(params or {}))

    def names(self) -> list[str]:
        return sorted({c.__name__ for c in self._by_name.values()})


OPERATORS = Registry("operator")
SOURCES = Registry("source")
SINKS = Registry("sink")


def _register_builtins() -> None:
    from mega_data_factory_spark.operators.dedup import (
        DecontaminationFilter,
        EmbeddingCosineDeduplicator,
        IncrementalExactDeduplicator,
        IncrementalKeyDeduplicator,
        IncrementalMinHashDeduplicator,
        KeyDeduplicator,
        MinHashLSHDeduplicator,
        NgramJaccardDeduplicator,
        SemanticDecontaminationFilter,
        SharedSpanDeduplicator,
        SimHashDeduplicator,
        SimHashNearDeduplicator,
        TextExactDeduplicator,
    )
    from mega_data_factory_spark.operators.sampling import (
        DatasetSplitRefiner,
        EpochWeightedMixer,
        StratifiedQuotaSampler,
        WeightedSourceSampler,
    )
    from mega_data_factory_spark.operators.filters import (
        C4PageFilter,
        DomainBlocklistFilter,
        GopherQualityFilter,
        ImageQualityFilter,
        NumericRangeFilter,
        TextLengthFilter,
        UrlFilter,
        WordScoreFilter,
    )
    from mega_data_factory_spark.operators.images import (
        ImageMetadataRefiner,
        ImagePhashDeduplicator,
        ImagePhashNearDeduplicator,
        ImageTechnicalQualityRefiner,
    )
    from mega_data_factory_spark.operators.multimodal import (
        AestheticScoreRefiner,
        AudioMetadataRefiner,
        AudioSpectralFeaturesRefiner,
        AigcDetectorRefiner,
        ImageEmbeddingRefiner,
        ImageResizeRefiner,
        VideoFrameSampleRefiner,
        VisualDegradationsRefiner,
    )
    from mega_data_factory_spark.operators.bpe import BpeTokenizer
    from mega_data_factory_spark.operators.packing import DocumentChunker, SentenceChunker, SpanCorruptionBuilder
    from mega_data_factory_spark.operators.classifier import QualityClassifier
    from mega_data_factory_spark.operators.lm import NgramPerplexityScorer, PerplexityBucketRefiner
    from mega_data_factory_spark.operators.dsir import DsirImportanceScorer, DsirResampler
    from mega_data_factory_spark.operators.clustering import SemanticDeduplicator
    from mega_data_factory_spark.operators.graph import ClusterDeduplicator
    from mega_data_factory_spark.operators.packing import SequencePacker
    from mega_data_factory_spark.operators.selection import TokenBudgetSelector
    from mega_data_factory_spark.operators.refiners import (
        BoilerplateLineRefiner,
        C4HeuristicRefiner,
        CompressionRatioRefiner,
        GopherQualityRefiner,
        IntraDocDedupRefiner,
        UnicodeNormalizeRefiner,
        UrlCanonicalizeRefiner,
        FingerprintRefiner,
        LanguageIdRefiner,
        PiiRedactRefiner,
        QualityScoreRefiner,
        RepetitionStatsRefiner,
        TextStatsRefiner,
    )

    for cls in (
        TextLengthFilter,
        WordScoreFilter,
        DomainBlocklistFilter,
        ImageQualityFilter,
        NumericRangeFilter,
        TextStatsRefiner,
        LanguageIdRefiner,
        QualityScoreRefiner,
        RepetitionStatsRefiner,
        PiiRedactRefiner,
        BoilerplateLineRefiner,
        C4HeuristicRefiner,
        C4PageFilter,
        CompressionRatioRefiner,
        GopherQualityFilter,
        GopherQualityRefiner,
        IntraDocDedupRefiner,
        UnicodeNormalizeRefiner,
        UrlCanonicalizeRefiner,
        FingerprintRefiner,
        TextExactDeduplicator,
        IncrementalExactDeduplicator,
        IncrementalKeyDeduplicator,
        IncrementalMinHashDeduplicator,
        KeyDeduplicator,
        MinHashLSHDeduplicator,
        SimHashDeduplicator,
        SimHashNearDeduplicator,
        NgramJaccardDeduplicator,
        SharedSpanDeduplicator,
        DecontaminationFilter,
        SemanticDecontaminationFilter,
        DatasetSplitRefiner,
        WeightedSourceSampler,
        StratifiedQuotaSampler,
        EpochWeightedMixer,
        EmbeddingCosineDeduplicator,
        ImageMetadataRefiner,
        ImageTechnicalQualityRefiner,
        ImagePhashDeduplicator,
        ImagePhashNearDeduplicator,
        ImageEmbeddingRefiner,
        AestheticScoreRefiner,
        ImageResizeRefiner,
        VideoFrameSampleRefiner,
        VisualDegradationsRefiner,
        AudioMetadataRefiner,
        AudioSpectralFeaturesRefiner,
        SemanticDeduplicator,
        SequencePacker,
        ClusterDeduplicator,
        QualityClassifier,
        NgramPerplexityScorer,
        PerplexityBucketRefiner,
        TokenBudgetSelector,
        DsirImportanceScorer,
        DsirResampler,
        BpeTokenizer,
        DocumentChunker,
        SentenceChunker,
        SpanCorruptionBuilder,
    ):
        OPERATORS.register(cls)
    # reference acronym-quirk aliases (framework/config.py:21-28)
    OPERATORS.register(UrlFilter, "URLFilter", "url_filter")
    OPERATORS.register(
        AigcDetectorRefiner, "ImageAIGCDetectorRefiner", "image_aigc_detector_refiner", "image_a_i_g_c_detector_refiner"
    )
    OPERATORS.register(
        ImageEmbeddingRefiner,
        "ImageClipEmbeddingRefiner",
        "image_clip_embedding_refiner",
        "ImageSigLIPEmbeddingRefiner",
        "image_siglip_embedding_refiner",
        "image_sig_l_i_p_embedding_refiner",
    )
    OPERATORS.register(AestheticScoreRefiner, "ImageAestheticQualityRefiner", "image_aesthetic_quality_refiner")
    OPERATORS.register(MinHashLSHDeduplicator, "min_hash_lsh_deduplicator", "minhash_lsh_deduplicator")
    OPERATORS.register(VisualDegradationsRefiner, "ImageVisualDegradationsRefiner", "image_visual_degradations_refiner")


_register_builtins()
