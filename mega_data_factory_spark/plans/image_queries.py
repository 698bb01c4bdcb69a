"""Image-family queries over deterministic in-query BMP fixtures.

The test tables have no binary image column, so these queries synthesize
their input inside the plan (``fixtures.image_df`` — generated distributed
via ``mapInPandas``, pure function of id). Metadata is oracle-checkable
because width/height/file-size are integer arithmetic on the id
(``fixtures.image_size_sql``); pixel statistics (entropy, artifacts) and
the DCT phash are not ANSI-SQL-expressible, so those two queries take the
driver's rows-only check — tests/test_images.py holds the value-level bar
for the kernels themselves.

Reference contract: operators/refiners/image_metadata.py:25-67,
image_technical_quality.py:41-193, operators/dedup/image_phash_dedup.py:30-84.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mega_data_factory_spark.fixtures import image_df, image_size_sql

N_META = 120
N_PHASH = 150
PHASH_PERIOD = 50  # pixel content repeats every 50 ids -> 100 planted dups


def image_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-only metadata parse (no pixel decode) over varied-size BMPs;
    every output column is a deterministic function of id."""
    from mega_data_factory_spark.operators.images import ImageMetadataRefiner

    df = image_df(spark, N_META, vary_size=True)
    out = ImageMetadataRefiner().apply(df)
    return out.select(
        "id",
        F.col("image_width").cast("int").alias("width"),
        F.col("image_height").cast("int").alias("height"),
        F.col("image_file_size_bytes").cast("long").alias("file_size"),
        F.col("image_format").alias("format"),
    ).orderBy("id")


def _metadata_oracle() -> str:
    w, h, size = image_size_sql("r")
    return f"""
SELECT r AS id,
       CAST({w} AS INTEGER) AS width,
       CAST({h} AS INTEGER) AS height,
       CAST({size} AS BIGINT) AS file_size,
       'BMP' AS format
FROM range(0, {N_META}) t(r)
ORDER BY id
"""


def image_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused featurization (one Arrow crossing: metadata + entropy +
    artifacts) then the conjunctive quality filter. Entropy/artifacts are
    pixel statistics -> rows-only driver check."""
    from mega_data_factory_spark.operators.filters import ImageQualityFilter
    from mega_data_factory_spark.operators.images import ImageFeatureExtractor

    df = ImageFeatureExtractor(with_phash=False).apply(image_df(spark, N_META, vary_size=True))
    # width>=48 keeps ids with id%5>=2; entropy>=3.0 passes for random pixels
    kept = ImageQualityFilter(min_width=48, min_height=32, max_compression_artifacts=0.99, min_entropy=3.0).apply(df)
    return kept.select(
        "id",
        F.col("image_width").cast("int").alias("width"),
        F.round(F.col("image_information_entropy").cast("double"), 3).alias("entropy"),
    ).orderBy("id")


def image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash dedup over planted pixel-identical duplicates
    (content period 50 over 150 ids): the fused extractor precomputes
    ``phash`` so the dedup stage reuses the column — compact keys in the
    shuffle, bytes cross into Python exactly once. Rows-only driver check
    (DCT phash is not SQL-expressible); tests assert the survivor set."""
    from mega_data_factory_spark.operators.images import ImageFeatureExtractor, ImagePhashDeduplicator

    df = ImageFeatureExtractor().apply(image_df(spark, N_PHASH, content_period=PHASH_PERIOD))
    out = ImagePhashDeduplicator().apply(df)
    return out.select("id", "phash").orderBy("id")


QUERIES = {
    "image_metadata": image_metadata,
    "image_quality_filter": image_quality_filter,
    "image_phash_dedup": image_phash_dedup,
}

ORACLE = {
    "image_metadata": _metadata_oracle(),
}
