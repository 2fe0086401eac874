"""End-to-end corpus curation: the composed training-data pipeline
(exact dedup → quality gate → deterministic split → token accounting)
as ONE single-shuffle DataFrame transform.

Each stage exists standalone (operators.dedup, operators.textstats);
this composition is what a real pretraining pipeline runs nightly, and
the engine-level point is that composing them does NOT multiply
shuffles: the only exchange is the dedup window on the content hash —
quality features, split assignment, and token counts are pure column
expressions evaluated in the same stage.

Scale posture: shuffle key is a 32-byte hash (never the document
body); at 100 TB the window is a hash-partitioned row_number, and the
quality/split expressions stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_spark.operators.textstats import _count_in, _ws_tokens, EN_STOPWORDS


def curate_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 20,
    max_punct_ratio: float = 0.2,
    val_pct: int = 5,
    test_pct: int = 5,
    seed: str = "split-v1",
) -> DataFrame:
    """Survivors of (exact-dedup ∧ quality gate), with split assignment
    and token counts. Keeper per duplicate group = smallest id."""
    text = F.col(text_col)
    keeper = F.min(id_col).over(Window.partitionBy(F.sha2(text, 256)))
    n_words = F.size(_ws_tokens(text))
    punct = F.length(F.regexp_replace(text, "[a-zA-Z0-9 ]", ""))
    punct_ratio = punct.cast("double") / F.greatest(F.length(text), F.lit(1))
    stop_ratio = _count_in(_ws_tokens(F.lower(text)), EN_STOPWORDS).cast(
        "double"
    ) / F.greatest(n_words, F.lit(1))
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    bucket = F.pmod(h, F.lit(100))
    split = (
        F.when(bucket < val_pct, "val")
        .when(bucket < val_pct + test_pct, "test")
        .otherwise("train")
    )
    return (
        df.withColumn("__keeper", keeper)
        .filter(F.col("__keeper") == F.col(id_col))
        .filter((n_words >= min_words) & (punct_ratio <= max_punct_ratio))
        .select(
            id_col,
            "source",
            n_words.alias("n_tokens"),
            F.round(stop_ratio, 6).alias("stopword_ratio"),
            split.alias("split"),
        )
    )
