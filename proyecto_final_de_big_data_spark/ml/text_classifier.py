"""Model-based quality filtering: a text classifier in the fastText-
classifier role that public LLM data pipelines describe (GPT-3 /
LLaMA-style "quality classifier": score every crawl document against a
model trained to recognize reference-quality text, keep high scorers).

MLlib composition — ``RegexTokenizer → HashingTF → IDF →
LogisticRegression``:

- HashingTF (feature hashing) instead of CountVectorizer: NO vocabulary
  fit, so the featurizer is a stateless map-only projection — at 100 TB
  there is no driver-side vocab to build, broadcast, or version; the
  fixed ``n_features`` dimension makes every model binary-compatible
  across corpus snapshots.
- IDF is the one fitted stat: a single map-side-combined aggregation
  producing an ``n_features``-long vector that lives in the model.
- LogisticRegression trains with L-BFGS on ``treeAggregate`` gradients
  (map-side partial gradient sums — the classic scale shape).
- SCORING (the 100-TB path) is a pure projection: hash, scale by the
  broadcast IDF vector, dot with the coefficient vector. No shuffle.

Determinism note: the fit is numerically deterministic for a fixed
partitioning but float-summation order varies with partitioning, so
exact coefficients are NOT engine-portable; the external gate pins the
STRUCTURE (every doc scored, valid probabilities, separability on a
deterministic synthetic label) and pytest pins accuracy ranges — the
same stance as ``ml/pipeline.py`` (M1-M7) and ``ml/clustering.py``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import IDF, HashingTF, RegexTokenizer
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class TextClassifierConfig:
    text_col: str = "text"
    label_col: str = "label"
    n_features: int = 4096
    min_doc_freq: int = 2
    max_iter: int = 50
    reg_param: float = 1e-3


def build_text_classifier(cfg: TextClassifierConfig) -> Pipeline:
    """The unfitted pipeline; ``fit`` on a labeled frame returns the
    scoring model."""
    tok = RegexTokenizer(
        inputCol=cfg.text_col,
        outputCol="__tokens",
        pattern=r"\s+",
        toLowercase=False,  # match the engine-wide whitespace tokenizer
    )
    tf = HashingTF(
        inputCol="__tokens", outputCol="__tf", numFeatures=cfg.n_features
    )
    idf = IDF(inputCol="__tf", outputCol="features", minDocFreq=cfg.min_doc_freq)
    lr = LogisticRegression(
        featuresCol="features",
        labelCol=cfg.label_col,
        maxIter=cfg.max_iter,
        regParam=cfg.reg_param,
    )
    return Pipeline(stages=[tok, tf, idf, lr])


def train_quality_classifier(
    labeled: DataFrame, cfg: TextClassifierConfig | None = None
) -> PipelineModel:
    """Fit the classifier on a labeled corpus (label 1 = keep-quality,
    0 = reject)."""
    return build_text_classifier(cfg or TextClassifierConfig()).fit(labeled)


def score_quality(
    model: PipelineModel, docs: DataFrame, keep_threshold: float = 0.5
) -> DataFrame:
    """Docs + ``quality_prob`` (P(label=1)) + ``keep`` flag. Map-only:
    hashing, IDF scaling, and the sigmoid are projections; nothing
    shuffles."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(docs)
    prob = vector_to_array("probability").getItem(1)
    return scored.withColumn("quality_prob", prob).withColumn(
        "keep", F.col("quality_prob") >= keep_threshold
    ).drop("__tokens", "__tf", "features", "rawPrediction", "probability", "prediction")
