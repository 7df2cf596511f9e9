"""Unsupervised embedding clustering (MLlib KMeans).

Scale shape: Lloyd's iterations are distributed map-reduce passes; the
only driver-held state is the k × dim centroid matrix (model
semantics, same stance as the IVF coarse quantizer in
``operators/similarity_ivf.py``). Assignment is a map-only transform.
Extension surface — the reference's ML stage (scripts/04_train_sparkml.py)
is supervised only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kmeans_assign(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 10,
    seed: int = 7,
    max_iter: int = 10,
) -> DataFrame:
    """Fit KMeans on ``vec_col`` (array<numeric>) and append an integer
    ``cluster`` assignment column."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = df.withColumn(
        "__features", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    km = KMeans(
        k=k,
        seed=seed,
        maxIter=max_iter,
        featuresCol="__features",
        predictionCol="cluster",
    )
    model = km.fit(feat)
    return model.transform(feat).drop("__features")
