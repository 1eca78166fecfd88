"""IVF (inverted-file) approximate nearest-neighbor search.

The scale path for ANN beyond hyperplane LSH: cluster the corpus with
KMeans (MLlib), store each vector under its centroid id, and at query time
probe only the ``nprobe`` closest centroids. Candidate generation becomes a
partition-prunable equi-filter on ``ivf_cluster`` — at 100 TB the cluster
id is a partition/bucket key and a probe touches nprobe/k of the data.

Centroids are tiny (k x dim) and travel to the driver; everything over the
corpus stays distributed.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.ml.clustering import KMeans
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame

from ..functions.vectors import cosine_similarity


class IVFIndex:
    def __init__(self, assigned: DataFrame, centroids: list[list[float]], vec_col: str, id_col: str):
        self.assigned = assigned  # corpus + ivf_cluster column
        self.centroids = centroids
        self.vec_col = vec_col
        self.id_col = id_col

    def search(self, query_vec: list[float], k: int = 10, nprobe: int = 4) -> DataFrame:
        """Probe the nprobe nearest centroids, exact cosine within them."""
        def dist(c):
            return math.sqrt(sum((a - b) ** 2 for a, b in zip(query_vec, c)))

        order = sorted(range(len(self.centroids)), key=lambda i: dist(self.centroids[i]))
        probe = order[:nprobe]
        q = F.array(*[F.lit(float(x)) for x in query_vec])
        return (
            self.assigned.filter(F.col("ivf_cluster").isin(probe))
            .select(
                F.col(self.id_col),
                cosine_similarity(F.col(self.vec_col), q).alias("cosine"),
            )
            .orderBy(F.desc("cosine"), F.asc(self.id_col))
            .limit(k)
        )


def build_ivf_index(
    embeddings: DataFrame,
    k_clusters: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> IVFIndex:
    """Fit KMeans on the (double-cast) vectors and assign cluster ids.

    At scale: persist ``assigned`` partitioned by ivf_cluster; refit
    centroids on a sample, not the full corpus.
    """
    with_vec = embeddings.withColumn(
        "__vec", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    km = KMeans(k=k_clusters, seed=seed, featuresCol="__vec", predictionCol="ivf_cluster")
    model = km.fit(with_vec)
    assigned = model.transform(with_vec).drop("__vec")
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    return IVFIndex(assigned, centroids, vec_col, id_col)
