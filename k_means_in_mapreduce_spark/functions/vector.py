"""Vector-math Catalyst expression builders.

These re-express the reference's scalar functions (reference:
``kmeans/src/main/java/it/unipi/hadoop/Point.java:47-76`` — Euclidean
distance, scale, argmin) as pure built-in column expressions so the whole
pipeline stays inside WholeStageCodegen — no Python UDF in the hot path.

Design notes for scale:
- ``nearest_centroid`` takes the centroid set as a *plan literal* (k×d
  constant array), the Spark analogue of the reference shipping centroids
  through the Hadoop ``Configuration`` (``KMeans.java:153-157``). For k·d up
  to ~10^5 this folds into the expression tree and is shipped once per task
  with the serialized plan — no shuffle, no join.
- argmin is computed over *squared* distance: sqrt is monotonic, so the
  argmin and its lowest-index tie-break are identical to the reference's
  sqrt-then-compare (``Point.java:57-71``) while saving k sqrts per row.
- ``F.array_position(dists, F.array_min(dists))`` returns the FIRST
  position of the minimum — exactly the reference's strict ``<`` lowest-
  index tie-break (``Point.java:65``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def sq_dist(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Squared Euclidean distance between two array<double> columns."""
    return F.aggregate(
        F.zip_with(_col(a), _col(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_dist(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Euclidean (L2) distance (reference: Point.java:47-55)."""
    return F.sqrt(sq_dist(a, b))


def dot(a: ColumnOrName, b: ColumnOrName) -> Column:
    return F.aggregate(
        F.zip_with(_col(a), _col(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: ColumnOrName) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: ColumnOrName, b: ColumnOrName) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def scale(a: ColumnOrName, divisor: Column) -> Column:
    """Element-wise divide (reference: Point.java:73-76, computeMean)."""
    return F.transform(_col(a), lambda x: x / divisor)


def centroid_matrix_lit(centroids: Sequence[Sequence[float]]) -> Column:
    """k×d centroid set as a constant array-of-arrays plan literal."""
    return F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
    )


def distance_vector(features: ColumnOrName, centroids: Sequence[Sequence[float]]) -> Column:
    """Array of k squared distances from ``features`` to each centroid."""
    return F.transform(
        centroid_matrix_lit(centroids), lambda c: sq_dist(_col(features), c)
    )


def nearest_centroid(features: ColumnOrName, centroids: Sequence[Sequence[float]]) -> Column:
    """0-based argmin cluster id with lowest-index tie-break.

    Reference semantics: Point.java:57-71 (nearestCentroid, strict ``<``).
    """
    dists = distance_vector(features, centroids)
    return (F.array_position(dists, F.array_min(dists)) - F.lit(1)).cast("int")
