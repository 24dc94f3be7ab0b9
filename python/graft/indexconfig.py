"""Plain-data index configs mirrored into the JVM by graft.Graft.

Reference analogue: python/hyperspace/indexconfig.py (re-derived: our
config family also covers data-skipping sketches, which the reference
wrapper does not expose).
"""


class CoveringIndexConfig:
    """Covering index: bucketed+sorted vertical slice of the source.

    ``num_buckets`` overrides ``spark.graft.index.numBuckets`` for this
    index only (a per-config override, never a session-conf mutation).

    >>> CoveringIndexConfig("idx", ["k"], ["v1", "v2"])
    """

    def __init__(self, index_name, indexed_columns, included_columns=None,
                 num_buckets=None):
        self.index_name = index_name
        self.indexed_columns = list(indexed_columns)
        self.included_columns = list(included_columns or [])
        self.num_buckets = num_buckets


class ZOrderIndexConfig:
    """Z-order covering index: range-clustered on a Morton interleave.

    >>> ZOrderIndexConfig("zidx", ["x", "y"], ["v"])
    """

    def __init__(self, index_name, indexed_columns, included_columns=None):
        self.index_name = index_name
        self.indexed_columns = list(indexed_columns)
        self.included_columns = list(included_columns or [])


class SketchSpec:
    """One per-file sketch of a data-skipping index."""

    def __init__(self, kind, expr, params=None):
        self.kind = kind          # "minmax" | "bloom" | "valuelist" | "partition"
        self.expr = expr          # source column name
        self.params = dict(params or {})

    @staticmethod
    def min_max(expr):
        return SketchSpec("minmax", expr)

    @staticmethod
    def bloom(expr, expected_items=10000, fpp=0.01):
        return SketchSpec("bloom", expr,
                          {"expectedItems": str(expected_items), "fpp": str(fpp)})

    @staticmethod
    def value_list(expr, max_values=1000):
        return SketchSpec("valuelist", expr, {"maxValues": str(max_values)})


class DataSkippingIndexConfig:
    """Data-skipping index: one row of sketches per source file.

    >>> DataSkippingIndexConfig("ds", [SketchSpec.min_max("ts")])
    """

    def __init__(self, index_name, sketches):
        self.index_name = index_name
        self.sketches = list(sketches)


class IvfIndexConfig:
    """IVF ANN index: k-means codebook + cell-partitioned corpus.

    pq_m > 0 adds product quantization (IVFADC serving: ADC ranking over
    stored codes in the probed cells + exact rerank); the vector
    dimension must divide evenly by pq_m. pq_iter refines the sampled PQ
    codebook with per-subspace Lloyd rounds.

    >>> IvfIndexConfig("ann", "vec_id", "embedding", k=16)
    >>> IvfIndexConfig("ann", "vec_id", "embedding", k=16, pq_m=16)
    """

    def __init__(self, index_name, id_column, vector_column, k=16, max_iter=5,
                 pq_m=0, pq_iter=0):
        self.index_name = index_name
        self.id_column = id_column
        self.vector_column = vector_column
        self.k = k
        self.max_iter = max_iter
        self.pq_m = pq_m
        self.pq_iter = pq_iter


class MinHashIndexConfig:
    """MinHash near-duplicate index: persisted signatures + LSH band keys.

    >>> MinHashIndexConfig("dedup", "doc_id", "text")
    """

    def __init__(self, index_name, id_column, text_column,
                 num_perm=16, bands=4):
        self.index_name = index_name
        self.id_column = id_column
        self.text_column = text_column
        self.num_perm = num_perm
        self.bands = bands
