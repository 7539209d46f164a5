"""Data-adaptive spatial partitioning: the reference's ``spatial_partitioning``
aggregate + KdbTree (presto-geospatial/.../SpatialPartitioningAggregateFunction.java:29,
presto-geospatial-toolkit/.../KdbTree.java:272, consumed by
SpatialJoinOperator.java:41) re-expressed Spark-first.

The reference builds a KdbTree on a single node from a SAMPLE of the input
envelopes (``spatial_partitioning(geometry, samplingPercentage,
partitionCount)``), then every spatial-join row is routed to the leaves its
envelope overlaps. We keep that exact split discipline — median split on the
longer side, skipping duplicate coordinates, extent halves carried down —
but the Spark expression of it is different from (and cheaper than) a
distributed tree:

1. **Learn** (driver, bounded): a deterministic hash-sample of at most
   ``max_sample`` points is collected and fed to :func:`build_kdb_tree`.
   This is the one deliberate ``collect`` — identical in role to the
   reference's single-node sample aggregation, and bounded by construction
   (the sample, never the data). At 100 TB the sample is still ~10k rows.
2. **Compile, don't join**: the learned tree is compiled into pure codegen
   Column expressions — a nested ``when``-chain for point -> leaf descent
   (depth ~ log2(leaves) comparisons) and a literal-array ``filter`` for
   envelope -> covering-leaf enumeration. No lookup table, no broadcast
   join, no UDF: leaf assignment rides inside the scan stage's
   WholeStageCodegen, and the leaf id becomes an ordinary equi-join key.

Unlike the fixed 10-degree grid (queries/geo_queries.py), leaf boundaries
follow the sampled data density, so per-leaf candidate counts stay bounded
under clustered real-world geodata (tests/test_spatial_partition.py pins
this on a deliberately 3-cluster fixture) instead of leaning on AQE
skew-split.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_LEVELS = 32  # practical bound; the reference allows 10,000


@dataclass(frozen=True)
class KdbLeaf:
    """A leaf rectangle. Bounds are half-open on the max side conceptually;
    the root extent is unbounded outward so every point maps to a leaf."""

    leaf_id: int
    xmin: float
    ymin: float
    xmax: float
    ymax: float


@dataclass(frozen=True)
class KdbNode:
    # Internal: split on `axis` ('x'|'y') at `value`; left = coord <= value.
    axis: str | None = None
    value: float | None = None
    left: "KdbNode | None" = None
    right: "KdbNode | None" = None
    leaf_id: int | None = None


@dataclass(frozen=True)
class SpatialPartitioning:
    root: KdbNode
    leaves: tuple[KdbLeaf, ...]

    def leaf_id_for_point(self, x: float, y: float) -> int:
        node = self.root
        while node.leaf_id is None:
            coord = x if node.axis == "x" else y
            node = node.left if coord <= node.value else node.right
        return node.leaf_id

    def leaf_id_expr(self, x: Column, y: Column) -> Column:
        """Point -> leaf id as a nested when-chain (tree descent, codegen)."""

        def descend(node: KdbNode) -> Column:
            if node.leaf_id is not None:
                return F.lit(node.leaf_id)
            coord = x if node.axis == "x" else y
            return F.when(coord <= F.lit(node.value), descend(node.left)).otherwise(
                descend(node.right)
            )

        return descend(self.root)

    def covering_leaf_ids_expr(
        self, xmin: Column, ymin: Column, xmax: Column, ymax: Column
    ) -> Column:
        """Envelope -> array of overlapping leaf ids, as a codegen filter
        over a literal leaf array (leaves are few — the partition count).

        Overlap uses closed bounds on both sides so an envelope touching a
        leaf boundary lands in both adjacent leaves — candidate duplication
        is impossible to miss, and the exact refine predicate dedups (a
        point belongs to exactly one leaf, so each (zone, point) pair meets
        in exactly one leaf: the point's)."""
        leaf_arr = F.array(
            *[
                F.struct(
                    F.lit(lf.leaf_id).alias("id"),
                    F.lit(lf.xmin).alias("xmin"),
                    F.lit(lf.ymin).alias("ymin"),
                    F.lit(lf.xmax).alias("xmax"),
                    F.lit(lf.ymax).alias("ymax"),
                )
                for lf in self.leaves
            ]
        )
        hits = F.filter(
            leaf_arr,
            lambda lf: (xmin <= lf["xmax"])
            & (xmax >= lf["xmin"])
            & (ymin <= lf["ymax"])
            & (ymax >= lf["ymin"]),
        )
        return F.transform(hits, lambda lf: lf["id"])


def build_kdb_tree(
    points: list[tuple[float, float]], max_items_per_node: int
) -> SpatialPartitioning:
    """KdbTree.buildKdbTree (KdbTree.java:272) over sampled points.

    Median split on the longer side of the current extent; the split value
    is the midpoint between the median coordinate and the next distinct one
    (KdbTree.java:358 — evens out unseen points that fall between), skipping
    duplicates; if one axis can't split (all coordinates equal), try the
    other; if neither can, emit a leaf. Leaf extents partition the plane:
    the outer border is +/-infinity so any point (seen or unseen) maps to
    exactly one leaf.
    """
    if max_items_per_node <= 0:
        raise ValueError("max_items_per_node must be > 0")
    inf = float("inf")
    leaves: list[KdbLeaf] = []

    def new_leaf(extent: tuple[float, float, float, float]) -> KdbNode:
        leaf_id = len(leaves)
        leaves.append(KdbLeaf(leaf_id, *extent))
        return KdbNode(leaf_id=leaf_id)

    def try_split(
        axis: str, pts: list[tuple[float, float]]
    ) -> tuple[float, list, list] | None:
        i = 0 if axis == "x" else 1
        s = sorted(pts, key=lambda p: p[i])
        mid = (len(s) - 1) // 2
        split_value = s[mid][i]
        j = mid
        while j < len(s) and s[j][i] == split_value:
            j += 1
        if j == len(s):
            return None  # every value from the median up is identical
        split_value = (split_value + s[j][i]) / 2.0
        left = [p for p in pts if p[i] <= split_value]
        right = [p for p in pts if p[i] > split_value]
        return split_value, left, right

    def build(
        pts: list[tuple[float, float]],
        extent: tuple[float, float, float, float],
        level: int,
    ) -> KdbNode:
        if len(pts) <= max_items_per_node or level >= MAX_LEVELS:
            return new_leaf(extent)
        xmin, ymin, xmax, ymax = extent
        # Split over the longer side of the *sampled* bounding box when the
        # extent is unbounded (root), else of the extent — mirrors the
        # reference, which seeds the root extent from the data.
        if xmax == inf or xmin == -inf or ymax == inf or ymin == -inf:
            w = max(p[0] for p in pts) - min(p[0] for p in pts)
            h = max(p[1] for p in pts) - min(p[1] for p in pts)
        else:
            w, h = xmax - xmin, ymax - ymin
        order = ("x", "y") if w >= h else ("y", "x")
        for axis in order:
            res = try_split(axis, pts)
            if res is None:
                continue
            value, lpts, rpts = res
            if axis == "x":
                lext = (xmin, ymin, value, ymax)
                rext = (value, ymin, xmax, ymax)
            else:
                lext = (xmin, ymin, xmax, value)
                rext = (xmin, value, xmax, ymax)
            return KdbNode(
                axis=axis,
                value=value,
                left=build(lpts, lext, level + 1),
                right=build(rpts, rext, level + 1),
            )
        return new_leaf(extent)

    root = build(points, (-inf, -inf, inf, inf), 0)
    return SpatialPartitioning(root=root, leaves=tuple(leaves))


def learn_partitioning(
    df: DataFrame,
    xcol: str,
    ycol: str,
    *,
    sample_key: str,
    sample_mod: int = 10,
    max_sample: int = 10_000,
    max_items_per_node: int = 100,
    partition_count: int | None = None,
) -> SpatialPartitioning:
    """The ``spatial_partitioning(geometry, samplingPercentage,
    partitionCount)`` analog. Deterministic hash-sample (``sample_key %
    sample_mod = 0`` — reproducible across engines and runs, unlike
    Bernoulli sampling) capped at ``max_sample`` rows, collected (bounded —
    the one deliberate collect, same role as the reference's single-node
    sample aggregation), then :func:`build_kdb_tree`.

    ``partition_count`` mirrors the reference signature's third argument and
    is the scale-safe way to size the tree: it derives max_items_per_node
    from the sample so the LEAF COUNT stays ~partition_count regardless of
    sample size. This matters because the tree compiles into a plan-side
    expression: leaves must be a bounded knob, never data-proportional
    (a sample-proportional leaf count at sf0.1 produced a ~2000-node
    when-chain — past the 64 KB codegen limit and slow to even analyze).
    """
    sample = (
        df.where((F.col(sample_key) % sample_mod) == 0)
        .select(F.col(xcol).cast("double"), F.col(ycol).cast("double"))
        .limit(max_sample)
        .collect()
    )
    pts = [(r[0], r[1]) for r in sample if r[0] is not None and r[1] is not None]
    if not pts:
        raise ValueError("spatial_partitioning: empty sample")
    if partition_count is not None:
        max_items_per_node = max(1, -(-len(pts) // partition_count))
    return build_kdb_tree(pts, max_items_per_node)
