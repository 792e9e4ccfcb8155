"""Graph analytics queries (gr-series): iterative propagation over a
graph derived from the warehouse — the workload family connecting the
engine to entity-graph use cases (influence, fraud rings, supply webs)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.graph import SCALE, pagerank_fixed_point
from .queries import query

_ITERS = 3
_OFF = 1_000_000  # supplier node-id offset (disjoint from custkeys)

# One PageRank iteration as SQL, parameterized by the previous generation.
_STEP = """SELECT e.dst AS node,
       {base} + ({d} * CAST(SUM(p.rank // g.deg) AS BIGINT)) // 100 AS rank
    FROM {prev} p JOIN deg g ON p.node = g.src JOIN edges e ON e.src = p.node
    GROUP BY e.dst"""


def _oracle() -> str:
    base, d = (100 - 85) * SCALE // 100, 85
    steps = ",\n".join(
        f"pr{i + 1} AS ({_STEP.format(base=base, d=d, prev=f'pr{i}')})" for i in range(_ITERS)
    )
    return f"""WITH raw AS (
          SELECT DISTINCT o_custkey AS src, l_suppkey + {_OFF} AS dst
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        edges AS (SELECT src, dst FROM raw
                  UNION ALL SELECT dst, src FROM raw),
        deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
        pr0 AS (SELECT src AS node, CAST({SCALE} AS BIGINT) AS rank FROM deg),
        {steps}
        SELECT node, rank FROM pr{_ITERS}"""


@query("gr01_pagerank", _oracle())
def gr01_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer↔supplier trading graph (edges = distinct
    (custkey, suppkey) pairs that share an order line, symmetrized so rank
    flows both ways), 3 fixed-point iterations — surfaces the most
    central buyers and suppliers in the supply web.

    The oracle unrolls the same three integer-exact iterations as chained
    CTEs (no recursion needed for a fixed count), so DuckDB reproduces
    every rank bit-for-bit — floor division + integer sums are
    order-independent where float PageRank would vary with partitioning.

    Scale: the edge build is one fact join + DISTINCT; each iteration is
    edges⋈ranks (rank table is the small side) + a combine-friendly
    groupBy dst. Power-law hubs are the known hazard — AQE skew splitting
    on the join, and the groupBy partial-aggregates hub contributions
    map-side. operators/graph.py holds the loop (localCheckpoint per
    generation, kmeans/connected-components discipline)."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    raw = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + _OFF).alias("dst"),
        )
        .distinct()
    )
    edges = raw.unionByName(
        raw.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return pagerank_fixed_point(edges, iters=_ITERS)


@query(
    "gr02_butterfly_count",
    f"""WITH raw AS (
          SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        wedges AS (
          SELECT a.supp AS s1, b.supp AS s2, COUNT(*) AS shared
          FROM raw a JOIN raw b ON a.cust = b.cust AND a.supp < b.supp
          GROUP BY a.supp, b.supp)
        SELECT CAST(SUM(shared * (shared - 1) // 2) AS BIGINT) AS n_butterflies,
               COUNT(*) AS n_supplier_pairs,
               CAST(MAX(shared) AS BIGINT) AS max_shared_customers
        FROM wedges""",
)
def gr02_butterfly_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Butterfly (2×2 biclique) counting over the customer↔supplier
    bipartite graph — THE density/cohesion motif for bipartite networks,
    where triangles cannot exist (gr01's graph is bipartite, so odd
    cycles are structurally absent): a butterfly is two customers who
    share the same two suppliers. Counted via wedges — supplier pairs
    co-purchased by one customer — then Σ C(shared, 2) per pair, all in
    exact integer arithmetic.

    Scale: the wedge join is per-customer (Σ C(deg_c, 2) work — the
    well-known hazard is a hub customer buying from everyone; production
    butterfly counting caps or samples degrees above a threshold, the
    same discipline as dd12's bucket cap, and the per-pair aggregate is
    combine-friendly). The summary row is a single reduce."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    raw = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(F.col("o_custkey").alias("cust"), F.col("l_suppkey").alias("supp"))
        .distinct()
    )
    a = raw.select(F.col("cust"), F.col("supp").alias("s1"))
    b = raw.select(F.col("cust"), F.col("supp").alias("s2"))
    wedges = (
        a.join(b, "cust")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count("*").alias("shared"))
    )
    return wedges.agg(
        F.sum(F.expr("shared * (shared - 1) div 2")).alias("n_butterflies"),
        F.count("*").alias("n_supplier_pairs"),
        F.max("shared").alias("max_shared_customers"),
    )


@query(
    "gr03_triangle_count",
    """WITH lp AS (
          SELECT DISTINCT l_orderkey, l_partkey
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE year(o_orderdate) = 1995),
        edges AS (
          SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
          FROM lp a JOIN lp b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        wedges AS (
          SELECT e1.u AS a, e1.v AS b, e2.v AS c
          FROM edges e1 JOIN edges e2 ON e1.v = e2.u),
        tri AS (
          SELECT w.a, w.b, w.c
          FROM wedges w JOIN edges e3 ON e3.u = w.a AND e3.v = w.c)
        SELECT (SELECT COUNT(*) FROM tri) AS n_triangles,
               (SELECT COUNT(*) FROM edges) AS n_edges,
               (SELECT COUNT(*) FROM wedges) AS n_wedges""",
)
def gr03_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the part co-purchase graph (parts are
    adjacent iff some 1995 order contains both): the unipartite
    complement of gr02's bipartite motif, and the standard cohesion /
    community-density primitive. Edges are id-oriented (u < v) so each
    triangle {a<b<c} is enumerated exactly once as the wedge (a,b),(b,c)
    closed by (a,c) — no post-hoc division, pure integer counts.

    Scale: the compact-oriented-edge self-join is the textbook
    distributed plan (one shuffle on the pivot vertex, then a closing
    semi-probe); wedge volume is Σ out-deg² — production runs orient by
    DEGREE (hubs point outward at low out-degree, bounding wedges by
    O(m^1.5), Schank/Wagner) rather than id; id-orientation keeps the
    oracle twin trivial at test scale and the docstring records the swap.
    The year filter is pushed to the orders scan; the closing probe
    reuses the shuffled edge partitioning."""
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") == 1995)
        .select("o_orderkey")
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    lp = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = lp.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = lp.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    edges = (
        a.join(b, "ok")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
        # The edge list feeds four branches (e1, e2, the closing probe,
        # and the edge count); checkpoint it so it's computed once — at
        # scale this is the materialized compact edge list every
        # production triangle counter builds first.
        .localCheckpoint(eager=False)
    )
    e1 = edges.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = edges.select(F.col("u").alias("b"), F.col("v").alias("c"))
    wedges = e1.join(e2, "b").select("a", "b", "c")
    # One pass over the wedges: a left probe into the closing-edge set
    # counts wedges and triangles together ((a,c) is unique in edges, so
    # a match never duplicates a wedge row).
    e3 = edges.select(
        F.col("u").alias("a"), F.col("v").alias("c"), F.lit(1).alias("hit")
    )
    closed = wedges.join(e3, ["a", "c"], "left").agg(
        F.count("hit").alias("n_triangles"),
        F.count("*").alias("n_wedges"),
    )
    n_edges = edges.agg(F.count("*").alias("n_edges"))
    return closed.crossJoin(n_edges).select("n_triangles", "n_edges", "n_wedges")
