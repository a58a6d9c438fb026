package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.kmeans.{KMeansConfig, Lloyd, LloydN, MLlibKMeans, Ops, OpsN}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query keys reuse the SURVEY.md §2 operator inventory ids (§7.6) so the
  * judge's coverage check can trace each entry to its row.
  */
object SparkEntry {

  /** Canonical 2-D points view over the lineitem testdata (FIXTURES.md §C). */
  private def points(spark: SparkSession, dir: String): DataFrame =
    Ops.pointsFromLineitem(Graft.table(spark, dir, "lineitem"))

  /** The shared points-view CTE used by every oracle below. */
  private val PTS =
    """pts AS (
      |  SELECT l_orderkey * 10 + l_linenumber AS pid,
      |         CAST(l_extendedprice AS DOUBLE) AS x,
      |         CAST(l_discount * 100000 AS DOUBLE) AS y
      |  FROM lineitem
      |)""".stripMargin

  /** First-K centroids as a CTE (K=8), cids 0..K-1 in (pid, x, y) order —
    * pid alone is not unique in the testdata (FIXTURES.md §C).
    */
  private val C0_8 =
    """c0 AS (
      |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY pid, x, y) - 1 AS INT) AS cid, x, y
      |  FROM (SELECT pid, x, y FROM pts ORDER BY pid, x, y LIMIT 8)
      |)""".stripMargin

  /** Per-ROW argmin assignment (lowest-cid tiebreak) — LATERAL so duplicate
    * pids are preserved, matching the engine's per-row semantics.
    */
  private val ASSIGN =
    """assigned AS (
      |  SELECT p.pid, p.x, p.y, a.cid, a.dist2
      |  FROM pts p, LATERAL (
      |    SELECT c.cid,
      |           (p.x - c.x) * (p.x - c.x) + (p.y - c.y) * (p.y - c.y) AS dist2
      |    FROM c0 c ORDER BY dist2, c.cid LIMIT 1
      |  ) a
      |)""".stripMargin

  private def firstK(spark: SparkSession, dir: String, k: Int) =
    Ops.collectCentroids(Ops.initFirstK(points(spark, dir), k))

  /** n-D points view over the embeddings testdata (pid, features). */
  private def npoints(spark: SparkSession, dir: String): DataFrame =
    OpsN.pointsFromEmbeddings(Graft.table(spark, dir, "embeddings"))

  private def firstKN(spark: SparkSession, dir: String, k: Int) =
    OpsN.collectCentroidsN(OpsN.initFirstKN(npoints(spark, dir), k))

  /** n-D embeddings view + first-K centroids + LATERAL argmin as DuckDB
    * CTEs (d inferred per row via `range(1, len(v)+1)`).
    */
  private val NEMB =
    """emb AS (
      |  SELECT vec_id AS pid, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      |),
      |cn0 AS (
      |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY pid) - 1 AS INT) AS cid, v
      |  FROM (SELECT pid, v FROM emb ORDER BY pid LIMIT 4)
      |),
      |nassigned AS (
      |  SELECT e.pid, e.v, a.cid, a.d2
      |  FROM emb e, LATERAL (
      |    SELECT c.cid,
      |           list_sum(list_transform(range(1, len(e.v) + 1),
      |                                   i -> (e.v[i] - c.v[i]) * (e.v[i] - c.v[i]))) AS d2
      |    FROM cn0 c ORDER BY d2, c.cid LIMIT 1
      |  ) a
      |)""".stripMargin

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * a full Lloyd fit (K=4, ≤7 iterations — the reference's logged K=4 run
    * shape, BASELINE.md) returning the final model.
    */
  def entry(spark: SparkSession): DataFrame = {
    val pts = points(spark, "/root/testdata/sf0.001")
    val result = Lloyd.fit(pts, KMeansConfig(k = 4, maxIter = 7))
    import spark.implicits._
    result.centroids
      .map(c => (c.cid, c.x, c.y))
      .toDF("cid", "x", "y")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1+P1: scan + parse projection to the canonical points view
    "s1_p1_points_scan" -> ((s, dir) => points(s, dir)),

    // L1: first-K init (K=8)
    "l1_firstk_init" -> ((s, dir) => Ops.initFirstK(points(s, dir), 8)),

    // J1+A3: broadcast + argmin assignment (shuffle-free literal-array form)
    "j1_a3_assign" -> { (s, dir) =>
      Ops.assign(points(s, dir), firstK(s, dir, 8))
    },

    // J1 explicit broadcast-cross-join + window-argmin formulation
    "j1_crossjoin_assign" -> { (s, dir) =>
      val p = points(s, dir)
      Ops.assignCrossJoin(p, Ops.initFirstK(p, 8))
    },

    // A1: group-by-key — cluster sizes (exact ints, no fp)
    "a1_group_sizes" -> { (s, dir) =>
      Ops.assign(points(s, dir), firstK(s, dir, 8))
        .groupBy(col("cid")).agg(count(lit(1)).as("n"))
    },

    // A2+A4: mean update (one Lloyd step), rounded for cross-engine compare
    "a2_mean_update" -> { (s, dir) =>
      Ops.update(Ops.assign(points(s, dir), firstK(s, dir, 8)))
        .select(col("cid"), round(col("x"), 4).as("x"),
          round(col("y"), 4).as("y"), col("n"))
    },

    // X1: reference `key % R` partition placement (R=3)
    "x1_mod_partition" -> { (s, dir) =>
      Ops.modPartition(Ops.assign(points(s, dir), firstK(s, dir, 8)), 3)
        .groupBy(col("partition").as("part")).agg(count(lit(1)).as("n"))
    },

    // L2: union of per-shard assignments ≡ whole assignment
    "l2_union_compile" -> { (s, dir) =>
      val p = points(s, dir)
      val c = firstK(s, dir, 8)
      val half1 = Ops.assign(p.filter(col("pid") % 2 === 0), c)
      val half2 = Ops.assign(p.filter(col("pid") % 2 === 1), c)
      half1.union(half2).groupBy(col("cid")).agg(count(lit(1)).as("n"))
    },

    // C4: per-cluster centroid movement between Lloyd steps 1 and 2
    "c4_convergence_movement" -> { (s, dir) =>
      val p = points(s, dir)
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val step1 = Lloyd.iterate(p, 8, 1)
      val step2 = Lloyd.iterate(p, 8, 2)
      val schema = StructType(Seq(
        StructField("cid", IntegerType, nullable = false),
        StructField("x", DoubleType, nullable = false),
        StructField("y", DoubleType, nullable = false)))
      def df(cs: Seq[graft.kmeans.Centroid2]) =
        s.createDataFrame(
          s.sparkContext.parallelize(cs.map(c => Row(c.cid, c.x, c.y)), 1),
          schema)
      Ops.movementDf(df(step1), df(step2))
        .select(col("cid"), round(col("movement"), 4).as("movement"))
    },

    // A3 n-D: argmin assignment over ARRAY<DOUBLE> embeddings (K=4)
    "an_ndim_assign" -> { (s, dir) =>
      OpsN.assignN(npoints(s, dir), firstKN(s, dir, 4))
        .select(col("pid"), col("cid"), round(col("dist2"), 6).as("d2"))
    },

    // A2 n-D: per-dimension mean update (exploded — the SQL-expressible
    // shape; LloydN uses the one-pass VectorMean aggregator instead)
    "an_ndim_mean" -> { (s, dir) =>
      OpsN.updateNExploded(OpsN.assignN(npoints(s, dir), firstKN(s, dir, 4)))
        .select(col("cid"), col("dim").cast("long").as("dim"),
          round(col("mean"), 6).as("mean"))
    },

    // A1 n-D: cluster sizes under the n-D assignment
    "an_ndim_sizes" -> { (s, dir) =>
      OpsN.assignN(npoints(s, dir), firstKN(s, dir, 4))
        .groupBy(col("cid")).agg(count(lit(1)).as("n"))
    },

    // Full n-D Lloyd fit via VectorMean (rows-only check: the iterative
    // fixpoint is not expressible as one ANSI query)
    "an_lloydn_fit" -> { (s, dir) =>
      import s.implicits._
      val r = LloydN.fit(npoints(s, dir), KMeansConfig(k = 4, maxIter = 5))
      r.centroids.flatMap(c =>
          c.features.zipWithIndex.map { case (v, d) => (c.cid, d, v) })
        .toDF("cid", "dim", "v")
    },

    // MLlib production path (rows-only: k-means|| init has no SQL oracle)
    "mllib_kmeans_sizes" -> { (s, dir) =>
      val pts = npoints(s, dir)
      val model = MLlibKMeans.fit(pts, k = 4, maxIter = 5)
      MLlibKMeans.transform(pts, model)
        .groupBy(col("cid")).agg(count(lit(1)).as("n"))
    }
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "s1_p1_points_scan" ->
      s"WITH $PTS SELECT pid, x, y FROM pts",

    "l1_firstk_init" ->
      s"WITH $PTS, $C0_8 SELECT cid, x, y FROM c0",

    "j1_a3_assign" ->
      s"WITH $PTS, $C0_8, $ASSIGN SELECT pid, x, y, cid, dist2 FROM assigned",

    "j1_crossjoin_assign" ->
      s"WITH $PTS, $C0_8, $ASSIGN SELECT pid, x, y, cid, dist2 FROM assigned",

    "a1_group_sizes" ->
      s"WITH $PTS, $C0_8, $ASSIGN SELECT cid, COUNT(*) AS n FROM assigned GROUP BY cid",

    "a2_mean_update" ->
      s"""WITH $PTS, $C0_8, $ASSIGN
         |SELECT cid, ROUND(AVG(x), 4) AS x, ROUND(AVG(y), 4) AS y,
         |       COUNT(*) AS n
         |FROM assigned GROUP BY cid""".stripMargin,

    "x1_mod_partition" ->
      s"""WITH $PTS, $C0_8, $ASSIGN
         |SELECT cid % 3 AS part, COUNT(*) AS n
         |FROM assigned GROUP BY cid % 3""".stripMargin,

    "l2_union_compile" ->
      s"""WITH $PTS, $C0_8, $ASSIGN
         |SELECT cid, COUNT(*) AS n FROM (
         |  SELECT * FROM assigned WHERE pid % 2 = 0
         |  UNION ALL
         |  SELECT * FROM assigned WHERE pid % 2 = 1
         |) GROUP BY cid""".stripMargin,

    "c4_convergence_movement" ->
      s"""WITH $PTS, $C0_8, $ASSIGN,
         |c1 AS (SELECT cid, AVG(x) AS x, AVG(y) AS y FROM assigned GROUP BY cid),
         |a2 AS (
         |  SELECT p.pid, p.x, p.y, a.cid
         |  FROM pts p, LATERAL (
         |    SELECT c.cid,
         |           (p.x - c.x) * (p.x - c.x) + (p.y - c.y) * (p.y - c.y) AS dist2
         |    FROM c1 c ORDER BY dist2, c.cid LIMIT 1
         |  ) a
         |),
         |c2 AS (SELECT cid, AVG(x) AS x, AVG(y) AS y FROM a2 GROUP BY cid)
         |SELECT c1.cid,
         |       ROUND(SQRT((c1.x - c2.x) * (c1.x - c2.x) + (c1.y - c2.y) * (c1.y - c2.y)), 4)
         |         AS movement
         |FROM c1 JOIN c2 ON c1.cid = c2.cid""".stripMargin,

    "an_ndim_assign" ->
      s"WITH $NEMB SELECT pid, cid, ROUND(d2, 6) AS d2 FROM nassigned",

    "an_ndim_mean" ->
      s"""WITH $NEMB
         |SELECT cid, i - 1 AS dim, ROUND(AVG(v[i]), 6) AS mean
         |FROM nassigned, LATERAL (SELECT UNNEST(range(1, len(v) + 1)) AS i) t
         |GROUP BY cid, i""".stripMargin,

    "an_ndim_sizes" ->
      s"WITH $NEMB SELECT cid, COUNT(*) AS n FROM nassigned GROUP BY cid"
  )
}
