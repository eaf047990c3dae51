package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over pair relations — the power-iteration
  * sibling of [[Dedup.connectedComponents]]. The near-dup pair graph
  * (d03) already drives cluster decisions (d11/d12); PageRank adds the
  * CENTRALITY view of the same graph: which documents sit at the core
  * of a duplication neighborhood (heavily-mirrored content — boilerplate
  * hubs, template families) vs its periphery. Training-data curation
  * uses exactly this signal to pick canonical representatives and to
  * down-weight hub content.
  *
  * All arithmetic is INTEGER (ranks are fixed-point at [[PrScale]], and
  * every division is a truncating integer division): the recurrence is
  * bit-replayable in any engine — integer sums are order-independent
  * where floating-point sums are not, so the DuckDB oracle can unroll
  * the same iterations textually and hash-match exactly. Truncation
  * leaks < 1 unit (= 10⁻¹² of total mass) per division — irrelevant to
  * the ranking, essential to determinism.
  */
object Graph {

  /** Fixed-point scale: 1 rank unit = 10⁻¹² of total probability mass. */
  val PrScale = 1000000000000L

  /** Fixed power-iteration count — deterministic by construction; on
    * the tiny-diameter near-dup components 8 rounds is far past
    * convergence at damping 0.85.
    */
  val PrIters = 8

  /** d36 — PageRank over the verified near-dup pair graph: vertices =
    * docs in ≥1 d03 pair, edges symmetrized, damping 85/100, teleport
    * mass split evenly. Output: `(doc_id, deg, pr)` with `pr` the
    * fixed-point rank after [[PrIters]] rounds.
    *
    * Scale shape, per round: one equi-join of the edge list against
    * the O(V) rank table, one keyed sum, one left join back to the
    * vertex set — all spillable keyed shuffles, no driver-side
    * per-row work (the driver sequences rounds only). Lineage is cut
    * per round with eager `localCheckpoint` (the d11 lesson: a
    * round that reads its previous result twice otherwise doubles the
    * logical plan per round). AQE is scoped OFF inside the loop and
    * the loop's shuffle width is sized from the measured edge count,
    * exactly as [[Dedup.connectedComponents]] does and for the same
    * measured reason.
    */
  def pageRank(spark: SparkSession, dir: String): DataFrame = {
    val (pairsRaw, _) = Dedup.jaccardPairsRaw(spark, dir)
    pageRankOnPairs(pairsRaw.select("id_a", "id_b"))
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")
  }

  /** PageRank on any 2-column undirected pair relation (one row per
    * edge, either direction). Returns `(id, deg, pr)`.
    */
  def pageRankOnPairs(pairs: DataFrame): DataFrame = {
    val cols = pairs.columns
    require(cols.length == 2, s"expected 2 edge columns, got ${cols.mkString(",")}")
    val sess = pairs.sparkSession
    val aqe0 = sess.conf.get("spark.sql.adaptive.enabled", "true")
    val sp0 = sess.conf.get("spark.sql.shuffle.partitions")
    sess.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val e0 = pairs.toDF("u", "v")
      val edges = e0.unionByName(e0.select(col("v").as("u"), col("u").as("v"))).persist()
      val width = math.max(1L, math.min(sp0.toLong, edges.count() / 500000L + 1L))
      sess.conf.set("spark.sql.shuffle.partitions", width.toString)

      val deg = edges.groupBy(col("u").as("id")).agg(count(lit(1)).as("deg")).persist()
      val n = deg.count()
      require(n > 0, "pageRank needs a non-empty edge list")
      val tele = (PrScale * 15L / 100L) / n

      var ranks = deg.select(col("id"), lit(PrScale / n).as("r")).localCheckpoint()
      for (_ <- 1 to PrIters) {
        val msgs = edges
          .join(ranks.withColumnRenamed("id", "u"), Seq("u"))
          .join(deg.toDF("u", "du"), Seq("u"))
          .select(col("v").as("id"), expr("r div du").as("c"))
          .groupBy("id").agg(sum("c").as("s"))
        ranks = deg.select("id")
          .join(msgs, Seq("id"), "left")
          .select(col("id"),
            (lit(tele) + expr("(85 * coalesce(s, 0L)) div 100")).as("r"))
          .localCheckpoint()
      }
      val out = ranks.join(deg, Seq("id"))
        .select(col("id"), col("deg"), col("r").as("pr"))
      edges.unpersist()
      out
    } finally {
      sess.conf.set("spark.sql.adaptive.enabled", aqe0)
      sess.conf.set("spark.sql.shuffle.partitions", sp0)
    }
  }

  /** d38 — per-vertex triangle count + local clustering coefficient
    * of the verified near-dup graph: the community-density view (a
    * template family where every mirror matches every other is
    * triangle-dense; a hub-and-spoke of unrelated snippets quoting one
    * document is triangle-free — the signal that separates "true
    * duplicate cluster" from "shared boilerplate star", which decides
    * whether keep-one-per-cluster curation is safe).
    *
    * Algorithm: DEGREE-ORDERED edge orientation (each undirected edge
    * directed from its lower (deg, id) endpoint to the higher), then
    * triangles enumerate as wedges `a→b, a→c` (with `b` before `c` in
    * the same order) closed by the directed edge `b→c` — every
    * triangle counted exactly once from its lowest-ordered vertex.
    * The orientation is THE at-scale trick: out-degree under it is
    * O(√m) even on power-law graphs, so wedge fan-out — the quadratic
    * term a naive neighbor self-join pays on hub vertices — is
    * bounded, giving the classic O(m^1.5) join-size bound. Every step
    * is an equi-join or keyed agg; the one inequality (`ord_b <
    * ord_c`) rides a hash join on the shared wedge center.
    *
    * `clustering = 2·T / (deg·(deg−1))` is a ratio of identical ints
    * in both engines (0.0 pinned where deg < 2) → exact double parity.
    * The oracle enumerates triangles off the canonical `id_a < id_b`
    * pair relation directly — a DIFFERENT enumeration order proving
    * the oriented plan drops/duplicates nothing.
    */
  def triangles(spark: SparkSession, dir: String): DataFrame = {
    val (pairsRaw, _) = Dedup.jaccardPairsRaw(spark, dir)
    trianglesOnPairs(pairsRaw.select("id_a", "id_b"))
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")
  }

  /** Triangle counts on any canonical (u < v) pair relation. */
  def trianglesOnPairs(pairs: DataFrame): DataFrame = {
    val e0 = pairs.toDF("u", "v").persist()
    val deg = e0.select(col("u").as("id"))
      .unionAll(e0.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    // orient: src = lower (deg, id) endpoint
    val keyed = e0
      .join(deg.toDF("u", "du"), Seq("u"))
      .join(deg.toDF("v", "dv"), Seq("v"))
    val ou = struct(col("du").as("d"), col("u").as("n"))
    val ov = struct(col("dv").as("d"), col("v").as("n"))
    val dir = keyed.select(
      when(ou < ov, col("u")).otherwise(col("v")).as("src"),
      when(ou < ov, col("v")).otherwise(col("u")).as("dst"),
      when(ou < ov, ov).otherwise(ou).as("dstOrd"))
      .persist()
    val tri = dir.as("e1")
      .join(dir.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.dstOrd") < col("e2.dstOrd"))
      .select(col("e1.src").as("a"), col("e1.dst").as("b"), col("e2.dst").as("c"))
      .join(dir.select(col("src").as("b"), col("dst").as("c")), Seq("b", "c"))
    val tn = tri.select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_tri"))
    val out = deg.join(tn, Seq("id"), "left")
      .select(col("id"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("clustering",
        when(col("deg") < 2, lit(0.0))
          .otherwise((col("n_tri") * 2).cast("double") / (col("deg") * (col("deg") - 1))))
    e0.unpersist()
    dir.unpersist()
    out
  }

  val oracleTriangles: String =
    s"""WITH ${Dedup.pairsCteSql},
       |p2 AS MATERIALIZED (SELECT id_a, id_b FROM pairs),
       |deg AS MATERIALIZED (
       |  SELECT id, count(*) AS deg FROM (
       |    SELECT id_a AS id FROM p2 UNION ALL SELECT id_b FROM p2)
       |  GROUP BY id),
       |tri AS (
       |  SELECT p1.id_a AS a, p1.id_b AS b, q.id_b AS c
       |  FROM p2 p1
       |  JOIN p2 q ON q.id_a = p1.id_b
       |  JOIN p2 r ON r.id_a = p1.id_a AND r.id_b = q.id_b),
       |tn AS (
       |  SELECT n AS id, count(*) AS n_tri
       |  FROM (SELECT unnest([a, b, c]) AS n FROM tri)
       |  GROUP BY 1)
       |SELECT d.id AS doc_id, d.deg,
       |       COALESCE(t.n_tri, 0) AS n_tri,
       |       CASE WHEN d.deg < 2 THEN 0.0::DOUBLE
       |            ELSE (COALESCE(t.n_tri, 0) * 2)::DOUBLE / (d.deg * (d.deg - 1))
       |       END AS clustering
       |FROM deg d LEFT JOIN tn t ON t.id = d.id
       |ORDER BY doc_id""".stripMargin

  /** k for [[kCore]] and the fixed unroll depth of its oracle. Peeling
    * is monotone, so rounds past the fixpoint are no-ops — the Spark
    * side may stop early (driver-checked fixpoint) while the oracle
    * always unrolls [[KCoreRounds]] rounds; the two agree as long as
    * the fixpoint lands within the bound, which [[kCore]] asserts.
    */
  val KCoreK = 3
  val KCoreRounds = 12

  /** d39 — k-core decomposition (k = [[KCoreK]]) of the verified
    * near-dup graph by iterative peeling: repeatedly delete vertices
    * with degree < k (and their incident edges) until none remain;
    * survivors form the k-core, reported with their within-core
    * degree. The graph-density cousin of d38: a mirror family is a
    * dense core; a boilerplate hub-and-spoke star peels away entirely
    * — the standard "is this cluster real or an artifact" screen
    * before keep-one-per-cluster curation.
    *
    * Iterate-to-FIXPOINT shape (vs d36's fixed rounds, d11's label
    * convergence): each round is one keyed degree agg + two
    * semi-joins, lineage cut by eager `localCheckpoint`, AQE scoped
    * off (the d11 loop discipline); the driver checks only the
    * surviving-edge count per round. Rounds are data-bounded: every
    * non-final round removes ≥ 1 vertex, and on near-dup graphs
    * (tiny-diameter components) the fixpoint lands in a handful.
    */
  def kCore(spark: SparkSession, dir: String): DataFrame = {
    val (pairsRaw, _) = Dedup.jaccardPairsRaw(spark, dir)
    kCoreOnPairs(pairsRaw.select("id_a", "id_b"))
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")
  }

  /** k-core of any canonical pair relation; returns `(id, core_deg)`. */
  def kCoreOnPairs(pairs: DataFrame): DataFrame = {
    val sess = pairs.sparkSession
    val aqe0 = sess.conf.get("spark.sql.adaptive.enabled", "true")
    sess.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val e0 = pairs.toDF("u", "v")
      var edges = e0.unionByName(e0.select(col("v").as("u"), col("u").as("v")))
        .localCheckpoint()
      var n = edges.count()
      var rounds = 0
      var converged = n == 0L
      while (!converged && rounds < KCoreRounds) {
        val keep = edges.groupBy("u").agg(count(lit(1)).as("deg"))
          .where(col("deg") >= KCoreK)
          .select(col("u").as("id"))
        val pruned = edges
          .join(keep.withColumnRenamed("id", "u"), Seq("u"), "left_semi")
          .join(keep.withColumnRenamed("id", "v"), Seq("v"), "left_semi")
          .select("u", "v")
          .localCheckpoint()
        val n2 = pruned.count()
        converged = n2 == n
        edges = pruned
        n = n2
        rounds += 1
      }
      require(converged, s"k-core did not converge within $KCoreRounds rounds")
      edges.groupBy(col("u").as("id")).agg(count(lit(1)).as("core_deg"))
    } finally {
      sess.conf.set("spark.sql.adaptive.enabled", aqe0)
    }
  }

  /** d39's DuckDB replay: [[KCoreRounds]] peel rounds unrolled
    * textually (the per-round degree aggregate bars a recursive CTE);
    * rounds after the fixpoint are no-ops, so the fixed unroll equals
    * the Spark side's early-stopped loop. Every round's edge set is
    * `AS MATERIALIZED` — each is referenced three times by the next
    * round (degree + both semi-join sides).
    */
  val oracleKCore: String = {
    val rounds = (1 to KCoreRounds).map { r =>
      s"""v$r AS (
         |  SELECT u AS id FROM e${r - 1} GROUP BY u HAVING count(*) >= $KCoreK),
         |e$r AS MATERIALIZED (
         |  SELECT e.u, e.v FROM e${r - 1} e
         |  JOIN v$r a ON a.id = e.u
         |  JOIN v$r b ON b.id = e.v)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${Dedup.pairsCteSql},
       |e0 AS MATERIALIZED (
       |  SELECT id_a AS u, id_b AS v FROM pairs
       |  UNION ALL
       |  SELECT id_b, id_a FROM pairs),
       |$rounds
       |SELECT u AS doc_id, count(*) AS core_deg
       |FROM e$KCoreRounds
       |GROUP BY u
       |ORDER BY doc_id""".stripMargin
  }

  /** DuckDB replay: the same integer recurrence with the iterations
    * unrolled textually (standard-SQL recursive CTEs forbid the
    * per-round aggregate). `//` on non-negative BIGINTs truncates
    * toward zero = JVM `div` — the parity the fixed-point design buys.
    * `edges`/`deg` are `AS MATERIALIZED`: each unrolled round
    * references them, and without the hint DuckDB re-evaluates the
    * whole LSH+verify chain behind `pairs` once per round (measured:
    * a > 80 GB temp spill at sf0.1).
    */
  val oraclePageRank: String = {
    val iters = (1 to PrIters).map { k =>
      s"""it$k AS (
         |  SELECT nd.id,
         |         (SELECT tele FROM meta) + ((85 * COALESCE(m.s, 0))::BIGINT // 100) AS r
         |  FROM nodes nd LEFT JOIN (
         |    SELECT e.v AS id, sum(p.r // d.deg) AS s
         |    FROM edges e
         |    JOIN it${k - 1} p ON p.id = e.u
         |    JOIN deg d ON d.id = e.u
         |    GROUP BY e.v) m ON m.id = nd.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${Dedup.pairsCteSql},
       |edges AS MATERIALIZED (
       |  SELECT id_a AS u, id_b AS v FROM pairs
       |  UNION ALL
       |  SELECT id_b, id_a FROM pairs),
       |deg AS MATERIALIZED (SELECT u AS id, count(*) AS deg FROM edges GROUP BY 1),
       |nodes AS (SELECT id FROM deg),
       |meta AS (
       |  SELECT count(*) AS n,
       |         (($PrScale * 15) // 100) // count(*) AS tele
       |  FROM nodes),
       |it0 AS (SELECT id, $PrScale // (SELECT n FROM meta) AS r FROM nodes),
       |$iters
       |SELECT p.id AS doc_id, d.deg, p.r AS pr
       |FROM it$PrIters p JOIN deg d ON d.id = p.id
       |ORDER BY doc_id""".stripMargin
  }
}
