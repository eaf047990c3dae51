package graft

import graft.llm.{Dedup, Graph}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reusable CC operator beyond the fixture's tiny components: the
  * 200-node chain has diameter 199, so plain neighbor-min propagation
  * would need ~200 rounds and trip the operator's 25-round cap —
  * convergence here proves the pointer-jumping shortcut delivers its
  * O(log diameter) bound, not just correctness on twins.
  */
class ConnectedComponentsSpec extends AnyFunSuite {
  import SparkTestBase.spark
  import spark.implicits._

  test("long chain converges within the round cap and labels to the min") {
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("a", "b")
    val labels = Dedup.connectedComponents(chain)
    assert(labels.count() == 200)
    assert(labels.filter(col("component") =!= 0L).isEmpty)
  }

  test("star and disjoint components get per-component min labels") {
    val star = (1L to 50L).map(i => (0L, i))
    val chain2 = (1000L until 1010L).map(i => (i, i + 1))
    val labels = Dedup.connectedComponents((star ++ chain2).toDF("a", "b"))
    assert(labels.filter(col("vertex") <= 50L && col("component") =!= 0L).isEmpty)
    assert(labels.filter(col("vertex") >= 1000L && col("component") =!= 1000L).isEmpty)
    assert(labels.count() == 51 + 11)
  }

  test("random graphs match a driver-side union-find oracle") {
    // seeded PRNG: deterministic across runs, varied shapes (sparse,
    // dense, self-loops, duplicate edges, isolated-by-absence vertices)
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 1 to 6) {
      val n = 20 + rnd.nextInt(60)
      val m = 1 + rnd.nextInt(3 * n)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      // union-find ground truth over the edge-touched vertex set
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) => val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra max rb) = ra min rb }
      val roots = edges.flatMap(e => Seq(e._1, e._2)).distinct.groupBy(find)
      val truth = roots.flatMap { case (_, members) =>
        val label = members.min
        members.map(_ -> label)
      }
      val got = Dedup.connectedComponents(edges.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == truth, s"trial $trial (n=$n m=$m): CC disagrees with union-find")
      // the public entry takes the driver fast path at these sizes;
      // the distributed loop must produce the identical labeling
      val e0 = edges.toDF("u", "v")
      val sym = e0.unionByName(e0.select(col("v").as("u"), col("u").as("v"))).persist()
      val loop = Dedup.connectedComponentsLoop(sym)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(loop == truth, s"trial $trial (n=$n m=$m): loop disagrees with union-find")
    }
  }

  /** Driver-side exact replay of d36's integer recurrence. */
  private def pageRankTruth(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val edges = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = edges.groupBy(_._1).map { case (k, es) => k -> es.size.toLong }
    val n = deg.size.toLong
    val tele = (Graph.PrScale * 15L / 100L) / n
    var r: Map[Long, Long] = deg.map { case (k, _) => k -> Graph.PrScale / n }
    for (_ <- 1 to Graph.PrIters) {
      val s = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      edges.foreach { case (u, v) => s(v) += r(u) / deg(u) }
      r = deg.map { case (k, _) => k -> (tele + (85L * s(k)) / 100L) }
    }
    r
  }

  test("d36 pageRank matches a driver-side integer replay exactly") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 4L), (5L, 6L), (1L, 7L))
    val got = Graph.pageRankOnPairs(pairs.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val truth = pageRankTruth(pairs)
    assert(got.keySet == truth.keySet)
    got.foreach { case (id, (_, pr)) => assert(pr == truth(id), s"vertex $id") }
    // centrality sanity on the path-with-chord: 2 is the hub of {1,2,3,4,7}
    assert(got(2L)._2 > got(3L)._2 && got(2L)._2 > got(1L)._2)
    // the isolated symmetric pair {5,6} has equal ranks
    assert(got(5L)._2 == got(6L)._2)
    // mass conservation up to truncation: ≤ 1 unit lost per division
    val total = got.values.map(_._2).sum
    assert(total <= Graph.PrScale && total > Graph.PrScale * 99L / 100L)
  }

  test("d38 triangles match a brute-force enumeration on random graphs") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 5) {
      val n = 4 + rnd.nextInt(12)
      val edges = (for {
        a <- 0 until n; b <- (a + 1) until n if rnd.nextBoolean()
      } yield (a.toLong, b.toLong)).toSeq
      if (edges.nonEmpty) {
        val es = edges.toSet
        val triTruth = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
        for {
          (a, b) <- edges; c <- (b + 1) until n
          if es.contains((a, c.toLong)) && es.contains((b, c.toLong))
        } Seq(a, b, c.toLong).foreach(v => triTruth(v) += 1)
        val degTruth = edges.flatMap(e => Seq(e._1, e._2))
          .groupBy(x => x).map { case (k, v) => k -> v.length.toLong }
        val got = Graph.trianglesOnPairs(edges.toDF("u", "v")).collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
        assert(got.keySet == degTruth.keySet, s"trial $trial vertex set")
        got.foreach { case (id, (d, t, cc)) =>
          assert(d == degTruth(id), s"trial $trial deg($id)")
          assert(t == triTruth(id), s"trial $trial tri($id)")
          val expCc = if (d < 2) 0.0 else 2.0 * t / (d * (d - 1))
          assert(cc == expCc, s"trial $trial cc($id)")
        }
      }
    }
  }

  test("d39 k-core matches iterative peeling on random graphs; hub-star peels away") {
    // hand case: K5 (a real 3-core) + a star center with 5 spokes (peels)
    val k5 = for (a <- 0 until 5; b <- (a + 1) until 5) yield (a.toLong, b.toLong)
    val star = (10 until 15).map(s => (9L, s.toLong))
    val got = Graph.kCoreOnPairs((k5 ++ star).toDF("u", "v")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L until 5L).map(_ -> 4L).toMap, s"got $got")
    // randomized: compare against a driver-side peel
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 4) {
      val n = 6 + rnd.nextInt(10)
      val edges = (for {
        a <- 0 until n; b <- (a + 1) until n if rnd.nextInt(3) == 0
      } yield (a.toLong, b.toLong)).toSeq
      if (edges.nonEmpty) {
        var es = edges.toSet
        var changed = true
        while (changed) {
          val deg = es.toSeq.flatMap(e => Seq(e._1, e._2))
            .groupBy(x => x).map { case (k, v) => k -> v.size }
          val keep = deg.filter(_._2 >= Graph.KCoreK).keySet
          val es2 = es.filter(e => keep(e._1) && keep(e._2))
          changed = es2 != es
          es = es2
        }
        val truth = es.toSeq.flatMap(e => Seq(e._1, e._2))
          .groupBy(x => x).map { case (k, v) => k -> v.size.toLong }
        val got2 = Graph.kCoreOnPairs(edges.toDF("u", "v")).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got2 == truth, s"trial $trial")
      }
    }
  }

  test("d36 on the corpus graph: deterministic across runs, degrees match d03") {
    val sf = SparkTestBase.Sf
    val a = Graph.pageRank(spark, sf).collect()
    val b = Graph.pageRank(spark, sf).collect()
    assert(a.nonEmpty && a.sameElements(b))
    val pairDegs = Dedup.lshJaccardPairs(spark, sf)
      .select("id_a", "id_b").collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1)))
      .groupBy(x => x).map { case (k, v) => k -> v.length.toLong }
    a.foreach { r => assert(r.getLong(1) == pairDegs(r.getLong(0)), s"deg ${r.getLong(0)}") }
  }

  test("graph trio: contracted equals member-level on random family blow-ups") {
    // the d36/d38/d39 exactness claim head-on: for a random rep graph
    // with random family sizes, the weighted-contracted closed forms
    // must equal the plain (f = 1) ops run on the FULL blown-up member
    // graph (family cliques + complete bipartite bundles per rep edge)
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 4) {
      val n = 4 + rnd.nextInt(6)
      val repEdges = (for {
        a <- 0 until n; b <- (a + 1) until n if rnd.nextInt(3) == 0
      } yield (a.toLong, b.toLong)).toSeq
      val fOf = (0 until n).map(i => i.toLong -> (1L + rnd.nextInt(4))).toMap
      def mem(i: Long): Seq[Long] = (0L until fOf(i)).map(k => i * 100 + k)
      val touching = repEdges.flatMap(e => Seq(e._1, e._2)).toSet
      val inGraph = (0L until n.toLong).filter(i => fOf(i) >= 2 || touching(i))
      if (inGraph.nonEmpty) {
        val memberEdges =
          repEdges.flatMap { case (a, b) =>
            for (x <- mem(a); y <- mem(b)) yield (math.min(x, y), math.max(x, y)) } ++
          inGraph.flatMap { i =>
            val m = mem(i)
            for (ai <- m.indices; bi <- (ai + 1) until m.size) yield (m(ai), m(bi)) }
        val verts = inGraph.map(i => (i * 100, fOf(i))).toDF("id", "f")
        val edges =
          (if (repEdges.nonEmpty) repEdges.map { case (a, b) => (a * 100, b * 100) }
           else Seq.empty[(Long, Long)]).toDF("u", "v")
        def asMap(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Any]] =
          df.collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
        def expand(rep: Map[Long, Seq[Any]]): Map[Long, Seq[Any]] =
          rep.flatMap { case (id, vals) => mem(id / 100).map(_ -> vals) }
        if (memberEdges.nonEmpty) {
          // PageRank
          val prC = asMap(Graph.pageRankContracted(verts, edges))
          val prM = asMap(Graph.pageRankOnPairs(memberEdges.toDF("u", "v")))
          assert(expand(prC) == prM, s"trial $trial pagerank")
          // Triangles
          val trC = asMap(Graph.trianglesContracted(verts, edges))
          val trM = asMap(Graph.trianglesOnPairs(memberEdges.toDF("u", "v")))
          assert(expand(trC) == trM, s"trial $trial triangles")
          // k-core
          val kcC = asMap(Graph.kCoreContracted(verts, edges)._1
            .select("id", "core_deg"))
          val kcM = asMap(Graph.kCoreOnPairs(memberEdges.toDF("u", "v")))
          assert(expand(kcC) == kcM, s"trial $trial kcore")
        }
      }
    }
  }

  test("d41: contracted LPA equals a member-level replay on random family blow-ups") {
    // independent reference model: synchronous majority-vote LPA over
    // the explicit member graph, initial label = family representative
    def lpaMember(edges: Seq[(Long, Long)], init: Map[Long, Long]): Map[Long, Long] = {
      val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      var lab = init
      for (_ <- 1 to Graph.LpaRounds)
        lab = adj.map { case (v, ns) =>
          val votes = ns.groupBy(lab).view.mapValues(_.size)
          v -> votes.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
        } ++ (init.keySet -- adj.keySet).map(v => v -> lab(v))
      lab
    }
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 4) {
      val n = 4 + rnd.nextInt(6)
      val repEdges = (for {
        a <- 0 until n; b <- (a + 1) until n if rnd.nextInt(3) == 0
      } yield (a.toLong, b.toLong)).toSeq
      val fOf = (0 until n).map(i => i.toLong -> (1L + rnd.nextInt(4))).toMap
      def mem(i: Long): Seq[Long] = (0L until fOf(i)).map(k => i * 100 + k)
      val touching = repEdges.flatMap(e => Seq(e._1, e._2)).toSet
      val inGraph = (0L until n.toLong).filter(i => fOf(i) >= 2 || touching(i))
      if (inGraph.nonEmpty) {
        val memberEdges =
          repEdges.flatMap { case (a, b) =>
            for (x <- mem(a); y <- mem(b)) yield (x, y) } ++
          inGraph.flatMap { i =>
            val m = mem(i)
            for (ai <- m.indices; bi <- (ai + 1) until m.size) yield (m(ai), m(bi)) }
        if (memberEdges.nonEmpty) {
          val verts = inGraph.map(i => (i * 100, fOf(i))).toDF("id", "f")
          val edges =
            (if (repEdges.nonEmpty) repEdges.map { case (a, b) => (a * 100, b * 100) }
             else Seq.empty[(Long, Long)]).toDF("u", "v")
          val contracted = Graph.lpaContracted(verts, edges).collect()
            .map(r => r.getLong(0) -> r.getLong(1)).toMap
          val expanded = contracted.flatMap { case (id, lab) => mem(id / 100).map(_ -> lab) }
          val init = inGraph.flatMap(i => mem(i).map(_ -> i * 100)).toMap
          assert(expanded == lpaMember(memberEdges, init), s"trial $trial lpa")
        }
      }
    }
  }

  /** Driver-side brute force for d53 on a plain (f = 1) graph. */
  private def linkPredictTruth(edges: Seq[(Long, Long)])
      : Map[(Long, Long), (Long, Long, Boolean, Double)] = {
    val es = edges.toSet
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val deg = adj.view.mapValues(_.size.toLong).toMap
    val verts = adj.keys.toSeq.sorted
    (for {
      ai <- verts.indices; bi <- (ai + 1) until verts.size
      a = verts(ai); b = verts(bi)
      common = adj(a) intersect adj(b)
      if common.nonEmpty
    } yield {
      val cn = common.size.toLong
      val snd = common.toSeq.map(deg).sum
      (a, b) -> (cn, snd, es.contains((a, b)), cn.toDouble / snd)
    }).toMap
  }

  test("d53 link prediction matches a brute-force enumeration on random graphs") {
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 1 to 5) {
      val n = 5 + rnd.nextInt(12)
      val edges = (for {
        a <- 0 until n; b <- (a + 1) until n if rnd.nextInt(3) == 0
      } yield (a.toLong, b.toLong)).toSeq
      if (edges.nonEmpty) {
        val got = Graph.linkPredictOnPairs(edges.toDF("u", "v")).collect()
          .map(r => (r.getLong(0), r.getLong(1)) ->
            (r.getLong(2), r.getLong(3), r.getBoolean(4), r.getDouble(5))).toMap
        assert(got == linkPredictTruth(edges), s"trial $trial (n=$n m=${edges.size})")
      }
    }
  }

  test("d53: contracted equals member-level on random family blow-ups") {
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 1 to 4) {
      val n = 4 + rnd.nextInt(6)
      val repEdges = (for {
        a <- 0 until n; b <- (a + 1) until n if rnd.nextInt(3) == 0
      } yield (a.toLong, b.toLong)).toSeq
      val fOf = (0 until n).map(i => i.toLong -> (1L + rnd.nextInt(4))).toMap
      def mem(i: Long): Seq[Long] = (0L until fOf(i)).map(k => i * 100 + k)
      val touching = repEdges.flatMap(e => Seq(e._1, e._2)).toSet
      val inGraph = (0L until n.toLong).filter(i => fOf(i) >= 2 || touching(i))
      if (inGraph.nonEmpty) {
        val memberEdges =
          repEdges.flatMap { case (a, b) =>
            for (x <- mem(a); y <- mem(b)) yield (math.min(x, y), math.max(x, y)) } ++
          inGraph.flatMap { i =>
            val m = mem(i)
            for (ai <- m.indices; bi <- (ai + 1) until m.size) yield (m(ai), m(bi)) }
        if (memberEdges.nonEmpty) {
          val verts = inGraph.map(i => (i * 100, fOf(i))).toDF("id", "f")
          val edges =
            (if (repEdges.nonEmpty) repEdges.map { case (a, b) => (a * 100, b * 100) }
             else Seq.empty[(Long, Long)]).toDF("u", "v")
          val members = inGraph.flatMap(i => mem(i).map(m => (i * 100, m)))
            .toDF("rep", "doc_id")
          def rows(df: org.apache.spark.sql.DataFrame) =
            df.collect().map(r => (r.getLong(0), r.getLong(1)) ->
              (r.getLong(2), r.getLong(3), r.getBoolean(4), r.getDouble(5))).toMap
          val contracted = rows(Graph.linkPredictCore(verts, edges, members))
          val memberLevel = rows(Graph.linkPredictOnPairs(memberEdges.toDF("u", "v")))
          assert(contracted == memberLevel, s"trial $trial link-predict blow-up")
        }
      }
    }
  }

  test("d53 on the corpus graph: deterministic; is_edge exactly marks d03 pairs") {
    val sf = SparkTestBase.Sf
    val a = Graph.linkPredict(spark, sf).collect()
    val b = Graph.linkPredict(spark, sf).collect()
    assert(a.nonEmpty && a.sameElements(b))
    val d03 = Dedup.lshJaccardPairs(spark, sf)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    a.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(r.getBoolean(4) == d03.contains(key), s"is_edge($key)")
      assert(r.getLong(2) >= 1L, s"cn($key)")
    }
  }

  test("d54 modularity: hand-checked partition values; corpus totals bounded") {
    // two triangles joined by one bridge — sync LPA with min-label
    // ties: {1,2,3} keeps 1; bridge vertex 4 adopts 3 (neighbors'
    // labels {3,5,6}, all count 1, min wins) and drags {5,6} with it.
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L), (4L, 6L), (5L, 6L))
    val verts = pairs.flatMap(e => Seq(e._1, e._2)).distinct.map(v => (v, 1L)).toDF("id", "f")
    val got = {
      // inline f=1 modularity via the same building blocks the corpus
      // path uses: LPA labels + per-community masses
      val lab = Graph.lpaContracted(verts, pairs.toDF("u", "v"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      lab
    }
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 3L, 6L -> 3L), s"lpa $got")
    // corpus-level: Σ e_in ≤ m implies Σ q_part < 1; each q_part ≥ -0.25
    val out = Graph.modularity(spark, SparkTestBase.Sf).collect()
    assert(out.nonEmpty)
    val comms = Graph.labelPropagation(spark, SparkTestBase.Sf)
      .select("community").distinct().count()
    assert(out.length == comms, "one row per d41 community")
    val qTotal = out.map(_.getDouble(4)).sum
    assert(qTotal > -0.5 && qTotal < 1.0, s"modularity total $qTotal out of range")
    out.foreach { r =>
      assert(r.getLong(1) >= 1 && r.getLong(2) >= 0 && r.getLong(3) >= 1,
        s"community ${r.getLong(0)} masses")
    }
    // determinism
    val again = Graph.modularity(spark, SparkTestBase.Sf).collect()
    assert(out.sameElements(again))
  }

  test("d66 conductance: exact identities against d54's masses") {
    val cond = Graph.conductance(spark, SparkTestBase.Sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    val mod = Graph.modularity(spark, SparkTestBase.Sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(cond.keySet == mod.keySet && cond.nonEmpty)
    // vol sums to 2m (every member-edge endpoint counted once)
    val vols = cond.values.map(_.getLong(2)).sum
    assert(vols % 2 == 0, "Σvol must be even (= 2m)")
    val m = vols / 2
    // Σcut double-counts each cross-community edge, so it is even too
    assert(cond.values.map(_.getLong(3)).sum % 2 == 0)
    cond.foreach { case (c, r) =>
      val (nm, vol, cut) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val md = mod(c)
      assert(nm == md.getLong(1), s"community $c n_members")
      // cut = d_sum − 2·e_in, vol = d_sum — the shared-masses identity
      assert(vol == md.getLong(3), s"community $c vol")
      assert(cut == md.getLong(3) - 2 * md.getLong(2), s"community $c cut")
      val denom = math.min(vol, 2 * m - vol)
      if (denom > 0) {
        assert(r.getDouble(4) == cut.toDouble / denom, s"community $c phi")
        assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0, s"community $c range")
      } else assert(r.isNullAt(4), s"community $c degenerate phi")
    }
    // the near-dup graph has real clusters: some boundary must be tight
    assert(cond.values.exists(_.getLong(3) == 0L), "expected at least one zero-cut community")
  }

  test("k-core engine loop runs past the oracle unroll bound (deep peel chain)") {
    // P_n^2 (path square) peels one vertex per end per round at k = 3 —
    // a 44-vertex chain needs ~21 rounds, far past KCoreRounds = 12.
    // The ENGINE must complete (the bound is an oracle artifact gated
    // only in the d39 query path); survivors = the attached K5 only.
    val n = 44
    val chain = (0 until n).flatMap { i =>
      Seq(i + 1, i + 2).filter(_ < n).map(j => (i.toLong, j.toLong))
    }
    val k5 = for (a <- 1000 until 1005; b <- (a + 1) until 1005)
      yield (a.toLong, b.toLong)
    val (rep, rounds) = Graph.kCoreContracted(
      (chain ++ k5).flatMap(e => Seq(e._1, e._2)).distinct.map(v => (v, 1L)).toDF("id", "f"),
      (chain ++ k5).toDF("u", "v"))
    assert(rounds > Graph.KCoreRounds, s"expected a deep peel, got $rounds rounds")
    val got = rep.select("id", "core_deg").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (1000L until 1005L).map(_ -> 4L).toMap, s"got $got")
  }
}
