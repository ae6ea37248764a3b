package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** PageRank + co-occurrence edge construction: hand-computed ranks on a
  * known graph, mass conservation on symmetric graphs (the no-dangling
  * contract the operator documents), and the group-size cap that keeps
  * per-group pair expansion bounded.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank matches the hand-computed ranks on a 3-node path") {
    // 1—2—3 symmetrized: outdeg 1,2,1; one round from uniform:
    //   r(1) = r(3) = 0.15/3 + 0.85 * (1/3)/2 = 0.19166...
    //   r(2)        = 0.15/3 + 0.85 * (1/3 + 1/3) = 0.61666...
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val r1 = Graph.pageRank(e, "src", "dst", iters = 1)
      .orderBy("node").as[(Long, Double)].collect().toSeq
    val t = 0.15 / 3
    assert(r1.map(_._1) == Seq(1L, 2L, 3L))
    assert(math.abs(r1(0)._2 - (t + 0.85 / 6)) < 1e-12)
    assert(math.abs(r1(1)._2 - (t + 0.85 * 2 / 3)) < 1e-12)
    assert(math.abs(r1(2)._2 - (t + 0.85 / 6)) < 1e-12)
    // zero iterations = the uniform start
    val r0 = Graph.pageRank(e, "src", "dst", iters = 0)
      .select("rank").as[Double].collect()
    assert(r0.length == 3, "vacuity guard: 3 vertices expected")
    assert(r0.forall(r => math.abs(r - 1.0 / 3) < 1e-12))
  }

  test("pageRank conserves mass on a symmetric graph across iterations") {
    // symmetric ⇒ no sinks ⇒ Σrank stays exactly 1 (up to fp noise)
    val rel = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 20L), (4L, 20L),
      (2L, 30L), (4L, 30L), (5L, 30L)).toDF("item", "grp")
    val e = Graph.coOccurrenceEdges(rel, "item", "grp")
    val ranks = Graph.pageRank(e, "src", "dst", iters = 4)
    val s = ranks.agg(sum("rank")).as[Double].collect()(0)
    assert(math.abs(s - 1.0) < 1e-9, s"mass leaked: $s")
    // higher-degree node 1 (two groups) outranks the degree-1 node 5
    val byNode = ranks.as[(Long, Double)].collect().toMap
    assert(byNode(1L) > byNode(5L))
  }

  test("triangleStats: K4 has 4 triangles at clustering 1; a path has none") {
    val k4 = (for { a <- 1 to 4; b <- 1 to 4 if a != b }
      yield (a.toLong, b.toLong)).toDF("src", "dst")
    val r = Graph.triangleStats(k4, "src", "dst").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)) ==
      ((4L, 6L, 4L, 1.0)))
    val p = Graph.triangleStats(
      Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst"), "src", "dst")
      .collect()(0)
    assert(p.getLong(2) == 0L && p.getDouble(3) == 0.0)
  }

  test("triangleStats equals the naive triple closure on random graphs") {
    val rnd = new scala.util.Random(7L)
    for (round <- 1 to 5) {
      val edges = (1 to 40)
        .map(_ => (rnd.nextInt(12).toLong + 1, rnd.nextInt(12).toLong + 1))
        .filter(e => e._1 != e._2)
      val canon = edges
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
      val nodes = canon.toSeq.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val naive = nodes.combinations(3).count { case Seq(x, y, z) =>
        canon((x, y)) && canon((y, z)) && canon((x, z)) }
      val got = Graph.triangleStats(edges.toDF("src", "dst"), "src", "dst")
        .collect()(0).getLong(2)
      assert(got == naive.toLong, s"round $round edges=$canon")
    }
  }

  test("coOccurrenceEdges: symmetric, distinct, size-1 groups silent, cap drops mega-groups") {
    val rel = Seq(
      (1L, 100L), (2L, 100L), (2L, 100L), // dup membership collapses
      (3L, 200L),                         // singleton group: no pairs
      (4L, 300L), (5L, 300L), (6L, 300L)) // triangle
      .toDF("item", "grp")
    val e = Graph.coOccurrenceEdges(rel, "item", "grp")
      .as[(Long, Long)].collect().toSet
    val tri = Set((4L, 5L), (5L, 4L), (4L, 6L), (6L, 4L), (5L, 6L), (6L, 5L))
    assert(e == tri + ((1L, 2L)) + ((2L, 1L)))
    // the cap: the 3-item group vanishes with maxGroupSize=2
    val capped = Graph.coOccurrenceEdges(rel, "item", "grp", maxGroupSize = 2)
      .as[(Long, Long)].collect().toSet
    assert(capped == Set((1L, 2L), (2L, 1L)))
  }

  test("bfsDistances: min hop distance on a known graph, budget respected") {
    // 1→2→3→4→5 path plus a shortcut 1→4; 9 isolated from the seeds
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L), (8L, 9L))
      .toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val d3 = Graph.bfsDistances(e, "src", "dst", seeds, "node", maxHops = 3)
      .as[(Long, Int)].collect().toMap
    // shortcut wins: 4 is at 1 hop, 5 at 2 — and 9 is unreachable
    assert(d3 == Map(1L -> 0, 2L -> 1, 4L -> 1, 3L -> 2, 5L -> 2))
    // hop budget: maxHops = 1 stops at the direct neighbors
    val d1 = Graph.bfsDistances(e, "src", "dst", seeds, "node", maxHops = 1)
      .as[(Long, Int)].collect().toMap
    assert(d1 == Map(1L -> 0, 2L -> 1, 4L -> 1))
    // maxHops = 0 returns exactly the (distinct'd) seed set at 0
    val d0 = Graph.bfsDistances(e, "src", "dst",
      Seq(1L, 1L, 8L).toDF("node"), "node", maxHops = 0)
      .as[(Long, Int)].collect().toMap
    assert(d0 == Map(1L -> 0, 8L -> 0))
  }

  test("bfsDistances: multi-source takes the nearest seed; one row per node") {
    // two seeds converging on 3: from 1 it's 2 hops, from 5 it's 1
    val e = Seq((1L, 2L), (2L, 3L), (5L, 3L), (3L, 6L)).toDF("src", "dst")
    val d = Graph.bfsDistances(e, "src", "dst",
      Seq(1L, 5L).toDF("node"), "node", maxHops = 3)
      .as[(Long, Int)].collect().toSeq
    assert(d.size == d.map(_._1).distinct.size)
    assert(d.toMap == Map(1L -> 0, 5L -> 0, 2L -> 1, 3L -> 1, 6L -> 2))
  }

  test("triangleStatsEstimate: p=1 equals exact; deterministic; accurate and ~unbiased across seeds") {
    // dense-ish random fixture: ~2k nodes, triangle-rich (grouped cliques)
    val edges = (0 until 400).flatMap { g =>
      val members = (0 until 6).map(i => (g * 5 + i * 7) % 2000L)
      for (a <- members; b <- members if a < b) yield (a, b)
    }.toDF("src", "dst")
    val exact = Graph.triangleStats(edges, "src", "dst")
      .select($"n_triangles", $"n_nodes", $"n_edges")
      .as[(Long, Long, Long)].collect()(0)
    assert(exact._1 > 500, s"fixture drift: too few triangles ${exact._1}")
    // p = 1: every edge kept — the estimator degenerates to the census
    val full = Graph.triangleStatsEstimate(edges, "src", "dst", p = 1.0)
      .select($"n_triangles_est", $"n_nodes", $"n_edges")
      .as[(Long, Long, Long)].collect()(0)
    assert(full == exact,
      s"p=1 estimate $full must equal the exact census $exact")
    // deterministic: same seed, same realization
    val e1 = Graph.triangleStatsEstimate(edges, "src", "dst", p = 0.5)
      .select($"n_triangles_est").as[Long].collect()(0)
    val e2 = Graph.triangleStatsEstimate(edges, "src", "dst", p = 0.5)
      .select($"n_triangles_est").as[Long].collect()(0)
    assert(e1 == e2, "hash-coin sampling must be deterministic")
    // accuracy + approximate unbiasedness: across 5 seeds at p=0.5 every
    // realization lands within 25% and the MEAN within 10% (rel-σ ≈
    // √(7/t) ≈ 8% here, so these bars have 3σ headroom)
    val ests = (1L to 5L).map(seed =>
      Graph.triangleStatsEstimate(edges, "src", "dst", p = 0.5, seed = seed)
        .select($"n_triangles_est").as[Long].collect()(0))
    ests.foreach(e => assert(math.abs(e - exact._1) <= 0.25 * exact._1,
      s"seed realization $e outside 25% of exact ${exact._1} ($ests)"))
    val mean = ests.sum.toDouble / ests.size
    assert(math.abs(mean - exact._1) <= 0.10 * exact._1,
      s"mean $mean across seeds outside 10% of exact ${exact._1} ($ests)")
  }
}
