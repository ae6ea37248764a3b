package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.operators.Dedup

/** Property test: both nearDupClusters execution strategies must agree with
  * a naive in-memory transitive closure on arbitrary random graphs — the
  * kind of shape coverage (self-edges, dense blobs, chains, isolated pairs)
  * hand-picked fixtures miss.
  */
class ClusterPropertySpec extends SparkSpec {
  import spark.implicits._

  private def naiveComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra) = rb
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val minOfRoot = nodes.groupBy(find).map { case (r, ns) => r -> ns.min }
    nodes.map(n => n -> minOfRoot(find(n))).toMap
  }

  private val edgeListGen: Gen[List[(Long, Long)]] =
    Gen.choose(1, 40).flatMap { n =>
      Gen.listOfN(n, for {
        a <- Gen.choose(0L, 19L)
        b <- Gen.choose(0L, 19L) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    }.map(_.distinct)

  test("union-find and distributed paths both equal the naive closure") {
    val prop = Prop.forAll(edgeListGen) { edges =>
      edges.isEmpty || {
        val expected = naiveComponents(edges)
        val df = edges.toDF("id_a", "id_b")
        val local = Dedup.nearDupClusters(df)
          .as[(Long, Long)].collect().toMap
        local == expected
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30),
      prop)
    assert(res.passed, res.status.toString)
  }

  test("distributed propagation equals the naive closure on random graphs") {
    val prop = Prop.forAll(edgeListGen) { edges =>
      edges.isEmpty || {
        val expected = naiveComponents(edges)
        val df = edges.toDF("id_a", "id_b")
        val dist = Dedup.nearDupClusters(df, maxIter = 25,
          localEdgeThreshold = 0L)
          .as[(Long, Long)].collect().toMap
        dist == expected
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8),
      prop)
    assert(res.passed, res.status.toString)
  }
}
