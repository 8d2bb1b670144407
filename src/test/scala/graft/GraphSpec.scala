package graft

import graft.ops.Graph
import org.scalatest.funsuite.AnyFunSuite

/** Connected-components (Graph / d07) behavior on synthetic graphs where
  * the answer is known by construction.
  */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def cc(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.connectedComponents(nodes.toDF("id"), edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two components, a singleton, duplicate + self edges") {
    val labels = cc(
      nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L),
      // {1,2,3} via 1-2, 2-3 (transitive); {4,5} reversed order; 6-6 self
      edges = Seq((1L, 2L), (3L, 2L), (5L, 4L), (2L, 1L), (6L, 6L)))
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 6L, 7L -> 7L))
  }

  test("empty edge set: every node is its own singleton component") {
    val labels = cc(Seq(5L, 9L, 2L), Seq.empty)
    assert(labels === Map(5L -> 5L, 9L -> 9L, 2L -> 2L))
  }

  test("long path converges to the min endpoint (diameter-round propagation)") {
    val n = 12L
    val labels = cc((1L to n), (1L until n).map(i => (i + 1, i)))
    assert(labels === (1L to n).map(_ -> 1L).toMap)
  }

  test("adversarial diameter: a path FAR longer than the hop budget converges (pointer jump)") {
    // 300-node path, diameter 299, hop budget 20: plain min-label
    // propagation would need 299 hops; the per-hop pointer jump makes
    // propagation distance double per hop, so ~9 hops suffice
    val n = 300L
    val labels = Graph.connectedComponents(
      (1L to n).toDF("id"),
      (1L until n).map(i => (i, i + 1)).toDF("a", "b"),
      maxRounds = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels === (1L to n).map(_ -> 1L).toMap)
  }

  test("2k-node random graph matches an in-memory union-find exactly") {
    val rnd = new scala.util.Random(42)
    val n = 2000
    // ~1500 random edges → a mix of singletons, pairs, chains and blobs
    val edges = Seq.fill(1500)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))

    // reference: classic union-find with path compression
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = (0 until n).map(i => i.toLong -> find(i).toLong).toMap

    val got = cc((0L until n.toLong), edges)
    assert(got === expected)
  }

  test("d07 labels are consistent with the d03 pair graph at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val pairs = SparkEntry.queries("d03_ngram_jaccard")(spark, dir)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1)))
    val labels = SparkEntry.queries("d07_dedup_clusters")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every paired doc shares its cluster with its pair partner
    pairs.foreach { case (a, b) => assert(labels(a) === labels(b), s"pair ($a,$b)") }
    // cluster representative is the min member and is its own label
    labels.groupBy(_._2).foreach { case (comp, members) =>
      assert(members.keys.min === comp)
    }
    // docs in no pair are singletons
    val inPair = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    labels.filterNot(kv => inPair(kv._1)).foreach { case (id, comp) => assert(id === comp) }
    spark.sharedState.cacheManager.clearCache()
  }
}
