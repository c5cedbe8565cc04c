package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Round14cOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ------------------------------------ personalized PageRank (q163)
  test("personalizedRanks: hand-computed 1 round — teleport only on the seed") {
    // 1→2, 2→{1,3}, 3→2; seed {1}; d=85
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val out = graft.ops.PageRank.personalizedRanks(edges, seeds, iterations = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // r0 = (1e12, 0, 0); node1 (od 1) sends 1e12 to 2; nodes 2,3 send 0
    // r1(1) = tele 150e9 + 0; r1(2) = 0 + 85·1e12 div 100; r1(3) = 0
    assert(out === Array(
      (1L, 150000000000L), (2L, 850000000000L), (3L, 0L)))
  }

  test("personalizedRanks: seeds outside the graph are ignored in the mass split") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val withGhost = graft.ops.PageRank.personalizedRanks(
      edges, Seq(1L, 99L).toDF("id"), iterations = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val clean = graft.ops.PageRank.personalizedRanks(
      edges, Seq(1L).toDF("id"), iterations = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(withGhost === clean)
  }

  test("personalizedRanks: an all-ghost seed set fails fast") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    assertThrows[IllegalArgumentException] {
      graft.ops.PageRank.personalizedRanks(edges, Seq(99L).toDF("id"), 1)
    }
  }

  // ---------------------------------------------------- k-core (q165)
  test("kCore: triangle survives a k=2 peel, the pendant chain dies in order") {
    // triangle a-b-c, chain c-d-e: round 1 peels e (deg 1),
    // round 2 peels d, round 3 stable at the triangle
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e"))
      .toDF("a", "b")
    val out = graft.ops.KCore.kCore(edges, k = 2, rounds = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    assert(out === Array(("a", 2L), ("b", 2L), ("c", 2L)))
    // converged: more rounds change nothing
    val more = graft.ops.KCore.kCore(edges, k = 2, rounds = 6)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    assert(more === out)
  }

  test("kCore: k above the densest core empties the graph") {
    val tri = Seq(("a", "b"), ("b", "c"), ("a", "c")).toDF("a", "b")
    assert(graft.ops.KCore.kCore(tri, k = 3, rounds = 2).count() === 0L)
  }

  // ------------------------------------ bigram surprisal (q164)
  test("bigramSurprisal: hand-computed conditional log2 over transition counts") {
    // d1 "a b a b": pairs (a,b)×2, (b,a)×1; d2 "a c": (a,c)×1
    // pc: (a,b)=2, (b,a)=1, (a,c)=1; lc: a=3, b=1
    // s(a,b) = log2(3 div 2 = 1) = 0; s(b,a) = log2(1) = 0;
    // s(a,c) = log2(3 div 1 = 3) = 1
    val docs = Seq(("d1", "a b a b"), ("d2", "a c"), ("d3", "x"))
      .toDF("doc_id", "text")
    val out = graft.ops.TextStats.bigramSurprisal(docs)
      .orderBy("doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // d3 has no transitions and is absent
    assert(out === Array(("d1", 3L, 0L, 0L), ("d2", 1L, 1L, 100L)))
  }
}
