package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The public facade compiles to the same results as the underlying
  * operators. */
class GraftFacadeSpec extends AnyFunSuite {
  import TestSpark.spark

  test("facade: cosine and asOfProbe evaluate as library columns") {
    import spark.implicits._
    val r = Seq((Array(1f, 0f), Array(1f, 0f), Array(1L, 5L, 9L), 6L))
      .toDF("a", "b", "arr", "key")
      .select(Graft.cosine(col("a"), col("b")).as("cos"),
        Graft.asOfProbe(col("arr"), col("key")).as("asof"))
      .collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12 && r.getLong(1) == 5L)
  }

  test("facade: exactDedupSurvivors keeps one key per distinct payload") {
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "text")
    val survivors = Graft.exactDedupSurvivors(df, col("id"), col("text"))
      .collect().map(_.getLong(0)).sorted
    assert(survivors.sameElements(Array(1L, 3L)))
  }

  test("facade: nearDuplicates delegates to the LSH pipeline") {
    import spark.implicits._
    val t = (0 until 40).map(i => s"f$i").mkString(" ")
    val out = Graft.nearDuplicates(Seq((1L, t), (2L, t)).toDF("doc_id", "text"))
    assert(out.count() == 1)
  }

  test("facade: seenFilter returns exactly the seen ∩ incoming keys") {
    import spark.implicits._
    val seen = Seq(1L, 3L, 5L).toDF("k")
    val incoming = Seq(2L, 3L, 4L, 5L).toDF("k")
    val got = Graft.seenFilter(seen, incoming, "k")
      .collect().map(_.getLong(0)).sorted
    assert(got.sameElements(Array(3L, 5L)))
  }

  test("facade: decontaminate flags the doc sharing a 5-gram with eval") {
    import spark.implicits._
    val evalDoc = (0 until 20).map(i => s"e$i").mkString(" ")
    val contaminated = "x y " + (5 until 10).map(i => s"e$i").mkString(" ") + " z"
    val clean = (0 until 20).map(i => s"c$i").mkString(" ")
    val docs = Seq((0L, evalDoc), (1L, contaminated), (2L, clean))
      .toDF("doc_id", "text")
    val got = Graft.decontaminate(docs, col("doc_id") === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sameElements(Array((1L, 1L))), s"got ${got.mkString(",")}")
  }

  test("facade: domainMix caps every source at the smallest source count") {
    import spark.implicits._
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"), (5L, "b"), (6L, "c"))
      .toDF("doc_id", "source")
    val got = Graft.domainMix(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // min source count = 1 (c) -> each source keeps its single lowest id
    assert(got.sameElements(Array(("a", 1L, 1L), ("b", 1L, 4L), ("c", 1L, 6L))),
      s"got ${got.mkString(",")}")
  }

  test("facade: repetitionScore ranks the repetitive doc first") {
    import spark.implicits._
    val repetitive = Seq.fill(10)("spam spam").mkString(" ")
    val varied = (0 until 20).map(i => s"v$i").mkString(" ")
    val got = Graft.repetitionScore(
      Seq((1L, repetitive), (2L, varied)).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    // full per-doc surface (no top-k cap in the library op)
    assert(got.size == 2)
    assert(got(1L) > 0.4 && got(2L) < 0.1, s"got $got")
  }

  test("facade: bandJoin finds pairs within the band and rejects disjoint column names") {
    import spark.implicits._
    val l = Seq((1L, 100L), (2L, 250L)).toDF("l_id", "l_t")
    val r = Seq((1L, 149L), (1L, 151L), (2L, 500L)).toDF("r_id", "r_t")
    val got = Graft.bandJoin(l, r, "l_id", "r_id", "l_t", "r_t", width = 50L)
      .collect().map(row => (row.getLong(0), row.getLong(3))).sorted
    // key 1: |100-149|<=50 and |100-151|>50; key 2: |250-500|>50
    assert(got.sameElements(Array((1L, 149L))), s"got ${got.mkString(",")}")
    intercept[IllegalArgumentException] {
      Graft.bandJoin(l, l, "l_id", "l_id", "l_t", "l_t", 50L)
    }
  }

  test("facade: semDedup collapses a planted near-identical pair within a cluster") {
    import spark.implicits._
    val v = Seq(
      (1L, 0, Array(1f, 0f, 0f)), (2L, 0, Array(0.999f, 0.01f, 0f)), // dup pair
      (3L, 0, Array(0f, 1f, 0f)),                                    // same cluster, far
      (4L, 1, Array(1f, 0f, 0f))                                     // other cluster
    ).toDF("vec_id", "label", "embedding")
    val got = Graft.semDedup(v, "vec_id", "label", "embedding", threshold = 0.95)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(got === Map(1L -> (1L, true), 2L -> (1L, false),
      3L -> (3L, true), 4L -> (4L, true)), s"got $got")
  }

  test("facade: docChunks strides with overlap and keeps empty docs") {
    import spark.implicits._
    val docs = Seq((1L, "abcdefghij"), (2L, "")).toDF("doc_id", "text")
    val got = Graft.docChunks(docs, "doc_id", "text", width = 5, stride = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    assert(got.sameElements(Array(
      (1L, 0L, "abcde"), (1L, 4L, "efghi"), (1L, 8L, "ij"), (2L, 0L, ""))),
      s"got ${got.mkString(",")}")
  }

  test("facade: latestByKey keeps exactly the greatest row per key") {
    import spark.implicits._
    val df = Seq((1L, 10L, "old"), (1L, 20L, "new"), (2L, 5L, "only"))
      .toDF("k", "ord", "v")
    val got = Graft.latestByKey(df, Seq("k"), Seq("ord"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(got === Map(1L -> (20L, "new"), 2L -> (5L, "only")))
  }

  test("facade: bm25 ranks term-dense docs above sparse ones, zero without terms") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark spark filler filler"),
      (2L, "spark filler filler filler filler"),
      (3L, "filler filler filler filler filler")).toDF("doc_id", "text")
    val got = Graft.bm25(docs, "doc_id", "text", Seq("spark"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) > got(2L), s"tf monotonicity lost: $got")
    assert(got(2L) > 0.0 && got(3L) == 0.0, s"got $got")
  }

  test("facade: rrfFuse computes exact reciprocal-rank sums with absent-rank zeros") {
    import spark.implicits._
    val a = Seq((1L, 0.9), (2L, 0.8), (3L, 0.7)).toDF("id", "score")
    val b = Seq((2L, 0.99), (4L, 0.5)).toDF("id", "score")
    val got = Graft.rrfFuse(a, b, "id", "score", k = 60, topN = 100)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def r(n: Int) = 1.0 / (60.0 + n)
    assert(got(1L) == math.rint(r(1) * 1e6) / 1e6)
    assert(got(2L) == math.rint((r(2) + r(1)) * 1e6) / 1e6)
    assert(got(3L) == math.rint(r(3) * 1e6) / 1e6)
    assert(got(4L) == math.rint(r(2) * 1e6) / 1e6)
  }

  test("facade: dupSpanFraction honours the span width") {
    import spark.implicits._
    // docs share a 4-token prefix but no 5-token span
    val docs = Seq(
      (1L, "a b c d x y z w v"),
      (2L, "a b c d q r s t u")).toDF("doc_id", "text")
    val at4 = Graft.dupSpanFraction(docs, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val at5 = Graft.dupSpanFraction(docs, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(at4(1L) > 0.0 && at4(2L) > 0.0, s"shared 4-span missed: $at4")
    assert(at5(1L) == 0.0 && at5(2L) == 0.0, s"phantom 5-span: $at5")
  }

  test("facade: connectedComponents + hashSampleKeep behave as the library ops") {
    import spark.implicits._
    val cc = Graft.connectedComponents(Seq((5L, 9L), (9L, 7L)).toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(5L -> 5L, 9L -> 5L, 7L -> 5L))
    val docs = (1L to 200L).toDF("id")
    val kept = docs.filter(Graft.hashSampleKeep(col("id"), "28")).count()
    // ~16% expected; a pure row property, so the exact count is stable
    assert(kept == docs.filter(Graft.hashSampleKeep(col("id"), "28")).count())
    assert(kept > 5 && kept < 80, s"kept $kept of 200")
  }

  test("facade: pageRank on a known 3-node chain distributes mass as expected") {
    import spark.implicits._
    // symmetric triangle: uniform stationary distribution, each ~1/3
    val tri = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L), (3L, 1L))
      .toDF("src", "dst")
    val r = Graft.pageRank(tri, iterations = 10).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    r.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-9, r.toString))
    // star 1 <-> {2,3}: the hub accumulates more mass than the leaves
    val star = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L)).toDF("src", "dst")
    val sr = Graft.pageRank(star, iterations = 20).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(sr(1L) > sr(2L) && math.abs(sr(2L) - sr(3L)) < 1e-9, sr.toString)
    // directed chain 1->2->3: the sink node 3 must surface (node set
    // is src ∪ dst) and accumulate more than the source it drains
    val chain = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val cr = Graft.pageRank(chain, iterations = 10).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(cr.keySet == Set(1L, 2L, 3L), cr.toString)
    assert(cr(3L) > cr(2L) && cr(2L) > cr(1L), cr.toString)
  }

  test("facade: standardize and tokenEntropy are the library forms of the ops") {
    import spark.implicits._
    val vecs = Seq((1L, Array(1f, 10f)), (2L, Array(3f, 30f)))
      .toDF("id", "vec")
    val z = Graft.standardize(vecs, "id", "vec").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // two points standardize to ±1 in every dimension
    assert(z(1L) == Seq(-1.0, -1.0) && z(2L) == Seq(1.0, 1.0), z.toString)
    val docs = Seq((1L, "a a a a"), (2L, "a b c d")).toDF("id", "text")
    val h = Graft.tokenEntropy(docs, "id", "text").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(h(1L) == 0.0, s"uniform-token doc must have zero entropy: $h")
    assert(math.abs(h(2L) - 2.0) < 1e-6, s"4 distinct tokens -> 2 bits: $h")
  }

  test("facade: kmeansStep assigns by cosine and re-averages members") {
    import spark.implicits._
    // two orthogonal directions; seeds are one point from each
    val vecs = Seq(
      (1L, Array(1f, 0f)), (2L, Array(2f, 0f)), (3L, Array(4f, 0f)),
      (4L, Array(0f, 1f)), (5L, Array(0f, 3f)))
      .toDF("id", "vec")
    val seeds = Seq((0L, Array(1f, 0f)), (1L, Array(0f, 1f))).toDF("cid", "cvec")
    val out = Graft.kmeansStep(vecs, "id", "vec", seeds).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[Double](2)))).toMap
    assert(out(0L)._1 == 3 && out(1L)._1 == 2, out.toString)
    // cluster 0 mean = ((1+2+4)/3, 0); cluster 1 mean = (0, (1+3)/2)
    assert(math.abs(out(0L)._2.head - 7.0 / 3) < 1e-6 && out(0L)._2(1) == 0.0,
      out.toString)
    assert(out(1L)._2 == Seq(0.0, 2.0), out.toString)
    // the documented iteration loop: double-typed centroids feed back
    val step1 = Graft.kmeansStep(vecs, "id", "vec", seeds)
    val step2 = Graft.kmeansStep(vecs, "id", "vec",
      step1.select(col("cid"), col("centroid").as("cvec"))).collect()
    // orthogonal clusters are stable: same membership on iteration 2
    assert(step2.map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(0L -> 3L, 1L -> 2L), step2.mkString(","))
  }

  test("facade: corrMatrix recovers exact +/-1 on linear columns") {
    import spark.implicits._
    val df = Seq((1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0))
      .toDF("x", "y", "z")
    val m = Graft.corrMatrix(df, Seq(
      "x" -> "CAST(x AS DECIMAL(10,2))",
      "y" -> "CAST(y AS DECIMAL(10,2))",
      "z" -> "CAST(z AS DECIMAL(10,2))")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m.keySet == Set("x_y", "x_z", "y_z"), m.toString)
    assert(m("x_y") == 1.0 && m("x_z") == -1.0 && m("y_z") == -1.0, m.toString)
  }

  test("facade: shortestPathHistogram and egoSizes are the library graph ops") {
    import spark.implicits._
    // 0-1-2-3 chain, seed node 0: distances 0,1,2 then -1 beyond 2
    // hops; ego sizes for node 0 are |{1}| and |{1,2}|.
    val half = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    val edges = half.union(half.select(col("dst"), col("src")))
    val hist = Graft.shortestPathHistogram(edges, n => n === 0, maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hist == Map(-1L -> 1L, 0L -> 1L, 1L -> 1L, 2L -> 1L), hist.toString)
    val ego = Graft.egoSizes(edges, n => n === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(ego == Seq((0L, 1L, 2L)), ego.toString)
  }
}
