package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Seed-sweep matrix for the declared-✗ (no-oracle) approximate rows
  * (SURVEY §2 carve-out): every planted-pair / tolerance claim is
  * asserted under THREE distinct fixture seeds, so a claim that only
  * holds for one lucky fixture rots loudly, not silently. Streaming
  * ✗-rows (evt_threshold_alerts, evt_watermark_late) are exempt by
  * construction — their MemoryStream specs exercise deterministic
  * event-time logic with no randomized fixture to sweep.
  *
  * Fixtures are seeded deterministic functions (sin-mixed), never
  * RNG state — the matrix is reproducible run to run. */
class SeedSweepSpec extends AnyFunSuite {
  import TestSpark.spark

  private val Seeds = Seq(11, 42, 97)

  private def words(seed: Int, n: Int): IndexedSeq[String] =
    (0 until n).map(i => s"w${(math.sin(seed * 1000.0 + i) * 1e6).toLong}")

  private def vec(seed: Int, i: Int): Array[Float] =
    (0 until 64).map(d => math.sin(seed * 1e4 + i * 64.0 + d).toFloat).toArray

  for (seed <- Seeds) {

    test(s"llm_dedup_near [seed=$seed]: planted near-dup recalled, unrelated not paired") {
      import spark.implicits._
      val base = words(seed, 60)
      val near = base.updated(30, "CHANGED").mkString(" ")
      val other = words(seed + 500, 60).mkString(" ")
      val pairs = graft.ops.LlmOps.nearDupPairs(
        Seq((1L, base.mkString(" ")), (2L, near), (3L, other))
          .toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(pairs.sameElements(Array((1L, 2L))), s"got ${pairs.mkString(",")}")
    }

    test(s"llm_dedup_simhash [seed=$seed]: identical always pairs; small edit recalled on long docs") {
      import spark.implicits._
      // Identical docs (Hamming 0, all bands equal) MUST pair — the
      // unconditional half of the contract.
      val t = words(seed + 900, 60).mkString(" ")
      val same = graft.ops.LlmOps2.simhashPairs(
        Seq((1L, t), (2L, t)).toDF("doc_id", "text"), maxHamming = 3)
        .collect()
      assert(same.length == 1 && same(0).getInt(2) == 0,
        s"identical docs not paired: ${same.mkString(",")}")
      // One edited word in a 300-word doc: per-bit majority margins
      // are ~sqrt(300), so a single token flips only near-tied bits —
      // few enough that a 16-bit band survives intact across the
      // sweep. (At 80 words the margins are thin and banding recall
      // genuinely fails for some seeds — the documented LSH recall
      // trade, NOT a fixture for this test.)
      val base = words(seed, 300)
      val near = base.updated(150, "CHANGED").mkString(" ")
      val pairs = graft.ops.LlmOps2.simhashPairs(
        Seq((1L, base.mkString(" ")), (2L, near)).toDF("doc_id", "text"),
        maxHamming = 16).collect()
      assert(pairs.length == 1 && pairs(0).getInt(2) <= 16,
        s"near-dup not recalled: ${pairs.mkString(",")}")
    }

    test(s"llm_simsearch_ann [seed=$seed]: planted duplicates recalled at cos 1.0") {
      import spark.implicits._
      val corpus = (0 until 40).map(i => (i.toLong, vec(seed, i)))
      val planted = Seq(0, 7, 21).map(q => (1000L + q, vec(seed, q)))
      val got = graft.ops.LlmOps2.annTopK(
        (corpus ++ planted).toDF("vec_id", "embedding"),
        col("vec_id").isin(0L, 7L, 21L), k = 5)
        .collect().groupBy(_.getLong(0))
      Seq(0L, 7L, 21L).foreach { q =>
        val hits = got.getOrElse(q, Array.empty)
        assert(hits.exists(r => r.getLong(1) == 1000L + q && r.getDouble(2) == 1.0),
          s"planted duplicate of $q not recalled: ${hits.mkString(",")}")
      }
    }

    test(s"llm_simsearch_ivf [seed=$seed]: planted duplicates recalled in-cell") {
      import spark.implicits._
      val corpus = (0 until 300).map(i => (i.toLong, vec(seed, i)))
      val planted = Seq(0, 97, 200).map(q => (1000L + q, vec(seed, q)))
      val got = graft.ops.LlmOps3.ivfTopK(
        (corpus ++ planted).toDF("vec_id", "embedding"),
        col("vec_id").isin(0L, 97L, 200L), k = 5)
        .collect().groupBy(_.getLong(0))
      Seq(0L, 97L, 200L).foreach { q =>
        val hits = got.getOrElse(q, Array.empty)
        assert(hits.exists(r => r.getLong(1) == 1000L + q && r.getDouble(2) == 1.0),
          s"planted duplicate of $q not recalled: ${hits.mkString(",")}")
      }
    }

    test(s"hll approx-distinct [seed=$seed]: within 5% on a seeded key space") {
      import spark.implicits._
      // ~3k rows over a seed-dependent number of distinct keys
      val nKeys = 500 + 150 * (seed % 7)
      val df = (0 until 3000)
        .map(i => (math.abs((math.sin(seed + i) * 1e6).toLong) % nKeys))
        .toDF("k")
      val approx = df.agg(approx_count_distinct(col("k")))
        .collect()(0).getLong(0)
      val exact = df.agg(countDistinct(col("k"))).collect()(0).getLong(0)
      assert(math.abs(approx - exact).toDouble / exact < 0.05,
        s"approx=$approx exact=$exact")
    }

    test(s"approx percentile [seed=$seed]: within 2% of exact") {
      import spark.implicits._
      val df = (0 until 4000)
        .map(i => math.abs(math.sin(seed * 3.0 + i)) * 1000.0 + 1.0)
        .toDF("v")
      val Array(a50, a99) = df
        .agg(expr("approx_percentile(v, array(0.5, 0.99), 10000)"))
        .collect()(0).getSeq[Double](0).toArray
      val Array(e50, e99) = df
        .agg(expr("percentile(v, array(0.5, 0.99))"))
        .collect()(0).getSeq[Double](0).toArray
      assert(math.abs(a50 - e50) / e50 < 0.02, s"p50 approx=$a50 exact=$e50")
      assert(math.abs(a99 - e99) / e99 < 0.02, s"p99 approx=$a99 exact=$e99")
    }

    test(s"count-min [seed=$seed]: never under-estimates, over by <= eps*N") {
      import spark.implicits._
      // zipf-ish skew so the sweep exercises heavy and light keys
      val rows = (0 until 5000).map { i =>
        val u = math.abs(math.sin(seed * 7.0 + i))
        (math.pow(u, 3) * 100).toLong
      }
      val df = rows.toDF("k")
      val bytes = df
        .agg(expr(s"count_min_sketch(k, 0.001d, 0.99d, $seed)"))
        .collect()(0).getAs[Array[Byte]](0)
      val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(bytes))
      val exact = rows.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
      val n = rows.size
      exact.foreach { case (k, c) =>
        val est = cms.estimateCount(k)
        assert(est >= c, s"key $k: est $est < exact $c")
        assert(est <= c + (0.001 * n).toLong + 1,
          s"key $k: est $est exceeds exact $c + eps*N")
      }
    }

    test(s"hash sampling [seed=$seed]: deterministic and rate-correct per salt") {
      import spark.implicits._
      val ids = (0L until 5000L).toDF("id")
      // salt plays the sweep seed: the md5-prefix keep set must be
      // identical across reruns and ~16% ("28"/"ff" + 1) of the keys
      val keep = graft.ops.LlmOps4.hashKeep(
        concat(lit(s"salt$seed-"), col("id")), "28")
      val a = ids.filter(keep).collect().map(_.getLong(0)).toSeq
      val b = ids.filter(keep).collect().map(_.getLong(0)).toSeq
      assert(a == b, "hash sample not deterministic across reruns")
      val expect = 5000.0 * 0x29 / 256.0
      val sd = math.sqrt(5000.0 * (0x29 / 256.0) * (1 - 0x29 / 256.0))
      assert(math.abs(a.size - expect) < 5 * sd,
        s"sampled ${a.size}, expected ~$expect")
    }

    test(s"multimodal byte stats [seed=$seed]: stub decode is length/content exact") {
      import spark.implicits._
      val docs = (0 until 20).map { i =>
        val text = words(seed + i, 5 + (i % 9)).mkString(" ")
        (i.toLong, text, "en", text.length.toLong)
      }
      val out = graft.ops.LlmOps2.multimodalBinary(
        docs.toDF("doc_id", "text", "lang", "n_chars")).collect()
      assert(out.length == docs.length)
      val byId = docs.map(d => d._1 -> d._2.getBytes("UTF-8")).toMap
      out.foreach { r =>
        val expectBytes = byId(r.getLong(0))
        assert(r.getInt(1) == expectBytes.length, s"n_bytes wrong for $r")
        val expectHead =
          expectBytes.take(8).map(b => f"${b & 0xff}%02x").mkString
        assert(r.getString(3) == expectHead, s"head hex wrong for $r")
      }
    }
  }
}
