package graft

import org.apache.spark.sql.functions._

/** Vector similarity kernels (SURVEY.md §2.3 x01): higher-order-function
  * dot/norm/cosine and the broadcast brute-force top-k.
  */
class VectorSpec extends SparkSuite {
  import ops.Vector
  import spark.implicits._

  test("dot and l2Norm on known vectors") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
    val r = df.select(
      Vector.dot(col("a"), col("b")).as("dot"),
      Vector.l2Norm(col("a")).as("na")).collect().head
    assert(math.abs(r.getDouble(0) - 32.0) < 1e-9)
    assert(math.abs(r.getDouble(1) - math.sqrt(14.0)) < 1e-9)
  }

  test("cosine: identical = 1, orthogonal = 0, opposite = -1") {
    val df = Seq(
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f), 1.0),
      (Array(1.0f, 0.0f), Array(0.0f, 3.0f), 0.0),
      (Array(1.0f, 2.0f), Array(-1.0f, -2.0f), -1.0)).toDF("a", "b", "want")
    df.select(
      Vector.cosine(col("a"), col("b"),
        Vector.l2Norm(col("a")), Vector.l2Norm(col("b"))).as("cos"),
      col("want")).collect().foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-6)
    }
  }

  test("cosineTopK ranks an exact duplicate first, excludes self") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f)),   // duplicate of probe
      (3L, Array(0.9f, 0.1f, 0.0f)),
      (4L, Array(0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val probes = corpus.filter(col("vec_id") === 1L)
    val out = Vector.cosineTopK(corpus, probes, k = 3)
      .orderBy("rank")
      .select("neighbor_id", "rank").as[(Long, Int)].collect()
    assert(out.map(_._1).toSeq == Seq(2L, 3L, 4L)) // no self (1L)
  }

  test("x01 returns k rows per probe with descending scores at sf0.001") {
    val out = Vector.x01(spark, sf0001)
      .select("probe_id", "rank", "cosine").collect()
    val byProbe = out.groupBy(_.getLong(0))
    assert(byProbe.size == 8)
    byProbe.values.foreach { rows =>
      val scores = rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      assert(scores.size == 10)
      assert(scores == scores.sorted.reverse, "scores must be non-increasing")
    }
  }

  test("simhashBucket: identical vectors collide, bucket is stable") {
    val df = Seq(
      (1L, Array.tabulate(8)(i => (i + 1).toFloat)),
      (2L, Array.tabulate(8)(i => (i + 1).toFloat)),
      (3L, Array.tabulate(8)(i => -(i + 1).toFloat))).toDF("vec_id", "embedding")
    val b = df.select(col("vec_id"),
        Vector.simhashBucket(col("embedding"), dim = 8).as("bucket"))
      .as[(Long, Long)].collect().toMap
    assert(b(1L) == b(2L))
    assert(b(1L) != b(3L)) // opposite vector flips every sign bit
  }
}
