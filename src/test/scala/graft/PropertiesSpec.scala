package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5.3), run through the real column
  * expressions on a local session — not a scala-side reimplementation.
  * Generators are raw scalacheck `Gen`s sampled under fixed seeds (the
  * scalatest<->scalacheck bridge artifact is not in the offline cache).
  */
class PropertiesSpec extends SparkSuite {
  import ops.Convert

  private val schema = StructType(Seq(
    StructField("amount", DecimalType(18, 2)),
    StructField("currency", StringType),
    StructField("rate", DoubleType)))

  // 2-dp money amounts in the generator's range (dags/order_generator_dag.py:69)
  private val amounts: Gen[java.math.BigDecimal] =
    Gen.chooseNum(1000L, 100000000L)
      .map(c => java.math.BigDecimal.valueOf(c, 2))

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(fail(s"generator exhausted at seed $seed"))

  private def runExact(rows: Seq[Row]): Seq[java.math.BigDecimal] =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .select(Convert.convertExact(
        col("amount"), col("currency"), col("rate")).as("out"))
      .collect().toSeq.map(_.getDecimal(0))

  test("property: convert(amount, EUR) == amount for any amount/rate") {
    (1L to 10L).foreach { seed =>
      val as   = sample(Gen.listOfN(20, amounts), seed)
      val rate = sample(Gen.chooseNum(0.01, 100.0), seed)
      val out  = runExact(as.map(a => Row(a, "EUR", rate)))
      out.zip(as).foreach { case (o, a) =>
        assert(o.compareTo(a) == 0, s"seed=$seed a=$a out=$o")
      }
    }
  }

  test("property: rate 1.0 (or missing) is the identity on 2-dp amounts") {
    (11L to 20L).foreach { seed =>
      val as = sample(Gen.listOfN(20, amounts), seed)
      val known   = runExact(as.map(a => Row(a, "USD", 1.0)))
      val missing = runExact(as.map(a => Row(a, "ZZZ", null)))
      known.zip(as).foreach { case (o, a) => assert(o.compareTo(a) == 0) }
      missing.zip(as).foreach { case (o, a) => assert(o.compareTo(a) == 0) }
    }
  }

  test("property: round-trip convert(convert(x, r), 1/r) within rounding") {
    (21L to 30L).foreach { seed =>
      val as   = sample(Gen.listOfN(10, amounts), seed)
      val rate = sample(Gen.chooseNum(0.1, 10.0), seed)
      val once = runExact(as.map(a => Row(a, "USD", rate)))
      val back = runExact(once.map(o => Row(o.setScale(2), "USD", 1.0 / rate)))
      back.zip(as).foreach { case (b, a) =>
        // leg 1 rounds a/r by <=0.005; the return leg multiplies that error
        // back by r and adds its own <=0.005 final round
        val bound = 0.005 * (1 + rate) + 0.005
        assert(b.subtract(a).abs.doubleValue <= bound + 1e-9,
          s"seed=$seed a=$a back=$b rate=$rate bound=$bound")
      }
    }
  }

  test("property: rolling_hash kernel == HOF fold on arbitrary unicode") {
    graft.ext.GraftFunctions.ensureRollingHash(spark)
    // full-range strings: BMP text, supplementary planes, line terminators,
    // control chars — far beyond the fixture corpus's ASCII
    val anyString: Gen[String] = Gen.listOf(Gen.frequency[String](
      6 -> Gen.alphaNumChar.map(_.toString),
      2 -> Gen.oneOf('\n', '\r', '\u0085', '\u2028', '\u2029', '\t').map(_.toString),
      2 -> Gen.chooseNum(0x20, 0xFFFD).map(_.toChar.toString),
      1 -> Gen.chooseNum(0x10000, 0x1FFFF).map(cp => new String(Character.toChars(cp)))
    )).map(_.mkString)
    (31L to 40L).foreach { seed =>
      val rows = sample(Gen.listOfN(40, anyString), seed).map(Row(_))
      val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
        StructType(Seq(StructField("t", StringType))))
      df.select(
          call_function("rolling_hash", col("t")).as("native"),
          ops.TextAnalysis.hofRollingHash(col("t")).as("hof"))
        .collect().foreach { r =>
          assert(r.getLong(0) == r.getLong(1),
            s"seed=$seed native=${r.getLong(0)} hof=${r.getLong(1)}")
        }
    }
  }

  test("property: word_ngrams kernel == HOF shingles/ngrams on arbitrary text") {
    graft.ext.GraftFunctions.ensureWordNgrams(spark)
    // adversarial tokenization inputs: repeated/leading/trailing spaces
    // (Spark split keeps empties), mixed case, unicode, short texts
    val word: Gen[String] = Gen.frequency(
      5 -> Gen.alphaNumStr.map(_.take(6)),
      2 -> Gen.const(""),
      1 -> Gen.oneOf("Ünïcødé", "ΣΙΓΜΑ", "ß", " "))
    val text: Gen[String] = Gen.listOf(word).map(_.mkString(" "))
    (71L to 78L).foreach { seed =>
      val rows = sample(Gen.listOfN(30, text), seed).map(Row(_))
      val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
        StructType(Seq(StructField("t", StringType))))
      Seq(1, 2, 3).foreach { n =>
        df.select(
            ops.Text.nativeShingles(col("t"), n).as("ns"),
            ops.Text.shingles(col("t"), n).as("hs"),
            ops.Text.nativeNgrams(col("t"), n).as("ng"),
            ops.Text.ngrams(col("t"), n).as("hg"))
          .collect().foreach { r =>
            assert(r.getSeq[String](0) == r.getSeq[String](1), s"seed=$seed n=$n distinct")
            assert(r.getSeq[String](2) == r.getSeq[String](3), s"seed=$seed n=$n multi")
          }
      }
    }
  }

  test("property: star connected components == min-label propagation on random graphs") {
    import spark.implicits._
    val edgeGen: Gen[(Long, Long)] = for {
      a <- Gen.chooseNum(0L, 39L); b <- Gen.chooseNum(0L, 39L) if a != b
    } yield (a, b)
    (61L to 66L).foreach { seed =>
      val pairs = sample(Gen.listOfN(25, edgeGen), seed)
        .toDF("doc_a", "doc_b")
      val plain = ops.Text.dupComponents(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val star = ops.Text.dupComponentsStar(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(star == plain, s"seed=$seed")
    }
  }

  test("star components finish a 200-node path — beyond plain propagation's round budget") {
    import spark.implicits._
    // diameter 199: min-label propagation moves the label one hop per
    // round (its 20-round cap cannot finish); large-star/small-star
    // contracts the path in O(log n) rounds
    val path = (0L until 199L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val star = ops.Text.dupComponentsStar(path)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star.size == 200 && star.values.forall(_ == 0L),
      "every path node must resolve to component 0")
  }

  test("property: prefix-filtered jaccard join == brute force on random corpora") {
    // small vocabularies force heavy overlap, so thresholds are exercised
    // from both sides; unigram shingles make the expected sets explicit
    val doc: Gen[String] =
      Gen.chooseNum(1, 12).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(0, 19).map(i => s"w$i")).map(_.mkString(" ")))
    (51L to 56L).foreach { seed =>
      val texts = sample(Gen.listOfN(30, doc), seed)
      val rows = texts.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }
      val docs = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2),
        StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
      Seq(0.5, 0.8).foreach { t =>
        val pref = ops.Text.jaccardJoin(docs, shingleN = 1, threshold = t)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        val sets = texts.map(_.split(" ").toSet).zipWithIndex
        val brute = (for {
          (a, i) <- sets; (b, j) <- sets if i < j
          inter = (a intersect b).size
          j2 = inter.toDouble / (a.size + b.size - inter).toDouble
          if j2 >= t
        } yield (i.toLong, j.toLong, j2)).toSet
        assert(pref == brute, s"seed=$seed t=$t pref=${pref.size} brute=${brute.size}")
      }
    }
  }

  test("property: simhash_bucket kernel == HOF planes on random vectors") {
    graft.ext.GraftFunctions.ensureSimHashBucket(spark)
    val dim = 8
    val vec: Gen[Seq[Float]] = Gen.chooseNum(0, dim + 2).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-100.0, 100.0).map(_.toFloat)))
    (41L to 50L).foreach { seed =>
      val rows = sample(Gen.listOfN(30, vec), seed).map(v => Row(v))
      val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
        StructType(Seq(StructField("v", ArrayType(FloatType)))))
      df.select(
          ops.Vector.simhashBucket(col("v"), dim).as("native"),
          ops.Vector.hofSimhashBucket(col("v"), dim).as("hof"))
        .collect().foreach { r =>
          assert(r.getLong(0) == r.getLong(1),
            s"seed=$seed native=${r.getLong(0)} hof=${r.getLong(1)}")
        }
    }
  }

  test("property: map-side IVF assignment == window form on tie-rich corpora") {
    // components drawn from {-1, 0, 1} in dim 4 force many EXACT cosine
    // ties (colinear vectors) plus zero vectors (NaN sims) — the ordering
    // edge cases the sf0.01-corpus pin in VectorSpec never hits. The two
    // forms must agree on (id, cell, sim) exactly, ties broken by cell asc
    // and NaN ranked first, for both n=1 and n=3.
    import spark.implicits._
    val comps = Gen.listOfN(4, Gen.oneOf(-1.0f, 0.0f, 1.0f))
    (61L to 70L).foreach { seed =>
      val vs = sample(Gen.listOfN(24, comps), seed)
        .zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
      val points = vs.toDF("id", "vec")
      val centsDf = points.orderBy("id").limit(8)
        .select(col("id").as("cell"), col("vec").as("cvec"))
      val cents = centsDf.collect().toSeq
        .map(r => (r.get(0): Any, r.getSeq[Float](1)))
      for (n <- Seq(1, 3)) {
        // Double.toString: locale-independent, exact, and NaN-safe (a raw
        // Double tuple compare would fail on NaN != NaN)
        val mapSide = ops.Vector.nearestCells(points, cents, n)
          .select("id", "cell", "sim").collect()
          .map(r => (r.getLong(0), r.getLong(1),
            java.lang.Double.toString(r.getDouble(2)))).sorted.toSeq
        val shuffle = ops.Vector.nearestCellShuffle(points, centsDf, n)
          .select("id", "cell", "sim").collect()
          .map(r => (r.getLong(0), r.getLong(1),
            java.lang.Double.toString(r.getDouble(2)))).sorted.toSeq
        assert(mapSide == shuffle, s"seed=$seed n=$n")
      }
    }
  }

  test("property: two-phase running sum == global window under heavy hash collisions") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // collisions across the order key h force the tie-break (h, doc_id)
    // and the bucket-boundary argument to both carry the proof
    val rowGen: Gen[(Long, Long)] = for {
      t <- Gen.chooseNum(0L, 50L)
      h <- Gen.oneOf(Gen.chooseNum(0L, 9L), Gen.chooseNum(0L, 1000000006L))
    } yield (t, h)
    (91L to 93L).foreach { seed =>
      val base = sample(Gen.listOfN(300, rowGen), seed).zipWithIndex
        .map { case ((t, h), i) => (i.toLong, t, h) }
        .toDF("doc_id", "n_tokens", "h")
      val direct = base.withColumn("cum", sum(col("n_tokens")).over(
          Window.orderBy(asc("h"), asc("doc_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("doc_id", "cum")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      Seq(1L, 5L, 32L).foreach { buckets =>
        val got = ops.TextAnalysis.hashOrderRunningSum(base, nBuckets = buckets)
          .select("doc_id", "cum")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == direct, s"seed=$seed buckets=$buckets")
      }
    }
  }

  test("property: saltedJoin multiset == plain join on random dup-keyed inputs") {
    import spark.implicits._
    // duplicate keys on BOTH sides: every fact row must match every
    // replica-deduped dim row exactly once per dim duplicate — the
    // multiplicity contract a salting bug breaks first
    val factGen: Gen[(Long, Long)] = for {
      k <- Gen.frequency(5 -> Gen.const(3L), 2 -> Gen.chooseNum(0L, 9L))
      p <- Gen.chooseNum(0L, 999L)
    } yield (k, p)
    val dimGen: Gen[(Long, Long)] = for {
      k <- Gen.chooseNum(0L, 9L); v <- Gen.chooseNum(0L, 99L)
    } yield (k, v)
    (81L to 83L).foreach { seed =>
      val fact = sample(Gen.listOfN(300, factGen), seed).toDF("fk", "p")
      val dim  = sample(Gen.listOfN(30, dimGen), seed).toDF("dk", "v")
      def hist(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("fk", "p", "dk", "v").count()
      Seq(1, 4).foreach { buckets =>
        val salted = ops.Skew.saltedJoin(fact, dim, "fk", "dk", buckets)
        val plain  = fact.join(dim, col("fk") === col("dk"))
        assert(hist(salted).except(hist(plain)).isEmpty &&
          hist(plain).except(hist(salted)).isEmpty,
          s"seed=$seed buckets=$buckets")
      }
    }
  }

  test("property: salted per-group top-N == direct window on random skewed strata") {
    import spark.implicits._
    // skewed strata (one hot group) + colliding hash values so tie-breaks
    // and the local-prune containment argument are both exercised
    val rowGen: Gen[(Long, String, Long)] = for {
      id <- Gen.chooseNum(0L, 4999L)
      g  <- Gen.frequency(8 -> Gen.const("hot"), 1 -> Gen.oneOf("a", "b", "c"))
      h  <- Gen.chooseNum(0L, 30L) // heavy collisions
    } yield (id, g, h)
    (71L to 74L).foreach { seed =>
      val base = sample(Gen.listOfN(400, rowGen), seed)
        .distinctBy(_._1) // doc_id must be unique for a total order
        .toDF("doc_id", "lang", "h")
      val direct = base.withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("lang")).orderBy(asc("h"), asc("doc_id"))).cast("int"))
        .filter(col("rk") <= 7).select("doc_id", "lang", "rk")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sorted.toSeq
      Seq(1, 3, 16).foreach { salts =>
        val got = ops.TextAnalysis.sampleTopNPerGroup(base, "lang", 7, salts)
          .select("doc_id", "lang", "rk")
          .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sorted.toSeq
        assert(got == direct, s"seed=$seed salts=$salts")
      }
    }
  }

  test("property: bucketed group rank == direct window rank under score ties") {
    import spark.implicits._
    // scores quantized to 1/20ths force heavy ties, including ties that
    // span what would be bucket boundaries at high nBuckets — same score
    // must always share a bucket for the offset argument to hold
    val rowGen: Gen[(Long, String, Double)] = for {
      id <- Gen.chooseNum(0L, 4999L)
      g  <- Gen.frequency(8 -> Gen.const("hot"), 1 -> Gen.oneOf("a", "b", "c"))
      s  <- Gen.chooseNum(0, 20)
    } yield (id, g, s / 20.0)
    (91L to 93L).foreach { seed =>
      val base = sample(Gen.listOfN(400, rowGen), seed)
        .distinctBy(_._1)
        .toDF("doc_id", "lang", "ttr")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(asc("ttr"), asc("doc_id"))
      val direct = base
        .withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("cnt", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))))
        .select("doc_id", "rk", "cnt")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      Seq(8, 1024).foreach { buckets =>
        val got = ops.TextAnalysis.bucketedGroupRank(
            base, "lang", "ttr", "doc_id", nBuckets = buckets)
          .select("doc_id", "rk", "cnt")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
        assert(got == direct, s"seed=$seed buckets=$buckets")
      }
    }
  }

  test("NULL score/hash raises instead of silently dropping the row") {
    import spark.implicits._
    // a null score would bucket to null, miss the census equi-join, and
    // vanish — the guard turns silent row loss into a loud failure
    val withNullScore = Seq((1L, "en", Some(0.5)), (2L, "en", None))
      .toDF("doc_id", "lang", "ttr")
    val e1 = intercept[Exception] {
      ops.TextAnalysis.bucketedGroupRank(
        withNullScore, "lang", "ttr", "doc_id").collect()
    }
    assert(e1.getMessage != null)
    val withNullH = Seq((1L, "en", Some(5L)), (2L, "en", None))
      .toDF("doc_id", "lang", "h")
    val e2 = intercept[Exception] {
      ops.TextAnalysis.exactStratifiedSample(
        withNullH, "lang", 1, 2, nBuckets = 4L, hRange = 501L).collect()
    }
    assert(e2.getMessage != null)
  }

  test("property: histogram-rank stratified sample == direct window at any fraction") {
    import spark.implicits._
    // skewed strata + colliding hashes: collisions sit INSIDE one bucket
    // by construction (same h ⇒ same bucket), so this exercises the
    // straddling bucket's tie-break rank against the global definition;
    // tiny nBuckets forces real multi-row buckets
    val rowGen: Gen[(Long, String, Long)] = for {
      id <- Gen.chooseNum(0L, 4999L)
      g  <- Gen.frequency(8 -> Gen.const("hot"), 1 -> Gen.oneOf("a", "b", "c"))
      h  <- Gen.chooseNum(0L, 500L)
    } yield (id, g, h)
    (81L to 83L).foreach { seed =>
      val base = sample(Gen.listOfN(400, rowGen), seed)
        .distinctBy(_._1)
        .toDF("doc_id", "lang", "h")
      Seq((1, 10), (3, 7), (1, 1), (0, 5)).foreach { case (num, den) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang")).orderBy(asc("h"), asc("doc_id"))
        val direct = base
          .withColumn("rk", row_number().over(w))
          .withColumn("cnt", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))))
          .filter(col("rk") <= expr(s"(cnt * $num + ${den - 1}) div $den"))
          .select("doc_id", "lang")
          .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
        Seq(4L, 64L).foreach { buckets =>
          val got = ops.TextAnalysis.exactStratifiedSample(
              base, "lang", num, den, nBuckets = buckets, hRange = 501L)
            .select("doc_id", "lang")
            .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
          assert(got == direct, s"seed=$seed f=$num/$den buckets=$buckets")
        }
      }
    }
  }
}
