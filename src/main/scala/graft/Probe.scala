package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Scratch profiling main for the optimization round (not a declared
  * surface): per-statement wall times + Spark job counts for the gates
  * under investigation. Run:
  *   SPARK_GRAFT_PROBE=q92u sbt "runMain graft.Probe"
  */
object Probe {
  private var jobs = 0
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val which = sys.env.getOrElse("SPARK_GRAFT_PROBE", "q92u")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.sessionWindow.merge.sessions.in.local.partition", "true")
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs += 1
      })
    // warmup
    spark.read.parquet(s"$sfDir/nation.parquet")
      .groupBy("n_regionkey").count()
      .write.format("noop").mode("overwrite").save()

    def step[T](name: String)(f: => T): T = {
      Thread.sleep(50) // let listener drain
      val j0 = jobs
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(50)
      println(f"[probe] $name%-28s ${dt}%8.3f s  jobs=${jobs - j0}")
      r
    }

    (1 to 2).foreach { round =>
      println(s"=== $which round $round ===")
      which match {
        case "q92u" =>
          val (t0d, d1, d2) = ops.Merge.mergeFixture(spark, sfDir)
          val tbl = s"${TempRoots.create("graft_probe_u_")}/table"
          def recent(d: DataFrame) = d
            .filter(year(col("o_orderdate")) >= 1996)
            .withColumn("yr", year(col("o_orderdate")))
          step("init") { graft.sources.GenTable.init(
            t0d.withColumn("yr", year(col("o_orderdate"))), tbl, "yr") }
          step("merge1") { graft.sources.GenTable.merge(spark, tbl, "yr",
            recent(d1), Seq("o_orderkey")) }
          step("merge2") { graft.sources.GenTable.merge(spark, tbl, "yr",
            recent(d2), Seq("o_orderkey")) }
          step("drop") { spark.sql("DROP TABLE IF EXISTS gt_probe_u") }
          step("create") { spark.sql(
            s"CREATE TABLE gt_probe_u USING gentable OPTIONS (path '$tbl')") }
          val df = step("select-plan") { spark.sql(
            """SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
              |FROM gt_probe_u VERSION AS OF 1
              |ORDER BY o_orderkey""".stripMargin) }
          step("noop") {
            df.write.format("noop").mode("overwrite").save() }
          // the Scala twin for contrast
          val df2 = step("scala-asof-plan") {
            graft.sources.GenTable.read(spark, tbl, "yr", asOfGen = Some(1L))
              .select("o_orderkey", "o_orderstatus", "o_totalprice",
                "o_orderdate").orderBy("o_orderkey") }
          step("scala-asof-noop") {
            df2.write.format("noop").mode("overwrite").save() }
        case "q92m_steps" =>
          val (t0d, d1, d2) = ops.Merge.mergeFixture(spark, sfDir)
          val tbl = s"${TempRoots.create("graft_probe_m_")}/table"
          def recent(d: DataFrame) = d
            .filter(year(col("o_orderdate")) >= 1996)
            .withColumn("yr", year(col("o_orderdate")))
          step("init") { graft.sources.GenTable.init(
            t0d.withColumn("yr", year(col("o_orderdate"))), tbl, "yr") }
          recent(d1).createOrReplaceTempView("probe_m_d1")
          recent(d2).createOrReplaceTempView("probe_m_d2")
          Seq("probe_m_d1", "probe_m_d2").zipWithIndex.foreach { case (v, i) =>
            step(s"sql-merge$i") { spark.sql(
              s"""MERGE INTO gentable.`$tbl` t USING $v s
                 |ON t.o_orderkey = s.o_orderkey
                 |WHEN MATCHED AND s._op = 'delete' THEN DELETE
                 |WHEN MATCHED THEN UPDATE SET *
                 |WHEN NOT MATCHED AND s._op <> 'delete' THEN INSERT *
                 |""".stripMargin) }
          }
          val dfm = step("read-plan") { spark.sql(
            s"""SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
               |FROM gentable.`$tbl` ORDER BY o_orderkey""".stripMargin) }
          step("read-noop") {
            dfm.write.format("noop").mode("overwrite").save() }
          // Scala twin statements for contrast
          val tbl2 = s"${TempRoots.create("graft_probe_m2_")}/table"
          step("scala-init") { graft.sources.GenTable.init(
            t0d.withColumn("yr", year(col("o_orderdate"))), tbl2, "yr") }
          step("scala-merge1") { graft.sources.GenTable.merge(spark, tbl2,
            "yr", recent(d1), Seq("o_orderkey")) }
          step("scala-merge2") { graft.sources.GenTable.merge(spark, tbl2,
            "yr", recent(d2), Seq("o_orderkey")) }
        case "q92w" =>
          step("q92w-all") {
            ops.Merge.q92w(spark, sfDir)
              .write.format("noop").mode("overwrite").save() }
        case "q92m" =>
          step("q92m-all") {
            ops.Merge.q92m(spark, sfDir)
              .write.format("noop").mode("overwrite").save() }
        case _ =>
          val fn = SparkEntry.queries(which)
          step(s"$which-all") {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      }
    }
    spark.stop()
  }
}
