package graft

import org.apache.spark.sql.functions._

/** Bucketing: the 100 TB co-location story. Writing both join sides
  * bucketed by the join key lets the sort-merge join read buckets directly —
  * zero Exchange in the join, which is the difference between a free join
  * and reshuffling 100 TB every time.
  */
class BucketingSpec extends SparkSuite {

  test("bucketed-by-key tables join with no shuffle; unbucketed tables shuffle") {
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(spark, sf0001).write.mode("overwrite")
        .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_b")
      Tables.lineitem(spark, sf0001).write.mode("overwrite")
        .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("lineitem_b")

      val bucketed = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "o_orderstatus")
      val bPlan = bucketed.queryExecution.executedPlan.toString
      assert(!bPlan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$bPlan")

      val plain = Tables.lineitem(spark, sf0001)
        .join(Tables.orders(spark, sf0001),
          col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "o_orderstatus")
      val pPlan = plain.queryExecution.executedPlan.toString
      assert(pPlan.contains("Exchange"),
        "control: the unbucketed join should need a shuffle")

      // and the plans agree on the data
      assert(bucketed.count() == plain.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
