package graft

import org.apache.spark.sql.functions._

/** R21 generator mirror: deterministic, seeded, in-range
  * (`dags/order_generator_dag.py:57-74`).
  */
class OrderGenSpec extends SparkSuite {

  test("same seed => identical rows; different seed => different rows") {
    val a = gen.OrderGen.orders(spark, 25, seed = 3).orderBy("order_id").collect()
    val b = gen.OrderGen.orders(spark, 25, seed = 3).orderBy("order_id").collect()
    val c = gen.OrderGen.orders(spark, 25, seed = 4).orderBy("order_id").collect()
    assert(a.toSeq == b.toSeq)
    assert(a.toSeq != c.toSeq)
  }

  test("generated columns respect the reference's ranges") {
    val df = gen.OrderGen.orders(spark, 200, seed = 1).cache()
    assert(df.count() == 200)
    assert(df.select("order_id").distinct().count() == 200)
    assert(df.filter(!col("customer_email")
      .rlike("^[a-z][0-9]{3,4}@example\\.com$")).count() == 0)
    assert(df.filter(col("amount") < 10.0 || col("amount") > 1000.01).count() == 0)
    assert(df.filter(!col("currency").isin(Dims.nationCodes: _*)).count() == 0)
    val base  = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val floor = java.sql.Timestamp.valueOf("2025-12-25 00:00:00")
    assert(df.filter(col("order_date") > base ||
      col("order_date") < floor).count() == 0)
    assert(df.filter(col("processed_at").isNotNull).count() == 0)
    df.unpersist()
  }
}
