package graft

/** The SQL entry point: the same semantics must be reachable through
  * `spark.sql` over registered views as through the DataFrame builders —
  * both compile to the same Catalyst plans.
  */
class SqlApiSpec extends SparkSuite {

  test("spark.sql over temp views matches the DataFrame builder (q08 shape)") {
    Tables.lineitem(spark, sf001).createOrReplaceTempView("lineitem_v")
    val sqlDf = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       count(*) AS count_order
        |FROM lineitem_v
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    val apiDf = ops.Aggregates.q08(spark, sf001)
      .select("l_returnflag", "l_linestatus", "sum_qty", "count_order")
    val s = sqlDf.collect().map(_.toSeq).toSeq
    val a = apiDf.collect().map(_.toSeq).toSeq
    assert(s == a)
  }

  test("registered eur_convert works from SQL text") {
    graft.ext.GraftFunctions // touch companion
    spark.sessionState.functionRegistry.registerFunction(
      graft.ext.GraftFunctions.identifier, graft.ext.GraftFunctions.info,
      graft.ext.GraftFunctions.eurConvertBuilder _)
    val r = spark.sql(
      "SELECT CAST(eur_convert(CAST(4.69 AS DECIMAL(18,2)), 'USD', 2.0D) AS DOUBLE)")
      .collect().head.getDouble(0)
    assert(r == 2.34) // 2.345 -> HALF_EVEN -> 2.34
  }
}
