package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables

/** q24_udaf_weighted_avg — the engine's typed-UDAF surface (SURVEY.md §2.3).
  *
  * A custom `Aggregator[IN, BUF, OUT]` with an exact-decimal buffer: the
  * partial state (Σ x·w, Σ w) merges associatively, so Spark runs it with
  * map-side partial aggregation like any built-in — this is the scalable way
  * to add an aggregate, vs. the reference's row-wise Python apply (R10).
  * The final division happens once, in IEEE double, matching the DuckDB
  * oracle's `CAST(sum AS DOUBLE)/CAST(sum AS DOUBLE)`.
  */
object WeightedAvg {

  case class In(x: java.math.BigDecimal, w: java.math.BigDecimal)
  case class Buf(xw: java.math.BigDecimal, w: java.math.BigDecimal)

  val agg: Aggregator[In, Buf, Option[Double]] =
    new Aggregator[In, Buf, Option[Double]] {
      private val Z = java.math.BigDecimal.ZERO
      def zero: Buf = Buf(Z, Z)
      def reduce(b: Buf, a: In): Buf =
        if (a == null || a.x == null || a.w == null) b
        else Buf(b.xw.add(a.x.multiply(a.w)), b.w.add(a.w))
      def merge(b1: Buf, b2: Buf): Buf = Buf(b1.xw.add(b2.xw), b1.w.add(b2.w))
      def finish(b: Buf): Option[Double] =
        if (b.w.signum == 0) None
        else Some(b.xw.doubleValue() / b.w.doubleValue())
      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[Option[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }

  /** Column form: weighted_avg(x, w) over DECIMAL inputs. */
  def weighted_avg(x: Column, w: Column): Column =
    udaf(agg, Encoders.product[In]).apply(x, w)

  /** Declared query: avg unit price weighted by quantity, per return flag. */
  def q24(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.groupBy(col("l_returnflag"))
      .agg(weighted_avg(
        col("l_extendedprice").cast("decimal(18,2)"),
        col("l_quantity").cast("decimal(18,2)")).as("w_avg_price"))
      .orderBy("l_returnflag")
  }

  val q24Sql: String =
    """SELECT l_returnflag,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |       / CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS w_avg_price
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin
}
