package graft

import java.nio.file.Files

/** Source/sink format fidelity: orders survive CSV and JSON round-trips
  * with explicit schemas (timestamps, decimals, nullable marker columns) —
  * the interchange formats a pipeline meets beside parquet and JDBC.
  */
class FormatsSpec extends SparkSuite {

  test("orders round-trip csv and json losslessly under an explicit schema") {
    val root = Files.createTempDirectory("graft_fmt_").toString
    val orders = gen.OrderGen.orders(spark, 60, seed = 29)
    val schema = orders.schema

    orders.write.option("header", "true").csv(s"$root/csv")
    val fromCsv = spark.read.option("header", "true")
      .schema(schema).csv(s"$root/csv")
    // file-source readers force nullable=true; names and types must hold
    assert(fromCsv.schema.map(f => (f.name, f.dataType)) ==
      schema.map(f => (f.name, f.dataType)))
    assert(fromCsv.except(orders).isEmpty && orders.except(fromCsv).isEmpty)

    orders.write.json(s"$root/json")
    val fromJson = spark.read.schema(schema).json(s"$root/json")
    assert(fromJson.except(orders).isEmpty && orders.except(fromJson).isEmpty)
  }
}
