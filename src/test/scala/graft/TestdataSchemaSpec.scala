package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Sentinel for driver-side testdata regeneration: the contract queries
  * and oracles bake in the column types below, and a regeneration that
  * changes one must fail HERE, loudly, in `sbt test` — not as silently
  * missing correctness rows. (The round-10 regeneration flipped
  * events.ts from TIMESTAMP(NANOS)-as-long to TIMESTAMP(MICROS)/NTZ and
  * six event-time queries vanished from the driver gate unnoticed:
  * Verify's per-query catch skipped their outputs and the correctness
  * file simply had fewer rows.) */
class TestdataSchemaSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .appName("testdata-schema").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fields(table: String): Map[String, DataType] =
    spark.read.parquet(s"/root/testdata/sf0.001/$table.parquet")
      .schema.fields.map(f => f.name -> f.dataType).toMap

  test("events: the six event-time queries assume ts TIMESTAMP_NTZ micros") {
    val f = fields("events")
    assert(f("ts") == TimestampNTZType,
      s"events.ts is ${f("ts")} — TS_US and the epoch_us oracles assume " +
        "TIMESTAMP_NTZ; update SparkEntry (q32/q48/q50/q59/q66/q76), the " +
        "streaming specs, and the verify skill notes together")
    assert(f("event_id") == LongType && f("user_id") == LongType &&
      f("event_type") == StringType && f("value") == DoubleType &&
      f("props") == StringType)
  }

  test("lineitem: synthesized-point arithmetic assumes integer key types") {
    val f = fields("lineitem")
    assert(f("l_orderkey") == LongType && f("l_linenumber") == IntegerType,
      "PT/PX/PY and every KEYS oracle do integer arithmetic on these")
    assert(f("l_returnflag") == StringType && f("l_quantity") == DoubleType)
  }

  test("documents: text operators assume (long doc_id, string text)") {
    val f = fields("documents")
    assert(f("doc_id") == LongType && f("text") == StringType &&
      f("lang") == StringType && f("source") == StringType)
  }

  test("embeddings: vector kernels assume array<float> embedding") {
    val f = fields("embeddings")
    assert(f("vec_id") == LongType && f("embedding") == ArrayType(FloatType),
      "VecKernels decode float arrays; a double regeneration would " +
        "change every cosine/argmax result")
  }

  test("orders: range-join fixtures assume long o_orderkey") {
    assert(fields("orders")("o_orderkey") == LongType)
  }
}
