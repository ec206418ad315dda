package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the Spark-4 parquet reader capability
  * [[graft.sources.SchemaDrift.readWidened]]'s single-scan path relies
  * on: a DECLARED wider schema upcasts per file (int32→long,
  * int32/float→double) and missing declared columns read as NULL. If a
  * Spark upgrade ever regresses this, these rows fail before any drift
  * query silently mis-reads. */
class WidenProbeSpec extends AnyFunSuite {
  import TestSpark._

  test("declared-schema parquet reads upcast per file: int32->long, int32/float->double, missing->NULL") {
    val dir = java.nio.file.Files.createTempDirectory("widenprobe").toString
    spark.range(3).selectExpr("cast(id as int) as v").write.parquet(s"$dir/f")
    assert(spark.read.schema(StructType(Seq(StructField("v", LongType))))
      .parquet(s"$dir/f").collect().map(_.getLong(0)).sorted.toSeq == Seq(0L, 1L, 2L))
    assert(spark.read.schema(StructType(Seq(StructField("v", DoubleType))))
      .parquet(s"$dir/f").collect().map(_.getDouble(0)).sorted.toSeq == Seq(0.0, 1.0, 2.0))
    spark.range(3).selectExpr("cast(id as float) as v").write.parquet(s"$dir/g")
    assert(spark.read.schema(StructType(Seq(StructField("v", DoubleType))))
      .parquet(s"$dir/g").collect().map(_.getDouble(0)).sorted.toSeq == Seq(0.0, 1.0, 2.0))
    // float→double upcast is the exact IEEE extension, not a re-parse:
    // a value that does not round-trip through float must surface as
    // the float's double extension (the file's ACTUAL value)
    import spark.implicits._
    Seq(0.1).toDF("v").selectExpr("cast(v as float) as v").write.parquet(s"$dir/h")
    val up = spark.read.schema(StructType(Seq(StructField("v", DoubleType))))
      .parquet(s"$dir/h").head.getDouble(0)
    assert(up == 0.1f.toDouble && up != 0.1)
    // missing declared column reads as NULL
    val withExtra = spark.read.schema(StructType(Seq(
        StructField("v", LongType), StructField("w", StringType))))
      .parquet(s"$dir/f").collect()
    assert(withExtra.forall(_.isNullAt(1)))
  }
}
