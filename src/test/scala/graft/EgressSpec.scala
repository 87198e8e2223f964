package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName

/** Egress-representation guard (round-5 red row x_scd2).
  *
  * The driver hashes Verify's parquet through pyarrow/pandas; the oracle
  * side goes through DuckDB. Those two readers only agree on timestamp
  * columns when the file's physical type can represent every value on
  * BOTH: int64 NANOS caps at 2262-04-11, so a 9999-12-31 SCD2
  * end-of-time sentinel silently wraps to 2001-07-31 under a ns reader
  * while DuckDB reads 9999-12-31 — rows/schema match, hash diverges.
  *
  * This spec pins the contract: the session writes parquet timestamps as
  * int64 TIMESTAMP(MICROS) (year 9999 is exact in µs), and a
  * written-then-reread out-of-ns-range sentinel round-trips unchanged.
  * If anyone drops the outputTimestampType pin from Verify/SparkTestBase
  * this fails before the driver ever sees a wrapped value.
  */
class EgressSpec extends SparkTestBase {

  private def footerType(dir: String, column: String) = {
    val part = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).head
    val in = HadoopInputFile.fromPath(
      new Path(part.getAbsolutePath),
      spark.sparkContext.hadoopConfiguration)
    val r = ParquetFileReader.open(in)
    try r.getFooter.getFileMetaData.getSchema.getType(Seq(column): _*)
      .asPrimitiveType()
    finally r.close()
  }

  test("timestamp egress is naive int64 TIMESTAMP(MICROS), ns-overflow-safe") {
    val dir = Files.createTempDirectory("egress").toString + "/scd"
    Verify.egress(spark.sql(
      """SELECT timestamp'9999-12-31 00:00:00' AS valid_to,
        |       timestamp'1992-01-01 12:34:56.789' AS valid_from""".stripMargin))
      .coalesce(1).write.mode("overwrite").parquet(dir)

    for (c <- Seq("valid_to", "valid_from")) {
      val t = footerType(dir, c)
      assert(t.getPrimitiveTypeName == PrimitiveTypeName.INT64,
        s"$c must egress as int64, not INT96: $t")
      t.getLogicalTypeAnnotation match {
        case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          assert(ts.getUnit == TimeUnit.MICROS,
            s"$c must be µs (ns wraps year 9999): $t")
          // tz-aware (isAdjustedToUTC) reads back with a +00:00 suffix
          // under pyarrow/DuckDB, hash-diverging from the naive oracle
          assert(!ts.isAdjustedToUTC,
            s"$c must egress naive (TIMESTAMP_NTZ), not instant: $t")
        case other => fail(s"$c lacks a timestamp annotation: $other")
      }
    }

    // the sentinel round-trips exactly (it would read 2001-07-31 if the
    // file were ns-physical and the reader honored the annotation)
    val back = spark.read.parquet(dir)
      .selectExpr("date_format(valid_to, 'yyyy-MM-dd HH:mm:ss')")
      .head().getString(0)
    assert(back == "9999-12-31 00:00:00", s"sentinel wrapped: $back")
  }
}
