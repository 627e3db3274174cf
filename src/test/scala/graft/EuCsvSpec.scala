package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.EuCsv

class EuCsvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("EU CSV sink/scan round-trip preserves values through the dialect") {
    val dir = java.nio.file.Files.createTempDirectory("eucsv").toString + "/t"
    val df = Seq(("DE", 1234.5, 7L), ("FR", 0.25, 9L)).toDF("c", "v", "n")
    EuCsv.write(df, dir, euCols = Seq("v"))
    // raw file carries the decimal comma and ';' separator
    val raw = spark.read.text(dir).as[String].collect().mkString("\n")
    assert(raw.contains("1234,5") && raw.contains("DE;"))
    val back = EuCsv.parseEuDoubles(
      EuCsv.read(spark, dir), Seq("v"))
    val got = back.orderBy("c").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got.toSeq == Seq(("DE", 1234.5), ("FR", 0.25)))
  }

  test("skipRows scan drops exactly the header offset of a single file") {
    val d = java.nio.file.Files.createTempDirectory("skiprows")
    val f = d.resolve("x.csv")
    java.nio.file.Files.writeString(f, "garbage line\na;b\n1;2\n3;4\n")
    val got = EuCsv.read(spark, f.toString, skipRows = 1)
    assert(got.columns.toSeq == Seq("a", "b"))
    assert(got.count() == 2)
  }

  test("skipRows scan refuses multi-file inputs loudly") {
    val d = java.nio.file.Files.createTempDirectory("multi")
    java.nio.file.Files.writeString(d.resolve("a.csv"), "h\n1\n")
    java.nio.file.Files.writeString(d.resolve("b.csv"), "h\n2\n")
    val e = intercept[IllegalArgumentException] {
      EuCsv.read(spark, d.toString, skipRows = 1)
    }
    assert(e.getMessage.contains("single file"))
  }
}
