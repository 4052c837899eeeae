package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.ops.EmissionsEtl
import graft.sources.Tables

/** Golden end-to-end: the checked-in miniature EEA CSV (FIXTURES.md §1.1,
  * with every edge-row class) through S1 + P1-P8 against a committed
  * expected table. */
class GoldenEtlSpec extends SparkSpec {

  test("eea_mini.csv through the full chain matches the golden table") {
    implicit val s = spark
    val path = getClass.getResource("/eea_mini.csv").getPath
    // Reference reads untyped (no inferSchema): all columns string, extra
    // column present (dropped by P1).
    val raw = Tables.csv(spark, path,
      StructType((EmissionsEtl.projectedCols :+ "SomeExtraColumn")
        .map(StructField(_, StringType))))
    val got = EmissionsEtl.transform(raw)
      .orderBy("Country", "Year", "Scenario", "Category").collect().toSeq
    val u = EmissionsEtl.unitLabel
    val g = EmissionsEtl.totalGhgClean
    assert(got == Seq(
      Row("Austria", 2030, "WEM", "Energy", g, 61393.54, u),
      Row("Austria", 2035, "WEM", "Energy", g, 59882.41, u),
      Row("France", 2030, "WEM", "Agriculture", g, 75231.92, u),
      Row("Germany", 2030, "WAM", "Energy", g, 541200.11, u),
      Row("Germany", 2030, "WEM", "Energy", g, 583912.77, u),
      Row("Sweden", 2040, "WOM", "Waste", g, 1893.05, u)))
  }
}
