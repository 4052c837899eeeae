package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.ops.EmissionsEtl
import graft.sources.Tables

/** Golden end-to-end: the checked-in miniature EEA CSV (FIXTURES.md §1.1,
  * with every edge-row class) through S1 + P1-P8 against a committed
  * expected table. */
class GoldenEtlSpec extends SparkSpec {

  test("CSV read modes: permissive nulls bad casts (reference tolerance), failfast rejects") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_badcsv_")
    Files.writeString(dir.resolve("bad.csv"),
      "a,b\n1,x\nnot_an_int,y\n3,z\n")
    val schema = StructType(Seq(
      StructField("a", IntegerType), StructField("b", StringType)))
    // PERMISSIVE (default): unparseable cell → null, row survives — the
    // tolerance the reference relies on by reading untyped.
    val permissive = Tables.csv(spark, dir.toString, schema).collect()
    assert(permissive.length == 3)
    assert(permissive.count(_.isNullAt(0)) == 1)
    // FAILFAST: strict typing at the edge fails the read, like the
    // reference's Postgres COPY would (SURVEY.md §7 hard parts).
    val strict = spark.read.schema(schema)
      .option("header", "true").option("mode", "FAILFAST")
      .csv(dir.toString)
    intercept[org.apache.spark.SparkException] { strict.collect() }
  }

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
