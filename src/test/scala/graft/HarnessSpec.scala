package graft

/** Unit locks on the measurement harness's own math and the job-description
  * scoping helper — the pieces whose bugs would corrupt EVIDENCE (bench
  * medians, attribution) rather than results. */
class HarnessSpec extends SparkSpec {

  test("spreadOf: max/min of the reps; degenerate inputs read as no-spread") {
    assert(Bench.spreadOf(Seq(1.0, 3.0, 2.0)) == 3.0)
    assert(Bench.spreadOf(Seq(5.0, 30.0, 24.0)) == 6.0) // the r14 q122 shape
    // one rep (deadline-degraded rows) and empty must never flag
    assert(Bench.spreadOf(Seq(4.2)) == 1.0)
    assert(Bench.spreadOf(Seq.empty) == 1.0)
    // a zero/negative wall (clock anomaly, failed rep) must not divide
    assert(Bench.spreadOf(Seq(0.0, 2.0)) == 1.0)
  }

  test("JobStage.named scopes the description: restored after the body, nested stages compose, null restores") {
    val sc = spark.sparkContext
    def current(): String = sc.getLocalProperty("spark.job.description")
    assert(current() == null, "precondition: no description set on this thread")
    JobStage.named(spark, "outer") {
      assert(current() == "outer")
      JobStage.named(spark, "inner") {
        assert(current() == "inner")
      }
      assert(current() == "outer", "nested stage must restore its parent")
    }
    assert(current() == null, "outermost stage must restore the null state")
    // the body's exception must not leak the description either
    intercept[RuntimeException] {
      JobStage.named(spark, "failing") { throw new RuntimeException("boom") }
    }
    assert(current() == null, "a throwing body must still restore")
  }
}
