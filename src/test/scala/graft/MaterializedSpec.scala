package graft

import org.apache.spark.sql.functions._
import graft.sources.Materialized

/** Contract tests for the parquet-backed session memo layer: identity,
  * exact value roundtrip (including array columns, the embedding case),
  * and single-build semantics — the properties every memoized relation
  * in the engine leans on.
  */
class MaterializedSpec extends SparkSpec {

  test("second lookup returns the SAME relation without rebuilding") {
    var builds = 0
    def build = {
      builds += 1
      spark.range(10).select(col("id"), (col("id") * 2).as("v"))
    }
    val a = Materialized.of(spark, "spec:identity")(build)
    val b = Materialized.of(spark, "spec:identity")(build)
    assert(builds == 1, "builder must run exactly once per session")
    assert(a eq b, "memo must return the identical DataFrame instance")
    // parquet scans don't promise row order — values must survive exactly
    assert(b.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted ==
      (0L until 10L).map(i => (i, i * 2)))
  }

  test("parquet roundtrip preserves doubles, longs, strings, and arrays exactly") {
    val sp = spark
    import sp.implicits._
    val in = Seq(
      (1L, "alpha", 0.1 + 0.2, Seq(1.5, -2.25, 1e-300)),
      (2L, "", -0.0, Seq.empty[Double]),
      (3L, "τϵχτ", Double.MinPositiveValue, Seq(Double.MaxValue)))
      .toDF("id", "s", "d", "arr")
    val out = Materialized.of(spark, "spec:roundtrip")(in)
    val got = out.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)), r.getSeq[Double](3)))
    val exp = in.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)), r.getSeq[Double](3)))
    assert(got.toSeq == exp.toSeq)
  }

  test("empty relations memoize with their schema intact") {
    val out = Materialized.of(spark, "spec:empty")(
      spark.range(5).where(col("id") < 0)
        .select(col("id"), col("id").cast("string").as("s")))
    assert(out.count() == 0)
    assert(out.schema.map(_.name) == Seq("id", "s"))
  }

  test("nested builders (memo built inside another memo's builder) work") {
    val out = Materialized.of(spark, "spec:outer") {
      val inner = Materialized.of(spark, "spec:inner")(
        spark.range(4).select(col("id")))
      inner.agg(sum("id").as("total"))
    }
    assert(out.collect().head.getLong(0) == 6L)
    assert(Materialized.of(spark, "spec:inner")(fail("must not rebuild"))
      .count() == 4)
  }

  test("concurrent same-key requests coalesce onto ONE build") {
    // Verify runs 4 queries concurrently; two absent-memo requests for the
    // same heavy relation must not duplicate the build job.
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val started = new java.util.concurrent.CountDownLatch(4)
    def build = {
      builds.incrementAndGet()
      Thread.sleep(200) // widen the race window: all threads enter before any build finishes
      spark.range(8).select(col("id"))
    }
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val futures = (1 to 4).map { _ =>
      Future {
        started.countDown()
        started.await()
        Materialized.of(spark, "spec:race")(build)
      }
    }
    val results = futures.map(Await.result(_, 60.seconds))
    assert(builds.get() == 1, s"expected 1 coalesced build, got ${builds.get()}")
    assert(results.forall(_ eq results.head),
      "all racers must receive the identical memoized relation")
    assert(results.head.count() == 8)
  }

  test("spark.graft.materialized.dir redirects memo writes to the configured root") {
    val shared = java.nio.file.Files.createTempDirectory("graft-spec-shared-")
    spark.conf.set("spark.graft.materialized.dir", shared.toString)
    try {
      val out = Materialized.of(spark, "spec:shareddir")(
        spark.range(6).select(col("id")))
      assert(out.count() == 6)
      val appRoot = shared.resolve(
        s"graft-mat-${spark.sparkContext.applicationId}")
      assert(java.nio.file.Files.isDirectory(appRoot),
        s"memo not written under the configured shared dir: $shared")
      val memoDirs = java.nio.file.Files.list(appRoot).toArray.map(_.toString)
      assert(memoDirs.exists(_.contains("spec_shareddir")),
        s"expected a spec:shareddir memo under $appRoot, found: ${memoDirs.mkString(",")}")
    } finally {
      spark.conf.unset("spark.graft.materialized.dir")
      val walk = java.nio.file.Files.walk(shared)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  test("a failed build deletes its partial directory and does not poison the key") {
    // Fail mid-WRITE (not at plan time): a job that throws after some tasks
    // have committed leaves a half-written directory — the case the cleanup
    // exists for. Shared-dir mode makes the root observable, and is also
    // the mode where a leak would be permanent (no session sweep there).
    val shared = java.nio.file.Files.createTempDirectory("graft-spec-fail-")
    spark.conf.set("spark.graft.materialized.dir", shared.toString)
    try {
      val boom = udf((id: Long) =>
        if (id == 7L) throw new RuntimeException("spec-induced write failure")
        else id)
      val failing = spark.range(8).repartition(4).select(boom(col("id")).as("id"))
      val ex = intercept[Exception] {
        Materialized.of(spark, "spec:failedbuild")(failing)
      }
      assert(ex.getMessage != null)
      val appRoot = shared.resolve(
        s"graft-mat-${spark.sparkContext.applicationId}")
      // File.list, not Files.list: the latter returns a stream that must
      // be closed, and this helper is evaluated repeatedly
      def memoDirs = Option(appRoot.toFile.list()).map(_.toSeq)
        .getOrElse(Seq.empty[String])
      assert(!memoDirs.exists(_.contains("spec_failedbuild")),
        s"failed build leaked its partial directory: $memoDirs")
      // the key is not poisoned: a correct builder succeeds on retry
      val ok = Materialized.of(spark, "spec:failedbuild")(
        spark.range(8).select(col("id")))
      assert(ok.count() == 8)
      assert(memoDirs.count(_.contains("spec_failedbuild")) == 1,
        s"expected exactly the retry's memo dir: $memoDirs")
    } finally {
      spark.conf.unset("spark.graft.materialized.dir")
      val walk = java.nio.file.Files.walk(shared)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  test("downstream filters push into the memo's parquet scan") {
    Materialized.of(spark, "spec:pushdown")(
      spark.range(100).select(col("id"), (col("id") % 7).as("k")))
    val q = Materialized.of(spark, "spec:pushdown")(fail("must not rebuild"))
      .where(col("k") === 3)
    val plan = q.queryExecution.executedPlan.toString
    val scan = plan.linesIterator.find(_.contains("FileScan parquet")).get
    assert(scan.contains("PushedFilters: [") && scan.contains("EqualTo(k,3)"),
      s"filter not pushed to the memo scan: $scan")
  }
}
