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

  /** Entries under the shared store's root whose name contains `frag`. */
  private def storeEntries(shared: java.nio.file.Path, frag: String): Seq[String] = {
    val root = shared.resolve("graft-mat-shared")
    Option(root.toFile.list()).map(_.toSeq).getOrElse(Seq.empty)
      .filter(_.contains(frag))
  }

  private def deleteTree(p: java.nio.file.Path): Unit = {
    val walk = java.nio.file.Files.walk(p)
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(q => java.nio.file.Files.deleteIfExists(q))
    finally walk.close()
  }

  test("spark.graft.materialized.dir redirects memo writes to the content-keyed store") {
    val shared = java.nio.file.Files.createTempDirectory("graft-spec-shared-")
    spark.conf.set("spark.graft.materialized.dir", shared.toString)
    try {
      val out = Materialized.of(spark, "spec:shareddir")(
        spark.range(6).select(col("id")))
      assert(out.count() == 6)
      val entries = storeEntries(shared, "spec_shareddir")
      assert(entries.size == 1,
        s"expected one published spec:shareddir entry, found: $entries")
      val entry = shared.resolve("graft-mat-shared").resolve(entries.head)
      assert(java.nio.file.Files.exists(entry.resolve("manifest.properties")),
        "published entry must carry its manifest")
      assert(java.nio.file.Files.exists(entry.resolve("data")),
        "published entry must hold the parquet table under data/")
    } finally {
      spark.conf.unset("spark.graft.materialized.dir")
      deleteTree(shared)
    }
  }

  test("shared store: a NEW session adopts a published memo; a bumped fingerprint rebuilds") {
    val shared = java.nio.file.Files.createTempDirectory("graft-spec-adopt-")
    spark.conf.set("spark.graft.materialized.dir", shared.toString)
    try {
      var builds = 0
      Materialized.of(spark, "spec:adopt") {
        builds += 1; spark.range(5).select(col("id"))
      }
      assert(builds == 1)
      // a fresh session (fresh in-memory memo map — the same path a fresh
      // APPLICATION takes: everything derives from conf + disk state)
      val s2 = spark.newSession()
      s2.conf.set("spark.graft.materialized.dir", shared.toString)
      val adopted = Materialized.of(s2, "spec:adopt") {
        builds += 1; s2.range(5).select(col("id"))
      }
      assert(builds == 1, "a matching fresh manifest must be adopted, not rebuilt")
      assert(adopted.collect().map(_.getLong(0)).toSeq.sorted == (0L until 5L))
      // a bumped build fingerprint must NOT adopt the old entry
      val s3 = spark.newSession()
      s3.conf.set("spark.graft.materialized.dir", shared.toString)
      s3.conf.set("spark.graft.materialized.fingerprint", "v2")
      Materialized.of(s3, "spec:adopt") {
        builds += 1; s3.range(5).select(col("id"))
      }
      assert(builds == 2, "a bumped fingerprint must rebuild")
      assert(storeEntries(shared, "spec_adopt").size == 2,
        "old and new fingerprints land on distinct entries")
    } finally {
      spark.conf.unset("spark.graft.materialized.dir")
      deleteTree(shared)
    }
  }

  test("shared store: stale entries are not adopted, and the janitor reclaims them") {
    val shared = java.nio.file.Files.createTempDirectory("graft-spec-stale-")
    spark.conf.set("spark.graft.materialized.dir", shared.toString)
    // rewrite through the Hadoop FS API (as the writer does) so the local
    // filesystem's checksum sidecar stays consistent with the content
    def ageManifest(ageMs: Long): Unit = {
      val mf = new org.apache.hadoop.fs.Path(shared.resolve("graft-mat-shared")
        .resolve(storeEntries(shared, "spec_stale").head)
        .resolve("manifest.properties").toString)
      val fs = mf.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val props = new java.util.Properties()
      val in = fs.open(mf)
      try props.load(in) finally in.close()
      props.setProperty("completedAtMs",
        (System.currentTimeMillis() - ageMs).toString)
      val out = fs.create(mf, true)
      try props.store(out, "aged by spec") finally out.close()
    }
    try {
      Materialized.of(spark, "spec:stale")(spark.range(3).select(col("id")))
      ageManifest(8L * 24 * 3600 * 1000) // older than the 7-day default TTL
      val s2 = spark.newSession()
      s2.conf.set("spark.graft.materialized.dir", shared.toString)
      var rebuilt = false
      Materialized.of(s2, "spec:stale") {
        rebuilt = true; s2.range(3).select(col("id"))
      }
      assert(rebuilt, "an entry past its TTL must be evicted and rebuilt")
      assert(storeEntries(shared, "spec_stale").size == 1,
        "the rebuild replaces the stale entry in place")
      // janitor: age the fresh entry again, then sweep
      ageManifest(8L * 24 * 3600 * 1000)
      assert(Materialized.sweepShared(s2) == 1, "sweep must reclaim the stale entry")
      assert(storeEntries(shared, "spec_stale").isEmpty, "entry gone after sweep")
      assert(Materialized.sweepShared(s2) == 0, "second sweep finds nothing")
    } finally {
      spark.conf.unset("spark.graft.materialized.dir")
      deleteTree(shared)
    }
  }

  test("shared store: two concurrent writers publish ONE entry, both read good data") {
    val shared = java.nio.file.Files.createTempDirectory("graft-spec-race-")
    val sessions = Seq(spark.newSession(), spark.newSession())
    sessions.foreach(_.conf.set("spark.graft.materialized.dir", shared.toString))
    try {
      // both builders are forced into flight before either publishes
      val latch = new java.util.concurrent.CountDownLatch(2)
      val results = new java.util.concurrent.ConcurrentHashMap[Int, Seq[Long]]()
      val threads = sessions.zipWithIndex.map { case (s, i) =>
        new Thread(() => {
          val df = Materialized.of(s, "spec:race") {
            latch.countDown(); latch.await()
            s.range(10).select(col("id"))
          }
          results.put(i, df.collect().map(_.getLong(0)).toSeq.sorted)
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join(120000))
      assert(results.size == 2, "both writers must complete")
      results.values().forEach(v => assert(v == (0L until 10L)))
      val all = Option(shared.resolve("graft-mat-shared").toFile.list())
        .map(_.toSeq).getOrElse(Seq.empty)
      assert(all.count(_.contains("spec_race")) == 1 && !all.exists(_.contains(".tmp-")),
        s"expected exactly one published entry and no tmp leftovers, found: $all")
      val entry = shared.resolve("graft-mat-shared")
        .resolve(all.find(_.contains("spec_race")).get)
      val inside = Option(entry.toFile.list()).map(_.toSeq).getOrElse(Seq.empty)
        .filterNot(_.startsWith(".")) // local-FS checksum sidecars
      assert(inside.sorted == Seq("data", "manifest.properties"),
        s"loser's rename-into-dir residue must be cleaned, entry holds: $inside")
    } finally {
      sessions.foreach(_.conf.unset("spark.graft.materialized.dir"))
      deleteTree(shared)
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
      assert(storeEntries(shared, "spec_failedbuild").isEmpty,
        "failed build leaked its partial tmp directory")
      // the key is not poisoned: a correct builder succeeds on retry
      val ok = Materialized.of(spark, "spec:failedbuild")(
        spark.range(8).select(col("id")))
      assert(ok.count() == 8)
      assert(storeEntries(shared, "spec_failedbuild").size == 1,
        "expected exactly the retry's published entry")
    } finally {
      spark.conf.unset("spark.graft.materialized.dir")
      deleteTree(shared)
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
