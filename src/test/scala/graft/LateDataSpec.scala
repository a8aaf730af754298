package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.core.Msg
import graft.streaming.StreamingChainLink

/** W5 — late-data semantics pinned: a record arriving after the watermark
  * passed its interval must not corrupt already-emitted results; it is
  * either dropped at the input (Spark's late-row filter) or emitted alone
  * with empty links (the reference's effective behavior for late base
  * messages, SURVEY.md §2.6 W5).
  */
class LateDataSpec extends SparkSpec {

  private def m(id: String, src: String, dst: String, s: Long, e: Long): Msg =
    Msg(id, src, dst, s, (e - s).toDouble, e)

  test("a very late message cannot retro-link already-emitted messages") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      sp.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val input = MemoryStream[Msg]
    val q = StreamingChainLink.linked(input.toDS(), "0 seconds")
      .writeStream.format("memory").queryName("late_out")
      .outputMode("append").start()
    try {
      // batch 1: child; batch 2: far-future sentinel → child emitted unlinked
      input.addData(Seq(m("child", "10.0.0.2", "10.0.0.3", 1100, 1300)))
      q.processAllAvailable()
      input.addData(Seq(m("sentinel", "10.9.9.9", "10.9.9.8", 500000, 500100)))
      q.processAllAvailable()
      val afterSentinel = sp.table("late_out").as[graft.core.LinkedMsg]
        .collect().map(l => l.id -> l).toMap
      assert(afterSentinel.contains("child"))
      assert(afterSentinel("child").parents.isEmpty)

      // batch 3: the child's parent arrives WAY late (wm ≈ 500000)
      input.addData(Seq(m("parent", "10.0.0.1", "10.0.0.2", 1000, 1500)))
      q.processAllAvailable()
      // one more watermark push so any state the late row created can flush
      input.addData(Seq(m("sentinel2", "10.9.9.9", "10.9.9.8", 900000, 900100)))
      q.processAllAvailable()
    } finally q.stop()

    val out = sp.table("late_out").as[graft.core.LinkedMsg].collect()
      .groupBy(_.id).view.mapValues(_.toSeq).toMap
    // the child was emitted exactly once, and stays unlinked
    assert(out("child").size == 1 && out("child").head.parents.isEmpty)
    // the late parent either never surfaces (input-dropped) or surfaces
    // exactly once with no children (state was evicted long ago)
    out.get("parent").foreach { rows =>
      assert(rows.size == 1 && rows.head.children.isEmpty,
        s"late parent retro-linked: $rows")
    }
    println(s"late-parent behavior: " +
      (if (out.contains("parent")) "emitted-unlinked" else "dropped-at-input"))
  }
}
