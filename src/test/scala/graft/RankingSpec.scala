package graft

import org.apache.spark.sql.functions._
import graft.operators.Ranking

/** Direct pins for the distributed ranking helpers (the oracle queries
  * cover them end-to-end; these pin the offset arithmetic in isolation).
  */
class RankingSpec extends SparkSpec {

  test("distributed running total == sequential prefix sum") {
    val sp = spark
    import sp.implicits._
    val df = (1L to 1000L).map(i => (i, i % 7)).toDF("id", "v")
    val got = Ranking.withRunningTotal(df, col("v"), "rt", col("id"))
      .select("id", "rt").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    var acc = 0L
    val exp = (1L to 1000L).map { i => acc += i % 7; i -> acc }.toMap
    assert(got == exp)
  }

  test("distributed global row number is the exact 1..n total order") {
    val sp = spark
    import sp.implicits._
    // descending sort with id tie-break, deliberately skewed values
    val df = (1L to 500L).map(i => (i, i % 3)).toDF("id", "v")
    val (ranked, n) = Ranking.withGlobalRowNumber(df, "rn",
      col("v").desc, col("id"))
    assert(n == 500L)
    val rows = ranked.select("id", "v", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._3).sorted.toSeq == (1L to 500L))
    val bySort = rows.sortBy { case (id, v, _) => (-v, id) }.map(_._3)
    assert(bySort.toSeq == (1L to 500L), "rn must follow the sort order")
  }
}
