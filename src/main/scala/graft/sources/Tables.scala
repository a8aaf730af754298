package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table loaders + the FROZEN `msgs` derivation shared between the Spark
  * queries and the DuckDB oracle SQL (FIXTURES.md §3).
  *
  * Everything here must be *engine-agnostic deterministic*: no engine hash
  * functions (Spark murmur3 != DuckDB hash), no float accumulation, integer
  * modulo only on non-negative operands, `floor` (not cast) for double→long.
  */
object Tables {

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Spark 4 rejects parquet TIMESTAMP(NANOS) outright; read as int64 nanos.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(spark.read.parquet(s"$dir/$name.parquet"))
  }

  /** Normalize an optional `ts` column to int64 epoch-NANOSECONDS, the frozen
    * internal contract every downstream `ts` expression assumes. The testdata
    * generator has shipped `events.ts` as parquet timestamp[ns] (read as
    * int64 via nanosAsLong) and later as timestamp[us] with
    * isAdjustedToUTC=false (read as TIMESTAMP_NTZ under Spark 4's default
    * inferTimestampNTZ); this adapter absorbs either — plus plain LTZ and
    * ISO-8601 strings in the lenient-parse spirit of the reference's reader
    * (simpy_kafka_reader.py:42-54) — so a regeneration cannot break the
    * query layer again.
    *
    * DuckDB parity: the oracle's `epoch_ms(ts)` treats naive timestamps as
    * UTC; the NTZ/string paths compute the same wall-as-UTC epoch with pure
    * NTZ arithmetic (`timestampdiff` from the NTZ epoch — no zone is ever
    * consulted), so the result is session-zone-independent even for wall
    * times inside a DST gap/overlap window on an unpinned session.
    */
  /** Epoch micros of an NTZ wall time read as UTC — pure field arithmetic
    * (wall date × 86400e6 + wall time-of-day micros), exact to the
    * microsecond, zero zone dependence. `extract(SECONDS)` carries the
    * fractional part as DECIMAL(8,6), so ×1e6 is lossless.
    */
  private def ntzEpochMicros(ntz: Column): Column =
    unix_date(ntz.cast("date")).cast("long") * lit(86400000000L) +
      (hour(ntz).cast("long") * lit(3600L) + minute(ntz).cast("long") * lit(60L)) * lit(1000000L) +
      (date_part(lit("SECONDS"), ntz) * lit(1000000)).cast("long")

  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType match {
      case org.apache.spark.sql.types.LongType =>
        // nanos (legacy TIMESTAMP(NANOS) via nanosAsLong) OR plain int64
        // micros — disambiguated per row by magnitude: epoch-nanos for any
        // date after 1973 exceed 1e17, epoch-micros stay below 1e17 until
        // year ~5138, so the ranges are disjoint by ~400× around this
        // data's 2020s timestamps. One codegen'd comparison per row, no
        // driver-side probe.
        df.withColumn("ts",
          when(abs(col("ts")) < lit(100000000000000000L),
            col("ts") * lit(1000L)).otherwise(col("ts")))
      case org.apache.spark.sql.types.TimestampType =>
        df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // Wall time treated as UTC via pure field decomposition — unix_date
        // on the wall date plus wall hour/minute/seconds, no time zone ever
        // consulted, so the result is session-zone-independent INCLUDING for
        // wall times inside a DST gap/overlap. (The previous cast-to-LTZ +
        // from_utc_timestamp round trip applied the zone offset once at wall
        // time and once at instant, which differ inside a transition window;
        // timestampdiff/to_utc_timestamp are no fix — both implicitly cast
        // NTZ operands to LTZ through the session zone first.)
        df.withColumn("ts", ntzEpochMicros(col("ts")) * lit(1000L))
      case org.apache.spark.sql.types.StringType =>
        df.withColumn("ts",
          ntzEpochMicros(col("ts").cast("timestamp_ntz")) * lit(1000L))
      case other =>
        throw new IllegalArgumentException(
          s"Tables.normalizeTs: unsupported ts encoding $other")
    }).getOrElse(df)

  /** Epoch millis of `events.ts` (normalized to int64 epoch-nanos by
    * [[load]]/[[normalizeTs]] regardless of the parquet encoding), referenced
    * by column name. Integer division — a double round-trip would lose
    * precision at ~1.7e18 ns (> 2^53). Matches DuckDB `epoch_ms(ts)` (floor;
    * all values positive). The single home of the ns→ms conversion: every
    * operator over `events` uses this.
    */
  val epochMs: Column = expr("ts div 1000000")

  /** [[epochMs]] bucketed by integer division — the whole chain stays in
    * int64 arithmetic (tumbling windows, daily buckets).
    */
  def epochMsBucket(divisorMs: Long): Column =
    expr(s"(ts div 1000000) div $divisorMs")

  /** The frozen derivation of the reference's message table from
    * `events.parquet`. Mirrored bit-for-bit by [[msgsCte]] for DuckDB.
    *
    * dst_ip uses a portable LCG mix of event_id (NOT Spark's `hash()`,
    * which DuckDB cannot reproduce). All arithmetic stays in int64 range:
    * max event_id ~6e5 * 1103515245 ~ 6.6e14 << 2^63.
    */
  def msgs(spark: SparkSession, dir: String): DataFrame =
    Materialized.of(spark, s"msgs:$dir") {
      val ev = load(spark, dir, "events")
      val startMs = epochMs
      ev.select(
        concat(lit("msg_"), col("event_id").cast("string")).as("id"),
        concat(lit("10.0.0."), (col("user_id") % 16).cast("string")).as("src_ip"),
        concat(lit("10.0.0."),
          ((col("user_id") + (col("event_id") * 1103515245L + 12345L) % 16) % 16)
            .cast("string")).as("dst_ip"),
        startMs.as("start_at_ms"),
        (col("value") * 60000.0).as("latency_msec"),
        (startMs + floor(col("value") * 60000.0).cast("long")).as("end_at_ms"))
    }

  /** DuckDB CTE computing exactly [[msgs]]. Prepend to oracle SQL as
    * `WITH msgs AS (...)`.
    */
  val msgsCte: String =
    """msgs AS (
      |  SELECT 'msg_' || event_id AS id,
      |         '10.0.0.' || (user_id % 16) AS src_ip,
      |         '10.0.0.' || ((user_id + (event_id * 1103515245 + 12345) % 16) % 16) AS dst_ip,
      |         epoch_ms(ts) AS start_at_ms,
      |         value * 60000.0 AS latency_msec,
      |         epoch_ms(ts) + CAST(floor(value * 60000.0) AS BIGINT) AS end_at_ms
      |  FROM events
      |)""".stripMargin

  /** Portable 60-bit string hash: identical in Spark and DuckDB.
    *
    * Spark:  graft_phash(s) — a codegen'd expression computing
    *         `conv(substring(md5(s),1,15),16,10)::long` digest-direct
    *         (no hex-string materialization; see
    *         [[graft.functions.PortableHash60]])
    * DuckDB: CAST('0x' || substr(md5(s),1,15) AS BIGINT)
    *
    * 15 hex digits = 60 bits, always non-negative, fits int64; stable
    * across engines unlike murmur3/xxhash.
    */
  def portableHash(c: Column): Column =
    graft.functions.PortableHash60(c)

  /** DuckDB SQL fragment for [[portableHash]] applied to expression `e`. */
  def portableHashSql(e: String): String =
    s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT)"
}
