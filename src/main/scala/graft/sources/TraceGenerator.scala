package graft.sources

import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Msg

/** Deterministic trace-generator fixture — batch-side parity with the
  * reference's SimPy simulator (`simpy_message_generator.py`), used by
  * streaming tests and benches as the out-of-order workload source.
  *
  * Faithfully reproduced semantics:
  *   - call tree (`:242-317`): Main(20 ticks) → {Sub1(30) ∥ Sub2(30→Sub3(10))}
  *     → 30 ticks → 40%: Sub2 again → 40 ticks; Main latency 130 or 170,
  *     1 tick = 1 ms (realtime factor 0.001, `:414-417`)
  *   - per-call IP choice from per-service pools `10.{0..4}.0.{0..size-1}`
  *     (`:78-105`); callee's src_ip == caller's service_ip (F1's invariant)
  *   - Gaussian inter-arrival clamped ≥0 (`:351-356`)
  *   - chi-square(df=2) delivery delay — i.e. Exp(scale=2)·1000 ms, capped
  *     at 30 000 (`:24-26, 121-135`) — giving `deliver_ts`, the adversarial
  *     arrival order (W6)
  *   - round-robin partition assignment (S5 `round_robin_partitioner`,
  *     `:36-45`)
  *   - global `msg_{n}` id counter in completion order (`:192-197`)
  *
  * Seeded `scala.util.Random`: the *distributions* match the reference; the
  * exact stream differs from CPython's Mersenne draws (irrelevant — the
  * reference's own tests never pin generator output, only linking results).
  */
object TraceGenerator {

  final case class GenConfig(
      nTraces: Int,
      meanIntervalMs: Double = 1000.0,
      stdDevMs: Double = 100.0,
      baseTimeMs: Long = 1704067200000L, // 2024-01-01T00:00Z
      poolSize: Int = 10,
      maxDelayMs: Long = 30000L,
      nPartitions: Int = 5,
      seed: Long = 42L)

  /** A generated message with its Kafka-side metadata. */
  final case class Delivered(msg: Msg, deliver_ts: Long, partition: Int)

  private final class Ctx(cfg: GenConfig) {
    val rnd = new Random(cfg.seed)
    private var counter = 0
    private var partitionCounter = 0
    val out = Seq.newBuilder[Delivered]

    def pool(svc: Int): IndexedSeq[String] =
      (0 until cfg.poolSize).map(i => s"10.$svc.0.$i")
    def pick(svc: Int): String = pool(svc)(rnd.nextInt(cfg.poolSize))

    /** chi-square(df=2)·scale(1s) delay, capped (reference `:121-135`). */
    def deliveryDelay(): Long = {
      val d = (-2.0 * math.log(rnd.nextDouble())) * 1000.0
      math.min(d.toLong, cfg.maxDelayMs)
    }

    def log(src: String, dst: String, start: Long, end: Long): Unit = {
      counter += 1
      val id = s"msg_$counter"
      val p = partitionCounter % cfg.nPartitions
      partitionCounter += 1
      out += Delivered(
        Msg(id, src, dst, start, (end - start).toDouble, end),
        end + deliveryDelay(), p)
    }
  }

  /** Generate all traces; messages appear in completion order like the
    * SimPy event loop would emit them.
    */
  def traces(cfg: GenConfig): Seq[Delivered] = {
    val ctx = new Ctx(cfg)
    val clientIp = ctx.pick(0) // one ClientService per run (reference main)
    var t0 = cfg.baseTimeMs
    (0 until cfg.nTraces).foreach { _ =>
      val mainIp = ctx.pick(1)
      val sub1Ip = ctx.pick(2)
      val sub2aIp = ctx.pick(3)
      val sub3aIp = ctx.pick(4)
      val branch = ctx.rnd.nextDouble() < 0.4
      // completion order: Sub1(t0+50), Sub3a(t0+60), Sub2a(t0+60),
      // [Sub3b(t0+130), Sub2b(t0+130)], Main
      ctx.log(mainIp, sub1Ip, t0 + 20, t0 + 50)
      ctx.log(sub2aIp, sub3aIp, t0 + 50, t0 + 60)
      ctx.log(mainIp, sub2aIp, t0 + 20, t0 + 60)
      val mainEnd = if (branch) {
        val sub2bIp = ctx.pick(3)
        val sub3bIp = ctx.pick(4)
        ctx.log(sub2bIp, sub3bIp, t0 + 120, t0 + 130)
        ctx.log(mainIp, sub2bIp, t0 + 90, t0 + 130)
        t0 + 170
      } else t0 + 130
      ctx.log(clientIp, mainIp, t0, mainEnd)
      // Gaussian inter-arrival, clamped at 0 (reference `:351-356`)
      val gap = cfg.meanIntervalMs + cfg.stdDevMs * ctx.rnd.nextGaussian()
      t0 += math.max(0L, gap.toLong)
    }
    ctx.out.result()
  }

  /** Messages in wire-arrival order (sorted by deliver_ts, ties by id) —
    * the adversarial input for streaming tests.
    */
  def arrivalOrder(cfg: GenConfig): Seq[Msg] =
    traces(cfg).sortBy(d => (d.deliver_ts, d.msg.id)).map(_.msg)

  /** As a DataFrame with delivery metadata (for parquet fixtures/benches). */
  def toDF(spark: SparkSession, cfg: GenConfig): DataFrame = {
    import spark.implicits._
    traces(cfg).map(d => (d.msg.id, d.msg.src_ip, d.msg.dst_ip,
      d.msg.start_at_ms, d.msg.latency_msec, d.msg.end_at_ms,
      d.deliver_ts, d.partition))
      .toDF("id", "src_ip", "dst_ip", "start_at_ms", "latency_msec",
        "end_at_ms", "deliver_ts", "partition")
  }
}
