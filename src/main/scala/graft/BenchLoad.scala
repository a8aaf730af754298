package graft

import java.lang.management.ManagementFactory

/** Load normalization for the streaming benches.
  *
  * Cross-round sandbox noise made raw msg/s swing ~2× with identical code
  * (SCALING.md round-8 re-measurement: 498-784 msg/s over 9 runs). The
  * fix prescribed by the round-8 verdict: record cores × system load next
  * to every rate and publish rate-per-idle-core, so the reference's
  * ~100 msg/s bar is checkable without cross-round sandbox luck.
  *
  * `idle_cores` is sampled BEFORE the timed section (the 1-minute loadavg
  * taken after the run includes our own JVM's work and would double-count
  * it): external load = min(load1_before, cores), idle = max(1, cores −
  * external). `rate_per_idle_core` = rate / idle. On an idle 32-core box
  * the normalized and raw numbers differ by ~3%; on a box already half
  * loaded the normalized number is ~2× the raw one — which is exactly the
  * correction the cross-sandbox comparison needs.
  */
object BenchLoad {
  final case class Sample(cores: Int, load1: Double)

  def sample(): Sample = {
    val os = ManagementFactory.getOperatingSystemMXBean
    Sample(os.getAvailableProcessors, os.getSystemLoadAverage)
  }

  /** JSON fields (no braces, leading comma) to splice into a bench line. */
  def jsonFields(before: Sample, after: Sample, rate: Double): String = {
    val ext = math.min(math.max(before.load1, 0.0), before.cores.toDouble)
    val idle = math.max(1.0, before.cores - ext)
    f""","cores":${before.cores},"load1_before":${before.load1}%.2f,"load1_after":${after.load1}%.2f,"idle_cores":$idle%.1f,"rate_per_idle_core":${rate / idle}%.3f"""
  }
}
