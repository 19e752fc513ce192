package graft

import org.apache.spark.TaskContext
import org.apache.spark.api.plugin.{DriverPlugin, ExecutorPlugin, SparkPlugin}

/** Test-only task-failure injector (VERDICT r12 next-round #2): fails a
  * deterministic subset of tasks on their FIRST attempt by throwing from
  * `ExecutorPlugin.onTaskStart` — the executor runs plugin callbacks
  * inside the task's try, so the throw surfaces as an ordinary retryable
  * task failure, exactly the 100 TB reality (preempted executors, fetch
  * failures, flaky disks) the hash-oracle discipline must survive.
  *
  * Keyed by (stageId, partitionId): each selected key fails exactly once,
  * so `spark.task.maxFailures >= 2` absorbs every injection and the job
  * must still produce bit-identical results. A speculative duplicate
  * (attemptNumber > 0) is never failed — speculation itself is a separate
  * chaos axis the probe enables via conf.
  *
  * Local-mode scoped: the `seen`/`injected` statics live in the one shared
  * JVM. On a real cluster the dedup would be per-executor (keys could
  * fail once per executor) — still correct for an invariance probe, just
  * noisier. Activate with `spark.plugins=graft.ChaosPlugin`.
  */
class ChaosPlugin extends SparkPlugin {
  override def driverPlugin(): DriverPlugin = null
  override def executorPlugin(): ExecutorPlugin = new ExecutorPlugin {
    override def onTaskStart(): Unit = {
      val tc = TaskContext.get()
      if (tc != null && tc.attemptNumber() == 0) {
        val key = (tc.stageId().toLong << 32) | (tc.partitionId() & 0xffffffffL)
        if (ChaosPlugin.shouldFail(key) && ChaosPlugin.seen.add(key)) {
          ChaosPlugin.injected.incrementAndGet()
          throw new RuntimeException(
            s"chaos: injected first-attempt failure " +
              s"stage=${tc.stageId()} partition=${tc.partitionId()}")
        }
      }
    }
  }
}

object ChaosPlugin {
  val seen: java.util.Set[java.lang.Long] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.lang.Long]()
  val injected = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Fraction of (stage, partition) keys that fail their first attempt.
    * Deterministic in the key so a re-run injects the same failures.
    */
  @volatile var fraction: Double = 1.0 / 3

  private[graft] def shouldFail(key: Long): Boolean = {
    if (fraction >= 1.0) return true
    if (fraction <= 0.0) return false
    val h = scala.util.hashing.byteswap64(key)
    java.lang.Long.remainderUnsigned(h, 1000L) < (fraction * 1000).toLong
  }
}
