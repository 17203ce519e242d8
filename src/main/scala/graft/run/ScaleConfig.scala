package graft.run

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.SparkSession

/** Data-size-driven partition sizing — the arithmetic behind "partitions
  * must fit in executor memory at the target scale factor", applied
  * instead of guessed.
  *
  * Rules (the standard 128 MB-per-task discipline):
  *  - scan side: `spark.sql.files.maxPartitionBytes` = the target task
  *    bytes (so a 100 TB scan becomes ~800k map tasks, each memory-safe);
  *  - shuffle side: partitions = ceil(inputBytes / targetTaskBytes),
  *    rounded UP to a multiple of the total cores (whole scheduling
  *    waves — 31 partitions on 32 cores strands a wave), floored at
  *    2×cores (always at least two waves so one long task can't stall a
  *    whole stage), capped at 1,048,576 (the shuffle-tracker sanity
  *    bound). With AQE on (SparkEntry.configure), this lands as the
  *    INITIAL partition number and AQE coalesces the empty tail — so
  *    over-estimating costs little, under-estimating spills.
  *
  * The local testdata default (32 partitions at sf0.1, `local[32]`) is
  * exactly `recommend(…)` for that size; the same call sized for 100 TB /
  * 1000 executors × 4 cores yields ~819k scan tasks and 786k initial
  * shuffle partitions — numbers a hand-tuned config rarely gets right.
  */
object ScaleConfig {

  final case class Settings(shufflePartitions: Int, maxPartitionBytes: Long)

  val MaxShufflePartitions = 1 << 20

  def recommend(inputBytes: Long, totalCores: Int,
      targetTaskBytes: Long = 128L * 1024 * 1024): Settings = {
    require(inputBytes >= 0 && totalCores >= 1 && targetTaskBytes >= 1L)
    val raw = (inputBytes + targetTaskBytes - 1) / targetTaskBytes
    val floored = math.max(raw, 2L * totalCores)
    val waves = ((floored + totalCores - 1) / totalCores) * totalCores
    Settings(math.min(waves, MaxShufflePartitions.toLong).toInt,
      targetTaskBytes)
  }

  /** Apply to a session: scan split size + AQE-coalescible initial
    * shuffle parallelism. */
  def configure(spark: SparkSession, s: Settings): Unit = {
    spark.conf.set("spark.sql.files.maxPartitionBytes", s.maxPartitionBytes)
    spark.conf.set("spark.sql.shuffle.partitions", s.shufflePartitions)
    spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
      s.shufflePartitions)
  }

  /** Size a local directory tree (the testdata path) to drive recommend. */
  def dirBytes(path: String): Long = {
    def walk(p: Path): Long =
      if (Files.isDirectory(p)) {
        val st = Files.list(p) // close eagerly: one open fd per level
        try {
          val it = st.iterator()
          var sum = 0L
          while (it.hasNext) sum += walk(it.next())
          sum
        } finally st.close()
      } else if (Files.isRegularFile(p)) Files.size(p)
      else 0L
    walk(Paths.get(path))
  }
}
