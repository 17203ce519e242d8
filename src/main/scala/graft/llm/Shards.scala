package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic training-shard writer (SURVEY §2D, D203) — the last
  * step between curation (D101/D102 budgets, D32/D48 mixing) and
  * serialization: the loader wants N shard files whose ASSIGNMENT and
  * within-shard ORDER are reproducible properties of the corpus and a
  * seed, never of the cluster that happened to write them.
  *
  *  - Shard = portable 60-bit hash of (doc id, seed) mod N — no RNG
  *    state, no partitioner dependence: the same corpus shards
  *    identically on any cluster, any partitioning, any rerun (the
  *    D20 deterministic-sampling discipline applied to layout).
  *  - Within-shard order = a SECOND keyed hash: the "shuffle" of
  *    training data made deterministic — a pseudo-random permutation
  *    every rerun reproduces, so a training run that crashes mid-epoch
  *    resumes on identical data order. The order key is WRITTEN
  *    (`ord`) so any reader can re-establish it.
  *  - Per-shard manifest (docs, token sum) derived from the LANDED
  *    files (the D197 validated-bytes discipline) and persisted as a
  *    `__shards__` tab sidecar — the loader's budget/curriculum
  *    accounting, and the thing a resume checks before trusting a dir.
  *
  * Cost shape: ONE exchange (repartition on the shard id), an in-task
  * sort, one file per shard, and a two-column read-back for the
  * manifest. At 100 TB choose numShards so a shard is a few GB — the
  * write parallelism IS numShards, which is what a training-data
  * layout wants anyway. */
object Shards {

  /** Add the portable `shard` and `ord` columns (pure projection). */
  def assigned(df: DataFrame, idCol: String, numShards: Int,
      seed: String): DataFrame = {
    require(numShards >= 1, s"numShards=$numShards")
    df.withColumn("shard",
        pmod(Dedup.portableHash60(
          concat_ws("|", col(idCol), lit(s"shard|$seed"))),
          lit(numShards.toLong)).cast("int"))
      .withColumn("ord", Dedup.portableHash60(
        concat_ws("|", col(idCol), lit(s"ord|$seed"))))
  }

  /** Shard, order and write `df` under `path` (one parquet file per
    * shard, hive layout `shard=N/`), then derive and persist the
    * manifest from the landed files. Returns the manifest frame
    * (shard, n_docs, n_tokens) — `tokens` is the caller's token-count
    * column (evaluated before the exchange, so the shuffle carries one
    * long, never the text twice). */
  def write(df: DataFrame, idCol: String, tokens: Column,
      numShards: Int, seed: String, path: String): DataFrame = {
    val spark = df.sparkSession
    val a = assigned(df, idCol, numShards, seed)
      .withColumn("n_tokens", tokens.cast("long"))
    a.repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("ord"), col(idCol))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    // hive partition values read back as STRING when the session runs
    // with partition type inference off — normalize explicitly
    val manifest = spark.read.parquet(path)
      .withColumn("shard", col("shard").cast("int"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
      .orderBy("shard")
      .localCheckpoint()
    graft.state.TabSidecar.write(
      java.nio.file.Paths.get(path + ".__shards__"),
      manifest.collect().toSeq.map(r =>
        s"${r.getInt(0)}\t${r.getLong(1)}\t${r.getLong(2)}"))
    manifest
  }

  /** The persisted manifest: (shard, n_docs, n_tokens). */
  def manifest(path: String): Seq[(Int, Long, Long)] =
    graft.state.TabSidecar.read(
      java.nio.file.Paths.get(path + ".__shards__")).flatMap { l =>
      l.split("\t") match {
        case Array(s, d, t) =>
          scala.util.Try((s.toInt, d.toLong, t.toLong)).toOption
        case _ => None
      }
    }
}
