package graft.sink

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Partition-scheme EVOLUTION without rewriting history (Iceberg's
  * partition evolution on the parquet fallback): a table accumulates
  * GENERATIONS, each a frozen derived-partitioned layout with its own
  * scheme — day buckets early, week buckets after the table grew, any
  * `src div N` scheme later — and new data only ever lands in the newest
  * generation. Changing the scheme of a 100 TB table is a metadata-sized
  * operation, never the repartition-everything rewrite that makes teams
  * keep bad layouts forever.
  *
  * Reads union the generations; because every generation carries its own
  * `_derived_partition` sidecar, the [[graft.plans.DerivedPartitionPrune]]
  * rule prunes EACH generation's scan under ITS OWN scheme once Catalyst
  * pushes the reader's raw-source predicate through the union — one
  * `ts BETWEEN …` filter skips day directories in the old generation and
  * week directories in the new one, with the reader knowing neither
  * scheme. */
object PartitionEvolution {

  private def genDir(root: String, g: Int) = s"$root/g=$g"

  /** Existing generation indices, ascending. */
  def generations(root: String): Seq[Int] = {
    val r = Paths.get(root)
    if (!Files.isDirectory(r)) return Nil
    val s = Files.list(r)
    try s.toArray.map(_.asInstanceOf[java.nio.file.Path])
      .map(_.getFileName.toString)
      .collect { case n if n.startsWith("g=") => n.drop(2).toInt }
      .sorted.toSeq
    finally s.close()
  }

  /** Land `df` as the NEXT generation under its own partition scheme
    * (`partCol = srcCol div divisor`). Prior generations are never
    * touched — evolving the scheme IS just using a new divisor here. */
  def addGeneration(df: DataFrame, root: String, srcCol: String,
      partCol: String, divisor: Long): Int = {
    val next = generations(root).lastOption.getOrElse(-1) + 1
    StageWriter.writeDerivedPartitioned(df, genDir(root, next),
      srcCol, partCol, divisor)
    next
  }

  /** Union of all generations (schemes differ per generation; the data
    * schema must match — the derived partition column is dropped so the
    * union is scheme-agnostic). */
  def read(spark: SparkSession, root: String, partCol: String): DataFrame = {
    val gens = generations(root)
    require(gens.nonEmpty, s"$root: no generations")
    gens.map(g => spark.read.parquet(genDir(root, g)).drop(partCol))
      .reduce(_.unionByName(_))
  }
}
