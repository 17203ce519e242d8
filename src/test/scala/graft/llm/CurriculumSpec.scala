package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** D241 — curriculum interleaving: cutpoint binning (strict-greater,
  * ties fall low), the stride key spreads every bin uniformly, every
  * prefix carries each bin within one element of its share, and the
  * worst case (a difficulty-sorted corpus) comes out mixed. */
class CurriculumSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("binByThresholds: strict-greater cutpoints, ties at a cutpoint " +
    "fall to the lower bin, unsorted cutpoints refuse") {
    val df = Seq(1.0, 5.0, 5.1, 9.0, 20.0).toDF("s")
    val bins = Curriculum.binByThresholds(df, col("s"), Seq(5.0, 9.0))
      .orderBy("s").select("bin").as[Int].collect().toSeq
    assert(bins == Seq(1, 1, 2, 2, 3), s"got $bins")
    intercept[IllegalArgumentException] {
      Curriculum.binByThresholds(df, col("s"), Seq(9.0, 5.0))
    }
  }

  test("interleave: a difficulty-SORTED corpus schedules mixed — every " +
    "prefix of the stride order holds each bin within one element of " +
    "its proportional share") {
    // 40 easy (bin 1), 20 hard (bin 2) — ids sorted by difficulty, the
    // anti-clustering worst case
    val df = ((1L to 40L).map(i => (i, 1)) ++
      (41L to 60L).map(i => (i, 2))).toDF("id", "bin")
    val sched = Curriculum.interleave(df, "bin", "id")
      .orderBy("sched_key", "bin", "id")
      .select("id", "bin", "bin_rank", "sched_key")
      .collect()
    assert(sched.length == 60)
    // prefix property at every cut point: |count_b(prefix K) −
    // K·n_b/N| ≤ 1 + 1 (one element per bin of rounding)
    val bins = sched.map(_.getInt(1))
    for (k <- 1 to 60) {
      val c1 = bins.take(k).count(_ == 1)
      assert(math.abs(c1 - k * 40.0 / 60.0) <= 2.0,
        s"prefix $k holds $c1 of bin 1")
    }
    // stride keys are exact: element i of bin 2 (n=20) sits at i/21
    val b2 = sched.filter(_.getInt(1) == 2)
    assert(b2.forall(r =>
      math.abs(r.getDouble(3) - r.getInt(2) / 21.0) < 1e-9))
    // determinism: same input, same schedule
    val again = Curriculum.interleave(df, "bin", "id")
      .orderBy("sched_key", "bin", "id")
      .select("id").as[Long].collect().toSeq
    assert(again == sched.map(_.getLong(0)).toSeq)
  }
}
