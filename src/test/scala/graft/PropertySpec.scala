package graft

import java.time.LocalDate
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.magic.Magic

/** Property-based invariants promised by SURVEY §5: magic-date inversion,
  * period formatting, ClearString idempotence, dedup-latest ≡ groupBy-max,
  * MERGE ≡ anti-join ∪ new. ScalaCheck generators drive the inputs (the
  * scalatestplus bridge isn't on the offline classpath, so samples are
  * drawn explicitly); column-level properties evaluate through a real
  * (small) Spark job so the tested code path is the production expression,
  * not a scalar re-implementation. */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dates: Gen[LocalDate] = Gen.choose(0L, 80000L)
    .map(LocalDate.of(1800, 1, 1).plusDays(_)) // 1800..~2019

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    Gen.listOfN(n, g).sample.get

  test("magic day number inverts to the same date (scalar, wide range)") {
    samples(dates, 500).foreach { d =>
      assert(Magic.fromMagicDay(Magic.toMagicDay(d)) == d)
    }
  }

  test("magic constants pin the encoding: 1900-01-01 = 693596") {
    assert(Magic.toMagicDay(LocalDate.of(1900, 1, 1)) == 693596L)
    assert(Magic.fromMagicDay(693596L) == LocalDate.of(1900, 1, 1))
  }

  test("column-level magic codec round-trips a batch of generated dates") {
    val sample = Gen.listOfN(300, dates).sample.get.distinct
    val df = sample.map(_.toString).toDF("iso")
      .withColumn("d", col("iso").cast("date"))
      .withColumn("magic", Magic.dateToMagicDay(col("d")))
      .withColumn("back", Magic.magicDayToDate(col("magic")))
    assert(df.filter(col("back") =!= col("d")).count() == 0)
    // and every encoded value clears the >100000 detection heuristic
    assert(df.filter(col("magic") <= Magic.DetectThreshold).count() == 0)
  }

  test("period formatting: YYYYMM for any (month, year); nulls → 190001") {
    val cases = (for { y <- 1900 to 2100 by 37; m <- 1 to 12 } yield
      (y.toString, m.toString)).toSeq
    val df = cases.toDF("y", "m")
      .withColumn("p", Magic.period(col("m"), col("y")))
    val bad = df.filter(!col("p").rlike("^[0-9]{4}(0[1-9]|1[0-2])$")).count()
    assert(bad == 0)
    val nulls = Seq((null: String, "5"), ("2000", null: String))
      .toDF("y", "m").withColumn("p", Magic.period(col("m"), col("y")))
    assert(nulls.select("p").as[String].collect().toSeq == Seq("190001", "190001"))
  }

  test("ClearString is idempotent: applying it twice equals once") {
    import graft.config.ColumnMetadata
    import graft.transform.TransformationEngine
    val gen = Gen.oneOf(Gen.const(null: String), Gen.const(""),
      Gen.const("  "), Gen.const("None"), Gen.const(" null "),
      Gen.alphaNumStr.map(s => s"  $s  "))
    val vals = Gen.listOfN(200, gen).sample.get
    val df = vals.zipWithIndex.map { case (v, i) => (i, v) }.toDF("i", "raw")
    def meta(src: String, out: String) = Seq(
      ColumnMetadata("i", 1, false, false, false, false, "int", "t", ""),
      ColumnMetadata(out, 2, false, false, false, false, "string", "t",
        s"fn_transform_ClearString($src)"))
    val once = TransformationEngine.apply(df, meta("raw", "c1"))
    val twice = TransformationEngine.apply(once, meta("c1", "c2"))
      .withColumnRenamed("c2", "c1")
    assert(once.except(twice).count() == 0 && twice.except(once).count() == 0)
  }

  test("dedup-latest equals groupBy-max selection on generated data") {
    import graft.transform.TransformationEngine
    val rows = Gen.listOfN(400,
      for {
        k <- Gen.choose(0, 20); ts <- Gen.choose(0, 50); v <- Gen.alphaStr
      } yield (k, ts, v)).sample.get
    val df = rows.toDF("k", "ts", "v")
    val got = TransformationEngine.dedupLatest(df, Seq("k"), Seq("ts"),
      tieBreak = Seq("v"))
    // oracle: max (ts, v) pair per key (same tiebreak order)
    val want = df.groupBy("k")
      .agg(max(struct(col("ts"), col("v"))).as("s"))
      .select(col("k"), col("s.ts").as("ts"), col("s.v").as("v"))
    assert(got.select("k", "ts", "v").except(want).count() == 0 &&
      want.except(got.select("k", "ts", "v")).count() == 0)
  }

  test("MERGE keeps anti-join ∪ new semantics on generated keyed data") {
    import graft.sink.StageWriter
    val rows = Gen.listOfN(300,
      for { k <- Gen.choose(0, 60); v <- Gen.choose(0, 1000) } yield (k, v))
      .sample.get
    val old = rows.toDF("k", "v").dropDuplicates("k")
    val delta = rows.take(80).map { case (k, v) => (k, v + 10000) }
      .toDF("k", "v").dropDuplicates("k")
    val merged = StageWriter.merge(old, delta, Seq("k"))
    // every delta key carries the delta value; untouched keys keep old value
    val deltaKeys = delta.select("k").as[Int].collect().toSet
    val out = merged.as[(Int, Int)].collect().toMap
    val oldM = old.as[(Int, Int)].collect().toMap
    val dM = delta.as[(Int, Int)].collect().toMap
    assert(out.keySet == oldM.keySet ++ dM.keySet)
    out.foreach { case (k, v) =>
      if (deltaKeys(k)) assert(v == dM(k)) else assert(v == oldM(k))
    }
  }

  test("join-view delta rule ≡ rebuild for random tables and splits") {
    val rowGen = Gen.listOfN(120,
      Gen.zip(Gen.choose(0L, 15L), Gen.choose(0, 999)))
    (1 to 4).foreach { seed =>
      val aRows = rowGen.sample.get.map { case (k, v) => (k, s"a$v") }
      val bRows = rowGen.sample.get.map { case (k, v) => (k, s"b$v") }
      val aCut = Gen.choose(0, aRows.size).sample.get
      val bCut = Gen.choose(0, bRows.size).sample.get
      val (a0, dA) = aRows.splitAt(aCut)
      val (b0, dB) = bRows.splitAt(bCut)
      def df(rs: Seq[(Long, String)], c: String) =
        if (rs.isEmpty) Seq((0L, "x")).toDF("k", c).limit(0)
        else rs.toDF("k", c)
      val maintained = df(a0, "av").join(df(b0, "bv"), Seq("k"))
        .unionByName(graft.operators.JoinView.delta(
          df(a0, "av"), df(dA, "av"), df(b0, "bv"), df(dB, "bv"), Seq("k")))
        .as[(Long, String, String)].collect().sorted.toSeq
      val rebuilt = aRows.toDF("k", "av").join(bRows.toDF("k", "bv"), Seq("k"))
        .as[(Long, String, String)].collect().sorted.toSeq
      assert(maintained == rebuilt, s"seed $seed: delta rule diverged")
    }
  }

  test("retraction rollup: applyChanges(diff) ≡ rebuild for random " +
      "mutations — deletes, updates, inserts, full-key retraction") {
    import org.apache.spark.sql.functions.{col, lit, when}
    val rowGen = Gen.listOfN(150,
      Gen.zip(Gen.choose(1L, 5000L), Gen.choose(0L, 12L),
        Gen.choose(0, 99999)))
    (1 to 3).foreach { seed =>
      val rows = rowGen.sample.get.map { case (id, k, c) =>
        (id, k, c / 100.0) }.distinct
      val v1 = rows.toDF("id", "k", "v")
      // delete id%3=0, update (+7.5) id%5=0 survivors, insert a new key 99
      val v2df = v1.filter(col("id") % 3 =!= 0)
        .withColumn("v", when(col("id") % 5 === 0, col("v") + 7.5)
          .otherwise(col("v")))
        .unionByName(Seq((999999L, 99L, 1.25)).toDF("id", "k", "v"))
      // the change feed exactly as VersionedTable.diff emits it
      val changes = v2df.exceptAll(v1).withColumn("change", lit("insert"))
        .unionByName(v1.exceptAll(v2df).withColumn("change", lit("delete")))
      val maintained = graft.operators.Rollup.applyChanges(
        graft.operators.Rollup.build(v1, Seq("k"), "v"),
        changes, Seq("k"), "v")
      val rebuilt = graft.operators.Rollup.build(v2df, Seq("k"), "v")
      assert(maintained.exceptAll(rebuilt).isEmpty &&
        rebuilt.exceptAll(maintained).isEmpty,
        s"seed $seed: retraction maintenance diverged from rebuild")
    }
  }

  test("multi-level IVM: cascading a parent rollup's change feed into a " +
      "coarser child ≡ the child's direct rebuild, for random mutations") {
    import org.apache.spark.sql.functions.{col, lit, pmod, sum, when}
    import org.apache.spark.sql.types.DecimalType
    val rowGen = Gen.listOfN(120,
      Gen.zip(Gen.choose(1L, 3000L), Gen.choose(0L, 40L),
        Gen.choose(0, 9999)))
    (1 to 2).foreach { seed =>
      val rows = rowGen.sample.get.map { case (id, k, c) =>
        (id, k, c / 100.0) }.distinct
      val v1 = rows.toDF("id", "k", "v")
      val v2 = v1.filter(col("id") % 4 =!= 0)
        .withColumn("v", when(col("id") % 3 === 0, col("v") + 2.5)
          .otherwise(col("v")))
      val fine1 = graft.operators.Rollup.build(v1, Seq("k"), "v")
        .localCheckpoint()
      val baseFeed = v2.exceptAll(v1).withColumn("change", lit("insert"))
        .unionByName(v1.exceptAll(v2).withColumn("change", lit("delete")))
      val fine2 = graft.operators.Rollup.applyChanges(fine1, baseFeed,
        Seq("k"), "v").localCheckpoint()
      val coarse1 = fine1.withColumn("g", pmod(col("k"), lit(7)))
        .groupBy("g").agg(sum("n").as("n"), sum("s").as("s"))
      val feed = graft.operators.Rollup.diffRollups(fine1, fine2)
        .withColumn("g", pmod(col("k"), lit(7)))
      def norm(df: org.apache.spark.sql.DataFrame) =
        df.select(col("g"), col("n"),
          col("s").cast(DecimalType(38, 2)).as("s"))
      val maintained = norm(graft.operators.Rollup.applyRollupChanges(
        coarse1, feed, Seq("g")))
      val rebuilt = norm(graft.operators.Rollup.build(
        v2.withColumn("g", pmod(col("k"), lit(7))), Seq("g"), "v"))
      assert(maintained.exceptAll(rebuilt).isEmpty &&
        rebuilt.exceptAll(maintained).isEmpty,
        s"seed $seed: cascade diverged from rebuild")
    }
  }

  test("semi-incremental min/max maintenance ≡ rebuild for random " +
      "mutations incl. extremum deletions and full-group retraction") {
    import org.apache.spark.sql.functions.{col, lit, when}
    val rowGen = Gen.listOfN(120,
      Gen.zip(Gen.choose(1L, 4000L), Gen.choose(0L, 10L),
        Gen.choose(0, 9999)))
    (1 to 3).foreach { seed =>
      val rows = rowGen.sample.get.map { case (id, k, c) =>
        (id, k, c / 100.0) }.distinct
      val v1 = rows.toDF("id", "k", "v")
      val v2 = v1.filter(col("id") % 3 =!= 0)
        .withColumn("v", when(col("id") % 5 === 0, col("v") - 50.0)
          .otherwise(col("v")))
      val changes = v2.exceptAll(v1).withColumn("change", lit("insert"))
        .unionByName(v1.exceptAll(v2).withColumn("change", lit("delete")))
      val maintained = graft.operators.Rollup.applyChangesMinMax(
        graft.operators.Rollup.buildMinMax(v1, Seq("k"), "v"),
        changes, Seq("k"), "v", v2)
      val rebuilt = graft.operators.Rollup.buildMinMax(v2, Seq("k"), "v")
      assert(maintained.exceptAll(rebuilt).isEmpty &&
        rebuilt.exceptAll(maintained).isEmpty,
        s"seed $seed: min/max maintenance diverged")
    }
  }

  test("exact selection ≡ sorted answer for random arrays and every rank " +
      "decile") {
    val vGen = Gen.listOfN(200, Gen.oneOf(
      Gen.choose(-1000L, 1000L),            // dense with duplicates
      Gen.choose(Long.MinValue / 4, Long.MaxValue / 4))) // wide domain
    (1 to 3).foreach { _ =>
      val vs = vGen.sample.get
      val sorted = vs.sorted
      val df = vs.toDF("v")
      (1 to vs.size by math.max(1, vs.size / 10)).foreach { k =>
        assert(graft.operators.Select.kthLong(df, "v", k, buckets = 64) ==
          sorted(k - 1))
      }
    }
  }

  test("CDC latest-wins final state is delivery-order independent") {
    val opGen = Gen.listOfN(60, Gen.zip(Gen.choose(0L, 9L),
      Gen.choose(0, 999), Gen.oneOf("U", "D")))
    (1 to 3).foreach { _ =>
      // unique seqs per key: index the ops
      val ops = opGen.sample.get.zipWithIndex.map { case ((k, v, op), i) =>
        (k, i.toLong, op, v.toDouble) }
      def finalState(order: Seq[(Long, Long, String, Double)]) = {
        // replay sequentially with the SAME max-seq-wins rule
        val st = scala.collection.mutable.Map[Long, (Long, String, Double)]()
        order.foreach { case (k, seq, op, v) =>
          if (st.get(k).forall(_._1 < seq)) st(k) = (seq, op, v) }
        st.toMap
      }
      val shuffled = scala.util.Random.shuffle(ops)
      assert(finalState(ops) == finalState(shuffled),
        "max-seq-wins must be order independent")
    }
  }
}
