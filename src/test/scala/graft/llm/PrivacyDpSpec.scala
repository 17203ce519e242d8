package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Privacy.dpCounts / geometricBreakpoints — mechanism shape, bounds,
  * determinism, seed sensitivity. */
class PrivacyDpSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("breakpoints are a valid CDF: strictly increasing, ending at 1.0, " +
    "symmetric mass around zero") {
    val bps = Privacy.geometricBreakpoints(0.5, maxNoise = 39)
    assert(bps.size == 79)
    assert(bps.last._2 == 1.0)
    bps.sliding(2).foreach { case Seq((_, a), (_, b)) => assert(a < b) }
    // P(K <= -1) == P(K >= 1) up to the folded tail mass (the positive
    // extreme absorbs the clamp to 1.0): ~2.6e-9 at eps=0.5, K=39
    val cumBelowZero = bps.find(_._1 == -1).get._2
    val cumAtZero = bps.find(_._1 == 0).get._2
    assert(math.abs(cumBelowZero - (1.0 - cumAtZero)) < 1e-8)
    // P(K = 0) = (1-α)/(1+α)
    val alpha = math.exp(-0.5)
    assert(math.abs((cumAtZero - cumBelowZero) -
      (1 - alpha) / (1 + alpha)) < 1e-12)
  }

  private def domain20 = (0 until 20).map(i => s"g$i").toDF("g")

  private def release(seed: Long, epoch: String = "e1") = {
    val df = (1L to 1000L).map(i => (s"g${i % 20}", 1)).toDF("g", "x")
    Privacy.dpCounts(df, Seq("g"), domain20, eps = 0.5, seed = seed,
      epoch = epoch)
      .select("g", "released").as[(String, Long)].collect()
      .sortBy(_._1).toSeq
  }

  test("noise is bounded by maxNoise and the release is deterministic " +
    "per (seed, epoch) but differs across seeds AND across epochs") {
    val a = release(42L)
    val b = release(42L)
    val c = release(7L)
    val d = release(42L, epoch = "e2")
    assert(a == b)
    assert(a != c) // 20 groups: astronomically unlikely to coincide
    // a re-release over evolving data must redraw noise, or released
    // deltas expose exact count deltas — the epoch is part of the
    // derivation, not a documentation promise
    assert(a != d)
    // every group's true count is 50; noise bound ±39
    assert(a.forall { case (_, r) => math.abs(r - 50L) <= 39L })
    // the mechanism is not inert across 20 groups
    assert(a.exists(_._2 != 50L))
  }

  test("public-domain release: the output key set IS the domain — absent " +
    "groups release noise around zero, out-of-domain groups are withheld") {
    val df = Seq(("a", 1), ("a", 1), ("b", 1), ("zz", 1)).toDF("g", "x")
    val dom = Seq("a", "b", "c", "d").toDF("g")
    val out = Privacy.dpCounts(df, Seq("g"), dom, 0.5, 1L, "e1")
      .select("g", "released").as[(String, Long)].collect().toMap
    assert(out.keySet == Set("a", "b", "c", "d"),
      "presence in the release must be a constant of the domain, " +
        "never of the data")
    assert(math.abs(out("c")) <= 39L && math.abs(out("d")) <= 39L,
      "absent groups must release noise(0)")
    assert(!out.contains("zz"), "data outside the public domain leaks")
  }

  test("stability histogram: tau matches the closed form, small groups " +
    "are suppressed with the guaranteed probability shape, big groups pass") {
    // tau: smallest t with alpha^t/(1+alpha) <= delta, plus one
    val eps = 0.5; val delta = 1e-6
    val alpha = math.exp(-eps)
    val tau = Privacy.stabilityThreshold(eps, delta)
    val t = tau - 1
    assert(math.pow(alpha, t.toDouble) / (1 + alpha) <= delta)
    assert(math.pow(alpha, (t - 1).toDouble) / (1 + alpha) > delta)
    // count-1 groups can NEVER clear tau when maxNoise-bounded noise tops
    // out below it... here 1 + 39 >= 28, so clearing is possible but only
    // in the delta tail; assert the released set is threshold-consistent
    val df = ((1 to 500).map(i => (s"big${i % 5}", 1)) ++
      Seq(("rare1", 1), ("rare2", 1))).toDF("g", "x")
    val out = Privacy.dpCountsStable(df, Seq("g"), eps, delta, 3L, "e1")
      .select("g", "released").as[(String, Long)].collect().toMap
    out.values.foreach(r => assert(r >= tau,
      "released rows must clear the stability threshold"))
    assert((0 until 5).forall(i => out.contains(s"big$i")),
      "groups with count 100 must survive (100 - 39 > tau)")
  }

  test("output never carries the true count column") {
    val df = Seq(("a", 1), ("a", 1), ("b", 1)).toDF("g", "x")
    val out = Privacy.dpCounts(df, Seq("g"), Seq("a", "b").toDF("g"),
      0.5, 1L, "e1")
    assert(out.columns.toSeq == Seq("g", "released", "eps"))
    val st = Privacy.dpCountsStable(df, Seq("g"), 0.5, 1e-6, 1L, "e1")
    assert(st.columns.toSeq == Seq("g", "released", "eps", "delta"))
  }

  test("pseudonymization: deterministic per key, divergent across keys, " +
    "join-preserving, null-passing") {
    val rows: Seq[(java.lang.Long, String)] =
      Seq((1L, "a"), (2L, "b"), (null, "c"))
    val df = rows.toDF("id", "v")
    val t1 = Privacy.pseudonymize(df, Seq("id"), "k1")
      .select("id", "v").as[(Option[String], String)].collect()
      .map(r => r._2 -> r._1).toMap
    val t1b = Privacy.pseudonymize(df, Seq("id"), "k1")
      .select("id", "v").as[(Option[String], String)].collect()
      .map(r => r._2 -> r._1).toMap
    val t2 = Privacy.pseudonymize(df, Seq("id"), "k2")
      .select("id", "v").as[(Option[String], String)].collect()
      .map(r => r._2 -> r._1).toMap
    assert(t1 == t1b) // deterministic
    assert(t1("a") != t2("a")) // key rotation breaks linkability
    assert(t1("a").get.matches("[0-9a-f]{64}")) // 256-bit hex token
    assert(t1("a") != t1("b")) // distinct ids stay distinct
    assert(t1("c").isEmpty) // null id pseudonymizes to null
    // join-preserving: tokenized frames join exactly like raw frames
    val left = Privacy.pseudonymize(
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "x"), Seq("id"), "k1")
    val right = Privacy.pseudonymize(
      Seq((1L, "u1"), (3L, "u3")).toDF("id", "name"), Seq("id"), "k1")
    val joined = left.join(right, Seq("id")).select("x", "name")
      .as[(Double, String)].collect().toSeq
    assert(joined == Seq((10.0, "u1")))
  }
}
