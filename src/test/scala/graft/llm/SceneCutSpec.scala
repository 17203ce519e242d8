package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Scene-cut detection (D116): lag semantics, strict threshold, phash
  * consistency between the media-level and frame-level paths. */
class SceneCutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cuts(frames: Seq[(Long, Int, Array[Byte])], t: Int) =
    Multimodal.sceneCuts(
        Multimodal.framePhash(frames.toDF("media_id", "frame_idx", "frame")),
        t)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getAs[Int]("cut")).toMap

  test("a full phash flip is a cut; identical successor is not; the " +
    "first frame never is") {
    val z = Array.fill[Byte](64)(0) // phash 0
    val o = Array.fill[Byte](64)(1) // every 1-byte block odd -> all 64 bits
    val out = cuts(Seq((1L, 0, z), (1L, 1, o), (1L, 2, o)), t = 36)
    assert(out == Map((1L, 0) -> 0, (1L, 1) -> 1, (1L, 2) -> 0))
  }

  test("threshold is strict: hamming == t is not a cut") {
    val z = Array.fill[Byte](64)(0)
    val h36 = Array.tabulate[Byte](64)(i => if (i < 36) 1 else 0)
    assert(cuts(Seq((1L, 0, z), (1L, 1, h36)), t = 36) ==
      Map((1L, 0) -> 0, (1L, 1) -> 0))
    assert(cuts(Seq((1L, 0, z), (1L, 1, h36)), t = 35) ==
      Map((1L, 0) -> 0, (1L, 1) -> 1))
  }

  test("media are independent: windows never cross media_id") {
    val z = Array.fill[Byte](64)(0)
    val o = Array.fill[Byte](64)(1)
    // media 2's first frame differs wildly from media 1's last — no cut
    val out = cuts(Seq((1L, 0, z), (1L, 1, z), (2L, 0, o)), t = 36)
    assert(out == Map((1L, 0) -> 0, (1L, 1) -> 0, (2L, 0) -> 0))
  }

  test("framePhash agrees with perceptualHash on identical bytes") {
    val payload = "some deterministic payload bytes".getBytes("UTF-8")
    val whole = Multimodal.perceptualHash(
      Seq((7L, payload)).toDF("media_id", "payload"))
      .collect().head.getLong(1)
    val framed = Multimodal.framePhash(
      Seq((7L, 0, payload)).toDF("media_id", "frame_idx", "frame"))
      .collect().head.getLong(2)
    assert(whole == framed)
  }
}
