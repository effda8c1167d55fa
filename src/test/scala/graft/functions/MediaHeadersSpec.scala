package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

/** Round-trip property: every header-accurate container MediaGen emits must
  * parse back to exactly the generation parameters, plus malformed-input
  * hardening (the quarantine lane, not an exception).
  */
class MediaHeadersSpec extends AnyFunSuite {
  import MediaHeaders._

  // 200 deterministic cases per property (fixed seed, same pattern as
  // CodecPropertySpec — no scalatestplus bridge in the dependency set).
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    check(Prop.forAll(ga, gb) { (a, b) => f(a, b); true })
  private def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(f: (A, B, C) => Unit): Unit =
    check(Prop.forAll(ga, gb, gc) { (a, b, c) => f(a, b, c); true })
  private def forAll[A, B, C, D](ga: Gen[A], gb: Gen[B], gc: Gen[C], gd: Gen[D])(
      f: (A, B, C, D) => Unit): Unit =
    check(Prop.forAll(ga, gb, gc, gd) { (a: A, b: B, c: C, d: D) => f(a, b, c, d); true })
  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200).withInitialSeed(Seed(42L)), p)
    assert(res.passed, res.status.toString)
  }

  val genDim: Gen[Int] = Gen.chooseNum(1, 65535)

  test("PNG round-trips width/height") {
    forAll(genDim, genDim, Gen.listOf(Gen.choose(0, 255).map(_.toByte))) { (w, h, filler) =>
      val p = MediaGen.png(w, h, filler.toArray)
      assert(detect(p).contains("png"))
      assert(parseImage(p).contains(ImageMeta("png", w, h, 1)))
    }
  }

  test("JPEG round-trips width/height through the SOF marker walk") {
    forAll(genDim, genDim) { (w, h) =>
      val p = MediaGen.jpeg(w, h)
      assert(detect(p).contains("jpeg"))
      assert(parseImage(p).contains(ImageMeta("jpeg", w, h, 1)))
    }
  }

  test("GIF round-trips dims and counts every image descriptor") {
    forAll(genDim, genDim, Gen.chooseNum(0, 50)) { (w, h, frames) =>
      val p = MediaGen.gif(w, h, frames)
      assert(detect(p).contains("gif"))
      assert(parseImage(p).contains(ImageMeta("gif", w, h, frames)))
    }
  }

  test("WAV round-trips rate/channels/bits and the declared data size") {
    forAll(Gen.oneOf(8000, 16000, 22050, 44100, 48000), Gen.chooseNum(1, 8),
      Gen.oneOf(8, 16, 24, 32), Gen.chooseNum(0L, 1L << 40)) { (rate, ch, bits, dataBytes) =>
      val p = MediaGen.wav(rate, ch, bits, dataBytes)
      assert(detect(p).contains("wav"))
      val a = parseWav(p).get
      assert(a.sampleRate == rate && a.channels == ch && a.bitsPerSample == bits)
      assert(a.dataBytes == (dataBytes & 0xffffffffL),
        "declared size is a u32 field; parser reads it even with the body absent")
    }
  }

  test("WAV duration derives from declared size in integer microseconds") {
    // 48000 Hz * 2ch * 16bit = 1536000 bits/s; 192000 bytes = 1 second.
    val a = parseWav(MediaGen.wav(48000, 2, 16, 192000L)).get
    assert(a.durationMicros == 1000000L)
    assert(parseWav(MediaGen.wav(8000, 1, 16, 16000L)).get.durationMicros == 1000000L)
  }

  test("malformed payloads quarantine as None, never throw") {
    val garbage = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13)
    assert(detect(garbage).isEmpty)
    assert(detect(Array.emptyByteArray).isEmpty)
    // right magic, truncated header
    assert(parsePng(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a, 0, 0)).isEmpty)
    assert(parseJpeg(Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xd9.toByte)).isEmpty)
    assert(parseWav("RIFF0000WAVE".getBytes("ISO-8859-1")).isEmpty)
    // JPEG with desynced markers
    assert(parseJpeg(Array[Byte](0xff.toByte, 0xd8.toByte, 0x00, 0x00, 0x00)).isEmpty)
  }
}
