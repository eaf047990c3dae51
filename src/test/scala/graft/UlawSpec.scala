package graft

import graft.llm.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** m12 µ-law leg: the JDK codec's expansion must agree with the G.711
  * closed form the oracle replays, over the FULL 256-value wire
  * domain — plus container and round-trip invariants.
  */
class UlawSpec extends AnyFunSuite {
  import SparkTestBase.{spark, Sf}

  private def jdkExpand(ulawBytes: Array[Byte]): Array[Int] = {
    // wrap the raw µ-law bytes in the same fmt-7 WAV shape the fixture
    // emits, decode through the real SPI reader + conversion codec
    val n = ulawBytes.length
    val out = new Array[Byte](58 + n)
    val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(50 + n).put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(18)
      .putShort(7).putShort(1).putInt(8000).putInt(8000).putShort(1).putShort(8).putShort(0)
      .put("fact".getBytes("US-ASCII")).putInt(4).putInt(n)
      .put("data".getBytes("US-ASCII")).putInt(n)
      .put(ulawBytes)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(out))
    val target = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, false)
    val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, ais).readAllBytes()
    Array.tabulate(pcm.length / 2)(i => (pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8))
  }

  test("JDK ULAW expansion equals the G.711 closed form on all 256 wire bytes") {
    val wire = Array.tabulate(256)(_.toByte)
    val jdk = jdkExpand(wire)
    val ours = wire.map(b => Multimodal.ulawDecode(b & 0xff))
    assert(jdk.length == 256)
    val diffs = (0 until 256).filter(i => jdk(i) != ours(i))
    assert(diffs.isEmpty,
      diffs.take(5).map(i => s"byte $i: jdk=${jdk(i)} ours=${ours(i)}").mkString("; "))
  }

  test("encode→decode round trip is idempotent on companded values") {
    // G.711 is lossy once: re-encoding an expanded value must return
    // the same wire byte (the compander's fixed point)
    (0 until 256).foreach { b =>
      val v = Multimodal.ulawDecode(b)
      val b2 = Multimodal.ulawEncode(v)
      assert(Multimodal.ulawDecode(b2) == v, s"byte $b not a fixed point")
    }
  }

  test("m12 output: full cover, bounded 16-bit range, lossy but sign-preserving") {
    val rows = Multimodal.ulawStats(spark, Sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getInt(1) == 120 + (r.getLong(0) % 83).toInt, "n_samples from the header chain")
      assert(r.getInt(4) >= -32124 && r.getInt(5) <= 32124, "G.711 peak magnitude")
    }
  }
}
