package graft

import graft.llm.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** m13 A-law leg: JDK codec expansion vs the G.711 closed form over
  * the full 256-value wire domain, compander fixed point, output
  * invariants.
  */
class AlawSpec extends AnyFunSuite {
  import SparkTestBase.{spark, Sf}

  private def jdkExpand(alawBytes: Array[Byte]): Array[Int] = {
    val n = alawBytes.length
    val out = new Array[Byte](58 + n)
    val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(50 + n).put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(18)
      .putShort(6).putShort(1).putInt(8000).putInt(8000).putShort(1).putShort(8).putShort(0)
      .put("fact".getBytes("US-ASCII")).putInt(4).putInt(n)
      .put("data".getBytes("US-ASCII")).putInt(n)
      .put(alawBytes)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(out))
    val target = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, false)
    val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, ais).readAllBytes()
    Array.tabulate(pcm.length / 2)(i => (pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8))
  }

  test("JDK ALAW expansion equals the G.711 closed form on all 256 wire bytes") {
    val wire = Array.tabulate(256)(_.toByte)
    val jdk = jdkExpand(wire)
    val ours = wire.map(b => Multimodal.alawDecode(b & 0xff))
    assert(jdk.length == 256)
    val diffs = (0 until 256).filter(i => jdk(i) != ours(i))
    assert(diffs.isEmpty,
      diffs.take(8).map(i => s"byte $i: jdk=${jdk(i)} ours=${ours(i)}").mkString("; "))
  }

  test("encode→decode round trip is idempotent on companded values") {
    (0 until 256).foreach { b =>
      val v = Multimodal.alawDecode(b)
      val b2 = Multimodal.alawEncode(v)
      assert(Multimodal.alawDecode(b2) == v, s"byte $b not a fixed point")
    }
  }

  test("m13 output: full cover, bounded A-law peak range") {
    val rows = Multimodal.alawStats(spark, Sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getInt(1) == 110 + (r.getLong(0) % 71).toInt, "n_samples from the header chain")
      assert(r.getInt(4) >= -32256 && r.getInt(5) <= 32256, "A-law peak magnitude")
    }
  }
}
