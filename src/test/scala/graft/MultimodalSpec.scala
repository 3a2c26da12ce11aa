package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Gates for the q179 REAL PNG codec beyond the oracle (which proves
  * pixel losslessness): the payloads must actually BE PNG — if a future
  * edit silently swapped the codec for a passthrough of the raw pixel
  * bytes, the oracle would still pass, but the magic number and the
  * size-vs-raw delta here would not. */
class MultimodalSpec extends SparkSpec {

  test("q179 payloads are genuine PNG: magic bytes, container overhead, decodable") {
    val rows = Multimodal.encodePng(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val png = r.getAs[Array[Byte]]("png")
      // PNG signature: 137 80 78 71 13 10 26 10
      val magic = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
      assert(png.take(8).sameElements(magic), "missing PNG signature")
      assert(png.length > 16, "16 raw pixels can't fit a real PNG container")
    }
    // a deliberately truncated payload must fail to decode — the reader
    // is a real codec, not a byte passthrough
    val broken = rows.head.getAs[Array[Byte]]("png").take(10)
    val decoded = try Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(broken)))
    catch { case _: Throwable => None }
    assert(decoded.isEmpty, "truncated PNG decoded — codec is not real")
  }

  test("q199 payloads are genuine WAV: RIFF/WAVE header, container overhead, decodable format") {
    val rows = Multimodal.encodeWav(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val wav = r.getAs[Array[Byte]]("wav")
      // RIFF container: 'RIFF' at 0, 'WAVE' at 8
      assert(new String(wav.take(4), "US-ASCII") == "RIFF", "missing RIFF magic")
      assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE", "missing WAVE tag")
      assert(wav.length > 16, "16 raw PCM bytes can't fit a real WAV container")
      // header round-trips the declared format, not a passthrough guess
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      val f = ais.getFormat
      assert(f.getChannels == 2 && f.getSampleSizeInBits == 16
        && f.getSampleRate == 8000f && !f.isBigEndian, s"format drifted: $f")
    }
    // a headerless payload must fail to parse — the reader is a codec
    val broken = rows.head.getAs[Array[Byte]]("wav").drop(12)
    val parsed = try {
      javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(broken)); true
    } catch { case _: Throwable => false }
    assert(!parsed, "headerless WAV parsed — codec is not real")
  }

  test("q222 payloads are genuine Y4M: stream magic, frame markers, reader validates") {
    val rows = Multimodal.encodeY4m(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val y4m = r.getAs[Array[Byte]]("y4m")
      // container magic pinned: spec stream header, not a raw plane dump
      assert(new String(y4m.take(9), "US-ASCII") == "YUV4MPEG2",
        "missing YUV4MPEG2 magic")
      assert(y4m.length > 2 * 16, "2 raw 4x4 planes can't fit a real container")
      val (w, h, frames) = Multimodal.Y4mCodec.read(y4m)
      assert(w == 4 && h == 4 && frames.size == 2, s"decoded ${w}x$h x${frames.size}")
      // writer->reader plane round trip is byte-exact
      val rt = Multimodal.Y4mCodec.write(w, h, frames)
      assert(java.util.Arrays.equals(rt, y4m), "write(read(x)) != x")
    }
    val sample = rows.head.getAs[Array[Byte]]("y4m")
    // headerless bytes must fail to parse — the reader is a codec
    assertThrows[IllegalArgumentException] {
      Multimodal.Y4mCodec.read(sample.drop(10))
    }
    // a truncated final frame plane must fail, not silently short-read
    assertThrows[IllegalArgumentException] {
      Multimodal.Y4mCodec.read(sample.dropRight(3))
    }
    // a non-mono colorspace must be rejected by this reader
    val c420 = new String(sample, "US-ASCII").replaceFirst("Cmono", "C420")
    assertThrows[IllegalArgumentException] {
      Multimodal.Y4mCodec.read(c420.getBytes("US-ASCII"))
    }
  }
}
