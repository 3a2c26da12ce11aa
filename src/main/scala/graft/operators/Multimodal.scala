package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{GraftQuery, Tables}

/** Typed row for the q62 decoder boundary. Top-level and public on
  * purpose: nested/private case classes break the encoder's *generated*
  * serializer (Janino cannot reference them → "Failed to compile" →
  * per-record interpreted fallback on the decode path). */
final case class DecodedFeature(doc_id: Long, j: Int, feat: Double)

/** Typed rows for the q179 REAL PNG codec boundary (same top-level
  * rule as [[DecodedFeature]]). */
final case class PngPayload(doc_id: Long, png: Array[Byte])
final case class PixelStats(doc_id: Long, n_px: Int, px_checksum: Long,
    px_min: Int, px_max: Int)

/** Typed rows for the q199 REAL WAV codec boundary. */
final case class WavPayload(doc_id: Long, wav: Array[Byte])
final case class ChannelStats(doc_id: Long, ch: Int, n_smp: Int,
    smp_checksum: Long, smp_min: Int, smp_max: Int)

/** Typed rows for the q222 REAL Y4M video codec boundary. */
final case class Y4mPayload(doc_id: Long, y4m: Array[Byte])
final case class FrameStats(doc_id: Long, frame: Int, n_px: Int,
    px_checksum: Long, px_min: Int, px_max: Int)

/** Multimodal binary-column plumbing (north-star extension; the
  * reference's only binary artifacts are its .npy/.pkl sidecars,
  * app/generate_embeddings.py:52-68 — no image/audio surface exists
  * there): image/audio/video as
  * opaque `BINARY` payloads with typed metadata, plus the decode /
  * feature-extract / frame-sample operator shapes a training-data pipeline
  * needs.
  *
  * The container has no external media codecs, so the GENERIC decode
  * step (q62) is a clearly-marked deterministic STUB (md5-derived
  * bytes) behind real per-partition batch plumbing. The IMAGE leg is
  * real end-to-end since q179 (the JDK's own `javax.imageio` PNG codec,
  * losslessness proven by the codec-free DuckDB oracle) and the AUDIO
  * leg since q199 (`javax.sound.sampled` WAV/PCM, per-channel sample
  * stats re-derived from the hash by the oracle), and the VIDEO leg
  * since q222 (a pure-JVM YUV4MPEG2 container writer+reader, per-frame
  * plane stats re-derived from the hash by the oracle) — all three
  * modalities are now real end-to-end; q62 remains the generic
  * stub-shaped decode harness for codecs the container doesn't ship.
  * The q60-q63 payloads are the utf-8 encoding of `documents.text` so
  * DuckDB can replay every byte (`encode(text)`).
  *
  * At 100 TB the payload column dominates I/O: every query here projects
  * only the columns it needs (parquet column pruning keeps un-read
  * payloads on disk) and computes per-row with no shuffle until the final
  * order/agg.
  */
object Multimodal {

  /** The synthetic modality catalog: source -> (mime, kind). */
  private def mime: Column =
    when(col("source") === "src0", "image/png")
      .when(col("source") === "src1", "audio/wav")
      .otherwise("video/mp4")

  /** documents as a binary-payload table:
    * (doc_id, payload BINARY, meta STRUCT<mime, n_bytes>). */
  def binaryTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        mime.as("mime"),
        length(col("text").cast("binary")).as("n_bytes")).as("meta"))

  // ---------------------------------------------------------------------
  // q60: binary ingest + typed metadata + content digest
  // ---------------------------------------------------------------------

  val q60BinaryIngest = GraftQuery(
    "q60_binary_ingest",
    "north-star multimodal ingest; S4,F7",
    (s, d) =>
      binaryTable(s, d).select(
        col("doc_id"),
        col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"),
        md5(col("payload")).as("digest"))
      .orderBy(col("doc_id")),
    Some("""SELECT doc_id,
        CASE WHEN source = 'src0' THEN 'image/png'
             WHEN source = 'src1' THEN 'audio/wav'
             ELSE 'video/mp4' END AS mime,
        octet_length(encode(text)) AS n_bytes,
        md5(text) AS digest
      FROM documents ORDER BY doc_id"""))

  // ---------------------------------------------------------------------
  // q61: frame sampling — K fixed offsets into the payload
  // ---------------------------------------------------------------------

  private val Frames = 4 // frames sampled per payload
  private val FrameBytes = 16 // bytes per sampled frame

  /** Sample `Frames` evenly-spaced 16-byte windows from each payload (the
    * video frame-sample shape: offset arithmetic on an opaque blob, one
    * output row per frame). Offsets are computed on the hex encoding so
    * the byte slices are replayable in DuckDB; the per-frame "feature" is
    * the md5 of the slice. */
  val q61FrameSample = GraftQuery(
    "q61_frame_sample",
    "north-star multimodal frame-sample",
    (s, d) => {
      val hexed = binaryTable(s, d).select(
        col("doc_id"),
        hex(col("payload")).as("h"),
        col("meta.n_bytes").as("n_bytes"))
      // stride in bytes; hex offset = 1 + frame * stride * 2
      val stride = floor(col("n_bytes") / Frames)
      hexed
        .select(col("doc_id"), posexplode(array((0 until Frames).map { i =>
          md5(col("h").substr(
            (lit(1) + lit(i) * stride * 2).cast("int"),
            lit(FrameBytes * 2)).cast("binary"))
        }: _*)).as(Seq("frame", "feature")))
        .orderBy(col("doc_id"), col("frame"))
    },
    Some("""WITH hx AS (
        SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n_bytes
        FROM documents),
      fr AS (
        SELECT doc_id, f AS frame,
          md5(substr(h, CAST(1 + f * (n_bytes // 4) * 2 AS INT), 32)) AS feature
        FROM hx CROSS JOIN (SELECT unnest(range(0, 4)) AS f))
      SELECT doc_id, CAST(frame AS INT) AS frame, feature
      FROM fr ORDER BY doc_id, frame"""))

  // ---------------------------------------------------------------------
  // q62: decode + feature-extract STUB behind real batch plumbing
  // ---------------------------------------------------------------------

  /** STUB DECODER — this is where a real image/audio decoder (JNI codec,
    * ONNX runtime, …) would plug in; the container ships none, so the
    * "decoded features" are a deterministic fake: the first 8 bytes of
    * md5(payload), scaled to [0,1]. The *plumbing* is the real thing: a
    * per-partition batch iterator over the binary column (one codec
    * instance per partition, amortized across rows — the Spark-side shape
    * a native decoder needs), exploded to a typed (doc_id, j, feat)
    * feature table. */
  def decodeFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val enc = org.apache.spark.sql.Encoders.product[DecodedFeature]
    binaryTable(s, d)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // one "decoder" per partition (MessageDigest standing in for a codec)
        val codec = MessageDigest.getInstance("MD5")
        rows.flatMap { case (id, payload) =>
          codec.reset()
          val digest = codec.digest(payload)
          (0 until 8).iterator.map { j =>
            DecodedFeature(id, j, math.round((digest(j) & 0xff) / 255.0 * 10000) / 10000.0)
          }
        }
      }(enc)
      .toDF()
      .orderBy(col("doc_id"), col("j"))
  }

  val q62DecodeStub = GraftQuery(
    "q62_decode_features",
    "north-star multimodal decode/feature-extract (stubbed codec)",
    (s, d) => decodeFeatures(s, d),
    Some("""WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents)
      SELECT doc_id, CAST(j AS INT) AS j,
        round(('0x' || substr(hx, CAST(2*j + 1 AS INT), 2))::INT / 255.0, 4) AS feat
      FROM h CROSS JOIN (SELECT unnest(range(0, 8)) AS j)
      ORDER BY doc_id, j"""))

  // ---------------------------------------------------------------------
  // q63: modality-level metadata aggregation
  // ---------------------------------------------------------------------

  val q63ModalityAgg = GraftQuery(
    "q63_modality_agg",
    "north-star multimodal metadata agg; A1,A5",
    (s, d) =>
      binaryTable(s, d)
        .groupBy(col("meta.mime").as("mime"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("meta.n_bytes")).as("total_bytes"),
          round(avg(col("meta.n_bytes")), 2).as("avg_bytes"),
          max(col("meta.n_bytes")).as("max_bytes"))
        .orderBy(col("mime")),
    Some("""SELECT
        CASE WHEN source = 'src0' THEN 'image/png'
             WHEN source = 'src1' THEN 'audio/wav'
             ELSE 'video/mp4' END AS mime,
        count(*) AS n,
        CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        round(avg(octet_length(encode(text))), 2) AS avg_bytes,
        max(octet_length(encode(text))) AS max_bytes
      FROM documents GROUP BY 1 ORDER BY mime"""))

  // ---------------------------------------------------------------------
  // q179: REAL image codec round trip — javax.imageio PNG, no stub
  // ---------------------------------------------------------------------

  /** Deterministic 4×4 grayscale image per document — pixel i is byte i
    * of md5(text) — encoded to REAL PNG bytes with the JDK's own codec
    * (`javax.imageio`, pure JVM, no external libs: the one decoder this
    * container actually ships). One encoder per partition, ImageIO's
    * file-cache off — the per-partition-codec batch shape q62 documents,
    * now with a genuine codec in it. */
  def encodePng(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val enc = org.apache.spark.sql.Encoders.product[PngPayload]
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        val codec = MessageDigest.getInstance("MD5")
        rows.map { case (id, payload) =>
          codec.reset()
          val px = codec.digest(payload) // 16 bytes = 4x4 gray pixels
          val img = new java.awt.image.BufferedImage(4, 4,
            java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          img.getRaster.setDataElements(0, 0, 4, 4, px)
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", out)
          PngPayload(id, out.toByteArray)
        }
      }(enc).toDF()
  }

  /** q179: the stub retired for images — a REAL PNG encode → decode
    * round trip. Pixels are md5-derived, so the DuckDB oracle replays
    * the per-doc pixel statistics STRAIGHT FROM THE HASH, never touching
    * a codec: hash equality therefore PROVES the JDK PNG writer+reader
    * pair is lossless on every document (any codec corruption — gamma,
    * palette, truncation — would shift a checksum and fail the gate).
    * Audio followed in q199 (WAV) and video in q222 (Y4M) — every
    * modality of the tier is real end-to-end. */
  val q179PngRoundTrip = GraftQuery(
    "q179_png_roundtrip",
    "north-star multimodal: REAL javax.imageio PNG encode->decode, losslessness oracle-proven",
    (s, d) => {
      import s.implicits._
      val enc = org.apache.spark.sql.Encoders.product[PixelStats]
      encodePng(s, d).as[(Long, Array[Byte])]
        .mapPartitions { rows =>
          javax.imageio.ImageIO.setUseCache(false)
          rows.map { case (id, png) =>
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(png))
            val r = img.getRaster
            val vs = for (y <- 0 until 4; x <- 0 until 4)
              yield r.getSample(x, y, 0)
            PixelStats(id, vs.size,
              vs.zipWithIndex.map { case (v, i) => v.toLong * (i + 1) }.sum,
              vs.min, vs.max)
          }
        }(enc).toDF()
        .orderBy(col("doc_id"))
    },
    Some("""WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents),
      px AS (
        SELECT doc_id, i,
          ('0x' || substr(hx, CAST(2*i + 1 AS INT), 2))::INT AS v
        FROM h CROSS JOIN (SELECT unnest(range(0, 16)) AS i))
      SELECT doc_id, CAST(count(*) AS INT) AS n_px,
        CAST(sum(v * (i + 1)) AS BIGINT) AS px_checksum,
        CAST(min(v) AS INT) AS px_min, CAST(max(v) AS INT) AS px_max
      FROM px GROUP BY 1 ORDER BY doc_id"""))

  // ---------------------------------------------------------------------
  // q199: REAL audio codec round trip — javax.sound.sampled WAV/PCM
  // ---------------------------------------------------------------------

  private val WavRate = 8000f
  private val WavChannels = 2
  private val WavFrames = 4 // 4 stereo frames = 8 16-bit samples = 16 bytes

  /** Deterministic stereo PCM clip per document — the 16 md5(text)
    * bytes as 4 frames of interleaved little-endian 16-bit samples —
    * encoded to REAL WAV bytes with the JDK's own audio stack
    * (`javax.sound.sampled.AudioSystem`, pure JVM: the second genuine
    * codec this container ships, after q179's imageio PNG). One
    * format/codec instance per partition — the per-partition batch
    * shape q62 documents. */
  def encodeWav(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val enc = org.apache.spark.sql.Encoders.product[WavPayload]
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val fmt = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          WavRate, 16, WavChannels, 2 * WavChannels, WavRate, false)
        val codec = MessageDigest.getInstance("MD5")
        rows.map { case (id, payload) =>
          codec.reset()
          val pcm = codec.digest(payload) // 16 bytes = 4 stereo frames
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, WavFrames.toLong)
          val out = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
          WavPayload(id, out.toByteArray)
        }
      }(enc).toDF()
  }

  /** q199: the audio stub retired the way q179 retired the image stub —
    * a REAL WAV encode → decode round trip. Samples are md5-derived, so
    * the DuckDB oracle re-derives the per-channel sample statistics
    * STRAIGHT FROM THE HASH, never touching a codec: hash equality
    * PROVES the JDK WAV writer+reader pair preserves every sample,
    * header field included (a byte-order, channel-interleave or header
    * corruption would shift a checksum or a count and fail the gate).
    * The video leg is real since q222 (Y4M) — every modality now runs
    * a genuine writer+reader pair end-to-end. */
  val q199WavRoundTrip = GraftQuery(
    "q199_wav_roundtrip",
    "north-star multimodal: REAL javax.sound WAV encode->decode, per-channel stats oracle-proven",
    (s, d) => {
      import s.implicits._
      val enc = org.apache.spark.sql.Encoders.product[ChannelStats]
      encodeWav(s, d).as[(Long, Array[Byte])]
        .mapPartitions { rows =>
          rows.flatMap { case (id, wav) =>
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(wav))
            val f = ais.getFormat
            require(f.getChannels == WavChannels
              && f.getSampleSizeInBits == 16 && !f.isBigEndian,
              s"decoded format drifted: $f")
            val pcm = ais.readAllBytes()
            require(pcm.length == 4 * WavFrames,
              s"decoded ${pcm.length} bytes, expected ${4 * WavFrames}")
            (0 until WavChannels).map { ch =>
              val vs = (0 until WavFrames).map { fr =>
                val i = 2 * (fr * WavChannels + ch)
                (((pcm(i + 1) & 0xff) << 8) | (pcm(i) & 0xff)).toShort.toInt
              }
              ChannelStats(id, ch, vs.size,
                vs.zipWithIndex.map { case (v, fr) => v.toLong * (fr + 1) }.sum,
                vs.min, vs.max)
            }
          }
        }(enc).toDF()
        .orderBy(col("doc_id"), col("ch"))
    },
    Some("""WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents),
      smp AS (
        SELECT doc_id, CAST(i % 2 AS INT) AS ch, i // 2 AS frame,
          ('0x' || substr(hx, CAST(4*i + 3 AS INT), 2))::INT * 256
            + ('0x' || substr(hx, CAST(4*i + 1 AS INT), 2))::INT AS raw
        FROM h CROSS JOIN (SELECT unnest(range(0, 8)) AS i)),
      sv AS (
        SELECT doc_id, ch, frame,
          CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS v
        FROM smp)
      SELECT doc_id, ch, CAST(count(*) AS INT) AS n_smp,
        CAST(sum(v * (frame + 1)) AS BIGINT) AS smp_checksum,
        CAST(min(v) AS INT) AS smp_min, CAST(max(v) AS INT) AS smp_max
      FROM sv GROUP BY 1, 2 ORDER BY doc_id, ch"""))

  // ---------------------------------------------------------------------
  // q222: REAL video codec round trip — YUV4MPEG2 (Y4M) container
  // ---------------------------------------------------------------------

  private val Y4mW = 4
  private val Y4mH = 4
  private val Y4mFrames = 2

  /** Pure-JVM YUV4MPEG2 container codec — the video leg of the
    * multimodal tier, retired the way q199 retired audio (the container
    * ships no compressed-video codec, and a LOSSY codec could never be
    * oracle-proven anyway; Y4M is the standard uncompressed interchange
    * container every video toolchain reads). Writer emits the spec
    * stream header (`YUV4MPEG2 W.. H.. F25:1 Ip A1:1 Cmono`) and one
    * `FRAME` marker per plane; reader parses and VALIDATES the header
    * (magic, dimensions, mono colorspace) and slices exact-size frame
    * planes — headerless, truncated, or wrong-colorspace bytes all fail
    * loudly (MultimodalSpec pins each). */
  private[graft] object Y4mCodec {
    private val Magic = "YUV4MPEG2"
    private val Ascii = java.nio.charset.StandardCharsets.US_ASCII

    def write(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
      require(frames.forall(_.length == w * h),
        s"frame plane must be ${w * h} bytes")
      val out = new java.io.ByteArrayOutputStream()
      out.write(s"$Magic W$w H$h F25:1 Ip A1:1 Cmono\n".getBytes(Ascii))
      frames.foreach { f => out.write("FRAME\n".getBytes(Ascii)); out.write(f) }
      out.toByteArray
    }

    /** Parse a Y4M stream → (width, height, Y planes). */
    def read(bytes: Array[Byte]): (Int, Int, Seq[Array[Byte]]) = {
      val nl0 = bytes.indexOf('\n'.toByte)
      require(nl0 > 0, "y4m: no stream header line")
      val header = new String(bytes, 0, nl0, Ascii)
      val toks = header.split(' ')
      require(toks.head == Magic, s"y4m: bad magic '${toks.head}'")
      def param(p: Char): Option[String] =
        toks.tail.find(_.startsWith(p.toString)).map(_.drop(1))
      val w = param('W').map(_.toInt).getOrElse(
        throw new IllegalArgumentException("y4m: missing W"))
      val h = param('H').map(_.toInt).getOrElse(
        throw new IllegalArgumentException("y4m: missing H"))
      require(param('C').forall(_ == "mono"),
        s"y4m: unsupported colorspace C${param('C').get} (mono reader)")
      val planeLen = w * h
      val frames = Seq.newBuilder[Array[Byte]]
      var pos = nl0 + 1
      while (pos < bytes.length) {
        val nl = bytes.indexOf('\n'.toByte, pos)
        require(nl > 0, "y4m: truncated FRAME marker")
        val marker = new String(bytes, pos, nl - pos, Ascii)
        require(marker == "FRAME" || marker.startsWith("FRAME "),
          s"y4m: bad frame marker '$marker'")
        require(nl + 1 + planeLen <= bytes.length,
          s"y4m: truncated frame plane at offset ${nl + 1}")
        frames += java.util.Arrays.copyOfRange(bytes, nl + 1, nl + 1 + planeLen)
        pos = nl + 1 + planeLen
      }
      (w, h, frames.result())
    }
  }

  /** Deterministic 2-frame mono clip per document — frame 0 is the 16
    * md5(text) bytes as a 4×4 Y plane, frame 1 the md5 of frame 0's hex
    * (DuckDB's `md5(md5(text))`, so the oracle can re-derive BOTH
    * planes) — written as a REAL Y4M stream. One digest instance per
    * partition (the per-partition-codec batch shape q62 documents). */
  def encodeY4m(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val enc = org.apache.spark.sql.Encoders.product[Y4mPayload]
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val md = MessageDigest.getInstance("MD5")
        def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
        rows.map { case (id, payload) =>
          md.reset()
          val f0 = md.digest(payload)
          md.reset()
          val f1 = md.digest(hex(f0).getBytes(
            java.nio.charset.StandardCharsets.US_ASCII))
          Y4mPayload(id, Y4mCodec.write(Y4mW, Y4mH, Seq(f0, f1)))
        }
      }(enc).toDF()
  }

  /** q222: the video stub retired — a REAL Y4M encode → decode round
    * trip, the last modality's asterisk removed (COVERAGE §2.9). Pixels
    * are md5-derived, so the DuckDB oracle re-derives every frame's
    * pixel statistics STRAIGHT FROM THE HASH, never touching the
    * container: hash equality PROVES the writer+reader pair preserves
    * every plane byte and frame boundary (a header drift, frame
    * re-order, or off-by-one plane slice would shift a checksum or a
    * frame count and fail the gate). */
  val q222Y4mRoundTrip = GraftQuery(
    "q222_y4m_roundtrip",
    "north-star multimodal: REAL Y4M video container encode->decode, per-frame stats oracle-proven",
    (s, d) => {
      import s.implicits._
      val enc = org.apache.spark.sql.Encoders.product[FrameStats]
      encodeY4m(s, d).as[(Long, Array[Byte])]
        .mapPartitions { rows =>
          rows.flatMap { case (id, y4m) =>
            val (w, h, frames) = Y4mCodec.read(y4m)
            require(w == Y4mW && h == Y4mH && frames.size == Y4mFrames,
              s"decoded shape drifted: ${w}x$h x${frames.size}")
            frames.zipWithIndex.map { case (plane, f) =>
              val vs = plane.map(_ & 0xff)
              FrameStats(id, f, vs.length,
                vs.zipWithIndex.map { case (v, i) => v.toLong * (i + 1) }.sum,
                vs.min, vs.max)
            }
          }
        }(enc).toDF()
        .orderBy(col("doc_id"), col("frame"))
    },
    Some("""WITH h AS (
        SELECT doc_id, md5(text) AS h0, md5(md5(text)) AS h1 FROM documents),
      px AS (
        SELECT doc_id, f.frame, i.i,
          ('0x' || substr(CASE WHEN f.frame = 0 THEN h0 ELSE h1 END,
            CAST(2*i.i + 1 AS INT), 2))::INT AS v
        FROM h
        CROSS JOIN (SELECT unnest(range(0, 2)) AS frame) f
        CROSS JOIN (SELECT unnest(range(0, 16)) AS i) i)
      SELECT doc_id, CAST(frame AS INT) AS frame, CAST(count(*) AS INT) AS n_px,
        CAST(sum(v * (i + 1)) AS BIGINT) AS px_checksum,
        CAST(min(v) AS INT) AS px_min, CAST(max(v) AS INT) AS px_max
      FROM px GROUP BY 1, 2 ORDER BY doc_id, frame"""))

  def queries: Seq[GraftQuery] = Seq(
    q60BinaryIngest, q61FrameSample, q62DecodeStub, q63ModalityAgg,
    q179PngRoundTrip, q199WavRoundTrip, q222Y4mRoundTrip)
}
