package graft

import graft.ops.MediaQueries
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the REAL uncompressed-media codecs: the decoders
  * must read back ARBITRARY spec-valid files (built here by independent
  * writers, not the library's encoders), byte-exactly — the property a
  * genuine parser has and a fixed-layout fake does not. Deterministic
  * seed sequence, same convention as Scd2PropertySpec.
  */
class MediaCodecPropertySpec extends AnyFunSuite {

  /** Run `body` over `n` deterministic samples of `gen`. */
  private def forSamples[T](gen: Gen[T], n: Int)(body: T => Unit): Unit = {
    var seed = Seed(1234L)
    (0 until n).foreach { _ =>
      body(gen.pureApply(Gen.Parameters.default, seed))
      seed = seed.next
    }
  }

  /** Independent WAV writer: optional foreign chunk before data. */
  private def buildWav(rate: Int, samples: Array[Short],
                       foreignChunk: Int): Array[Byte] = {
    val extra = if (foreignChunk > 0) 8 + foreignChunk + (foreignChunk & 1) else 0
    val bb = java.nio.ByteBuffer.allocate(44 + extra + 2 * samples.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII"))
      .putInt(36 + extra + 2 * samples.length)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1).putShort(1)
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
    if (foreignChunk > 0) {
      bb.put("junk".getBytes("US-ASCII")).putInt(foreignChunk)
        .put(Array.fill[Byte](foreignChunk + (foreignChunk & 1))(0x55))
    }
    bb.put("data".getBytes("US-ASCII")).putInt(2 * samples.length)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Independent BMP writer over explicit top-down blue rows; green/red
    * channels differ so summing the wrong channel fails. */
  private def buildBmp(blues: Array[Array[Int]]): Array[Byte] = {
    val h = blues.length
    val w = blues(0).length
    val stride = (3 * w + 3) & ~3
    val bb = java.nio.ByteBuffer.allocate(54 + stride * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + stride * h)
      .putShort(0).putShort(0).putInt(54)
    bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24).putInt(0)
      .putInt(stride * h).putInt(0).putInt(0).putInt(0).putInt(0)
    for (row <- h - 1 to 0 by -1) {
      for (x <- 0 until w)
        bb.put(blues(row)(x).toByte).put(((row + x) % 256).toByte)
          .put(((row * 7 + x) % 256).toByte)
      bb.put(Array.fill[Byte](stride - 3 * w)(0x3c))
    }
    bb.array()
  }

  private case class WavCase(rate: Int, samples: Array[Short], junk: Int)

  test("WAV decoder reads arbitrary generated PCM files exactly") {
    val gen: Gen[WavCase] = for {
      rate <- Gen.oneOf(8000, 16000, 22050, 44100)
      n <- Gen.choose(0, 400)
      samples <- Gen.listOfN(n,
        Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt))
      junk <- Gen.oneOf(0, 1, 5, 16)
    } yield WavCase(rate, samples.map(_.toShort).toArray, junk)
    forSamples(gen, 60) { c =>
      val meta = MediaQueries.decodeWav(1L, buildWav(c.rate, c.samples, c.junk))
      assert(meta.sample_rate === c.rate.toLong)
      assert(meta.n_samples === c.samples.length.toLong)
      assert(meta.sum_abs === c.samples.map(s => math.abs(s.toLong)).sum)
      assert(meta.duration_ms === c.samples.length * 1000L / c.rate)
    }
  }

  test("BMP decoder reads arbitrary generated images exactly") {
    val gen: Gen[Array[Array[Int]]] = for {
      w <- Gen.choose(1, 24)
      h <- Gen.choose(1, 24)
      rows <- Gen.listOfN(h, Gen.listOfN(w, Gen.choose(0, 255)))
    } yield rows.map(_.toArray).toArray
    forSamples(gen, 60) { blues =>
      val meta = MediaQueries.decodeBmp(1L, buildBmp(blues))
      assert(meta.width === blues(0).length.toLong)
      assert(meta.height === blues.length.toLong)
      assert(meta.n_pixels === blues(0).length.toLong * blues.length)
      assert(meta.sum_blue === blues.flatten.map(_.toLong).sum)
    }
  }
}
