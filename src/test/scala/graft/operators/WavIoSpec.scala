package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem, UnsupportedAudioFileException}

/** Equivalence gate for the r17 WavIo optimization: the cached-SPI
  * read/convert/write paths must be byte-for-byte identical to the
  * `AudioSystem` convenience entry points they replace (same provider
  * classes, minus the per-call synchronized registry scan). */
class WavIoSpec extends AnyFunSuite {

  private def pcm16leMono(rate: Float, samples: Array[Short]): Array[Byte] = {
    val raw = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      raw(2 * i) = (samples(i) & 0xff).toByte
      raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    raw
  }

  private def wavBytesVia(
      writeFn: (AudioInputStream, AudioFileFormat.Type, java.io.OutputStream) => Any,
      fmt: AudioFormat, raw: Array[Byte], frames: Long): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    writeFn(new AudioInputStream(new java.io.ByteArrayInputStream(raw), fmt, frames),
      AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private val rate = 8000f
  private val samples: Array[Short] =
    Array.tabulate(512)(i => ((i * 2731 + 17) % 65536 - 32768).toShort)
  private val fmt16 = new AudioFormat(rate, 16, 1, true, false)
  private val raw16 = pcm16leMono(rate, samples)

  test("write: WavIo output is byte-identical to AudioSystem.write") {
    val viaWavIo = wavBytesVia(Multimodal.WavIo.write, fmt16, raw16, samples.length.toLong)
    val viaJdk = wavBytesVia(
      (s, t, o) => AudioSystem.write(s, t, o), fmt16, raw16, samples.length.toLong)
    assert(viaWavIo.sameElements(viaJdk))
  }

  test("read: WavIo decodes the same format and bytes as AudioSystem") {
    val wav = wavBytesVia(Multimodal.WavIo.write, fmt16, raw16, samples.length.toLong)
    val a = Multimodal.WavIo.read(new java.io.ByteArrayInputStream(wav))
    val b = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(wav))
    assert(a.getFormat.toString === b.getFormat.toString)
    assert(a.readAllBytes().sameElements(b.readAllBytes()))
  }

  test("read is cache-independent: repeated + fresh-state decodes agree") {
    val wav = wavBytesVia(Multimodal.WavIo.write, fmt16, raw16, samples.length.toLong)
    // first call may populate the lastOk cache, second must hit it;
    // both must return the identical samples
    val first = Multimodal.WavIo.read(new java.io.ByteArrayInputStream(wav)).readAllBytes()
    val second = Multimodal.WavIo.read(new java.io.ByteArrayInputStream(wav)).readAllBytes()
    assert(first.sameElements(second))
    assert(first.sameElements(raw16))
  }

  test("convert: 8-bit unsigned → 16-bit signed LE mono matches AudioSystem") {
    val fmt8 = new AudioFormat(rate, 8, 1, false, false)
    val raw8 = Array.tabulate[Byte](256)(i => ((i * 37 + 5) % 256).toByte)
    def src() = new AudioInputStream(
      new java.io.ByteArrayInputStream(raw8), fmt8, raw8.length.toLong)
    val viaWavIo = Multimodal.WavIo.convert(fmt16, src()).readAllBytes()
    val viaJdk = AudioSystem.getAudioInputStream(fmt16, src()).readAllBytes()
    assert(viaWavIo.sameElements(viaJdk))
  }

  test("read: non-audio bytes fail loudly even with a warm reader cache") {
    val wav = wavBytesVia(Multimodal.WavIo.write, fmt16, raw16, samples.length.toLong)
    Multimodal.WavIo.read(new java.io.ByteArrayInputStream(wav)) // warm lastOk
    val junk = Array.tabulate[Byte](64)(i => (i * 13 + 7).toByte)
    intercept[UnsupportedAudioFileException] {
      Multimodal.WavIo.read(new java.io.ByteArrayInputStream(junk))
    }
  }

  test("concurrent decodes return identical samples (no shared-state corruption)") {
    val wav = wavBytesVia(Multimodal.WavIo.write, fmt16, raw16, samples.length.toLong)
    import scala.collection.parallel.CollectionConverters._
    val results = (1 to 16).par.map { _ =>
      Multimodal.WavIo.read(new java.io.ByteArrayInputStream(wav)).readAllBytes().toSeq
    }.toList
    assert(results.forall(_ == raw16.toSeq))
  }
}
