package graft.multimodal

/** Minimal deterministic WAV (RIFF) encoder: 16-bit signed little-endian
  * PCM, mono. Every byte of the output is a closed-form function of the
  * sample array:
  *
  *   length(n) = 44 (canonical RIFF/fmt/data header) + 2·n
  *
  * which lets the DuckDB oracle predict the on-disk byte count of a REAL
  * audio file without an audio codec, while the Spark side decodes the
  * bytes with the real JDK decoder (javax.sound.sampled.AudioSystem) —
  * the decode path under test is genuine, the test fixture is
  * predictable. Companion of [[Png]] for the image kind.
  */
object Wav {

  val HeaderBytes = 44

  /** Deterministic byte length of [[encodePcm16]]'s output. */
  def expectedLength(nSamples: Int): Long = HeaderBytes + 2L * nSamples

  /** Encode `samples` as a valid mono 16-bit PCM WAV readable by any
    * conformant decoder (including the JDK's AudioSystem). */
  def encodePcm16(samples: Array[Short], sampleRate: Int = 8000): Array[Byte] = {
    val dataLen = 2 * samples.length
    val buf = java.nio.ByteBuffer.allocate(HeaderBytes + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
    buf.putInt(36 + dataLen)               // RIFF chunk size
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII"))
    buf.putInt(16)                         // fmt chunk size (PCM)
    buf.putShort(1)                        // audio format: PCM
    buf.putShort(1)                        // channels: mono
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * 2)             // byte rate (blockAlign = 2)
    buf.putShort(2)                        // block align
    buf.putShort(16)                       // bits per sample
    buf.put("data".getBytes("US-ASCII"))
    buf.putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }
}
