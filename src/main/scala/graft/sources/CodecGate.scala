package graft.sources

/** Shared decode-entry refusal gate (r14): converts the raw overrun
  * exception classes a corrupt or truncated byte stream produces —
  * IndexOutOfBounds, BufferUnderflow, NegativeArraySize, inflater
  * DataFormat, ImageIO/EOF IOExceptions, ArithmeticException — into
  * NAMED `IllegalArgumentException` refusals carrying the codec name
  * and the original cause. The codecs' correctness on VALID files is
  * pinned by their round-trip and hand-built-fixture specs; this gate
  * only renames the failure class on invalid input, so an archive
  * with a flipped length field surfaces as "GRIB: corrupt or
  * truncated" instead of a bare ArrayIndexOutOfBoundsException deep
  * in an unpack loop. Count and length fields that drive ALLOCATION
  * are still bounded at their read sites — an allocation bomb must be
  * refused before the array is requested, not caught after
  * ([[CodecRobustnessSpec]] sweeps every truncation and bit flip of
  * every codec fixture to hold both properties).
  */
private[sources] object CodecGate {
  def gated[T](what: String)(body: => T): T =
    try body catch {
      case e: IndexOutOfBoundsException        => rename(what, e)
      case e: java.nio.BufferUnderflowException => rename(what, e)
      case e: NegativeArraySizeException        => rename(what, e)
      case e: java.util.zip.DataFormatException => rename(what, e)
      case e: ArithmeticException               => rename(what, e)
      // IOException deliberately NOT caught: decode paths may perform
      // live filesystem reads (HDF4 external-element siblings), and a
      // transient infra failure renamed to "corrupt stream" would
      // blacklist a healthy file (r14 review). Byte-level sources
      // that can raise IOExceptions (ImageIO) wrap them at the call
      // site, where corrupt-input is the only plausible cause.
    }

  private def rename(what: String, e: Throwable): Nothing =
    throw new IllegalArgumentException(
      s"$what: corrupt or truncated stream — " +
        e.getClass.getSimpleName +
        Option(e.getMessage).map(m => s": $m").getOrElse(""),
      e)
}
