package graft.core

import java.io.{BufferedWriter, FileWriter, RandomAccessFile}
import java.nio.charset.StandardCharsets

/** The reference's two single-file sinks, byte-format-compatible.
  *
  * S6 — JSON object sink (`lib/mini_hadoop/job/job_runner.ex:242-270`):
  * ONE JSON object `{\n  "k": v,\n  "k2": v2\n}` — not JSONL. Inherently a
  * single-file driver-side write; for distributed output use
  * `df.write.json` (documented divergence, SURVEY §7.3).
  *
  * S7 — TSV sink with count header (`job_runner.ex:272-323`): `k\tv`
  * lines under a 50-char-padded `# <suffix> - Total: N entries` header
  * that is back-patched at offset 0 after streaming, so the writer never
  * needs the count up front.
  */
object Sinks {

  private val ChunkSize = 250 // @write_chunk_size, job_runner.ex:12

  /** JSON scalar rendering close to Jason.encode!: strings quoted+escaped,
    * integral numbers bare, doubles via Scala toString (case of the
    * exponent marker may differ from Elixir — cosmetic, documented). */
  private[graft] def jsonValue(v: Any): String = v match {
    case null => "null"
    case s: String => "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    case b: Boolean => b.toString
    case other => other.toString
  }

  /** Write `{"k": v, ...}` as one JSON object; returns the entry count. */
  def writeJsonObject[K, V](path: String, it: Iterator[(K, V)]): Long = {
    val w = new BufferedWriter(new FileWriter(path, StandardCharsets.UTF_8))
    try {
      w.write("{\n")
      var n = 0L
      it.grouped(ChunkSize).foreach { batch =>
        batch.foreach { case (k, v) =>
          if (n > 0) w.write(",\n")
          w.write("  \"")
          w.write(k.toString.replace("\\", "\\\\").replace("\"", "\\\""))
          w.write("\": ")
          w.write(jsonValue(v))
          n += 1
        }
      }
      w.write("\n}")
      n
    } finally w.close()
  }

  /** Write `k\tv` lines with the back-patched count header; returns the
    * entry count. `suffix` is e.g. "unsorted" or "sorted by value desc". */
  def writeTsvWithCount[K, V](path: String, it: Iterator[(K, V)],
      suffix: String): Long = {
    val w = new BufferedWriter(new FileWriter(path, StandardCharsets.UTF_8))
    val placeholder = s"# $suffix - Total: ".padTo(50, ' ') + "\n"
    var n = 0L
    try {
      w.write(placeholder)
      it.grouped(ChunkSize).foreach { batch =>
        batch.foreach { case (k, v) =>
          w.write(k.toString); w.write("\t"); w.write(v.toString); w.write("\n")
          n += 1
        }
      }
    } finally w.close()
    // back-patch the header at offset 0 (same trick as job_runner.ex:303-308)
    val header = s"# $suffix - Total: $n entries".padTo(50, ' ') + "\n"
    val raf = new RandomAccessFile(path, "rw")
    try {
      raf.seek(0)
      raf.write(header.getBytes(StandardCharsets.UTF_8))
    } finally raf.close()
    n
  }
}
