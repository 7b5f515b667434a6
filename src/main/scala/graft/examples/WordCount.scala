package graft.examples

import graft.core.{JobSpec, SortOpt}
import java.nio.charset.StandardCharsets

/** WordCount with tokenizer parity to the reference
  * (`lib/mini_hadoop/examples/word_count.ex:12-147`):
  *   - downcase, then words = maximal runs of letters / decimal digits /
  *     ' / - / _ (Unicode letters included — the reference's state machine
  *     accepts `\p{L}` codepoints but only DECIMAL digits,
  *     word_count.ex:100-110, hence `\p{Nd}` not `\p{N}`: Ⅻ and ② are
  *     separators there, not word characters);
  *   - validity filter (word_count.ex:118-128): "a" and "i" pass, ""
  *     fails, otherwise UTF-8 byte length ≥ 2 AND contains a letter.
  */
object WordCount {

  private val WordRun = "[\\p{L}\\p{Nd}'_-]+".r

  def validWord(w: String): Boolean =
    w == "a" || w == "i" ||
      (w.getBytes(StandardCharsets.UTF_8).length >= 2 && w.exists(_.isLetter))

  def tokenize(text: String): Seq[String] =
    WordRun.findAllIn(text.toLowerCase).toSeq.filter(validWord)

  /** Per-line mapper + summing reducer. The reference mapper pre-counts
    * within its 8MB block (word_count.ex:15-18); per-line emission plus
    * the same reducer yields identical totals. */
  def spec(sortOpt: Option[SortOpt] = Some(SortOpt.Default)): JobSpec[String, Long] =
    JobSpec[String, Long](
      "word_count",
      line => tokenize(line).map(_ -> 1L),
      (word, counts) => Iterator.single(word -> counts.sum),
      sortOpt,
      combine = Some(_ + _)) // the reference mapper pre-counts per block
}
