package graft

import graft.examples.WordCount
import org.scalatest.funsuite.AnyFunSuite

/** Reference tokenizer parity (word_count.ex:29-128): word chars are
  * letters/digits/'/-/_; validity keeps "a"/"i", else needs UTF-8 byte
  * length ≥ 2 and at least one letter. */
class TokenizerSpec extends AnyFunSuite {

  /** Seeded sampler over a word/non-word char soup (property-test stand-in;
    * scalatest's scalacheck bridge isn't in the offline dep cache). */
  private def randomStrings(n: Int): Seq[String] = {
    val rnd = new scala.util.Random(42)
    val alphabet = "abzAZ019'-_ .,;\t!éß汉 "
    Seq.fill(n)(Seq.fill(rnd.nextInt(40))(
      alphabet(rnd.nextInt(alphabet.length))).mkString)
  }

  test("basic tokenization and case folding") {
    assert(WordCount.tokenize("The CAT and the hat") ==
      Seq("the", "cat", "and", "the", "hat"))
  }

  test("single-char words: only a and i survive") {
    assert(WordCount.tokenize("a b c i x") == Seq("a", "i"))
  }

  test("apostrophes, hyphens, underscores stay inside words") {
    assert(WordCount.tokenize("don't well-known snake_case") ==
      Seq("don't", "well-known", "snake_case"))
  }

  test("pure digits are dropped (no letter), alphanumerics kept") {
    assert(WordCount.tokenize("42 x2 2x 100") == Seq("x2", "2x"))
  }

  test("multibyte letters count bytes like the reference") {
    // "é" is 1 char but 2 UTF-8 bytes → byte_size >= 2 passes
    assert(WordCount.tokenize("é") == Seq("é"))
  }

  test("punctuation separates words") {
    assert(WordCount.tokenize("end.start,comma;semi") ==
      Seq("end", "start", "comma", "semi"))
  }

  test("property: every token matches the word-char alphabet and validity") {
    randomStrings(300).foreach { s =>
      WordCount.tokenize(s).foreach { w =>
        assert(w.matches("[\\p{L}\\p{N}'_-]+"), s"input <$s> token <$w>")
        assert(WordCount.validWord(w))
        assert(w == w.toLowerCase)
      }
    }
  }

  test("property: token multiset is insensitive to line splitting") {
    val ss = randomStrings(300)
    ss.zip(ss.reverse).foreach { case (a, b) =>
      val joined = WordCount.tokenize(a + " " + b)
      val split = WordCount.tokenize(a) ++ WordCount.tokenize(b)
      assert(joined.sorted == split.sorted, s"<$a> + <$b>")
    }
  }
}
