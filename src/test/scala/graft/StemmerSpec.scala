package graft

import graft.engine.Stemmer
import org.scalatest.funsuite.AnyFunSuite

/** Porter stemmer unit vectors — original 1980 algorithm semantics
  * (the engine's documented choice; the reference's nltk stemmer adds
  * NLTK_EXTENSIONS deviations, SURVEY.md §2.2 P6). */
class StemmerSpec extends AnyFunSuite {

  private val vectors = Seq(
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
    "caress" -> "caress", "cats" -> "cat",
    "feed" -> "feed", "plastered" -> "plaster", "motoring" -> "motor",
    "sing" -> "sing", "hopping" -> "hop", "tanned" -> "tan",
    "falling" -> "fall", "hissing" -> "hiss", "failing" -> "fail",
    "filing" -> "file",
    "happy" -> "happi", "sky" -> "sky",
    "relational" -> "relat", "conditional" -> "condit",
    // "electriciti -> electric" is the paper's step-3 example only;
    // the full pipeline's step 4 strips "ic" at m>1 -> "electr".
    "digitizer" -> "digit", "electriciti" -> "electr",
    "hopeful" -> "hope", "goodness" -> "good",
    "adjustment" -> "adjust", "adoption" -> "adopt",
    "activate" -> "activ", "effective" -> "effect",
    "probate" -> "probat", "rate" -> "rate",
    "controll" -> "control", "roll" -> "roll")

  test("known Porter vectors") {
    for ((in, want) <- vectors)
      assert(Stemmer.stem(in) == want, s"stem($in)")
  }

  test("short words pass through") {
    assert(Stemmer.stem("as") == "as")
    assert(Stemmer.stem("a") == "a")
    assert(Stemmer.stem("") == "")
  }

  test("stemText maps every whitespace token and preserves order") {
    assert(Stemmer.stemText("ponies  ties caresses") == "poni ti caress")
    assert(Stemmer.stemText(null) == null)
  }

  test("idempotent on its own output") {
    for ((in, _) <- vectors) {
      val once = Stemmer.stem(in)
      assert(Stemmer.stem(once) == Stemmer.stem(once))
    }
  }
}
