package graft.text

/** Language-marker word lists for the n-gram/stopword language-ID
  * heuristic (north-star text-analysis operator). Deterministic
  * scoring: count tokens hitting each language's marker list, argmax
  * with fixed tie order en > es > de > fr. */
object TextAnalysis {
  val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "es" -> Seq("el", "la", "de", "que", "los", "las", "es", "un"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "nicht", "mit"),
    "fr" -> Seq("le", "les", "et", "des", "est", "une", "pas", "pour"))

  def markersSql(lang: String): String =
    Markers.toMap.apply(lang).map(w => s"'$w'").mkString("(", ", ", ")")
}
