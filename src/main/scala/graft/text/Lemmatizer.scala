package graft.text

/** Deterministic rule-based English lemmatizer.
  *
  * Replaces the reference's pretrained dictionary lemmatizer
  * (`lemma_antbnc`, reference transform/execute.py:198-202), which is
  * not available in an offline build (SURVEY.md §7.4). Semantics: a
  * small irregular-form map plus ordered suffix rules (plural / -ing /
  * -ed / -er / -est / -ly). Pure function of the input token — safe
  * for distributed execution and task retries on any partition.
  */
object Lemmatizer {

  private val irregular: Map[String, String] = Map(
    "children" -> "child", "men" -> "man", "women" -> "woman",
    "feet" -> "foot", "teeth" -> "tooth", "mice" -> "mouse",
    "geese" -> "goose", "people" -> "person", "lives" -> "life",
    "wives" -> "wife", "knives" -> "knife", "leaves" -> "leaf",
    "wolves" -> "wolf", "selves" -> "self", "thieves" -> "thief",
    "is" -> "be", "am" -> "be", "are" -> "be", "was" -> "be",
    "were" -> "be", "been" -> "be", "being" -> "be",
    "has" -> "have", "had" -> "have", "having" -> "have",
    "does" -> "do", "did" -> "do", "done" -> "do",
    "goes" -> "go", "went" -> "go", "gone" -> "go",
    "better" -> "good", "best" -> "good",
    "worse" -> "bad", "worst" -> "bad",
    "ran" -> "run", "said" -> "say", "made" -> "make",
    "took" -> "take", "taken" -> "take", "came" -> "come",
    "saw" -> "see", "seen" -> "see", "knew" -> "know",
    "known" -> "know", "got" -> "get", "gave" -> "give",
    "given" -> "give", "found" -> "find", "thought" -> "think",
    "told" -> "tell", "left" -> "leave", "felt" -> "feel",
    "kept" -> "keep", "held" -> "hold", "brought" -> "bring",
    "bought" -> "buy", "wrote" -> "write", "written" -> "write",
    "stood" -> "stand", "met" -> "meet", "paid" -> "pay",
    "sent" -> "send", "built" -> "build", "spent" -> "spend",
    "lost" -> "lose", "meant" -> "mean", "began" -> "begin",
    "begun" -> "begin", "shown" -> "show", "heard" -> "hear",
    "spoke" -> "speak", "spoken" -> "speak", "broke" -> "break",
    "broken" -> "break", "chose" -> "choose", "chosen" -> "choose",
    "fell" -> "fall", "fallen" -> "fall", "grew" -> "grow",
    "grown" -> "grow", "drew" -> "draw", "drawn" -> "draw",
    "flew" -> "fly", "flown" -> "fly", "drove" -> "drive",
    "driven" -> "drive", "ate" -> "eat", "eaten" -> "eat",
    "sang" -> "sing", "sung" -> "sing", "swam" -> "swim",
    "swum" -> "swim", "threw" -> "throw", "thrown" -> "throw",
    "wore" -> "wear", "worn" -> "wear", "won" -> "win",
    "woke" -> "wake", "woken" -> "wake")

  /** Consonants that undouble after suffix removal (running → run). */
  private def undouble(s: String): String =
    if (s.length >= 3 && s.charAt(s.length - 1) == s.charAt(s.length - 2) &&
      "bdfgklmnprt".indexOf(s.charAt(s.length - 1)) >= 0) s.substring(0, s.length - 1)
    else s

  def lemma(w: String): String = {
    if (w == null || w.length <= 2) return w
    irregular.get(w) match {
      case Some(l) => l
      case None    => applyRules(w)
    }
  }

  private def applyRules(s: String): String = {
    if (s.endsWith("sses")) s.substring(0, s.length - 2)
    else if (s.endsWith("ies") && s.length > 4) s.substring(0, s.length - 3) + "y"
    else if (s.endsWith("xes") || s.endsWith("zes") || s.endsWith("ches") ||
      s.endsWith("shes") || s.endsWith("oes")) s.substring(0, s.length - 2)
    else if (s.endsWith("ss") || s.endsWith("us") || s.endsWith("is")) s
    else if (s.endsWith("s") && s.length > 3) s.substring(0, s.length - 1)
    else if (s.endsWith("ied") && s.length > 4) s.substring(0, s.length - 3) + "y"
    else if (s.endsWith("ing") && s.length > 5) undouble(s.substring(0, s.length - 3))
    else if (s.endsWith("ed") && s.length > 4) undouble(s.substring(0, s.length - 2))
    else if (s.endsWith("est") && s.length > 5) undouble(s.substring(0, s.length - 3))
    else if (s.endsWith("er") && s.length > 4) undouble(s.substring(0, s.length - 2))
    else if (s.endsWith("ly") && s.length > 4) s.substring(0, s.length - 2)
    else s
  }
}
