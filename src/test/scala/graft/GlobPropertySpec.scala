package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.config.EntityFilter

/** ScalaCheck property tests (SURVEY.md §5c): glob→regex compilation. */
object GlobPropertySpec extends Properties("globToRegex") {

  private val ident: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf(Gen.alphaLowerChar, Gen.const('_'))).map(_.mkString)

  private def re(glob: String) = ("^(?:" + EntityFilter.globToRegex(glob) + ")$").r

  property("star matches any literal expansion") = forAll(ident, ident, ident) {
    (pre, mid, post) =>
      re(s"$pre*$post").matches(s"$pre$mid$post") && re(s"$pre*$post").matches(s"$pre$post")
  }

  property("literal globs match only themselves") = forAll(ident, ident) { (a, b) =>
    re(a).matches(a) && (re(a).matches(b) == (a == b))
  }

  property("? matches exactly one char") = forAll(ident) { a =>
    re(s"$a?").matches(a + "x") && !re(s"$a?").matches(a) && !re(s"$a?").matches(a + "xy")
  }

  property("regex metacharacters are escaped") =
    forAll(Gen.oneOf(".", "^", "$", "+", "{", "}", "(", ")", "|", "\\")) { m =>
      re(s"a${m}b").matches(s"a${m}b") && !re(s"a${m}b").matches("aXb")
    }
}
