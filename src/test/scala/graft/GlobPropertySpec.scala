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

/** Property: the pure-Scala predicate and the Catalyst Column predicate
  * implement the SAME HA filter semantics for ARBITRARY configs — the
  * case-4 sub-branches are exactly where a divergence would hide. */
object EntityFilterParityProperty extends Properties("entityFilterParity") {
  import graft.config.FilterSpec
  import org.apache.spark.sql.functions.col

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(30) // each case runs a Spark job

  private val domain: Gen[String] = Gen.oneOf("sensor", "light", "fan", "person")
  private val tokenGen: Gen[String] = Gen.oneOf("a", "b", "temp_1", "weather_x", "noisy")
  private val entityId: Gen[String] = for { d <- domain; n <- tokenGen } yield s"$d.$n"
  private val glob: Gen[String] = Gen.oneOf("sensor.*", "*.noisy", "light.temp_*", "fan.?")

  private val spec: Gen[FilterSpec] = for {
    ds <- Gen.listOf(domain).map(_.distinct.take(2))
    es <- Gen.listOf(entityId).map(_.distinct.take(2))
    gs <- Gen.listOf(glob).map(_.distinct.take(2))
  } yield FilterSpec(ds, es, gs)

  private val ids: Seq[String] =
    (for { d <- Seq("sensor", "light", "fan", "person", "other") }
      yield Seq(s"$d.a", s"$d.b", s"$d.temp_1", s"$d.weather_x", s"$d.noisy", s"$d.q")).flatten

  property("accepts == column for arbitrary include/exclude configs") =
    forAll(spec, spec) { (inc, exc) =>
      val spark = SparkSpec.session
      import spark.implicits._
      val f = new EntityFilter(inc, exc)
      val viaCol = ids.toDF("entity_id")
        .filter(f.column(col("entity_id"))).as[String].collect().toSet
      val viaScala = ids.filter(f.accepts).toSet
      val diff = (viaCol -- viaScala) ++ (viaScala -- viaCol)
      Prop(viaCol == viaScala) :| s"inc=$inc exc=$exc diff=$diff"
    }
}
