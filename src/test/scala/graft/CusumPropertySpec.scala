package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Pins the algebra `ltss_changepoint` stands on: Page's recursion
  * S_t = max(0, S_{t−1} + d_t) equals the closed two-window form
  * P_t − min(0, min_{j≤t} P_j) the batch plan compiles (running prefix
  * sum + running min), at EVERY step of a random integer deviation
  * series — the identity is checked prefix-by-prefix, not just at the
  * end, because the operator reports per-bucket statistics and an
  * argmax over them. The streaming twin runs the recursion literally
  * (`StatefulStreamingSpec`), so this property is what makes batch and
  * stream the same detector. */
object CusumPropertySpec extends Properties("CusumClosedForm") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(500)

  property("closed two-window form equals the recursion at every prefix") =
    forAll(Gen.listOf(Gen.choose(-50L, 50L))) { devs =>
      var s = 0L // the recursion
      var p = 0L // running prefix sum (the first window)
      var minP = Long.MaxValue // running min of P_1..t (the second window)
      devs.forall { dv =>
        s = math.max(0L, s + dv)
        p += dv
        minP = math.min(minP, p)
        s == p - math.min(0L, minP)
      }
    }
}
