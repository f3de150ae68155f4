package graft.plan

import org.scalatest.funsuite.AnyFunSuite
import Planner._

/** Pins the planner to the reference's hand-derived delta-dataflows
  * (/root/reference/examples/triangles.rs:50-62). */
class PlannerSpec extends AnyFunSuite {

  test("triangle relation 0 = dK3dA: [fwd(x,lt), fwd(y,lt)]") {
    val p = planRelation(0, triangle)
    assert(p.attrOrder == IndexedSeq(0, 1, 2))
    assert(p.stages == IndexedSeq(IndexedSeq(
      Constraint(0, forward = true, inclusive = false),
      Constraint(1, forward = true, inclusive = false))))
  }

  test("triangle relation 1 = dK3dB: [fwd(x,le), rev(z,lt)]") {
    val p = planRelation(1, triangle)
    assert(p.attrOrder == IndexedSeq(0, 2, 1))
    assert(p.stages == IndexedSeq(IndexedSeq(
      Constraint(0, forward = true, inclusive = true),
      Constraint(1, forward = false, inclusive = false))))
  }

  test("triangle relation 2 = dK3dC: [rev(y,le), rev(z,le)]") {
    val p = planRelation(2, triangle)
    assert(p.attrOrder == IndexedSeq(1, 2, 0))
    assert(p.stages == IndexedSeq(IndexedSeq(
      Constraint(0, forward = false, inclusive = true),
      Constraint(1, forward = false, inclusive = true))))
  }

  test("inverse permutation round-trips") {
    for (m <- Seq(triangle, cycle3, clique4, clique5, cycle4, cliqueHat);
         r <- m.indices) {
      val p = planRelation(r, m)
      for (a <- 0 until p.numAttrs) assert(p.attrOrder(p.inverse(a)) == a)
    }
  }

  test("every stage constrains the new attribute by earlier positions only") {
    for (m <- Seq(triangle, cycle3, clique4, clique5, cycle4, cliqueHat);
         r <- m.indices) {
      val p = planRelation(r, m)
      for ((stage, s) <- p.stages.zipWithIndex; c <- stage)
        assert(c.prefixPos < s + 2)
    }
  }

  test("4-clique plans have 2 extension stages with full constraints") {
    val p = planRelation(0, clique4)
    assert(p.stages.length == 2)
    assert(p.stages(0).length == 2) // attr 2 constrained by both seed attrs
    assert(p.stages(1).length == 3) // attr 3 constrained by all three
  }

  test("disconnected motif is rejected") {
    intercept[IllegalArgumentException] {
      planRelation(0, Seq((0, 1), (2, 3)))
    }
  }

  test("self-loop motif edge is rejected") {
    intercept[IllegalArgumentException] { planRelation(0, Seq((0, 0))) }
  }
}
