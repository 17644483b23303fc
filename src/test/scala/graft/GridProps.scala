package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.dfw.GridOps

/** ScalaCheck properties for the driver-side grid accessors
  * (`preprocess.py:499-517`): the closed-form index math must agree
  * with full enumeration for arbitrary choice lists.
  */
object GridProps extends Properties("GridOps") {

  private val genGroups: Gen[List[List[Double]]] =
    Gen.chooseNum(1, 4).flatMap { k =>
      Gen.listOfN(k, Gen.chooseNum(1, 5).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(-100.0, 100.0))))
    }

  property("comboCount is the product of sizes") = Prop.forAll(genGroups) { gs =>
    GridOps.comboCount(gs.map(_.toSeq)) == gs.map(_.size.toLong).product
  }

  property("comboByIndex enumerates kron order exhaustively") = Prop.forAll(genGroups) { gs =>
    val groups = gs.map(_.toSeq)
    // direct cartesian product in kron order (first param slowest)
    val expected = groups.foldLeft(Seq(Seq.empty[Double])) { (acc, choices) =>
      for (prefix <- acc; c <- choices) yield prefix :+ c
    }
    (0L until GridOps.comboCount(groups)).forall { i =>
      GridOps.comboByIndex(groups, i) == expected(i.toInt)
    }
  }

  property("out-of-range combo index throws") = Prop.forAll(genGroups) { gs =>
    val groups = gs.map(_.toSeq)
    Prop.throws(classOf[IllegalArgumentException]) {
      GridOps.comboByIndex(groups, GridOps.comboCount(groups))
    }
  }
}
