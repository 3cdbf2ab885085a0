package graft.geo

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based invariants for the geo core (ScalaCheck, run by sbt's test
  * framework alongside the ScalaTest suites). These are the algebraic laws
  * every geospatial operator leans on; example-based specs cover the edge
  * cases, properties cover the space. */
object GeoProps extends Properties("geo") {

  private val lat = Gen.chooseNum(-89.999, 89.999)
  private val lng = Gen.chooseNum(-179.999, 179.999)
  private val res = Gen.chooseNum(2, 12)

  property("codec roundtrip: res/row/col survive encode") =
    forAll(lat, lng, res) { (la, ln, r) =>
      val c = Cells.latLngToCell(la, ln, r)
      Cells.res(c) == r &&
        Cells.rowOf(c) == Cells.latToRow(la, r) &&
        Cells.encode(r, Cells.rowOf(c), Cells.colOf(c)) == c
    }

  property("centroid lands back in its own cell") =
    forAll(lat, lng, res) { (la, ln, r) =>
      val c = Cells.latLngToCell(la, ln, r)
      val (cla, cln) = Cells.centroid(c)
      Cells.latLngToCell(cla, cln, r) == c
    }

  property("parent is monotone: parent(cell(p)) == cell_at_parent_res(p)") =
    forAll(lat, lng, Gen.chooseNum(4, 12)) { (la, ln, r) =>
      val pr = r - 2
      Cells.cellToParent(Cells.latLngToCell(la, ln, r), pr) ==
        Cells.latLngToCell(la, ln, pr)
    }

  property("cover contains the cell of every point inside the bbox") =
    forAll(lat, lng, res) { (la, ln, r) =>
      val (laMax, lnMax) = (math.min(la + 0.5, 89.999), math.min(ln + 0.7, 179.999))
      val cov = Cells.cover(la, laMax, ln, lnMax, r).toSet
      // probe the corners and center of the box
      Seq((la, ln), (laMax, lnMax), ((la + laMax) / 2, (ln + lnMax) / 2))
        .forall { case (a, b) => cov.contains(Cells.latLngToCell(a, b, r)) }
    }

  property("rectangle PIP == closed-form bounds test (half-open)") =
    forAll(lat, lng, lat, lng) { (la, ln, pla, pln) =>
      val (laMax, lnMax) = (la + 2.0, ln + 3.0)
      val ring = Array(ln, la, lnMax, la, lnMax, laMax, ln, laMax)
      Geom.contains(ring, pln, pla) ==
        (pla >= la && pla < laMax && pln >= ln && pln < lnMax)
    }

  property("haversine: symmetric, non-negative, zero at identity") =
    forAll(lat, lng, lat, lng) { (a, b, c, d) =>
      val x = Geom.haversineKm(a, b, c, d)
      x >= 0.0 && math.abs(x - Geom.haversineKm(c, d, a, b)) < 1e-9 &&
        Geom.haversineKm(a, b, a, b) < 1e-9
    }
}
