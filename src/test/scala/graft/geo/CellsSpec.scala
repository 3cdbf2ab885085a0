package graft.geo

import org.scalatest.funsuite.AnyFunSuite

class CellsSpec extends AnyFunSuite {

  // deterministic sample of lat/lng incl. exact grid boundaries
  val rng = new scala.util.Random(42)
  val samples: Seq[(Double, Double)] =
    (1 to 2000).map(_ => (rng.nextDouble() * 179.998 - 89.999, rng.nextDouble() * 359.998 - 179.999)) ++
      Seq((-78.75, -180.0), (0.0, 0.0), (40.0, -74.0), (-45.0, 135.0), (89.999, 179.999),
        (-89.999, -179.999), (11.25 - 90.0, 5.625 - 180.0))

  test("codec roundtrip: res/row/col recoverable") {
    for ((lat, lng) <- samples; r <- Seq(0, 5, 12, 20)) {
      val c = Cells.latLngToCell(lat, lng, r)
      assert(Cells.res(c) == r)
      assert(Cells.rowOf(c) == Cells.latToRow(lat, r))
      assert(Cells.colOf(c) == Cells.lngToCol(lng, r))
      assert(Cells.rowOf(c) >= 0 && Cells.rowOf(c) < Cells.rows(r))
      assert(Cells.colOf(c) >= 0 && Cells.colOf(c) < Cells.cols(r))
    }
  }

  test("parent of point's cell == point's cell at parent res") {
    for ((lat, lng) <- samples)
      assert(Cells.cellToParent(Cells.latLngToCell(lat, lng, 12), 5) ==
        Cells.latLngToCell(lat, lng, 5))
  }

  test("kRing contains center, bounded by chebyshev k") {
    for ((lat, lng) <- samples; k <- 0 to 3) {
      val c = Cells.latLngToCell(lat, lng, 6)
      val ring = Cells.kRing(c, k)
      assert(ring.contains(c))
      assert(ring.length <= (2 * k + 1) * (2 * k + 1))
      ring.foreach { rc =>
        assert(math.abs(Cells.rowOf(rc) - Cells.rowOf(c)) <= k)
        assert(math.abs(Cells.colOf(rc) - Cells.colOf(c)) <= k)
      }
    }
  }

  test("cover of a degenerate bbox is the single containing cell") {
    for ((lat, lng) <- samples)
      assert(Cells.cover(lat, lat, lng, lng, 7)
        .sameElements(Array(Cells.latLngToCell(lat, lng, 7))))
  }

  test("centroid lands back in the same cell") {
    for ((lat, lng) <- samples) {
      val c = Cells.latLngToCell(lat, lng, 9)
      val (clat, clng) = Cells.centroid(c)
      assert(Cells.latLngToCell(clat, clng, 9) == c)
    }
  }
}
