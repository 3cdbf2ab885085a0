package graft.geo

import org.scalatest.funsuite.AnyFunSuite
import graft.synth.Synth

class GeomSpec extends AnyFunSuite {

  test("PIP half-open semantics on rectangles matches floor-grid assignment") {
    val polys = Synth.catchmentList
    val byId = polys.map(p => p.hydroid -> p).toMap
    val rng = new scala.util.Random(7)
    // random points + exact boundary points (corner ownership)
    val pts = (1 to 5000).map(_ => (rng.nextDouble() * 159.998 - 79.999, rng.nextDouble() * 359.98 - 179.99)) ++
      Seq((-48.75, -180.0), (-48.75, -177.5), (0.0, 0.0), (1.25, 2.5), (40.0, -74.0),
        (78.75, 177.5), (-80.0, -180.0), (41.25, -71.999))
    for ((lat, lng) <- pts) {
      val expect = Synth.hydroidOf(lat, lng)
      val got = polys.filter(p => Geom.contains(p.ring, lng, lat)).map(_.hydroid)
      assert(got == Seq(expect), s"($lat,$lng): pip=$got floor=$expect")
      assert(Geom.contains(byId(expect).ring, lng, lat))
    }
  }

  test("a 4-cell shared corner is owned by exactly the cell whose min corner it is") {
    val lat = 1.25; val lng = 2.5 // exact corner of catchments (72,72)..(73,73)
    val h = Synth.hydroidOf(lat, lng)
    assert(h == 73 * 144 + 73)
    val owners = Synth.catchmentList.filter(p => Geom.contains(p.ring, lng, lat))
    assert(owners.map(_.hydroid) == Seq(h))
  }

  test("dist2 and haversine are symmetric and non-negative") {
    val rng = new scala.util.Random(11)
    for (_ <- 1 to 500) {
      val (a, b, c, d) = (rng.nextDouble() * 170 - 85, rng.nextDouble() * 350 - 175,
        rng.nextDouble() * 170 - 85, rng.nextDouble() * 350 - 175)
      assert(Geom.dist2(a, b, c, d) == Geom.dist2(c, d, a, b))
      assert(Geom.dist2(a, b, c, d) >= 0)
      assert(math.abs(Geom.haversineKm(a, b, c, d) - Geom.haversineKm(c, d, a, b)) < 1e-9)
      assert(Geom.haversineKm(a, b, a, b) == 0.0)
    }
  }
}
