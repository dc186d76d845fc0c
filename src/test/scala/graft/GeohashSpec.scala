package graft

import graft.search.Aggs
import org.apache.spark.sql.functions._

/** Pins Aggs.geohash5 (integer quantize → interleave → base32) against
  * the textbook bisection encoder — the public geohash algorithm:
  * alternate lon/lat interval halving, base32 every 5 bits.
  */
class GeohashSpec extends SparkSpec {
  import spark.implicits._

  private def reference(lat: Double, lon: Double, chars: Int): String = {
    val alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    var latLo = -90.0; var latHi = 90.0
    var lonLo = -180.0; var lonHi = 180.0
    val sb = new StringBuilder
    var isLon = true
    var bits = 0
    var n = 0
    while (sb.length < chars) {
      val bit =
        if (isLon) {
          val mid = (lonLo + lonHi) / 2
          if (lon >= mid) { lonLo = mid; 1 } else { lonHi = mid; 0 }
        } else {
          val mid = (latLo + latHi) / 2
          if (lat >= mid) { latLo = mid; 1 } else { latHi = mid; 0 }
        }
      n = (n << 1) | bit
      bits += 1
      isLon = !isLon
      if (bits == 5) { sb.append(alpha(n)); bits = 0; n = 0 }
    }
    sb.toString
  }

  test("geohash5 equals the bisection encoder on the public vector and a coordinate sweep") {
    // the standard public test vector (57.64911, 10.40744) → u4pru…,
    // reproduced here at the repo's hundredth-degree grid
    assert(reference(57.65, 10.41, 5) == "u4pru")
    // sweep includes exact cell-boundary coordinates (multiples of 11.25°
    // = 1125 hundredths, where >= tie-breaking must agree) and the
    // corners of the domain
    val sweep =
      Seq((14765L, 19041L), (0L, 0L), (17999L, 35999L), (1125L, 1125L), (9000L, 18000L), (2250L, 33750L)) ++
        (0 until 60).map(i => ((i * 661L) % 18000, (i * 7919L) % 36000))
    val got = sweep
      .toDF("la100", "lo100")
      .select($"la100", $"lo100", Aggs.geohash5($"la100", $"lo100").as("gh"))
      .as[(Long, Long, String)]
      .collect()
    got.foreach { case (la, lo, gh) =>
      val expect = reference(la / 100.0 - 90.0, lo / 100.0 - 180.0, 5)
      assert(gh == expect, s"la100=$la lo100=$lo: got $gh want $expect")
    }
  }

  test("generalized geohash equals the bisection encoder at precisions 3 through 7") {
    // even totals flip the interleave weights (lon must still lead from
    // the MSB) — precisions 4 and 6 exercise that branch; 3/5/7 the odd one
    val sweep =
      Seq((14765L, 19041L), (0L, 0L), (17999L, 35999L), (1125L, 1125L), (9000L, 18000L)) ++
        (0 until 40).map(i => ((i * 661L) % 18000, (i * 7919L) % 36000))
    for (p <- 3 to 7) {
      val got = sweep
        .toDF("la100", "lo100")
        .select($"la100", $"lo100", Aggs.geohash($"la100", $"lo100", p).as("gh"))
        .as[(Long, Long, String)]
        .collect()
      got.foreach { case (la, lo, gh) =>
        val expect = reference(la / 100.0 - 90.0, lo / 100.0 - 180.0, p)
        assert(gh == expect, s"p=$p la100=$la lo100=$lo: got $gh want $expect")
      }
    }
  }
}
