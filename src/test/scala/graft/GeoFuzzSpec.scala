package graft

import graft.search.Aggs
import org.apache.spark.sql.functions._

/** Generative drill for the geo predicates — random polygons (convex
  * and star-shaped, 3–8 vertices), random bounding boxes, random
  * distance radii, over random point clouds, each against the SAME
  * IEEE arithmetic evaluated independently in plain Scala. These
  * predicates are advertised as bit-identical across engines because
  * they use only correctly-rounded ops (*, /, +, -, sqrt, comparisons);
  * this drill pins that claim point for point, including points that
  * land NEAR edges (generated ON polygon edges then nudged by one
  * interesting epsilon).
  */
class GeoFuzzSpec extends SparkSpec {

  private def pnpolyRef(lat: Double, lon: Double, pts: Seq[(Double, Double)]): Boolean = {
    var crossings = 0
    pts.indices.foreach { i =>
      val (lat1, lon1) = pts(i)
      val (lat2, lon2) = pts((i + 1) % pts.size)
      if (((lat1 > lat) != (lat2 > lat)) &&
          lon < (lon2 - lon1) * (lat - lat1) / (lat2 - lat1) + lon1)
        crossings += 1
    }
    crossings % 2 == 1
  }

  test("25 random polygons x 400 points: pointInPolygon == IEEE reference, bit for bit") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(0x6e0L)

    val basePoints = Vector.tabulate(300) { i =>
      (i, rnd.nextDouble() * 20 - 10, rnd.nextDouble() * 20 - 10)
    }

    (1 to 25).foreach { ci =>
      // star-shaped polygon around a random center: angles sorted, radii random
      val cx = rnd.nextDouble() * 6 - 3
      val cy = rnd.nextDouble() * 6 - 3
      val nV = 3 + rnd.nextInt(6)
      val angles = Vector.fill(nV)(rnd.nextDouble() * 2 * math.Pi).sorted
      val pts = angles.map { a =>
        val r = 1.0 + rnd.nextDouble() * 5
        (cx + r * math.cos(a), cy + r * math.sin(a))
      }
      // edge-adjacent points: midpoints of edges nudged by ±eps
      val edgy = pts.indices.flatMap { i =>
        val (a1, o1) = pts(i)
        val (a2, o2) = pts((i + 1) % pts.size)
        val (mx, my) = ((a1 + a2) / 2, (o1 + o2) / 2)
        Seq((1000 + i * 4, mx + 1e-12, my), (1001 + i * 4, mx - 1e-12, my), (1002 + i * 4, mx, my + 1e-9), (1003 + i * 4, mx, my - 1e-9))
      }
      val all = basePoints ++ edgy
      val df = all.toDF("id", "lat", "lon")
      val got = df
        .select(col("id"), Aggs.pointInPolygon(col("lat"), col("lon"), pts).as("in"))
        .collect()
        .map(r => r.getInt(0) -> r.getBoolean(1))
        .toMap
      all.foreach { case (id, lat, lon) =>
        val want = pnpolyRef(lat, lon, pts)
        assert(got(id) == want, s"polygon #$ci pts=$pts point=($lat,$lon): spark=${got(id)} ref=$want")
      }
    }
  }

  test("random bboxes and distance rings: predicate == IEEE reference") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(0x6e1L)
    val points = Vector.tabulate(400)(i => (i, rnd.nextDouble() * 10, rnd.nextDouble() * 10))
    val df = points.toDF("id", "lat", "lon").cache()

    (1 to 15).foreach { ci =>
      val top = rnd.nextDouble() * 10; val bottom = top - rnd.nextDouble() * 5
      val left = rnd.nextDouble() * 10; val right = left + rnd.nextDouble() * 5
      val bbox =
        col("lat") <= lit(top) && col("lat") >= lit(bottom) && col("lon") >= lit(left) && col("lon") <= lit(right)
      val gotB = df.select(col("id"), bbox.as("in")).collect().map(r => r.getInt(0) -> r.getBoolean(1)).toMap
      points.foreach { case (id, la, lo) =>
        val want = la <= top && la >= bottom && lo >= left && lo <= right
        assert(gotB(id) == want, s"bbox #$ci ($top,$bottom,$left,$right) point ($la,$lo)")
      }

      // equirectangular distance, the geo_distance formula: only *, +, sqrt
      val oLat = rnd.nextDouble() * 10; val oLon = rnd.nextDouble() * 10
      val radius = rnd.nextDouble() * 500
      val dlat = col("lat") - lit(oLat)
      val dlon = (col("lon") - lit(oLon)) * lit(0.7071067811865476)
      val pred = sqrt(dlat * dlat + dlon * dlon) * lit(111.195) <= lit(radius)
      val gotD = df.select(col("id"), pred.as("in")).collect().map(r => r.getInt(0) -> r.getBoolean(1)).toMap
      points.foreach { case (id, la, lo) =>
        val dla = la - oLat
        val dlo = (lo - oLon) * 0.7071067811865476
        val want = math.sqrt(dla * dla + dlo * dlo) * 111.195 <= radius
        assert(gotD(id) == want, s"ring #$ci origin=($oLat,$oLon) r=$radius point ($la,$lo)")
      }
    }
  }
}
