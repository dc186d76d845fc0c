package graft

import graft.search.JsonDsl
import org.apache.spark.sql.functions._

/** Generative drill for keyset pagination: random mixed-direction sort
  * specs over a corpus FULL of duplicate sort values (ties are where
  * lexicographic cursors break), walked page by page through the wire
  * `search_after` body. The concatenated pages must equal the full
  * sorted result exactly — no gaps, no duplicates, no reordering — for
  * every page size, with the page count exactly ceil(n / size).
  */
class PaginationFuzzSpec extends SparkSpec {

  test("12 random sort specs: search_after page walk == full sort, gap- and dup-free") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(0xbade5L)
    val gs = Vector("a", "b", "c", "d")
    val rows = Vector.tabulate(150) { i => (i.toLong, gs(rnd.nextInt(gs.size)), rnd.nextInt(5)) }
    val frame = rows.toDF("id", "g", "v").cache()

    (1 to 12).foreach { ci =>
      val specs: Seq[(String, Boolean)] = (rnd.nextInt(3) match {
        case 0 => Seq("g" -> rnd.nextBoolean())
        case 1 => Seq("v" -> rnd.nextBoolean())
        case 2 => Seq("g" -> rnd.nextBoolean(), "v" -> rnd.nextBoolean())
      }) :+ ("id" -> true)
      val size = 10 + rnd.nextInt(16)

      val sortJson = specs
        .map { case (f, asc) => s"""{"$f": {"order": "${if (asc) "asc" else "desc"}"}}""" }
        .mkString("[", ",", "]")

      // full expected order from the engine itself (already oracle-gated
      // elsewhere); the drill tests the WALK against it
      val orderCols = specs.map { case (f, asc) => if (asc) col(f).asc else col(f).desc }
      val full = frame.orderBy(orderCols: _*).select("id", "g", "v").collect()

      var cursor: Option[Seq[Any]] = None
      val seen = scala.collection.mutable.ArrayBuffer[Long]()
      var pages = 0
      var done = false
      while (!done) {
        val afterPart = cursor
          .map { c =>
            val rendered = c.map {
              case v: String => "\"" + v + "\""
              case v => v.toString
            }
            s""", "search_after": [${rendered.mkString(",")}]"""
          }
          .getOrElse("")
        val body = s"""{"sort": $sortJson, "size": $size$afterPart}"""
        val page = JsonDsl.parse(frame, body).select("id", "g", "v").collect()
        pages += 1
        require(pages <= 40, s"runaway page walk (config #$ci)")
        if (page.isEmpty) done = true
        else {
          seen ++= page.map(_.getLong(0))
          val last = page.last
          cursor = Some(specs.map {
            case ("g", _) => last.getString(1)
            case ("v", _) => last.getInt(2)
            case ("id", _) => last.getLong(0)
          })
          if (page.length < size) done = true
        }
      }
      assert(
        seen.toVector == full.map(_.getLong(0)).toVector,
        s"config #$ci specs=$specs size=$size: walked=${seen.take(20)} full=${full.map(_.getLong(0)).take(20).toVector}"
      )
      assert(pages == (rows.size + size - 1) / size + (if (rows.size % size == 0) 1 else 0) ||
        pages == (rows.size + size - 1) / size,
        s"config #$ci: $pages pages for ${rows.size} rows at size $size")
      assert(seen.distinct.size == rows.size, s"config #$ci: duplicates in the walk")
    }
  }
}
