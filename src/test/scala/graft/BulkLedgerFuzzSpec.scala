package graft

import graft.search.JsonDsl
import org.apache.spark.sql.functions._

/** Generative drill for the `_bulk` ledger — a windowed per-id state
  * machine (presence folds through the op sequence: index/create make
  * the doc present, delete absent, update leaves presence unchanged,
  * and each op's result is judged against the presence BEFORE it).
  * Random op sequences over ids that collide heavily, against a plain
  * sequential fold of the OpenSearch result table:
  * index → created/updated; create → created/version_conflict;
  * update → updated/document_missing; delete → deleted/not_found.
  */
class BulkLedgerFuzzSpec extends SparkSpec {

  test("5 random bulk bodies: ledger == sequential presence fold") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(0xb07bL)
    val actions = Vector("index", "create", "update", "delete")

    (1 to 5).foreach { ci =>
      val baseIds = (1 to 12).filter(_ => rnd.nextBoolean()).map(_.toLong)
      val base = baseIds.map(id => (id, s"doc$id")).toDF("doc_id", "payload")

      val ops = Vector.tabulate(25 + rnd.nextInt(15)) { k =>
        (actions(rnd.nextInt(4)), (1 + rnd.nextInt(14)).toString, k)
      }
      val ndjson = ops
        .flatMap { case (a, id, k) =>
          val head = s"""{"$a": {"_id": $id}}"""
          if (a == "delete") Seq(head) else Seq(head, s"""{"f": $k}""")
        }
        .mkString("\n")

      val got = JsonDsl
        .bulkLedger(base, "doc_id", ndjson)
        .collect()
        .map(r => (r.getLong(r.fieldIndex("seq")), r.getString(r.fieldIndex("action")), r.getString(r.fieldIndex("_id")), r.getString(r.fieldIndex("result"))))
        .toVector

      var present = baseIds.map(_.toString).toSet
      val want = ops.zipWithIndex.map { case ((a, id, _), k) =>
        val before = present.contains(id)
        val result = a match {
          case "index" => present += id; if (before) "updated" else "created"
          case "create" => present += id; if (before) "version_conflict" else "created"
          case "update" => if (before) "updated" else "document_missing"
          case "delete" => present -= id; if (before) "deleted" else "not_found"
        }
        (k + 1L, a, id, result)
      }
      assert(got == want, s"bulk #$ci:\n got=${got.take(10)}\n want=${want.take(10)}")
    }
  }
}
