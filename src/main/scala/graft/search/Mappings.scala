package graft.search

import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** Per-index field mappings — the reference's index-definition surface
  * (TDD aurora-postgresql-cdc-opensearchtdd.md §4: each indexed table
  * declares keyword vs text vs date/numeric fields; consumer.py creates
  * the index with those mappings before the first upsert).
  *
  * The mapping decides ANALYZED vs EXACT semantics at query-compile time:
  * a `match` on a `text` field tokenizes and tests analyzed terms, while
  * the same `match` on a `keyword` field is exact equality — precisely
  * OpenSearch's behavior. Declared per index and consulted by
  * [[JsonDsl]]; everything stays a declarative Catalyst predicate either
  * way, so pushdown is unaffected.
  */
final case class IndexMapping(fields: Map[String, String]) {

  /** OpenSearch's dynamic-mapping default for strings is keyword-with-
    * text-subfield; exact is the safe default for undeclared fields.
    */
  def fieldType(name: String): String = fields.getOrElse(name, "keyword")

  def isText(name: String): Boolean = fieldType(name) == "text"
}

object IndexMapping {

  val empty: IndexMapping = IndexMapping(Map.empty)

  /** Parse the OpenSearch `_mapping` body format the reference's TDD uses:
    * `{"properties": {"field": {"type": "text"}, ...}}` (a top-level
    * `{"mappings": {...}}` wrapper is accepted too).
    */
  def fromJson(body: String): IndexMapping = {
    val root0 = new ObjectMapper().readTree(body)
    require(root0 != null && root0.isObject, s"mapping body must be a JSON object: $body")
    val root = if (root0.has("mappings")) root0.get("mappings") else root0
    val props = root.get("properties")
    require(props != null && props.isObject, s"mapping body needs a 'properties' object: $body")
    IndexMapping(
      props
        .fields()
        .asScala
        .map(e => e.getKey -> Option(e.getValue.get("type")).map(_.asText).getOrElse("keyword"))
        .toMap
    )
  }
}
