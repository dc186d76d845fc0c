package graft

/** DuckDB replay of the NSW graph tier's SEARCH paths (r18).
  *
  * `ann_graph_build` became fully oracle-replayable in r17 (md5 skew
  * sub-bucket); this object extends the replication through the beam
  * search itself, promoting the whole query/serving family
  * (`ann_graph_topk`, `ann_graph_serving`, `ann_graph_serving_batch`,
  * `ann_graph_batch_topk`, `search_dsl_json_knn_hnsw`) and — with the
  * r18 md5 top-layer sample — the two-layer keys
  * (`ann_graph_hier_build`, `ann_graph_hier_topk`).
  *
  * The beam ([[graft.operators.Similarity.graphSearchBatch]] and the
  * bit-identical serving tiers, pinned by GraphServingSpec) is a FIXED
  * number of expand/score/prune rounds over 6dp-rounded cosines with
  * (cos desc, id asc) tie order — no data-dependent iteration — so a
  * fixed set of unrolled CTE blocks replays it exactly:
  *
  *   frontier_r = top-beam of (scored_{r-1} minus all prior frontiers)
  *                by (cos desc, id asc)
  *   scored_r   = scored_{r-1} UNION neighbors(frontier_r)
  *
  * For a fixed probe the score is a pure function of the id, so the
  * scored state is just an id SET and `UNION` is the dedup/anti-join;
  * the final answer re-joins the per-probe cosine table and takes the
  * same (cos desc, id asc) top-k the engine's bounded heap takes.
  */
private[graft] object GraphOracle {

  private val idHash = "CAST(('0x'||substr(md5(CAST(vec_id AS VARCHAR)),1,15)) AS BIGINT)"

  /** The graph BUILD chain — k-means(16 lists, 2 fixed-point Lloyd
    * rounds) blocking, 2-assignment, md5 skew sub-bucket, DISTINCT pair
    * ownership, per-node top-8 adjacency, per-cell min-id entry points —
    * over the `embeddings` rows passing `extraWhere`. CTE names are
    * prefixed with `p` so two chains (hier top + bottom) coexist in one
    * WITH. Mirrors ann_graph_build's r17 oracle line for line; exposes
    * `${p}adj` (id, nbr) and `${p}entry` (id).
    */
  def buildChain(p: String, extraWhere: String = ""): String =
    s"""${p}base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE embedding IS NOT NULL$extraWhere),
       |${p}c0 AS (
       |  SELECT row_number() OVER (ORDER BY $idHash, vec_id) - 1 AS cell, v AS c
       |  FROM ${p}base
       |  ORDER BY $idHash, vec_id
       |  LIMIT 16),
       |${p}a0 AS (SELECT vec_id, cell FROM (
       |  SELECT b.vec_id, c.cell, row_number() OVER (PARTITION BY b.vec_id ORDER BY list_distance(b.v, c.c), c.cell) AS rn
       |  FROM ${p}base b CROSS JOIN ${p}c0 c) WHERE rn = 1),
       |${p}s1 AS (
       |  SELECT ${p}a0.cell, d.d,
       |         sum(CAST(floor(b.v[d.d]*1000000.0 + 0.5) AS BIGINT)) AS s,
       |         count(b.v[d.d]) AS n
       |  FROM ${p}base b JOIN ${p}a0 USING (vec_id) CROSS JOIN generate_series(1,64) d(d)
       |  GROUP BY ${p}a0.cell, d.d),
       |${p}c0d AS (SELECT cell, d.d, c[d.d] AS x FROM ${p}c0 CROSS JOIN generate_series(1,64) d(d)),
       |${p}c1 AS (
       |  SELECT ${p}c0d.cell,
       |         list(CASE WHEN ${p}s1.n IS NOT NULL AND ${p}s1.n > 0
       |              THEN CAST(CAST(CAST(${p}s1.s AS DOUBLE)/(CAST(${p}s1.n AS DOUBLE)*1000000.0) AS REAL) AS DOUBLE)
       |              ELSE ${p}c0d.x END ORDER BY ${p}c0d.d) AS c
       |  FROM ${p}c0d LEFT JOIN ${p}s1 ON ${p}s1.cell = ${p}c0d.cell AND ${p}s1.d = ${p}c0d.d
       |  GROUP BY ${p}c0d.cell),
       |${p}a1 AS (SELECT vec_id, cell FROM (
       |  SELECT b.vec_id, c.cell, row_number() OVER (PARTITION BY b.vec_id ORDER BY list_distance(b.v, c.c), c.cell) AS rn
       |  FROM ${p}base b CROSS JOIN ${p}c1 c) WHERE rn = 1),
       |${p}s2 AS (SELECT ${p}a1.cell, d.d, sum(CAST(floor(b.v[d.d]*1000000.0 + 0.5) AS BIGINT)) AS s, count(b.v[d.d]) AS n
       |  FROM ${p}base b JOIN ${p}a1 USING (vec_id) CROSS JOIN generate_series(1,64) d(d) GROUP BY ${p}a1.cell, d.d),
       |${p}c1d AS (SELECT cell, d.d, c[d.d] AS x FROM ${p}c1 CROSS JOIN generate_series(1,64) d(d)),
       |${p}c2 AS (SELECT ${p}c1d.cell, list(CASE WHEN ${p}s2.n IS NOT NULL AND ${p}s2.n > 0
       |              THEN CAST(CAST(CAST(${p}s2.s AS DOUBLE)/(CAST(${p}s2.n AS DOUBLE)*1000000.0) AS REAL) AS DOUBLE)
       |              ELSE ${p}c1d.x END ORDER BY ${p}c1d.d) AS c
       |  FROM ${p}c1d LEFT JOIN ${p}s2 ON ${p}s2.cell = ${p}c1d.cell AND ${p}s2.d = ${p}c1d.d GROUP BY ${p}c1d.cell),
       |${p}asg AS (
       |  SELECT b.vec_id, c.cell, row_number() OVER (PARTITION BY b.vec_id ORDER BY list_distance(b.v, c.c), c.cell) AS rn
       |  FROM ${p}base b CROSS JOIN ${p}c2 c),
       |${p}ac2 AS (SELECT vec_id, cell FROM ${p}asg WHERE rn <= 2),
       |${p}census AS (SELECT cell, CAST(ceil(count(*)/4096.0) AS BIGINT) AS nsub FROM ${p}ac2 GROUP BY cell),
       |${p}bkt AS (SELECT a.vec_id, a.cell, b.v,
       |               CAST(('0x'||substr(md5(CAST(a.cell AS VARCHAR)||':'||CAST(a.vec_id AS VARCHAR)),1,15)) AS BIGINT) % cs.nsub AS g
       |        FROM ${p}ac2 a JOIN ${p}base b USING (vec_id) JOIN ${p}census cs ON cs.cell = a.cell),
       |${p}half AS (SELECT DISTINCT l.vec_id AS id, r.vec_id AS nbr,
       |                round(list_cosine_similarity(l.v, r.v), 6) AS cos
       |         FROM ${p}bkt l JOIN ${p}bkt r ON l.cell = r.cell AND l.g = r.g AND l.vec_id < r.vec_id),
       |${p}sym AS (SELECT id, nbr, cos FROM ${p}half UNION ALL SELECT nbr AS id, id AS nbr, cos FROM ${p}half),
       |${p}adj AS (SELECT id, nbr FROM (
       |  SELECT id, nbr, row_number() OVER (PARTITION BY id ORDER BY cos DESC, nbr) AS rn FROM ${p}sym) WHERE rn <= 8),
       |${p}entry AS (SELECT min(vec_id) AS id FROM ${p}asg WHERE rn = 1 GROUP BY cell)""".stripMargin

  /** Per-probe exact-cosine table over the `bp`-chain's corpus:
    * (pid, id, cos) with the engine's HALF_UP 6dp round.
    */
  def cosCte(q: String, bp: String, probeWhere: String): String =
    s"""${q}probes AS (SELECT vec_id AS pid, CAST(embedding AS DOUBLE[]) AS q FROM embeddings WHERE $probeWhere),
       |${q}cos AS (SELECT pr.pid, b.vec_id AS id, round(list_cosine_similarity(b.v, pr.q), 6) AS cos
       |  FROM ${bp}base b CROSS JOIN ${q}probes pr)""".stripMargin

  /** The unrolled beam: `rounds` frontier/expand blocks, prefix `q`.
    * `entry` is the seed CTE (one `id` column), `adj`/`cos` the chain's
    * adjacency and the probe cosine table. Exposes `${q}sc$rounds`.
    */
  def beamChain(q: String, probes: String, entry: String, adj: String, cos: String, beam: Int, rounds: Int): String = {
    val sb = new StringBuilder
    sb.append(s"${q}sc0 AS (SELECT pr.pid, e.id FROM $probes pr CROSS JOIN $entry e)")
    for (r <- 1 to rounds) {
      val excl = (1 until r)
        .map(j => s"    AND NOT EXISTS (SELECT 1 FROM ${q}fr$j e WHERE e.pid = s.pid AND e.id = s.id)")
        .mkString("\n")
      val exclBlock = if (excl.isEmpty) "" else "\n" + excl
      sb.append(s""",
${q}fr$r AS (SELECT pid, id FROM (
  SELECT s.pid, s.id, row_number() OVER (PARTITION BY s.pid ORDER BY c.cos DESC, s.id) AS rn
  FROM ${q}sc${r - 1} s JOIN $cos c ON c.pid = s.pid AND c.id = s.id
  WHERE TRUE$exclBlock) WHERE rn <= $beam),
${q}sc$r AS (SELECT pid, id FROM ${q}sc${r - 1}
  UNION SELECT f.pid, a.nbr AS id FROM ${q}fr$r f JOIN $adj a ON a.id = f.id)""")
    }
    sb.toString
  }

  /** Final per-probe top-k over the full scored set — the engine's
    * bounded heap as a (pid, id, cos, rn) window.
    */
  private def finalTopk(scored: String, cos: String, k: Int): String =
    s"""SELECT pid, id, cos, rn FROM (
       |  SELECT s.pid, s.id, c.cos, row_number() OVER (PARTITION BY s.pid ORDER BY c.cos DESC, s.id) AS rn
       |  FROM $scored s JOIN $cos c ON c.pid = s.pid AND c.id = s.id) WHERE rn <= $k""".stripMargin

  /** ann_graph_topk / ann_graph_serving / search_dsl_json_knn_hnsw:
    * single probe (vec 0), beam 16, 3 rounds, k 10 — emitted id column
    * named per caller.
    */
  def singleTopkSql(idName: String): String =
    s"""WITH ${buildChain("g")},
       |${cosCte("q", "g", "vec_id = 0")},
       |${beamChain("q", "qprobes", "gentry", "gadj", "qcos", 16, 3)}
       |SELECT id AS $idName, cos FROM (
       |${finalTopk("qsc3", "qcos", 10)})
       |ORDER BY cos DESC, $idName""".stripMargin

  /** ann_graph_serving_batch: probes 0..2, per-probe top-10, no rank. */
  def servingBatchSql: String =
    s"""WITH ${buildChain("g")},
       |${cosCte("q", "g", "vec_id < 3")},
       |${beamChain("q", "qprobes", "gentry", "gadj", "qcos", 16, 3)}
       |SELECT pid AS probe_id, id, cos FROM (
       |${finalTopk("qsc3", "qcos", 10)})
       |ORDER BY probe_id, id""".stripMargin

  /** ann_graph_batch_topk: same beam, rank column carried. */
  def batchTopkSql: String =
    s"""WITH ${buildChain("g")},
       |${cosCte("q", "g", "vec_id < 3")},
       |${beamChain("q", "qprobes", "gentry", "gadj", "qcos", 16, 3)}
       |SELECT pid AS probe_id, id, cos, CAST(rn AS INTEGER) AS rank FROM (
       |${finalTopk("qsc3", "qcos", 10)})
       |ORDER BY probe_id, rank""".stripMargin

  private val topWhere = s" AND $idHash % 8 = 0"

  /** ann_graph_hier_build: the md5-sampled top layer's own build —
    * degree histogram of its top-8 adjacency.
    */
  def hierBuildSql: String =
    s"""WITH ${buildChain("t", topWhere)}
       |SELECT degree, count(*) AS n_nodes FROM (
       |  SELECT id, count(*) AS degree FROM tadj GROUP BY id)
       |GROUP BY degree ORDER BY degree""".stripMargin

  /** ann_graph_hier_topk: 2 beam rounds over the top layer pick the 16
    * warm seeds (scores against the FULL corpus base — only top-layer
    * ids are ever scored, graphSearch2 passes the full frame), then 2
    * bottom rounds from those seeds; k 10.
    */
  def hierTopkSql: String =
    s"""WITH ${buildChain("t", topWhere)},
       |${buildChain("b")},
       |${cosCte("q", "b", "vec_id = 0")},
       |${beamChain("tq", "qprobes", "tentry", "tadj", "qcos", 16, 2)},
       |seeds AS (SELECT id FROM (
       |${finalTopk("tqsc2", "qcos", 16)})),
       |${beamChain("bq", "qprobes", "seeds", "badj", "qcos", 16, 2)}
       |SELECT id, cos FROM (
       |${finalTopk("bqsc2", "qcos", 10)})
       |ORDER BY cos DESC, id""".stripMargin
}
