package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Corpus REWRITE operators: dedup stages that don't just measure or
  * flag duplication (x1/x2/x42) but produce the cleaned corpus itself.
  *
  * x42 reports how much of each document sits inside cross-document
  * repeated spans; x43 is the stage a pipeline runs next — remove the
  * repeated material and emit the surviving text (the line/span-level
  * dedup of CCNet / RefinedWeb: reference pipelines drop duplicated
  * lines before model training rather than whole near-dup documents,
  * cf. reference repo weekly-report.py's whole-row dedup being the only
  * grain it needs at relational scale; at corpus scale the grain is the
  * span).
  *
  * Scale shape (x43): block extraction is a pure map (no shuffle —
  * blocks are built array-side per row and exploded); "globally first
  * occurrence" is ONE hash-aggregate on the block-content key (the
  * min() runs over a single packed long, so it stays a
  * HashAggregateExec with map-side partials — same d1 lesson); the
  * keep-filter is an equi-join back on that key (shuffle on block
  * content, nothing quadratic, nothing collected); reconstruction is
  * one keyed aggregate per doc. Every shuffle key is a block hash or a
  * doc id — the plan is x1's dedup shape plus one regroup, and would
  * run unchanged on a 1000-executor cluster.
  */
object Rewrite {

  /** Block geometry: non-overlapping 10-token blocks — the "line" unit
    * of the rewrite (the synthetic corpus has no newlines; production
    * would split on '\n' and the plan shape is identical). */
  private val BlockTokens = 10

  /** Block-index bits in the packed first-occurrence long. Blocks per
    * doc is bounded by doc length / BlockTokens — 2^20 blocks ≈ 10M
    * tokens per document, far above any real doc; doc_id keeps the top
    * 43 bits (sign excluded), enough for 8.8e12 documents. */
  private val BlkBits = 20

  private val blockDedupOracle: String =
    s"""WITH toks AS MATERIALIZED (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |blk0 AS MATERIALIZED (
       |  SELECT doc_id,
       |    unnest(list_transform(generate_series(0, (len(t) - 1) // $BlockTokens),
       |      i -> {'blk': i,
       |            'btxt': array_to_string(
       |              t[(i * $BlockTokens + 1):(i * $BlockTokens + $BlockTokens)], ' ')})) AS u
       |  FROM toks),
       |blk AS MATERIALIZED (
       |  SELECT doc_id, (u).blk AS blk, (u).btxt AS btxt FROM blk0),
       |first AS MATERIALIZED (
       |  SELECT btxt, MIN(doc_id * ${1L << BlkBits} + blk) AS mp
       |  FROM blk GROUP BY btxt),
       |kept AS MATERIALIZED (
       |  SELECT b.doc_id, b.blk, b.btxt
       |  FROM blk b JOIN first f ON b.btxt = f.btxt
       |  WHERE b.doc_id * ${1L << BlkBits} + b.blk = f.mp),
       |agg AS MATERIALIZED (
       |  SELECT doc_id, COUNT(*) AS kept_n,
       |    string_agg(btxt, ' ' ORDER BY blk) AS new_text
       |  FROM kept GROUP BY doc_id),
       |tot AS MATERIALIZED (
       |  SELECT doc_id, COUNT(*) AS n FROM blk GROUP BY doc_id)
       |SELECT d.doc_id,
       |  CAST(tot.n AS BIGINT) AS n_blocks,
       |  CAST(COALESCE(agg.kept_n, 0) AS BIGINT) AS kept_blocks,
       |  COALESCE(agg.new_text, '') AS new_text
       |FROM documents d
       |JOIN tot USING (doc_id) LEFT JOIN agg USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  /** x43: span-level dedup REWRITE — chunk every document into
    * non-overlapping [[BlockTokens]]-token blocks, keep only the
    * globally FIRST occurrence of each distinct block content (ordered
    * by (doc_id, position) — within-doc repeats drop too), and emit the
    * surviving text per document. One row per doc (kept and fully-
    * gutted alike), so output is linear and the removal rate directly
    * readable.
    *
    * Determinism: "first" is an arithmetic min over doc_id·2^20+blk —
    * integer-exact on both engines; reconstruction order is the block
    * index. No floats anywhere. */
  val blockDedup = Q.withOracle(
    "x43_block_dedup_rewrite",
    "x43: keep-first block-level dedup with per-doc text reconstruction",
    blockDedupOracle) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val toks = split(col("text"), " ")
    val lastBlk = floor((size(toks) - 1) / lit(BlockTokens)).cast("int")
    val blocks = docs
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), lastBlk),
        i => array_join(slice(toks, i * BlockTokens + 1, lit(BlockTokens)), " "))))
      .select(col("doc_id"), col("pos").as("blk"), col("col").as("btxt"))
    val packed = shiftleft(col("doc_id"), BlkBits).bitwiseOR(col("blk").cast("long"))
    // ONE hash-agg on block content; min over a packed long keeps the
    // plan in HashAggregateExec (PlanAuditSpec enforces repo-wide).
    val first = blocks.groupBy(col("btxt")).agg(min(packed).as("mp"))
    val kept = blocks.join(first, "btxt").filter(packed === col("mp"))
    val agg = kept.groupBy(col("doc_id")).agg(
      count(lit(1)).as("kept_n"),
      array_join(
        transform(array_sort(collect_list(struct(col("blk"), col("btxt")))),
          x => x.getField("btxt")), " ").as("new_text0"))
    val tot = blocks.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_blocks"))
    docs.select(col("doc_id"))
      .join(tot, "doc_id").join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_blocks"),
        coalesce(col("kept_n"), lit(0L)).cast("long").as("kept_blocks"),
        coalesce(col("new_text0"), lit("")).as("new_text"))
      .orderBy(col("doc_id"))
  }

  val all: Seq[Q] = Seq(blockDedup)
}
