package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy record linkage (entity resolution): find pairs of records whose
  * identifying string is within a small edit distance — near-identical
  * customer/supplier/author records that exact keys can't collapse. The
  * standard two-phase shape every ER system uses (Fellegi-Sunter
  * blocking, Ed-Join's segment filter): a cheap equi-join candidate
  * front, then the expensive verifier only on candidates.
  */
object Linkage {

  /** Edit-distance pairs via an exact blocking front + Levenshtein
    * verify.
    *
    * DECLARED SEMANTICS — by default, equal-length (substitution)
    * matching: every block key includes the string length, so pairs
    * whose strings differ in length (edits containing an insert/
    * delete) are NOT reported. That is the right contract for
    * fixed-width identifier schemas (codes, padded names, SKUs). For
    * `maxDist = 1` the front is EXACT under that contract
    * (equal-length edit distance 1 ⟺ exactly one substitution); for
    * `maxDist ≥ 2` recall covers all ≤ maxDist-substitution pairs —
    * an equal-length pair whose optimal edit script uses paired
    * insert/deletes (a shifted span, possible at distance ≥ 2) is out
    * of contract. Asserted front ≡ brute force in OperatorsSuite; the
    * oracle carries the same length predicate.
    *
    * `indels = true` (maxDist = 1 only) lifts the length restriction:
    * the full edit-distance-1 relation — substitution, insertion OR
    * deletion. The FastSS deletion neighborhood the substitution front
    * already stages covers indels nearly for free: ed(s,t) = 1 with
    * |s| = |t|+1 ⟺ some single-character deletion of s equals t
    * exactly, so ONE extra equi-join of the masked variants against
    * full strings (key: block cols + variant text; the length
    * relation is implied by string equality) yields every indel pair
    * with zero false positives. Candidates stay ∝ true matches.
    * Asserted ≡ length-unrestricted brute force in OperatorsSuite.
    *
    * Front, `maxDist = 1` (FastSS/deletion-neighborhood indexing):
    * each string emits `len` keys — (position i, string with position i
    * deleted). Two equal-length strings at hamming ≤ 1 share a masked
    * variant, so the self-equi-join on (blockCols…, length, i, masked)
    * generates candidates ∝ TRUE MATCHES, never blockwise all-pairs —
    * immune to near-constant name structure ("Customer#…" shares its
    * whole prefix; a segment front degenerates to |block|² there, the
    * rewrite that took x_entity_match 13.4 s → sub-second at sf0.1).
    * The staged frame grows ×len, the price of output-proportional
    * candidates — right for identifier-length strings.
    *
    * Front, `maxDist ≥ 2` (pigeonhole segments): the string splits into
    * maxDist+1 equal segments; a ≤ maxDist-substitution pair agrees on
    * at least one whole segment. Candidate volume is Σ_b |b|² over
    * groups sharing (blockCols, a segment) — the caller's co-block
    * column carries the selectivity when name structure makes segments
    * near-constant; AQE splits skewed blocks.
    *
    * Both fronts deduplicate candidates on (id, id) BEFORE the
    * O(len²) Levenshtein verifier. NULL name rows are silently excluded
    * (a NULL has no length, no segments, and no defined edit distance).
    *
    * Output: (id1, id2, dist), id1 < id2, dist ≤ maxDist. */
  def editDistancePairs(df: DataFrame, idCol: String, nameCol: String,
                        blockCols: Seq[String], maxDist: Int,
                        indels: Boolean = false): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    require(!indels || maxDist == 1,
      "indel matching is supported at maxDist = 1 only (the deletion-" +
        "neighborhood front is exact there); use maxDist = 1 or indels = false")
    Joins.requireFreeColumns("editDistancePairs", df.columns,
      "__id", "__nm", "__len", "__seg", "__segval",
      "__ida", "__idb", "__nma", "__nmb", "id1", "id2", "dist")
    val base = df.select(
      (Seq(col(idCol).as("__id"), col(nameCol).as("__nm"),
        length(col(nameCol)).as("__len")) ++ blockCols.map(col)): _*)
    val staged =
      if (maxDist <= 1) {
        // masked variant i = the string with 1-based position i+1 cut out
        base
          .select((Seq(col("__id"), col("__nm"), col("__len"),
            // greatest guards len=0 (Spark's sequence(0,-1) would count
            // DOWN); an empty string then emits one "" mask and still
            // pairs with other empties at dist 0
            explode(sequence(lit(0), greatest(col("__len") - 1, lit(0))))
              .as("__seg"))
            ++ blockCols.map(col)): _*)
          .select((Seq(col("__id"), col("__nm"), col("__len"), col("__seg"),
            concat(col("__nm").substr(lit(1), col("__seg")),
              col("__nm").substr(col("__seg") + 2, col("__len")))
              .as("__segval"))
            ++ blockCols.map(col)): _*)
      } else {
        val segs = maxDist + 1
        // segment i (0-based, equal split): chars
        // [floor(i·L/segs)+1, floor((i+1)·L/segs)] in 1-based form
        val lo = (floor(col("__seg") * col("__len") / segs) + 1).cast("int")
        val hi = floor((col("__seg") + 1) * col("__len") / segs).cast("int")
        base
          .select((Seq(col("__id"), col("__nm"), col("__len"),
            explode(sequence(lit(0), lit(segs - 1))).as("__seg"))
            ++ blockCols.map(col)): _*)
          .select((Seq(col("__id"), col("__nm"), col("__len"), col("__seg"),
            col("__nm").substr(lo, hi - lo + 1).as("__segval"))
            ++ blockCols.map(col)): _*)
      }
    val key = Seq("__len", "__seg", "__segval") ++ blockCols
    val a = staged.toDF(staged.columns.map {
      case "__id" => "__ida"; case "__nm" => "__nma"; case other => other
    }: _*)
    val b = staged.toDF(staged.columns.map {
      case "__id" => "__idb"; case "__nm" => "__nmb"; case other => other
    }: _*)
    val subCand = a.join(b, key)
      .where(col("__ida") < col("__idb"))
      .select(col("__ida"), col("__idb"), col("__nma"), col("__nmb"))
    val cand = if (!indels) subCand else {
      // indel front: a masked variant of the longer string equal to the
      // FULL shorter string ⟺ one deletion apart. String equality on
      // the join key implies the len-1 relation, so the key drops both
      // __len and __seg; normalize to id1 < id2 before the shared dedup
      // ("aab" masks to "ab" at two positions — distinct() collapses).
      val full = base.where(col("__nm").isNotNull).select(
        (Seq(col("__id").as("__idb"), col("__nm").as("__nmb"),
          col("__nm").as("__segval")) ++ blockCols.map(col)): _*)
      val masked = staged.select(
        (Seq(col("__id").as("__ida"), col("__nm").as("__nma"),
          col("__segval")) ++ blockCols.map(col)): _*)
      val flip = col("__ida") > col("__idb")
      val indelCand = masked.join(full, "__segval" +: blockCols)
        .where(col("__ida") =!= col("__idb"))
        .select(
          when(flip, col("__idb")).otherwise(col("__ida")).as("__ida"),
          when(flip, col("__ida")).otherwise(col("__idb")).as("__idb"),
          when(flip, col("__nmb")).otherwise(col("__nma")).as("__nma"),
          when(flip, col("__nma")).otherwise(col("__nmb")).as("__nmb"))
      subCand.unionByName(indelCand)
    }
    cand
      .distinct()
      .select(col("__ida").as("id1"), col("__idb").as("id2"),
        levenshtein(col("__nma"), col("__nmb")).cast("long").as("dist"))
      .where(col("dist") <= maxDist)
  }
}
