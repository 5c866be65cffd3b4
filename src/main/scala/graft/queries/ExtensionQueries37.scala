package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{HilbertIndex, Rounding, VectorFunctions, ZOrder}
import graft.io.Tables

/** Round-8 twelfth continuation wave: Johnson-Lindenstrauss projection
  * with a distance-distortion audit (q305), isotonic calibration via
  * the exact minimax PAV solution (q306), and a Hilbert-vs-Z-order
  * range-scan locality audit (q307). Same contract as every other
  * module: each Spark pipeline pairs with DuckDB oracle SQL replaying
  * it.
  */
object ExtensionQueries37 {

  private val SrcDim = 64
  private val ProjDim = 16

  /** Deterministic ±1 JL sign, a pure function of (dim, out-dim) — the
    * projection "matrix" is never materialized anywhere but here, and
    * the oracle SQL inlines the same values as literals. A splitmix-
    * style avalanche mix, NOT a linear congruence: the first draft used
    * parity of a linear form and the 16 rows collapsed into perfectly
    * correlated ± copies (row sums all exactly 0, one row pair at
    * |dot| = 64 — the same mod-2 degeneracy DESIGN.md records for the
    * q291 pHash patterns). Extension37Spec pins the matrix quality.
    */
  private def jlSign(d: Int, j: Int): Float = {
    var h = d.toLong * 0x9E3779B97F4A7C15L + j.toLong * 0xC2B2AE3D27D4EB4FL
    h ^= h >>> 29
    h *= 0xBF58476D1CE4E5B9L
    h ^= h >>> 32
    if ((h & 1L) == 0L) 1.0f else -1.0f
  }

  /** Visible to the spec so the matrix-quality pins exercise the SAME
    * values the query inlines.
    */
  def jlSignMatrix: Array[Array[Float]] =
    Array.tabulate(ProjDim, SrcDim)((j, d) => jlSign(d + 1, j + 1))

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q305: Johnson-Lindenstrauss ±1 random projection 64→16 with a
    // measured distance-distortion audit — the cheap dimensionality
    // reduction in front of ANN indexing (project once, index the
    // 4×-smaller vectors, re-rank survivors at full width). The signs
    // are a pure hash of (dim, out_dim) so the projection needs NO
    // stored matrix — any executor regenerates it — and the audit is
    // the JL lemma made empirical: the projected/original distance
    // ratio over consecutive-id pairs, histogrammed in 0.05 buckets
    // (concentration near 1.0 is the win; the tails are the risk).
    // Projected dims round to REAL so both engines compare identical
    // 32-bit values; ratio means accumulate as exact 1e-9 LONGs.
    Q(
      "q305_jl_distortion",
      (s, dir) => {
        val proj = array((1 to ProjDim).map { j =>
          val signs = (1 to SrcDim).map(d => jlSign(d, j)).toArray
          (VectorFunctions.dotProduct(col("embedding"), typedlit(signs)) /
            lit(4.0)).cast("float")
        }: _*)
        val e = Tables.load(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"), proj.as("p"))
        val pairs = e.as("a").join(e.as("b"),
            col("b.vec_id") === col("a.vec_id") + 1)
          .select(
            VectorFunctions.l2Dist(col("a.embedding"), col("b.embedding"))
              .as("d_orig"),
            VectorFunctions.l2Dist(col("a.p"), col("b.p")).as("d_proj"))
          .where(col("d_orig") > 0.0)
          .withColumn("ratio", col("d_proj") / col("d_orig"))
        pairs
          .groupBy(floor(col("ratio") * lit(20.0)).cast("long")
            .as("bucket"))
          .agg(count(lit(1)).as("n"),
            sum(floor(col("ratio") * lit(1000000000.0) + lit(0.5))
              .cast("long")).as("r9"),
            min("ratio").as("mn"), max("ratio").as("mx"))
          .select(col("bucket"), col("n"),
            Rounding.stableRound6(col("r9").cast("double") /
              lit(1000000000.0) / col("n").cast("double"))
              .as("mean_ratio"),
            Rounding.stableRound6(col("mn")).as("min_ratio"),
            Rounding.stableRound6(col("mx")).as("max_ratio"))
          .orderBy("bucket")
      },
      Some {
        def signList(j: Int): String =
          (1 to SrcDim).map(d => if (jlSign(d, j) > 0) "1.0" else "-1.0")
            .mkString("[", ",", "]")
        val projList = (1 to ProjDim)
          .map(j => s"CAST(list_dot_product(v, ${signList(j)}::DOUBLE[])" +
            " / 4.0 AS REAL)")
          .mkString("[", ", ", "]")
        s"""WITH e AS (
           |  SELECT vec_id, embedding::DOUBLE[] AS v,
           |    $projList AS p
           |  FROM embeddings),
           |pairs AS (
           |  SELECT list_distance(a.v, b.v) AS d_orig,
           |    list_distance(a.p::DOUBLE[], b.p::DOUBLE[]) AS d_proj
           |  FROM e a JOIN e b ON b.vec_id = a.vec_id + 1),
           |r AS (
           |  SELECT d_proj / d_orig AS ratio FROM pairs
           |  WHERE d_orig > 0.0)
           |SELECT CAST(floor(ratio * 20.0) AS BIGINT) AS bucket,
           |  CAST(count(*) AS BIGINT) AS n,
           |  ${Rounding.duckSql(
              "sum(CAST(floor(ratio * 1000000000.0 + 0.5) AS BIGINT))" +
              "::DOUBLE / 1000000000.0 / count(*)::DOUBLE")}
           |    AS mean_ratio,
           |  ${Rounding.duckSql("min(ratio)")} AS min_ratio,
           |  ${Rounding.duckSql("max(ratio)")} AS max_ratio
           |FROM r GROUP BY 1 ORDER BY bucket""".stripMargin
      }),

    // ------------------------------------------------------------------
    // q306: isotonic calibration of the q204 length-based probability
    // via the EXACT minimax characterization of the pool-adjacent-
    // violators solution: iso(i) = max_{j≤i} min_{k≥i} avg(y over bins
    // j..k). PAV itself is a sequential stack walk; the minimax form is
    // pure joins over the BIN frame (≤20 rows — parameter-sized, not
    // data-sized), so the whole fit is three broadcast joins after one
    // 20-key aggregation of the corpus — the only isotonic shape that
    // makes sense distributed. Every pooled average is one double
    // division of exact LONG window sums; min/max over identical
    // doubles are engine-stable. The fitted curve is nondecreasing by
    // theorem (Extension37Spec pins it).
    Q(
      "q306_isotonic_calibration",
      (s, dir) => {
        val scored = Tables.load(s, dir, "documents")
          .select(
            when(col("lang") === "en", 1L).otherwise(0L).as("y"),
            (col("n_chars").cast("double") /
              (col("n_chars") + lit(1000)).cast("double")).as("p"))
          .withColumn("bin", floor(col("p") * lit(20.0)).cast("long"))
        val bins = scored.groupBy("bin")
          .agg(count(lit(1)).as("w"), sum("y").as("pos"))
        val wOrd = Window.orderBy("bin")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = bins
          .withColumn("rn", row_number().over(Window.orderBy("bin")))
          .withColumn("cw", sum("w").over(wOrd))
          .withColumn("cp", sum("pos").over(wOrd))
        val i = cum.select(col("rn").as("irn"), col("bin"), col("w"),
          col("pos"))
        val j = cum.select(col("rn").as("jrn"), col("w").as("jw"),
          col("pos").as("jpos"), col("cw").as("jcw"), col("cp").as("jcp"))
        val k = cum.select(col("rn").as("krn"), col("cw").as("kcw"),
          col("cp").as("kcp"))
        val tri = i
          .join(j, col("jrn") <= col("irn"))
          .join(k, col("krn") >= col("irn"))
          .groupBy("irn", "jrn")
          .agg(min(
            (col("kcp") - col("jcp") + col("jpos")).cast("double") /
              (col("kcw") - col("jcw") + col("jw")).cast("double"))
            .as("mn"))
        val iso = tri.groupBy("irn").agg(max("mn").as("iso"))
        i.join(iso, "irn")
          .select(col("bin"), col("w").as("n"), col("pos"),
            Rounding.stableRound6(col("pos").cast("double") /
              col("w").cast("double")).as("rate"),
            Rounding.stableRound6(col("iso")).as("iso_rate"))
          .orderBy("bin")
      },
      Some(s"""WITH scored AS (
             |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
             |    n_chars::DOUBLE / (n_chars + 1000)::DOUBLE AS p
             |  FROM documents),
             |bins AS (
             |  SELECT CAST(floor(p * 20.0) AS BIGINT) AS bin,
             |    count(*) AS w, CAST(sum(y) AS BIGINT) AS pos
             |  FROM scored GROUP BY 1),
             |cum AS (
             |  SELECT bin, w, pos, row_number() OVER (ORDER BY bin) AS rn,
             |    sum(w) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
             |      PRECEDING AND CURRENT ROW) AS cw,
             |    sum(pos) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
             |      PRECEDING AND CURRENT ROW) AS cp
             |  FROM bins),
             |tri AS (
             |  SELECT i.rn AS irn, j.rn AS jrn,
             |    min((k.cp - j.cp + j.pos)::DOUBLE /
             |        (k.cw - j.cw + j.w)::DOUBLE) AS mn
             |  FROM cum i JOIN cum j ON j.rn <= i.rn
             |  JOIN cum k ON k.rn >= i.rn
             |  GROUP BY 1, 2),
             |iso AS (SELECT irn, max(mn) AS iso FROM tri GROUP BY 1)
             |SELECT bin, CAST(w AS BIGINT) AS n, pos,
             |  ${Rounding.duckSql("pos::DOUBLE / w::DOUBLE")} AS rate,
             |  ${Rounding.duckSql("iso")} AS iso_rate
             |FROM cum JOIN iso ON iso.irn = cum.rn
             |ORDER BY bin""".stripMargin)),

    // ------------------------------------------------------------------
    // q307: Hilbert-vs-Z-order range-scan locality audit over a 64×64
    // (price-cents, order-day) grid of the orders table — the
    // data-layout decision q101 set up, now MEASURED: for three probe
    // rectangles, how many contiguous key runs does each curve need to
    // cover the occupied cells? Fewer runs = fewer row-group seeks when
    // the table is written sorted by that key; Hilbert's advantage is
    // exactly its lack of Morton's diagonal jumps. All integer
    // arithmetic end-to-end (integer-cents snap, stretch-div bucketing,
    // the codegen'd HilbertIndex walk, lag-based run counting) — zero
    // fp risk. The grid/audit frames are parameter-sized (≤4096 cells,
    // 3 rects); only the one bucketing scan sees the data.
    Q(
      "q307_hilbert_locality",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
        val base = o.select(
          floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long")
            .as("cents"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("us"))
        val mm = base.agg(max("cents"), min("us"), max("us")).head()
        val (maxC, minUs, maxUs) = (mm.getLong(0), mm.getLong(1),
          mm.getLong(2))
        val maxDay = (maxUs - minUs) / 86400000000L
        val cells = base
          .select(
            expr(s"(cents * 64) div ${maxC + 1}").as("bx"),
            expr(s"((us - ${minUs}L) div 86400000000 * 64) div " +
              s"${maxDay + 1}").as("by"))
          .groupBy("bx", "by").agg(count(lit(1)).as("n_rows"))
        val keyed = cells.select(col("bx"), col("by"), col("n_rows"),
          HilbertIndex(col("bx"), col("by"), 6).as("hkey"),
          ZOrder.interleave16(col("bx"), col("by")).as("zkey"))
        import s.implicits._
        val rects = Seq((1L, 0L, 31L, 0L, 31L), (2L, 16L, 47L, 16L, 47L),
          (3L, 8L, 55L, 24L, 39L))
          .toDF("rect_id", "x1", "x2", "y1", "y2")
        val melted = keyed.crossJoin(broadcast(rects))
          .where(col("bx").between(col("x1"), col("x2")) &&
            col("by").between(col("y1"), col("y2")))
          .select(col("rect_id"), col("n_rows"),
            explode(array(
              struct(lit("hilbert").as("curve"), col("hkey").as("key")),
              struct(lit("zorder").as("curve"), col("zkey").as("key"))))
              .as("e"))
          .select(col("rect_id"), col("n_rows"), col("e.curve").as("curve"),
            col("e.key").as("key"))
        val wLag = Window.partitionBy("rect_id", "curve").orderBy("key")
        melted
          .withColumn("brk",
            when(lag("key", 1).over(wLag).isNull ||
              col("key") =!= lag("key", 1).over(wLag) + 1, 1L)
              .otherwise(0L))
          .groupBy("rect_id", "curve")
          .agg(count(lit(1)).as("n_cells"), sum("n_rows").as("covered"),
            sum("brk").as("n_runs"))
          .orderBy("rect_id", "curve")
      },
      Some {
        val hilb = HilbertIndex.duckLevels(6,
          "(SELECT bx, by, n_rows, bx AS x, by AS y, 0::BIGINT AS d " +
            "FROM cells)",
          Seq("bx", "by", "n_rows"))
        s"""WITH base AS (
           |  SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
           |      AS cents,
           |    epoch_us(o_orderdate::TIMESTAMP) AS us
           |  FROM orders),
           |mm AS (
           |  SELECT max(cents) AS maxc, min(us) AS minus,
           |    (max(us) - min(us)) // 86400000000 AS maxday
           |  FROM base),
           |cells AS (
           |  SELECT (cents * 64) // (maxc + 1) AS bx,
           |    (((us - minus) // 86400000000) * 64) // (maxday + 1) AS by,
           |    count(*) AS n_rows
           |  FROM base, mm GROUP BY 1, 2),
           |keyed AS (
           |  SELECT bx, by, n_rows, d AS hkey,
           |    ${ZOrder.duckSql("bx", "by")} AS zkey
           |  FROM $hilb),
           |rects(rect_id, x1, x2, y1, y2) AS (
           |  VALUES (1, 0, 31, 0, 31), (2, 16, 47, 16, 47),
           |    (3, 8, 55, 24, 39)),
           |melted AS (
           |  SELECT rect_id, n_rows, 'hilbert' AS curve, hkey AS key
           |  FROM keyed, rects
           |  WHERE bx BETWEEN x1 AND x2 AND by BETWEEN y1 AND y2
           |  UNION ALL
           |  SELECT rect_id, n_rows, 'zorder' AS curve, zkey AS key
           |  FROM keyed, rects
           |  WHERE bx BETWEEN x1 AND x2 AND by BETWEEN y1 AND y2),
           |runs AS (
           |  SELECT rect_id, curve, n_rows,
           |    CASE WHEN lag(key) OVER w IS NULL
           |      OR key <> lag(key) OVER w + 1 THEN 1 ELSE 0 END AS brk
           |  FROM melted
           |  WINDOW w AS (PARTITION BY rect_id, curve ORDER BY key))
           |SELECT CAST(rect_id AS BIGINT) AS rect_id, curve,
           |  CAST(count(*) AS BIGINT) AS n_cells,
           |  CAST(sum(n_rows) AS BIGINT) AS covered,
           |  CAST(sum(brk) AS BIGINT) AS n_runs
           |FROM runs GROUP BY rect_id, curve
           |ORDER BY rect_id, curve""".stripMargin
      }))
}
