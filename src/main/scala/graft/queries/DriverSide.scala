package graft.queries

import org.apache.spark.sql.{DataFrame, Row}

/** Guarded driver-side materialization for the domain-frame →
  * driver-algorithm pattern (Hungarian assignment, max-flow, union-find,
  * Markov-chain convergence, …): every such algorithm in `queries/` runs
  * on a frame already reduced to a low-cardinality domain (region ×
  * priority cells, event-type transition matrix, label centroids), so a
  * bounded collect is correct — but a fixture or schema drift could
  * silently turn the domain frame unbounded and OOM the driver.
  *
  * [[collectBounded]] makes that failure loud AND cheap: it collects at
  * most `cap + 1` rows (a `CollectLimit`, so the driver never
  * materializes a runaway frame even to count it) and `require`s the
  * frame fit the cap. When the require passes, the `limit` was a no-op —
  * all rows came back, so the nondeterministic row-selection of a
  * truncating limit can never leak into results.
  */
object DriverSide {

  /** Default cap: generous for every legitimate domain frame in the
    * registry (the largest is a few hundred rows), far below anything
    * that could distress a driver.
    */
  final val DefaultCap = 10000

  def collectBounded(df: DataFrame, what: String,
                     cap: Int = DefaultCap): Array[Row] = {
    val rows = df.limit(cap + 1).collect()
    require(rows.length <= cap,
      s"$what: driver-side domain frame exceeded cap $cap — " +
        "fixture/schema drift made a bounded-domain assumption unbounded")
    rows
  }

  /** `df.collectBounded("q442 region×priority cells")` call-site form. */
  implicit class BoundedCollectOps(private val df: DataFrame) extends AnyVal {
    def collectBounded(what: String, cap: Int = DefaultCap): Array[Row] =
      DriverSide.collectBounded(df, what, cap)
  }
}
