package graft.core

import org.apache.spark.sql.{DataFrame, Row}

/** The ONE sanctioned way to pull a metadata frame onto the driver.
  *
  * Every driver-side `.collect()` in this codebase is a bounded
  * metadata probe (manifest commit lists, expectation reports, recall
  * summaries) — never a data path. This helper makes the bound
  * EXPLICIT and enforced: it fetches `maxRows + 1` and fails loudly
  * if the frame exceeds its declared bound, so a future edit that
  * accidentally points a probe at a fact table dies with a named
  * error instead of OOMing the driver at scale. (One-row `.agg(...)
  * .head()` probes are bounded by construction and don't need this.)
  */
object DriverProbe {

  def boundedCollect(df: DataFrame, maxRows: Int, what: String): Array[Row] = {
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"$what: driver-side probe exceeded its declared bound of " +
        s"$maxRows rows — this probe must never see a data-sized frame")
    rows
  }
}
