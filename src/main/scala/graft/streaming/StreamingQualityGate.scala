package graft.streaming

import graft.operators.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Streaming quality gate — the ingest-time form of
  * [[TextOps.nsTextGopher]]: every arriving document is scored against
  * the full Gopher rule battery and dropped at the door when any rule
  * fires, instead of surviving until a nightly filter pass.
  *
  * STATELESS like [[StreamingDsir.admissionStream]]: the rules are pure
  * per-row projections (no corpus statistics at all — the whole battery
  * is in-row by design), so there is no state store, no watermark, and
  * replays are idempotent by determinism. This is the cheapest possible
  * admission stage and belongs FIRST in the ingest chain: every document
  * it drops never reaches the shingle/embedding stages behind it.
  */
object StreamingQualityGate {

  /** Admit arriving documents that pass all six Gopher rules; the rule
    * and signal columns ride along for downstream audit.
    */
  def admissionStream(docStream: DataFrame): DataFrame =
    TextOps.gopherProfile(docStream).where(col("pass"))
}
