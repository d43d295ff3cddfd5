package graft.api

import graft.ledger.LedgerStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's HTTP read API over the ledger (S8 / L1 / L2).
  *
  * `get-upload-status?upload_id=X` and `list-uploads?status=S&limit=N` are
  * declared in the reference's deploy.sh:16-37 and documented in
  * README.md:48-64, but their Python entry points are absent from the
  * snapshot — semantics reconstructed from the docs (SURVEY.md §2.1 S8).
  *
  * Both are trivial scans of the small ledger: a point lookup and a
  * filter+limit. Ordering for list-uploads is unspecified by the docs; we
  * pick `queued_at DESC` (newest first) with `upload_id` as a deterministic
  * tiebreak, and note it as an engine decision.
  */
class StatusQueries(store: LedgerStore) {

  def getUploadStatus(uploadId: String): DataFrame =
    store.read().filter(col("upload_id") === uploadId)

  def listUploads(status: Option[String] = None, limit: Int = 10): DataFrame = {
    val base = store.read()
    status.fold(base)(s => base.filter(col("status") === s))
      .orderBy(col("queued_at").desc_nulls_last, col("upload_id"))
      .limit(limit)
  }
}
