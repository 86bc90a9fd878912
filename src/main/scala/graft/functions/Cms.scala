package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The Count-Min bucket kernel (Cormode & Muthukrishnan 2005) shared
  * by the batch `text_cms` query and the streaming `cmsStream` face —
  * one definition of token → (row, bucket) so stream and batch sketch
  * into the same cells. Every cell is an integer SUM — order-free and
  * mergeable, which is exactly why the sketch streams: cells from any
  * partition of the data (triggers, shards, windows) add. Width 32 is
  * the gate's deliberately-colliding sizing; production w = ceil(e/eps)
  * with the same plan shape. */
object Cms {

  val D = 3
  val W = 32L

  /** Bucket of `tok` under hash row `dd` (1-based). */
  def bucket(dd: Int, tok: Column): Column =
    pmod(Hll.u32(concat(lit(s"cms$dd:"), tok)), lit(W))

  /** Explode a token column into its D (dd, bkt) cell coordinates. */
  def cells(tok: Column): Column =
    explode(array((1 to D).map(dd =>
      struct(lit(dd).as("dd"), bucket(dd, tok).as("bkt"))): _*))
}
